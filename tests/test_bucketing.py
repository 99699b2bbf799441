"""Bucketed co-located join: persisting both join sides bucketed on the
join key lets Spark plan a SortMergeJoin with NO Exchange on either side —
the pre-shuffled layout a 100 TB fact table wants (pyspark guide,
'Partitioning & shuffle').  This test proves the engine produces that plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def warehouse(spark):
    # warehouse.dir is a static conf — use the default (./spark-warehouse,
    # gitignored) and clean the tables up afterwards
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    from ida_dataengineerproject_spark.sources.tables import table

    li = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderdate")

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")

    joined = (
        spark.table("li_b")
        .join(
            spark.table("o_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderdate")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    # disable broadcast so the join must use the bucketed layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_section, (
        "bucketed join must not shuffle either side:\n" + join_section
    )
    assert joined.count() > 0
