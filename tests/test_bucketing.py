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


def test_ensure_bucketed_key_is_part_of_the_memo_tag(spark):
    """Regression (ADVICE r10): a second call bucketing the SAME
    (table, cols) on a DIFFERENT key must materialize a DIFFERENT
    catalog table — before r11 the memo tag omitted the key, so the
    wrong-key table was silently reused and the exchange-free plan
    quietly disappeared."""
    from ida_dataengineerproject_spark.sources.bucketed import (
        ensure_bucketed,
    )

    cols = ["l_orderkey", "l_partkey", "l_extendedprice"]
    a = ensure_bucketed(spark, SF_SMOKE, "lineitem", "l_orderkey", cols, 4)
    b = ensure_bucketed(spark, SF_SMOKE, "lineitem", "l_partkey", cols, 4)
    assert a != b
    # and each table's real bucket spec matches its requested key
    for name, key in [(a, "l_orderkey"), (b, "l_partkey")]:
        ddl = spark.sql(f"SHOW CREATE TABLE {name}").first()[0]
        assert f"CLUSTERED BY ({key})" in ddl, ddl
