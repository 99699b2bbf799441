"""Registry entries for the composed pipeline + two more TPC-H shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.aggs import sum_exact
from ..plans.datapipeline import prepare_documents
from ..registry import register
from ..sources.tables import table


@register("pipeline_prepare_documents")  # rows-only: LSH stage is hash-seeded
def q_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full training-data prep pipeline: quality gate → lang filter →
    exact dedup → MinHash-LSH near-dup removal → stats projection.
    Invariants asserted in tests/test_datapipeline.py."""
    return prepare_documents(spark, sf_dir)


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate — every predicate reaches
    the parquet scan (PushedFilters), result is one row."""
    li = table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        sum_exact(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )


@register(
    "tpch_q12_shipmode_priority",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional counting (CASE inside SUM) +
    a non-equi residual predicate on the join output."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    hot = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hot, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hot, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
