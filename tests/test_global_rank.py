"""Contract tests for operators/ranking.global_rank.

The bucketed two-level rank must equal the naive single-partition
window rank exactly, for any bucket boundaries — including the
degenerate constant-column case where every boundary dedupes away.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ida_dataengineerproject_spark.operators.ranking import global_rank
from ida_dataengineerproject_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def _naive(df, value_col, tiebreaks):
    w = Window.orderBy(value_col, *tiebreaks)
    return df.withColumn("rank", F.row_number().over(w))


def test_equals_naive_window_rank(spark):
    rev = (
        table(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").cast("long").alias("v"))
    )
    got = {
        r["o_custkey"]: r["rank"]
        for r in global_rank(rev, "v", ["o_custkey"]).collect()
    }
    want = {
        r["o_custkey"]: r["rank"]
        for r in _naive(rev, "v", ["o_custkey"]).collect()
    }
    assert got == want
    n = len(want)
    assert sorted(got.values()) == list(range(1, n + 1))


def test_constant_column_degenerates_to_one_bucket(spark):
    df = spark.createDataFrame(
        [(i, 42) for i in range(100)], ["id", "v"]
    )
    got = {
        r["id"]: r["rank"] for r in global_rank(df, "v", ["id"]).collect()
    }
    # all values equal -> rank follows the tiebreak alone
    assert got == {i: i + 1 for i in range(100)}


def test_heavy_skew_still_exact(spark):
    # 90% of rows share one hot value; boundaries collapse around it
    rows = [(i, 7) for i in range(900)] + [(900 + i, i) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = global_rank(df, "v", ["id"]).collect()
    want = {r["id"]: r["rank"] for r in _naive(df, "v", ["id"]).collect()}
    assert {r["id"]: r["rank"] for r in got} == want


def test_only_bounded_single_partition_exchange(spark):
    rev = (
        table(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").cast("long").alias("v"))
    )
    df = global_rank(rev, "v", ["o_custkey"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # exactly one SinglePartition exchange: the <=n_buckets offset cumsum
    assert plan.count("Arguments: SinglePartition") == 1, plan
