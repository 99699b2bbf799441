"""operators/interval_join.py contract: equality with the naive
nested-loop result, boundary inclusivity, by-key scoping, and the
nested-loop-free plan pin."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from ida_dataengineerproject_spark.operators.interval_join import (
    interval_point_join,
)


def test_matches_naive_including_boundaries_and_cell_spans(spark):
    # intervals chosen to straddle grid cells (width 10) and to share
    # exact boundary points with the point set
    intervals = [(100, 0, 9), (101, 5, 25), (102, 30, 30), (103, 8, 41)]
    points = list(range(0, 45, 3))  # 0,3,...,42 — hits 0, 9, 30, 41 edges
    pdf = spark.createDataFrame([(p,) for p in points], ["pt"])
    idf = spark.createDataFrame(intervals, ["iid", "s", "e"])
    got = sorted(
        (r["pt"], r["iid"])
        for r in interval_point_join(pdf, idf, "pt", "s", "e", 10).collect()
    )
    want = sorted(
        (p, iid)
        for p, (iid, s, e) in itertools.product(points, intervals)
        if s <= p <= e
    )
    assert got == want


def test_by_keys_scope_the_join(spark):
    pdf = spark.createDataFrame(
        [("a", 5), ("b", 5)], ["grp", "pt"]
    )
    idf = spark.createDataFrame([("a", 0, 10, 1)], ["grp", "s", "e", "iid"])
    got = interval_point_join(
        pdf, idf, "pt", "s", "e", 4, by=["grp"]
    ).collect()
    assert [(r["grp"], r["pt"]) for r in got] == [("a", 5)]


def test_plan_has_no_nested_loop_join(spark):
    pdf = spark.range(1000).select(F.col("id").alias("pt"))
    idf = spark.range(50).select(
        F.col("id").alias("iid"),
        (F.col("id") * 20).alias("s"),
        (F.col("id") * 20 + 15).alias("e"),
    )
    j = interval_point_join(pdf, idf, "pt", "s", "e", 16)
    j.write.format("noop").mode("overwrite").save()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rejects_nonpositive_width(spark):
    import pytest

    pdf = spark.range(1).select(F.col("id").alias("pt"))
    with pytest.raises(ValueError, match="width"):
        interval_point_join(pdf, pdf, "pt", "pt", "pt", 0)
