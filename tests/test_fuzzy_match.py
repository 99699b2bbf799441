"""Contract tests for deletion-neighborhood fuzzy matching.

The SymSpell blocking identity guarantees zero false negatives at edit
distance <= 1; test_blocked_equals_bruteforce pins that against a
literal cross join computed in the same Spark session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ida_dataengineerproject_spark.operators.fuzzy import (
    delete_variants,
    fuzzy_match_lev1,
)

NAMES = [
    "small ring",
    "small rng",      # deletion of 'i'
    "smalk ring",     # substitution
    "small rings",    # insertion at end
    "xsmall ring",    # insertion at start
    "tiny bolt",      # unrelated
    "red widget",
    "red widgett",
    "ab",             # short strings: deletes go to length 1
    "b",
]


def test_delete_variants_shape(spark):
    df = spark.createDataFrame([("abc",)], ["s"]).select(
        delete_variants(F.col("s"))
    )
    [row] = df.collect()
    assert row["variant"] == ["abc", "bc", "ac", "ab"]


def test_blocked_equals_bruteforce(spark):
    probe = spark.createDataFrame([(n,) for n in NAMES], ["a"])
    cat = spark.createDataFrame([(n,) for n in NAMES], ["b"])
    blocked = {
        (r["a"], r["b"], r["dist"])
        for r in fuzzy_match_lev1(probe, cat, "a", "b").collect()
    }
    brute = {
        (r["a"], r["b"], r["dist"])
        for r in probe.crossJoin(cat)
        .select("a", "b", F.levenshtein("a", "b").alias("dist"))
        .where(F.col("dist") <= 1)
        .collect()
    }
    assert blocked == brute
    # sanity: the intended pairs are present
    assert ("small ring", "small rng", 1) in blocked
    assert ("small ring", "smalk ring", 1) in blocked
    assert ("small ring", "small rings", 1) in blocked
    assert ("small ring", "xsmall ring", 1) in blocked
    assert ("small ring", "tiny bolt", 1) not in {
        (a, b, d) for a, b, d in blocked
    }
