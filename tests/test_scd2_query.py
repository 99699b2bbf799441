"""Invariant tests for x28_scd2_merge_history (parity pins values; these
pin the SCD2 contract itself)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from ida_dataengineerproject_spark.operators.scd2 import scd2_merge
from ida_dataengineerproject_spark.queries.scd_ops import q_x28

SF = "/root/testdata/sf0.001"


def test_x28_scd2_invariants(spark):
    rows = q_x28(spark, SF).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(r)
    for uid, vs in per_user.items():
        cur = [v for v in vs if v["is_current"]]
        assert len(cur) == 1, f"user {uid}: {len(cur)} current rows"
        assert cur[0]["valid_to_us"] is None
        # closed versions have valid_to, and intervals chain without
        # overlap: sorted by valid_from, each valid_to == next valid_from
        # EXCEPT across the merge cutover (a close at cutover may leave a
        # gap to nothing — the new version starts exactly at cutover)
        closed = sorted(
            (v for v in vs if not v["is_current"]),
            key=lambda v: v["valid_from_us"],
        )
        for v in closed:
            assert v["valid_to_us"] is not None
            assert v["valid_to_us"] > v["valid_from_us"] or (
                # merge-closed rows may close at the cutover which can
                # equal valid_from only if the version opened at cutover
                v["valid_to_us"] >= v["valid_from_us"]
            )


def test_scd2_merge_idempotent_on_same_batch(spark):
    """Re-applying an identical updates batch must be a no-op: every key
    matches with equal attributes, so no rows close and none open."""
    dim = spark.createDataFrame(
        [
            (1, "a", 10, None, True),
            (2, "b", 20, None, True),
        ],
        "k int, attr string, v int, valid_to timestamp, is_current boolean",
    ).withColumn("valid_from", F.lit("2024-01-01").cast("timestamp"))
    upd = spark.createDataFrame([(1, "a", 10)], "k int, attr string, v int")
    ts = F.lit("2024-02-01").cast("timestamp")
    once = scd2_merge(dim, upd, ["k"], ["attr", "v"], batch_ts=ts)
    twice = scd2_merge(once, upd, ["k"], ["attr", "v"], batch_ts=ts)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    assert len(a) == 2  # nothing closed, nothing added
