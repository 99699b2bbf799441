"""operators/asof.py contract: both directions equal the naive
per-row nearest-match scan, including the inclusive tie rule and
no-match NULLs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ida_dataengineerproject_spark.operators.asof import asof_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _naive(left, right, direction):
    out = []
    for key, lts, tag in left:
        cands = [
            (rts, v)
            for k, rts, v in right
            if k == key
            and (rts <= lts if direction == "backward" else rts >= lts)
        ]
        if not cands:
            out.append((tag, None))
        elif direction == "backward":
            out.append((tag, max(cands)[1]))
        else:
            out.append((tag, min(cands)[1]))
    return sorted(out)


def test_asof_both_directions_match_naive_with_ties_and_missing(spark):
    left_rows = [
        (1, 10, "a"), (1, 20, "b"), (1, 5, "c"),   # c: no earlier right
        (2, 15, "d"),                                # ties at 15
        (3, 7, "e"),                                 # key with no right rows
    ]
    right_rows = [
        (1, 8, "r8"), (1, 10, "r10"), (1, 19, "r19"),
        (2, 15, "r15"), (2, 30, "r30"),
    ]
    left = spark.createDataFrame(
        [(k, _ts(s), t) for k, s, t in left_rows], ["k", "ts", "tag"]
    )
    right = spark.createDataFrame(
        [(k, _ts(s), v) for k, s, v in right_rows], ["k", "ts", "val"]
    )
    for direction in ("backward", "forward"):
        got = asof_join(
            left, right, ["k"], "ts", "ts", ["val"], direction=direction
        )
        got_pairs = sorted(
            (r["tag"], r["val"]) for r in got.collect()
        )
        want = _naive(
            [(k, s, t) for k, s, t in left_rows],
            [(k, s, v) for k, s, v in right_rows],
            direction,
        )
        assert got_pairs == want, direction
        # every left row survives exactly once (left-join semantics)
        assert got.count() == len(left_rows)


def test_asof_match_ts_enables_tolerance_filtering(spark):
    left = spark.createDataFrame([(1, _ts(100), "x")], ["k", "ts", "tag"])
    right = spark.createDataFrame([(1, _ts(10), "old")], ["k", "ts", "val"])
    got = asof_join(left, right, ["k"], "ts", "ts", ["val"]).collect()[0]
    assert got["val"] == "old"
    lag = (got["ts"] - got["__match_ts"]).total_seconds()
    assert lag == 90.0  # caller can apply any TTL on __match_ts (xq6 rule)
