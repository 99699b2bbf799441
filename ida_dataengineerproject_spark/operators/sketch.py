"""Count-Min sketch over a key column — sub-linear frequency estimation
as pure DataFrame ops (no driver-side state, no UDF).

Why an engine needs it at 100 TB: exact per-key counts of a
high-cardinality column (users, URLs, n-grams) shuffle one row per
distinct key; a CMS shuffles d×w fixed counters (here 4×1024 ≈ 4k rows)
no matter how many keys exist, and answers point-frequency queries with
the classic one-sided guarantee: est ≥ true, and
P[est > true + ε·N] ≤ δ with w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉.

Build: explode each row to d (row_idx, bucket) pairs via xxhash64(seed,
key) mod w — map-side, then ONE aggregate over (row_idx, bucket): the
shuffle payload is the sketch size, not the data size.  Query: join keys
against the sketch on (row_idx, bucket), take min over the d counters.

The sketch is itself a DataFrame, so it unions (mergeable: CMS of a
union = elementwise sum) and persists like any table — the property that
makes it work across partitions/days/streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 1024


def _bucket(key: Column, seed: int, width: int) -> Column:
    return F.pmod(F.xxhash64(F.lit(seed), key), F.lit(width))


def cms_build(
    df: DataFrame, key: str, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """Build the sketch: DataFrame(row_idx int, bucket long, cnt long)
    with depth×width rows at most, regardless of |df| or key cardinality."""
    rows = df.select(
        F.posexplode(
            F.array(
                *[
                    _bucket(F.col(key).cast("string"), d, width)
                    for d in range(depth)
                ]
            )
        ).alias("row_idx", "bucket")
    )
    return rows.groupBy("row_idx", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key: str,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``keys[key]``: min over the d
    counters each key hashes to.  The sketch (≤ depth×width rows) is
    broadcast; the probe is a map-side join + tiny aggregate."""
    probes = keys.select(
        key,
        F.posexplode(
            F.array(
                *[
                    _bucket(F.col(key).cast("string"), d, width)
                    for d in range(depth)
                ]
            )
        ).alias("row_idx", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row_idx", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """CMS(A ∪ B) = elementwise counter sum — the mergeability that lets
    per-partition/per-day sketches roll up without touching raw data."""
    return (
        a.unionAll(b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
