"""Z-order (Morton) clustering for multi-dimensional data skipping.

At 100 TB, a filter on two independent columns (e.g. custkey AND order
date) prunes
parquet row groups only if the file sort order correlates with BOTH
columns.  A lexicographic sort helps the leading column only; interleaving
the bits of the two dimensions (Morton / Z-order curve) gives every file a
tight min/max envelope in *each* dimension, so row-group statistics prune
on either predicate.  This is the same technique Delta Lake's OPTIMIZE
ZORDER BY and Iceberg's sort-order z-ordering apply; here it is a pure
Catalyst expression (shift/mask arithmetic, whole-stage codegen) feeding a
`repartitionByRange` + in-partition sort, so it scales to any input and
never touches Python.

The reference has no analogous operator (it is a 10^4-row pandas ETL);
this is part of the driver-mandated large-scale extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Each dimension contributes its LOW 31 BITS: 31+31 = 62-bit key, so the
# interleave can never reach the long sign bit — a negative key would sort
# before (0,0) and destroy Z-curve locality.  Larger values are truncated
# to their low 31 bits (documented: the key is a clustering sort key, not
# an identity; ids beyond 2^31 should be pre-bucketed/hashed by the caller).
_INPUT_MASK = 0x7FFFFFFF

# Classic bit-spreading constants: spread the (masked) low 32 bits of x so
# bit i moves to position 2i ("part1by1").  Five mask/shift rounds, 64-bit.
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_bits(col: Column) -> Column:
    """Interleave-ready spread of the low 31 bits (bit i → bit 2i).

    Pure shift/mask expression — stays in whole-stage codegen.  The input
    mask makes the function total: any long input yields a valid spread of
    its low 31 bits (without it, bit 32+ of an unmasked input would leak
    through the first round's mask and corrupt the key)."""
    x = col.cast("long").bitwiseAND(F.lit(_INPUT_MASK))
    for shift, mask in _SPREAD:
        # NB: Column.__or__ is boolean OR in PySpark — bitwiseOR is the
        # integer operator
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_key(a: Column, b: Column) -> Column:
    """62-bit Morton key interleaving the low 31 bits of two non-negative
    int columns: bit i of `a` → bit 2i, bit i of `b` → bit 2i+1.  Always
    non-negative for any long inputs (see _INPUT_MASK)."""
    return spread_bits(a).bitwiseOR(F.shiftleft(spread_bits(b), 1))


def zorder_key_epoch_day(id_col: Column, date_col: Column) -> Column:
    """Morton key for the common (integer id, date) filter pair: the date
    becomes days-since-epoch (fits 32 bits for any sane date)."""
    return morton_key(id_col, F.datediff(date_col, F.lit("1970-01-01")))


def checked(col: Column, name: str) -> Column:
    """`col`, with a per-row guard that raises when the value would be
    truncated by the 31-bit input mask (negative or ≥ 2^31).  The guard is
    a branch inside the same whole-stage-codegen scan — no extra job, no
    extra pass — so silent Morton-coordinate aliasing (distinct high keys
    clustering into the same curve position) becomes a loud error telling
    the caller to pre-hash/bucket the column."""
    c = col.cast("long")
    return F.when(
        (c < 0) | (c > F.lit(_INPUT_MASK)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"zorder: column '{name}' value "
                ),
                c.cast("string"),
                F.lit(
                    " outside [0, 2^31): pre-hash or bucket wide ids "
                    "before Z-order clustering"
                ),
            )
        ).cast("long"),
    ).otherwise(c)


def compress_ranges(
    df: DataFrame, cols: list[str]
) -> dict[str, tuple[int, int]]:
    """Per-column (lo, shift) for the order-preserving 31-bit compression
    ``(v - lo) >> shift``: one bounded min/max aggregate (control plane —
    1 row collected), shift = excess bits of the span above 31.  Exact
    integer arithmetic end-to-end, so the mapping is monotone: equal
    inputs share a curve coordinate and order never inverts — the
    general answer for 64-bit ids (the r9 x10 replica's shifted keys
    broke the strict 2^31 guard; BENCH_SCALE_r9 found it)."""
    aggs: list[Column] = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"lo_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"hi_{c}"))
    row = df.agg(*aggs).collect()[0]
    out: dict[str, tuple[int, int]] = {}
    for c in cols:
        lo = row[f"lo_{c}"] if row[f"lo_{c}"] is not None else 0
        hi = row[f"hi_{c}"] if row[f"hi_{c}"] is not None else lo
        span = max(0, hi - lo)
        out[c] = (lo, max(0, span.bit_length() - 31))
    return out


def cluster_by_zorder(
    df: DataFrame,
    a: str,
    b: str,
    num_partitions: int | None = None,
    strict: bool = True,
    keep_bucket: bool = False,
    compress: bool = False,
) -> DataFrame:
    """Cluster rows along the Z-curve of (a, b) so a subsequent parquet
    write yields files whose min/max statistics are tight in BOTH columns.

    `repartitionByRange` on the Morton key range-partitions the curve
    (one shuffle — the same shuffle any clustering write pays), and the
    in-partition `sortWithinPartitions` orders rows inside each file.
    The key column is dropped before returning; writers see the original
    schema.

    `strict` (default) raises at scan time on any value the 31-bit input
    mask would truncate — truncation only degrades clustering quality
    (correctness is preserved by residual filters), but silently degraded
    file pruning at 100 TB is exactly the failure you want surfaced.
    Pass strict=False to accept low-31-bit clustering for wide ids, or
    `compress=True` for the general 64-bit answer: each dimension is
    order-preservingly mapped into [0, 2^31) via ``(v - min) >> shift``
    (exact integer arithmetic from one bounded min/max aggregate —
    compress_ranges), so arbitrary long ids cluster correctly with at
    most the span's excess bits of intra-bucket resolution lost.

    `keep_bucket` adds a ``__zbucket`` int column — the range-bucket id
    along the curve (``spark_partition_id`` after the range shuffle) —
    for a subsequent ``partitionBy("__zbucket")`` write: that directory
    layout is what lets Spark's own partition pruning (static or dynamic)
    skip buckets without any driver-side file list
    (sources/file_pruning.py)."""
    if compress:
        rngs = compress_ranges(df, [a, b])
        (lo_a, sh_a), (lo_b, sh_b) = rngs[a], rngs[b]
        key = morton_key(
            F.shiftright(F.col(a).cast("long") - F.lit(lo_a), sh_a),
            F.shiftright(F.col(b).cast("long") - F.lit(lo_b), sh_b),
        )
    elif strict:
        key = morton_key(checked(F.col(a), a), checked(F.col(b), b))
    else:
        key = morton_key(F.col(a), F.col(b))
    out = df.withColumn("__zkey", key)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "__zkey")
    else:
        out = out.repartitionByRange("__zkey")
    out = out.sortWithinPartitions("__zkey").drop("__zkey")
    if keep_bucket:
        out = out.withColumn("__zbucket", F.spark_partition_id())
    return out
