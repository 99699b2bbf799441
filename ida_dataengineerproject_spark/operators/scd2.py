"""SCD Type-2 merge without Delta (CDC pattern; pyspark guide "Common OLAP
patterns": emulate MERGE with anti-join + union + window).

The reference's warehouse is insert-only with ON CONFLICT dedup; a real
deployment of the same star schema needs slowly-changing dimensions —
e.g. dim_grupo_economico when an operator rebrands.  This implements the
standard valid_from/valid_to/is_current contract as a pure batch plan:

1. incoming batch ⋈ current dim on the natural key
2. changed or new rows → new versions (valid_from = batch ts)
3. matching current rows for changed keys → closed (valid_to, is_current=F)
4. everything else passes through untouched

One shuffle on the natural key; no MERGE engine required.  Delta/Iceberg
MERGE INTO is the drop-in upgrade when those jars are on the classpath
(import-gated, not required here).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    batch_ts: Column | None = None,
) -> DataFrame:
    """Apply an updates batch to an SCD2 dimension.

    ``dim`` must carry (key_cols..., attr_cols..., valid_from timestamp,
    valid_to timestamp nullable, is_current boolean); ``updates`` carries
    (key_cols..., attr_cols...).  Returns the merged dimension.
    """
    ts = batch_ts if batch_ts is not None else F.current_timestamp()
    keys = list(key_cols)

    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    # attribute-change detection (null-safe equality on every attr)
    changed_pred = None
    for a in attr_cols:
        p = ~F.col(f"cur.{a}").eqNullSafe(F.col(f"upd.{a}"))
        changed_pred = p if changed_pred is None else (changed_pred | p)

    joined = cur.alias("cur").join(updates.alias("upd"), keys, "full_outer")

    is_new = F.col("cur.valid_from").isNull()  # key absent from dim
    is_changed = F.col("upd." + attr_cols[0]).isNotNull() & changed_pred

    # 1) brand-new + changed keys → fresh current versions from the update
    new_versions = (
        joined.filter(is_new | is_changed)
        .select(
            *keys,
            *[F.col(f"upd.{a}").alias(a) for a in attr_cols],
            ts.alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )

    # 2) changed keys → close the previous current row
    closed = (
        joined.filter(is_changed & ~is_new)
        .select(
            *keys,
            *[F.col(f"cur.{a}").alias(a) for a in attr_cols],
            F.col("cur.valid_from").alias("valid_from"),
            ts.alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )

    # 3) unchanged current rows pass through
    unchanged = (
        joined.filter(~is_new & ~is_changed)
        .select(
            *keys,
            *[F.col(f"cur.{a}").alias(a) for a in attr_cols],
            F.col("cur.valid_from").alias("valid_from"),
            F.col("cur.valid_to").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )

    return hist.unionByName(closed).unionByName(unchanged).unionByName(new_versions)
