"""Grid-bucketed interval-containment join (range join at scale).

``point BETWEEN start AND end`` joins are the classic Spark trap: with
no equi-key Catalyst falls back to BroadcastNestedLoopJoin (O(|P|·|I|)
and a broadcast of a whole side).  The distributed strategy — the same
one Spark's own range-join hints, Delta's range optimizations, and the
published interval-join literature use — aligns both sides to a fixed
grid:

- an interval [s, e] replicates to every grid cell it overlaps
  (ceil(len/width) + 1 rows — bounded when interval lengths are
  bounded, the common case for promo windows / sessions / validity
  ranges);
- a point maps to exactly ONE cell;
- an ordinary hash equi-join on (by-keys…, cell) finds every candidate
  co-located, and the exact containment predicate runs as a residual
  filter.

Cost: |P| + Σ len_i/width shuffle rows, never |P|·|I|; pick ``width``
near the median interval length so replication stays O(1) per interval.
Plan-testable: the join is a plain hash/sort-merge equi-join — no
BroadcastNestedLoopJoin node anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    width: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Inner join: every (point row, interval row) pair with
    ``start <= point <= end`` (inclusive ends), equal ``by`` keys
    required when given.  ``point_col``/``start_col``/``end_col`` must
    be integer-valued (cast dates to epoch days first).  Column names
    must not collide across the two inputs (beyond ``by``)."""
    if width <= 0:
        raise ValueError(f"grid width must be positive, got {width}")
    keys = list(by or [])
    p = points.withColumn(
        "__cell", F.floor(F.col(point_col) / width).cast("long")
    )
    i = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / width).cast("long"),
                F.floor(F.col(end_col) / width).cast("long"),
            )
        ),
    )
    return (
        p.join(i, keys + ["__cell"])
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__cell")
    )
