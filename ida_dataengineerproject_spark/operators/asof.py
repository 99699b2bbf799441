"""Generic as-of (temporal nearest) join — one operator for the pattern
xq6 / x05b compose inline (union + ordered window), in both directions.

An as-of join attaches, to each left ("probe") row, the single right
("reference") row that is nearest in time on the allowed side:

- ``backward``: latest right row at-or-before the probe's timestamp —
  "the price in effect", "the last touch before the purchase";
- ``forward``: earliest right row at-or-after — "the next maintenance
  event", "time to re-engagement".

The scalable rewrite (SURVEY.md §7.4.5): UNION both sides tagged, one
window partitioned by the join keys ordered by (ts, side), and a
carry — ``last(payload, ignorenulls)`` over the preceding frame for
backward, ``first(payload, ignorenulls)`` over the following frame for
forward.  ONE shuffle on the by-keys, no per-group pandas, no range
join, and skew follows the key distribution exactly like any keyed
window.  DuckDB's native ASOF JOIN is the oracle twin (forward via
negated epoch — ASOF picks the max reference key <= probe key, and
max(-t) corresponds to min(t)).

Tie rule: a reference row with ts EQUAL to the probe's matches in both
directions (at-or-before / at-or-after), the same inclusive rule as
DuckDB ASOF's >= / the negated <=.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    values: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``values`` columns from
    the temporally nearest ``right`` row (NULL when no match exists on
    the allowed side), plus ``__match_ts`` (the matched reference
    timestamp, for tolerance filtering by the caller).

    ``by`` columns must exist on both sides with identical names;
    ``values`` are right-side columns and must not collide with left
    columns."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # resolve every caller-supplied name backtick-quoted (F.col and
    # df[c] both parse dots as struct access, so a column literally
    # named "a.b" would fail or resolve wrongly) — pinned by
    # test_asof_join_escaped_column_names
    def _qc(name: str):
        return F.col("`" + name.replace("`", "``") + "`")

    payload = F.struct(
        _qc(right_ts).alias("__mts"),
        *[_qc(v).alias(v) for v in values],
    )
    left_cols = [c for c in left.columns]
    r = right.select(
        *[_qc(b).alias(b) for b in by],
        _qc(right_ts).alias("__ts"),
        payload.alias("__p"),
        # real DataType, not a DDL string: names needing escaping (dots,
        # spaces) and types whose simpleString doesn't round-trip would
        # break a string-built schema
        F.lit(None).cast(StructType(left.schema.fields)).alias("__l"),
    )
    l = left.select(
        *[_qc(b).alias(b) for b in by],
        _qc(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.struct(*[_qc(c).alias(c) for c in left_cols]).alias("__l"),
    )
    if direction == "backward":
        # reference sorts BEFORE probe at equal ts → inclusive match
        side_r, side_l = 0, 1
        tagged = r.withColumn("__side", F.lit(side_r)).unionByName(
            l.withColumn("__side", F.lit(side_l))
        )
        w = (
            Window.partitionBy(*[_qc(b) for b in by])
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = F.last("__p", ignorenulls=True).over(w)
        probe_side = side_l
    else:
        # probe sorts BEFORE reference at equal ts → inclusive match
        side_l, side_r = 0, 1
        tagged = r.withColumn("__side", F.lit(side_r)).unionByName(
            l.withColumn("__side", F.lit(side_l))
        )
        w = (
            Window.partitionBy(*[_qc(b) for b in by])
            .orderBy("__ts", "__side")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carry = F.first("__p", ignorenulls=True).over(w)
        probe_side = side_l
    out = (
        tagged.withColumn("__c", carry)
        .where(F.col("__side") == probe_side)
        .select(
            *[F.col("__l").getField(c).alias(c) for c in left_cols],
            F.col("__c.__mts").alias("__match_ts"),
            *[F.col("__c").getField(v).alias(v) for v in values],
        )
    )
    return out
