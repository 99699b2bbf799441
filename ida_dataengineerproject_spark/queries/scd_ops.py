"""SCD Type-2 dimension history (round 6): register the batch merge
operator (operators/scd2.py::scd2_merge) under the oracle gate.

The reference's dimensions are insert-only (ON CONFLICT DO NOTHING,
/root/reference/etl/etl_ida.py dim loads); a production deployment of
the same star needs versioned dimension history.  x28 treats the events
stream as a profile changelog (key = user_id, attrs = last event type +
value bucket), builds the pre-cutover history declaratively (change
compression + lead() validity intervals), then applies the post-cutover
batch through scd2_merge.  The DuckDB oracle recomputes the ENTIRE
merged result relationally — the same "operator vs declarative twin"
proof shape as xs13 (incremental MV refresh == full recompute).

Timestamps cross the compare as epoch micros (BIGINT) — no format-string
dialect risk; the cutover is a constant mid-range date (testdata spans
Jan 2024; parity fails loudly if the generator ever shifts it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.scd2 import scd2_merge
from ..registry import register
from ..sources.tables import table
from .events_ops import EVENTS_US

CUTOVER = "2024-01-16 00:00:00"


@register(
    "x28_scd2_merge_history",
    f"""
    WITH e AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(floor(value / 100) AS BIGINT) AS vb
        FROM {EVENTS_US}),
    b1 AS (SELECT * FROM e WHERE ts < TIMESTAMP '{CUTOVER}'),
    chg AS (
        SELECT user_id, ts, event_type, vb FROM (
            SELECT user_id, ts, event_type, vb,
                   lag(event_type) OVER w AS pt, lag(vb) OVER w AS pv
            FROM b1 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        WHERE pt IS NULL OR pt <> event_type OR pv <> vb),
    h AS (
        SELECT user_id, event_type, vb,
               epoch_us(ts) AS valid_from_us,
               epoch_us(lead(ts) OVER w2) AS valid_to_us,
               lead(ts) OVER w2 IS NULL AS is_current
        FROM chg WINDOW w2 AS (PARTITION BY user_id ORDER BY ts)),
    u AS (
        SELECT user_id, event_type, vb FROM (
            SELECT user_id, event_type, vb,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM e WHERE ts >= TIMESTAMP '{CUTOVER}')
        WHERE rn = 1),
    cur AS (SELECT * FROM h WHERE is_current),
    hist AS (SELECT * FROM h WHERE NOT is_current),
    j AS (
        SELECT COALESCE(cur.user_id, u.user_id) AS user_id,
               cur.event_type AS c_et, cur.vb AS c_vb,
               cur.valid_from_us AS c_from,
               u.event_type AS u_et, u.vb AS u_vb,
               cur.user_id IS NULL AS is_new,
               u.user_id IS NOT NULL
                 AND (cur.event_type IS DISTINCT FROM u.event_type
                      OR cur.vb IS DISTINCT FROM u.vb) AS is_changed
        FROM cur FULL OUTER JOIN u ON cur.user_id = u.user_id),
    cut AS (SELECT epoch_us(TIMESTAMP '{CUTOVER}') AS c)
    SELECT user_id, event_type, vb, valid_from_us, valid_to_us, is_current
    FROM hist
    UNION ALL  -- closed previous versions of changed keys
    SELECT user_id, c_et, c_vb, c_from, (SELECT c FROM cut), FALSE
    FROM j WHERE is_changed AND NOT is_new
    UNION ALL  -- unchanged current rows pass through
    SELECT user_id, c_et, c_vb, c_from, NULL, TRUE
    FROM j WHERE NOT is_new AND NOT is_changed
    UNION ALL  -- fresh versions for new + changed keys
    SELECT user_id, u_et, u_vb, (SELECT c FROM cut), NULL, TRUE
    FROM j WHERE is_new OR is_changed
    """,
)
def q_x28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build + one scd2_merge batch, checked end-to-end.

    Scale shape: the history build is change compression + validity
    intervals over windows partitioned by user_id (high-cardinality,
    never a global sort); scd2_merge itself is ONE full-outer join on
    the natural key plus unions — at 100 TB both sides hash-partition
    on user_id and nothing else shuffles.  The updates batch collapses
    to one row per key BEFORE the join (latest-wins, row_number DESC),
    so merge input is dimension-sized, not changelog-sized."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.floor(F.col("value") / 100).cast("long").alias("vb"),
    )
    cut = F.lit(CUTOVER).cast("timestamp")
    b1 = e.where(F.col("ts") < cut)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        b1.select(
            "user_id",
            "ts",
            "event_type",
            "vb",
            F.lag("event_type").over(w).alias("pt"),
            F.lag("vb").over(w).alias("pv"),
        )
        .where(
            F.col("pt").isNull()
            | (F.col("pt") != F.col("event_type"))
            | (F.col("pv") != F.col("vb"))
        )
        .drop("pt", "pv")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    dim0 = chg.select(
        "user_id",
        "event_type",
        "vb",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    updates = (
        e.where(F.col("ts") >= cut)
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "vb")
    )
    merged = scd2_merge(
        dim0, updates, ["user_id"], ["event_type", "vb"], batch_ts=cut
    )
    return merged.select(
        "user_id",
        "event_type",
        "vb",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    )


_PIT_CAP = "2024-03-01 00:00:00"  # beyond the testdata's Jan-2024 span


@register(
    "xq35_pit_feature_join",
    f"""
    WITH prof AS (
        SELECT user_id, ts, MAX(event_type) AS et,
               MAX(CAST(floor(value / 100) AS BIGINT)) AS vb
        FROM {EVENTS_US} WHERE event_type IN ('click', 'view')
        GROUP BY user_id, ts),
    chg AS (
        SELECT user_id, ts, et, vb FROM (
            SELECT user_id, ts, et, vb,
                   lag(et) OVER w AS pt, lag(vb) OVER w AS pv
            FROM prof WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        WHERE pt IS NULL OR pt <> et OR pv <> vb),
    v AS (
        SELECT user_id, et, vb,
               epoch_us(ts) AS vf,
               COALESCE(epoch_us(lead(ts) OVER w2),
                        epoch_us(TIMESTAMP '{_PIT_CAP}')) - 1 AS vte
        FROM chg WINDOW w2 AS (PARTITION BY user_id ORDER BY ts)),
    p AS (
        SELECT user_id, epoch_us(ts) AS pus,
               CAST(value AS DECIMAL(38,6)) AS rev
        FROM {EVENTS_US} WHERE event_type = 'purchase')
    SELECT v.et AS profile_type, v.vb AS profile_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(CAST(SUM(p.rev) AS DOUBLE), 2) AS revenue
    FROM p JOIN v ON v.user_id = p.user_id
                 AND p.pus BETWEEN v.vf AND v.vte
    GROUP BY v.et, v.vb
    """,
)
def q_pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join (the feature-store staple):
    each purchase is enriched with the profile version IN EFFECT at its
    timestamp — never a later one, the leakage rule every training-data
    pipeline must enforce.  Profile versions are SCD2-style validity
    intervals (change compression over click/view events, half-open
    [from, next_from) realized as inclusive [from, next_from − 1 µs]);
    the enrichment is operators/interval_join.py::interval_point_join
    with ``by=['user_id']`` — cell-gridded per user (1-day cells), an
    ordinary hash equi-join on (user, cell) plus the exact BETWEEN
    residual, never a nested loop.  Purchases before a user's first
    profile version drop (inner semantics), identically in the oracle's
    plain range join.

    Versus xq33/xq6's as-of composition: this consumes the INTERVAL
    form of the dimension (what an SCD2 warehouse actually stores), so
    the same operator serves any validity-range enrichment —
    prices-in-effect, contract terms, consent windows."""
    from ..operators.interval_join import interval_point_join

    ev = table(spark, sf_dir, "events")
    prof = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_type").alias("et"),
            F.max(F.floor(F.col("value") / 100).cast("long")).alias("vb"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    chg = (
        prof.select(
            "user_id", "ts", "et", "vb",
            F.lag("et").over(w).alias("pt"),
            F.lag("vb").over(w).alias("pv"),
        )
        .where(
            F.col("pt").isNull()
            | (F.col("pt") != F.col("et"))
            | (F.col("pv") != F.col("vb"))
        )
        .drop("pt", "pv")
    )
    cap = F.unix_micros(F.lit(_PIT_CAP).cast("timestamp"))
    v = chg.select(
        "user_id",
        "et",
        "vb",
        F.unix_micros("ts").alias("vf"),
        (
            F.coalesce(F.unix_micros(F.lead("ts").over(w)), cap) - 1
        ).alias("vte"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("pus"),
        F.col("value").cast("decimal(38,6)").alias("rev"),
    )
    j = interval_point_join(
        p, v, "pus", "vf", "vte", width=86_400_000_000, by=["user_id"]
    )
    return j.groupBy(
        F.col("et").alias("profile_type"), F.col("vb").alias("profile_bucket")
    ).agg(
        F.count("*").alias("n_purchases"),
        F.round(F.sum("rev").cast("double"), 2).alias("revenue"),
    )
