"""Structured Streaming operators (SURVEY.md §2.10 — the reference is
strictly batch, docker-compose.yml:33-34; these are the driver-mandated
streaming extensions of the batch ops in queries/events_ops.py).

Each transformation takes/returns streaming DataFrames, so the same code
runs against kafka/socket sources in production; tests drive them with a
file source over the testdata parquet + a memory sink (synchronous
processAllAvailable).

Scale notes: watermarks bound state (late events beyond the horizon are
dropped, state for closed windows is evicted); session_window keeps one
state entry per open (user, session); dropDuplicates keeps one entry per
key within the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _event_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one batch).
    The file source requires a directory: stream the sf_dir with a glob
    filter.

    ``ts`` encoding varies across testdata generations (see
    sources/tables.py); streaming needs the schema up front, so peek at the
    footer with a one-off batch read (driver-side, no data scan) and
    normalize to ``timestamp`` exactly as the batch path does.  If the
    file hasn't landed yet (the stream may start before the first file
    arrives), fall back to the current generator encoding (timestamp[us]
    without TZ → TIMESTAMP_NTZ) instead of failing eagerly."""
    import os

    from pyspark.errors import AnalysisException

    try:
        raw_ts = (
            spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            .schema["ts"]
            .dataType
        )
    except AnalysisException:  # path not found yet: stay lazy
        # Only the missing-path case falls back; a corrupt file or a
        # permission error propagates here instead of resurfacing later
        # as a confusing stream schema mismatch.
        raw_ts = T.TimestampNTZType()
    raw = (
        spark.readStream.schema(_event_schema(raw_ts))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(raw_ts, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(raw_ts, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type (streaming twin of
    x06_tumbling_hourly).  Append-mode capable: windows finalize when the
    watermark passes window end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows (streaming twin of x05_sessionize_events):
    state-backed gap sessions, one state entry per open session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming form of ON CONFLICT DO NOTHING (etl_ida.py:534)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


def streaming_dedup_within_watermark(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Dedup on event_id alone with state bounded by the watermark
    (dropDuplicatesWithinWatermark, Spark ≥3.5): unlike plain
    dropDuplicates — whose key must include the event-time column for
    state to ever be evicted — this keeps one state entry per key and
    expires it when the watermark passes, the right semantics when the
    duplicate key does NOT embed the timestamp (retried webhook
    deliveries, at-least-once sources)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window counts (streaming twin of the batch
    x06b_sliding_window): every event contributes to window/slide = 2
    open windows; state per (window, event_type) is evicted when the
    watermark passes window end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def purchases_with_recent_views(
    events: DataFrame,
    max_lag: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: each 'purchase' paired with the same
    user's 'view' events in the preceding ``max_lag`` window (the
    streaming analog of the batch as-of join, x05b).

    Both sides carry watermarks + the time-range join condition, so state
    for either side is evicted once the watermark passes the range — the
    boundedness contract stream-stream joins require.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user"),
            F.col("ts").alias("view_ts"),
            F.col("value").alias("view_value"),
        )
        .withWatermark("view_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("user_id") == F.col("view_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_lag}")),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "view_id", "view_ts", "view_value")


def run_to_memory(spark: SparkSession, df: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Drive a streaming frame to completion against a memory sink and
    return the materialized result (test/batch-parity harness)."""
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def enriched_with_user_dim(stream: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a static (batch)
    user dimension — the broadcast-dim pattern of a streaming fact
    pipeline.  The static side is re-resolved per micro-batch (so a
    parquet dim picks up new files) and needs no watermark or state:
    Spark plans it as a stateless broadcast-hash join inside each batch.
    """
    return stream.join(
        F.broadcast(user_dim), stream.user_id == user_dim.dim_user_id, "left"
    ).select(
        "event_id", "user_id", "ts", "event_type", "value",
        F.coalesce("segment", F.lit("unknown")).alias("segment"),
    )


def compacting_batch_sink(out_dir: str, target_file_mb: int = 128):
    """foreachBatch sink that writes each micro-batch COMPACTED to
    target-size files under a batchId-keyed directory.

    Composes the two operational pieces: exactly-once via the
    deterministic per-batch path (a replayed batch overwrites its own
    directory — same contract as tests/test_foreach_batch.py) and
    small-file hygiene via sources/compaction.write_compacted (streaming
    sinks are the #1 producer of kilobyte files at scale; compacting at
    write time beats a separate rewrite job reading everything twice).

    Use: ``stream.writeStream.foreachBatch(compacting_batch_sink(dir))``.
    """
    from ..sources.compaction import write_compacted

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_compacted(
            batch_df,
            f"{out_dir}/batch_id={batch_id}",
            target_file_mb=target_file_mb,
            mode="overwrite",
        )

    return write_batch


def rate_anomaly_stream(
    events: DataFrame,
    baseline: DataFrame,
    factor: float = 3.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of x15_event_rate_anomaly: per-minute tumbling
    counts gated against a PRE-COMPUTED robust baseline (the 1-row
    (med_rate, mad) from queries/guard_ops.rate_baseline) via a
    stream-static broadcast join.

    The split is the production shape: the median/MAD need global
    history, so the batch side owns them (refreshed per day/hour), and
    the stream applies the bounded-state part — watermarked 1-minute
    windows, one count per open window.  Scale: state is O(open
    windows), the baseline is a broadcast of one row."""
    counts = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("n_events"))
    )
    from pyspark.sql.functions import broadcast

    return counts.join(broadcast(baseline)).select(
        F.col("w.start").alias("minute"),
        "n_events",
        "med_rate",
        "mad",
        (
            F.abs(F.col("n_events").cast("double") - F.col("med_rate"))
            > factor * F.col("mad")
        ).alias("is_anomaly"),
    )
