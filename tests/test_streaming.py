"""Structured Streaming tests: drive each streaming operator over the
testdata events file (file source → memory sink, availableNow) and check
batch parity / watermark semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def stream(spark):
    from ida_dataengineerproject_spark.streaming.events import read_events_stream

    return read_events_stream(spark, SF_SMOKE)


def test_tumbling_counts_match_batch(spark, stream):
    from ida_dataengineerproject_spark.sources.tables import table
    from ida_dataengineerproject_spark.streaming.events import (
        run_to_memory,
        tumbling_counts,
    )

    out = run_to_memory(spark, tumbling_counts(stream), "t_tumbling")
    batch = (
        table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    got = {(str(r.window_start), r.event_type): r.n_events for r in out.collect()}
    want = {(str(r.w.start), r.event_type): r.n_events for r in batch.collect()}
    assert got == want


def test_session_window_total_events(spark, stream):
    from ida_dataengineerproject_spark.sources.tables import table
    from ida_dataengineerproject_spark.streaming.events import (
        run_to_memory,
        session_window_stats,
    )

    out = run_to_memory(spark, session_window_stats(stream), "t_sessions")
    total_events = table(spark, SF_SMOKE, "events").count()
    assert out.agg(F.sum("n_events")).collect()[0][0] == total_events
    # session windows never overlap per user
    rows = sorted(
        ((r.user_id, r.session_start, r.session_end) for r in out.collect())
    )
    for (u1, s1, e1), (u2, s2, e2) in zip(rows, rows[1:]):
        if u1 == u2:
            assert s2 >= e1


def test_stream_stream_join_matches_batch(spark, stream):
    from ida_dataengineerproject_spark.sources.tables import table
    from ida_dataengineerproject_spark.streaming.events import (
        purchases_with_recent_views,
        run_to_memory,
    )

    out = run_to_memory(
        spark, purchases_with_recent_views(stream), "t_ssjoin", mode="append"
    )
    ev = table(spark, SF_SMOKE, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("vu"),
        F.col("ts").alias("vts"),
    )
    batch = p.join(
        v,
        (p.user_id == v.vu)
        & (v.vts <= p.pts)
        & (v.vts >= p.pts - F.expr("INTERVAL 30 MINUTES")),
    )
    got = {(r.purchase_id, r.view_id) for r in out.collect()}
    want = {(r.purchase_id, r.view_id) for r in batch.collect()}
    # single availableNow batch: watermark never advances mid-run, so the
    # streaming result must equal the batch join exactly
    assert got == want and len(got) > 0


def test_streaming_dedup(spark, stream):
    from ida_dataengineerproject_spark.streaming.events import (
        run_to_memory,
        streaming_dedup,
    )

    out = run_to_memory(spark, streaming_dedup(stream), "t_dedup", mode="append")
    n = out.count()
    assert n == out.select("event_id").distinct().count()
    assert n > 0


def test_streaming_dedup_within_watermark(spark, stream):
    from ida_dataengineerproject_spark.streaming.events import (
        run_to_memory,
        streaming_dedup_within_watermark,
    )

    out = run_to_memory(
        spark, streaming_dedup_within_watermark(stream), "t_dedup_wm", mode="append"
    )
    n = out.count()
    assert n == out.select("event_id").distinct().count()
    assert n > 0


def test_sliding_counts_match_batch(spark, stream):
    """Streaming sliding windows must equal the batch x06b aggregation
    (every event in exactly 2 windows)."""
    from ida_dataengineerproject_spark.sources.tables import table
    from ida_dataengineerproject_spark.streaming.events import (
        run_to_memory,
        sliding_counts,
    )

    out = run_to_memory(spark, sliding_counts(stream), "t_sliding")
    batch = (
        table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    got = {(str(r.window_start), r.event_type): r.n_events for r in out.collect()}
    want = {(str(r.w.start), r.event_type): r.n_events for r in batch.collect()}
    assert got == want
    assert sum(got.values()) == 2 * table(spark, SF_SMOKE, "events").count()


def test_stream_static_dim_enrichment(spark):
    """Stream-static join enriches each event with its user segment;
    users absent from the dim fall back to 'unknown' (left join) —
    results equal the batch join exactly."""
    from ida_dataengineerproject_spark.sources.tables import table
    from ida_dataengineerproject_spark.streaming.events import (
        enriched_with_user_dim,
        read_events_stream,
        run_to_memory,
    )

    dim = (
        table(spark, SF_SMOKE, "events")
        .select(F.col("user_id").alias("dim_user_id"))
        .distinct()
        .filter(F.col("dim_user_id") % 2 == 0)  # half the users have a row
        .withColumn(
            "segment",
            F.when(F.col("dim_user_id") % 4 == 0, "power").otherwise("casual"),
        )
    )
    stream = read_events_stream(spark, SF_SMOKE)
    out = run_to_memory(
        spark, enriched_with_user_dim(stream, dim), "t_enrich", mode="append"
    )
    batch = table(spark, SF_SMOKE, "events")
    n_even = batch.filter(F.col("user_id") % 2 == 0).count()
    got = out.groupBy("segment").count().collect()
    by_seg = {r.segment: r["count"] for r in got}
    assert by_seg.get("unknown", 0) == batch.count() - n_even
    assert set(by_seg) <= {"power", "casual", "unknown"}
    assert sum(by_seg.values()) == batch.count()


def test_rate_anomaly_stream_matches_batch_gate(spark, stream):
    """The streaming anomaly gate (stream-static broadcast of the batch
    baseline) flags exactly the minutes the batch x15 logic flags."""
    from ida_dataengineerproject_spark.queries.guard_ops import (
        minute_counts,
        rate_baseline,
    )
    from ida_dataengineerproject_spark.sources.tables import table
    from ida_dataengineerproject_spark.streaming.events import (
        rate_anomaly_stream,
        run_to_memory,
    )

    ev = table(spark, SF_SMOKE, "events")
    baseline = rate_baseline(ev)
    out = run_to_memory(
        spark, rate_anomaly_stream(stream, baseline), "t_rate_anomaly"
    )
    got = {str(r.minute): (r.n_events, r.is_anomaly) for r in out.collect()}

    b = baseline.collect()[0]
    want = {
        str(r.minute): (
            r.n_events,
            abs(float(r.n_events) - b.med_rate) > 3.0 * b.mad,
        )
        for r in minute_counts(ev).collect()
    }
    assert got == want and len(got) > 0


def test_stateful_ops_on_rocksdb_state_store(spark, stream):
    """The 100 TB-state posture for STANDARD stateful operators (window
    aggregation + streaming dedup), not just transformWithState (which
    requires RocksDB anyway): the default HDFS-backed store keeps all
    state in executor heap; RocksDB spills to local disk with changelog
    checkpointing.  Runs the tumbling-count and dedup queries under
    `RocksDBStateStoreProvider` and pins batch parity — proving every
    stateful operator in streaming/events.py is provider-agnostic and
    the engine can flip the store per query at scale."""
    from ida_dataengineerproject_spark.session import scoped_conf
    from ida_dataengineerproject_spark.sources.tables import table
    from ida_dataengineerproject_spark.streaming.events import (
        streaming_dedup,
        run_to_memory,
        tumbling_counts,
    )

    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    with scoped_conf(
        spark, {"spark.sql.streaming.stateStore.providerClass": rocks}
    ):
        # streaming queries read session confs at START, which happens
        # inside run_to_memory -> inside the scope
        out = run_to_memory(spark, tumbling_counts(stream), "t_rocks_tumb")
        batch = (
            table(spark, SF_SMOKE, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
        )
        got = {
            (str(r.window_start), r.event_type): r.n_events
            for r in out.collect()
        }
        want = {
            (str(r.w.start), r.event_type): r.n_events
            for r in batch.collect()
        }
        assert got == want

        deduped = run_to_memory(
            spark, streaming_dedup(stream), "t_rocks_dedup", mode="append"
        )
        n_distinct = (
            table(spark, SF_SMOKE, "events")
            .select("event_id", "ts")
            .distinct()
            .count()
        )
        assert deduped.count() == n_distinct
