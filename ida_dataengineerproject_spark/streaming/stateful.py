"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10 — no reference equivalent; this is the escape hatch for
operators Structured Streaming's built-ins can't express).

Example operator: per-user running counters (events seen, value sum,
last-seen timestamp) emitted once per micro-batch per active user — the
shape of a feature-store updater.  State is one small tuple per user,
evicted via ProcessingTimeTimeout when a user goes quiet.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _make_update_user(evict_after_ms: int | None):
    def _update_user(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in batches:
            if not len(pdf):  # defensive: empty Arrow chunk
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, total, last_us))
        if evict_after_ms is not None:
            state.setTimeoutDuration(evict_after_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts_us": [last_us],
            }
        )

    return _update_user


try:  # Spark 4.x StatefulProcessor API (transformWithStateInPandas)
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
except ImportError:  # pragma: no cover - older Spark
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment]


class _RunningCounters(StatefulProcessor):
    """StatefulProcessor twin of ``running_user_counters``: per-user
    (n_events, total_value, last_ts_us) in a ValueState, one output row
    per user per micro-batch."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        prev = self._totals.get() if self._totals.exists() else None
        n, total, last_us = prev if prev is not None else (0, 0.0, 0)
        for pdf in rows:
            if not len(pdf):  # defensive: empty Arrow chunk
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
        self._totals.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts_us": [last_us],
            }
        )

    def close(self) -> None:
        pass


def running_user_counters_tws(events: DataFrame) -> DataFrame:
    """Per-user running counters on the Spark 4 ``transformWithState``
    API — the successor to applyInPandasWithState: named state variables
    (ValueState/ListState/MapState), timers, and TTL live on the handle
    instead of one opaque tuple, and the state store must be RocksDB
    (set here; changelog-checkpointed, incremental — the 100 TB-state
    posture where the default HDFS-backed store keeps full state in
    executor heap)."""
    # The TWS state protocol needs google.protobuf in the Python workers;
    # this container ships none, so activate the vendored minimal runtime
    # (vendor/google/protobuf, shipped to workers via addPyFile) — a
    # no-op wherever a real protobuf is installed.
    from .proto_shim import ensure_protobuf

    ensure_protobuf(events.sparkSession)
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningCounters(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def running_user_counters(
    events: DataFrame, evict_after_ms: int | None = None
) -> DataFrame:
    """Streaming per-user counters.  Input: streaming frame with
    (user_id, ts, value).

    ``evict_after_ms`` enables ProcessingTimeTimeout state eviction for
    long-running deployments.  Leave None for finite/catch-up runs: a
    timeout conf makes the engine schedule extra timeout-handling batches,
    which never terminate under trigger(availableNow) (and hit a Spark 4.1
    planning bug on the second batch)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_after_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_user(evict_after_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ----------------------------------------------------- CDC latest-state

CDC_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
        T.StructField("last_value", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)

CDC_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
        T.StructField("last_value", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _cdc_update(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Streaming twin of queries/quality_ops.cdc_apply_latest_state:
    latest row per key wins, ordered by (ts, event_id); the running
    state carries the winner plus the event count.  Tombstones ('error')
    are kept IN state — a later upsert may resurrect the key, exactly
    like the batch window semantics — and filtered at read time."""
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover - NoTimeout in tests
        state.remove()
        return
    ts_us, eid, typ, val, n = (
        state.get if state.exists else (-1, -1, None, 0.0, 0)
    )
    for pdf in batches:
        if not len(pdf):  # defensive: empty Arrow chunk
            continue
        n += len(pdf)
        top = pdf.sort_values(["ts", "event_id"]).iloc[-1]
        bts = int(pd.Timestamp(top["ts"]).value // 1000)
        beid = int(top["event_id"])
        if (bts, beid) > (ts_us, eid):
            ts_us, eid = bts, beid
            typ, val = str(top["event_type"]), float(top["value"])
    state.update((ts_us, eid, typ, val, n))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "last_type": [typ],
            "last_value": [val],
            "n_events": [n],
        }
    )


def cdc_latest_state_stream(events: DataFrame) -> DataFrame:
    """Streaming CDC apply (x13's streaming twin): per-key latest state
    maintained incrementally — each micro-batch updates only the touched
    keys, so a 100 TB changelog never reprocesses history (the batch
    form re-windows the full log).  Emits the refreshed state row per
    touched key per batch (update mode); readers drop tombstoned keys
    (last_type = 'error'), mirroring the batch filter."""
    return events.groupBy("user_id").applyInPandasWithState(
        _cdc_update,
        outputStructType=CDC_OUTPUT_SCHEMA,
        stateStructType=CDC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.IntegerType()),
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
        T.StructField("t3_us", T.LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
        T.StructField("t3", T.LongType()),
    ]
)


def _funnel_update(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Per-user ordered funnel state machine (view → click → purchase,
    >= ties), the streaming twin of queries/events_ops.py::
    q_funnel_conversion's per-user (t1, t2, t3) triple.

    State: three epoch-micros (-1 = stage not reached).  Rows are sorted
    by (ts, funnel stage) WITHIN the batch — the stage tiebreak makes a
    click/purchase sharing a timestamp with its qualifying predecessor
    process AFTER it, matching the >= tie semantics of the batch query
    (a same-instant view→click→purchase chain converts); an unstable
    ts-only sort could process the successor first and drop it.  Across
    batches the update rules are monotone (a stage timestamp only ever
    moves earlier, and moving t1 earlier never invalidates
    t2 ≥ old-t1 ≥ new-t1), so the final state equals the batch
    semantics whenever each user's events arrive in timestamp order
    across batches — the in-order/watermark delivery contract, same as
    every stateful op here."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
    frames = [pdf for pdf in batches]
    rows = pd.concat(frames)
    stage_order = rows["event_type"].map(
        {"view": 0, "click": 1, "purchase": 2}
    ).fillna(3)
    rows = rows.assign(__stage=stage_order).sort_values(["ts", "__stage"])
    ts_us = rows["ts"].astype("int64") // 1000
    for et, ts in zip(rows["event_type"], ts_us):
        ts = int(ts)
        if et == "view" and (t1 < 0 or ts < t1):
            t1 = ts
        elif et == "click" and t1 >= 0 and ts >= t1 and (t2 < 0 or ts < t2):
            t2 = ts
        elif et == "purchase" and t2 >= 0 and ts >= t2 and (t3 < 0 or ts < t3):
            t3 = ts
    state.update((t1, t2, t3))
    stage = 3 if t3 >= 0 else (2 if t2 >= 0 else (1 if t1 >= 0 else 0))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "stage": pd.Series([stage], dtype="int32"),
            "t1_us": [t1 if t1 >= 0 else None],
            "t2_us": [t2 if t2 >= 0 else None],
            "t3_us": [t3 if t3 >= 0 else None],
        }
    )


def funnel_stage_stream(events: DataFrame) -> DataFrame:
    """Streaming exact ordered funnel: per-user stage + stage timestamps
    maintained across micro-batches (applyInPandasWithState, update
    mode).  Consumers read the LATEST row per user; because updates are
    monotone, min-ignoring-nulls per column over all emissions equals
    the final state (what the batch-parity test pins)."""
    return (
        events.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_update,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
