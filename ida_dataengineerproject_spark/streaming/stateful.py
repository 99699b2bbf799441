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
