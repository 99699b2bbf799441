"""Streaming sketch maintenance (round 6): keep a KMV distinct sketch
per group up to date as micro-batches arrive.

Why sketches and streams belong together: a KMV bottom-k sample is a
MERGEABLE summary — merge(sketch(A), sketch(B)) == sketch(A ∪ B) exactly
(take the k smallest of the union of the two samples) — so maintaining
it incrementally over a stream gives BIT-IDENTICAL state to a batch
build over all data seen, regardless of how the stream was chopped into
batches.  That equality is the test contract
(tests/test_streaming_sketches.py); the same argument powers x09c's HLL
day→month rollup and makes the sketch state safe to query mid-stream.

State lives as one parquet snapshot per micro-batch under
``state_dir/v{batch_id}`` (exactly-once: a replayed batch rewrites its
own version instead of double-merging — the same batchId-keyed
idempotency as streaming/events.py::compacting_batch_sink), with the
latest version read back as the current sketch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import kmv_sketch


def merge_kmv(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Exact KMV merge: per group, k smallest of the union of samples.
    Full-outer so groups seen in only one side pass through."""
    aa = a.select(F.col("g"), F.col("sk").alias("sk_a"))
    bb = b.select(F.col("g"), F.col("sk").alias("sk_b"))
    j = aa.join(bb, "g", "full_outer")
    merged = F.expr(
        f"slice(array_sort(array_distinct(concat("
        f"coalesce(sk_a, array()), coalesce(sk_b, array())))), 1, {k})"
    )
    return j.select(
        "g", merged.alias("sk"), F.size(merged).cast("int").alias("sk_n")
    )


def _latest_version(state_dir: str) -> int | None:
    # driver-LOCAL filesystem only (see sink docstrings): on an HDFS/S3
    # URI os.path.isdir is always False and state would silently restart
    # from scratch every batch — refuse loudly instead (ADVICE r6)
    if "://" in state_dir:
        raise ValueError(
            "state_dir must be a driver-local filesystem path; got URI "
            f"{state_dir!r} — resolve versions via the Hadoop FileSystem "
            "API before using object-store state dirs"
        )
    if not os.path.isdir(state_dir):
        return None
    vs = [
        int(name[1:])
        for name in os.listdir(state_dir)
        if name.startswith("v") and name[1:].isdigit()
    ]
    return max(vs) if vs else None


def kmv_stream_sink(
    state_dir: str, group_col: str, key_col: str, k: int = 256
):
    """foreachBatch callback maintaining the per-group KMV sketch.

    Batch n's state = merge(state at batch n-1, sketch(batch n)) written
    to ``state_dir/v{n}``; a replay of batch n re-reads v{n-1} and
    rewrites v{n} — idempotent, never double-merged.  Per batch this
    touches (groups × k) state rows + the batch's own rows; the raw
    stream is never retained.

    ``state_dir`` must be a DRIVER-LOCAL filesystem path (version
    discovery walks it with os.listdir); HDFS/S3 URIs are rejected with
    a ValueError rather than silently restarting state every batch."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = kmv_sketch(batch_df, group_col, key_col, k=k)
        prev_v = _latest_version(state_dir)
        # replay safety: merge against the version strictly below this
        # batch, ignoring a half-written v{batch_id} from a crashed try
        prev_v = min(prev_v, batch_id - 1) if prev_v is not None else None
        if prev_v is not None and prev_v >= 0:
            prev = spark.read.parquet(f"{state_dir}/v{prev_v}")
            merged = merge_kmv(prev, fresh, k=k)
        else:
            merged = fresh
        merged.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")
        spark.catalog.refreshByPath(state_dir)

    return write_batch


def read_kmv_state(spark: SparkSession, state_dir: str) -> DataFrame:
    v = _latest_version(state_dir)
    if v is None:
        raise FileNotFoundError(f"no sketch state under {state_dir}")
    return spark.read.parquet(f"{state_dir}/v{v}")


def merge_mg(
    state: DataFrame | None, batch_counts: DataFrame, capacity: int
) -> DataFrame:
    """Mergeable-summaries MG merge (Agarwal et al., TODS 2013): add
    counters, then if more than ``capacity`` survive, subtract the
    (capacity+1)-th largest counter from all and drop the non-positive.
    Total undercount stays <= N/(capacity+1) across any merge tree, so
    the streaming state keeps the same superset guarantee as the batch
    sketch (operators/sketch.py::mg_candidates)."""
    if state is not None:
        s = state.select("key", F.col("cnt").alias("c_a"))
        b = batch_counts.select("key", F.col("cnt").alias("c_b"))
        merged = s.join(b, "key", "full_outer").select(
            "key",
            (
                F.coalesce(F.col("c_a"), F.lit(0))
                + F.coalesce(F.col("c_b"), F.lit(0))
            ).alias("cnt"),
        )
    else:
        merged = batch_counts.select("key", "cnt")
    n = merged.count()  # bounded: <= capacity + batch-distinct rows
    if n > capacity:
        cut = (
            merged.orderBy(F.col("cnt").desc())
            .limit(capacity + 1)
            .orderBy("cnt")
            .limit(1)
            .collect()[0]["cnt"]
        )  # (capacity+1)-th largest — one number off a bounded frame
        merged = merged.select(
            "key", (F.col("cnt") - F.lit(cut)).alias("cnt")
        ).where(F.col("cnt") > 0)
    return merged


def mg_stream_sink(state_dir: str, key_col: str, capacity: int = 1024):
    """foreachBatch callback maintaining Misra-Gries heavy-hitter
    candidates over a stream — batchId-versioned snapshots, replay-safe
    like kmv_stream_sink.  State never exceeds ``capacity`` rows; any
    key whose TOTAL stream count exceeds N/(capacity+1) is guaranteed
    present.  Pair with a candidate-filtered exact count over the at-
    rest data (operators/sketch.py::heavy_hitters confirm pass) when
    exact frequencies are needed.  ``state_dir`` must be driver-local
    (see kmv_stream_sink)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counts = (
            batch_df.select(F.col(key_col).alias("key"))
            .groupBy("key")
            .agg(F.count("*").alias("cnt"))
        )
        prev_v = _latest_version(state_dir)
        prev_v = min(prev_v, batch_id - 1) if prev_v is not None else None
        prev = (
            spark.read.parquet(f"{state_dir}/v{prev_v}")
            if prev_v is not None and prev_v >= 0
            else None
        )
        merge_mg(prev, counts, capacity).write.mode("overwrite").parquet(
            f"{state_dir}/v{batch_id}"
        )
        spark.catalog.refreshByPath(state_dir)

    return write_batch
