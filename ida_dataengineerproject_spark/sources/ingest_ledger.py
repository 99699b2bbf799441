"""Incremental file-ingest ledger — exactly-once batch ingestion over a
growing directory.

The reference re-reads its whole source catalog every run and relies on
fact-hash dedup to stay idempotent (etl/etl_ida.py: full re-extract +
ON CONFLICT-style skip).  That re-read is O(corpus) per run; at 100 TB an
ingest must be O(new data).  The standard pattern (Structured Streaming's
file source and Databricks Auto Loader do the same) is a LEDGER of
processed files: each run lists the source, anti-joins the ledger, reads
ONLY the unseen files, and appends their names to the ledger after the
batch commits.

Crash consistency: the ledger append happens AFTER the output write, so a
crash between the two re-processes the last batch (at-least-once at the
file level) — pair with the hash-dedup sink (operators/dedup) or an
idempotent overwrite-by-partition write for end-to-end exactly-once, the
same contract foreachBatch sinks use (tests/test_foreach_batch.py).

The ledger itself is a parquet table of file identities (path, size) —
listing-stable, no wall-clock timestamps, so reruns are deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    """The processed-files ledger (empty DataFrame if none exists yet)."""
    if os.path.isdir(ledger_path):
        return spark.read.schema(LEDGER_SCHEMA).parquet(ledger_path)
    return spark.createDataFrame([], LEDGER_SCHEMA)


def list_source_files(
    spark: SparkSession, src_dir: str, suffix: str = ".parquet"
) -> DataFrame:
    """Current source listing as (path, size_bytes).  Local-fs listing
    here; on a real lake this is the object-store list call (or its
    manifest/inventory at very large file counts)."""
    rows = [
        (os.path.join(src_dir, f), os.path.getsize(os.path.join(src_dir, f)))
        for f in sorted(os.listdir(src_dir))
        if f.endswith(suffix)
    ]
    return spark.createDataFrame(rows, LEDGER_SCHEMA)


def unprocessed_files(listing: DataFrame, ledger: DataFrame) -> DataFrame:
    """Files present in the listing but absent from the ledger: one
    left-anti join on the FULL file identity (path, size_bytes) — a file
    rewritten in place under the same name (size changed) counts as new
    and is re-ingested rather than silently skipped.  Lake sources should
    still treat files as immutable (an in-place append re-ingests the
    whole file; pair with the hash-dedup sink)."""
    return listing.join(
        ledger.select("path", "size_bytes"), ["path", "size_bytes"], "left_anti"
    )


def ingest_new_files(
    spark: SparkSession,
    src_dir: str,
    ledger_path: str,
    process,
    suffix: str = ".parquet",
) -> dict[str, int]:
    """One incremental run: list → anti-join ledger → process ONLY new
    files via ``process(df)`` → append their identities to the ledger.

    ``process`` receives the DataFrame of the new files' rows and performs
    the sink write; it is NOT invoked when no new files exist (the ledger
    is untouched and the run is a no-op).  Returns {files_new,
    files_seen_total}.  The new-file list is a bounded driver-side readout
    (file identities, not data)."""
    ledger = read_ledger(spark, ledger_path)
    listing = list_source_files(spark, src_dir, suffix)
    new = unprocessed_files(listing, ledger)
    new_rows = new.collect()  # bounded: file identities only
    if new_rows:
        process(spark.read.parquet(*[r.path for r in new_rows]))
        # ledger append AFTER the sink commit (see module docstring)
        spark.createDataFrame(new_rows, LEDGER_SCHEMA).write.mode(
            "append"
        ).parquet(ledger_path)
    return {
        "files_new": len(new_rows),
        "files_seen_total": listing.count(),
    }
