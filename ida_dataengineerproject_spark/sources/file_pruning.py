"""Manifest-based file pruning — Iceberg/Delta-style data skipping from
file-level statistics, composed with Z-order clustering.

Parquet row-group statistics prune *within* a scan, but the scan still
lists and footer-reads every file.  Lake formats avoid that with a
manifest: per-file min/max per column, consulted BEFORE the scan so
non-overlapping files are never opened.  At 100 TB the manifest is built
once at write time (a bounded side artifact: one row per file) and turns a
million-file listing into a handful of reads for selective predicates —
provided the write clustered the data so per-file envelopes are tight,
which is exactly what operators/zorder.cluster_by_zorder produces.

Here the manifest is computed with one distributed aggregation over
``input_file_name()`` and collected (bounded: rows == file count); pruning
is a driver-side interval-overlap test; the pruned read lists only the
surviving files.  A residual filter stays on top — pruning is a superset
guarantee, not an exact one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_file_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max statistics for `cols`: one aggregation pass,
    output rows == file count (the persistable manifest)."""
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy("__file").agg(*aggs)


def pruned_read(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    predicates: dict[str, tuple],
) -> tuple[DataFrame, dict[str, int]]:
    """Read only the files whose [min, max] envelope overlaps every
    predicate interval; returns (DataFrame with residual filters applied,
    {files_total, files_read}).

    `predicates` maps column → (lo, hi) inclusive bounds.  The manifest
    collect is bounded (one row per file); at scale it would be a
    pre-persisted table read the same way."""
    def overlaps(d: dict, c: str, lo, hi) -> bool:
        mn, mx = d[f"min_{c}"], d[f"max_{c}"]
        if mn is None or mx is None:
            # all-NULL column in this file: no row can satisfy the
            # inclusive-bounds residual filter — prune it
            return False
        return not (mx < lo or mn > hi)

    rows = manifest.collect()
    keep = []
    for r in rows:
        d = r.asDict()
        if all(overlaps(d, c, lo, hi) for c, (lo, hi) in predicates.items()):
            keep.append(d["__file"])
    stats = {"files_total": len(rows), "files_read": len(keep)}
    if not keep:
        df = spark.read.parquet(path).limit(0)
    else:
        df = spark.read.parquet(*keep)
    for c, (lo, hi) in predicates.items():
        df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    return df, stats
