"""Copy-on-write MERGE over bucket-partitioned parquet — Delta/Iceberg
MERGE INTO semantics without the table-format jars (unavailable in this
environment; the commit protocol here is per-partition-directory swap
instead of a transaction log).

Layout: the target table is written partitioned by a deterministic key
bucket (``__mbucket = key mod n_buckets``, one directory per bucket).  A
MERGE with a keyed changeset then touches ONLY the buckets the change
keys map to:

1. impacted bucket ids = distinct buckets of the change keys — bounded
   by ``n_buckets`` (a write-time constant), so collecting them is
   bounded metadata, never data;
2. the surviving rows of impacted buckets are read via partition pruning
   (non-impacted directories are never listed or opened), changed keys
   anti-joined out, upserts unioned in;
3. the merged buckets are staged to a scratch directory and committed by
   per-directory delete+rename — untouched buckets keep their exact
   files (byte-identical, same mtimes), and a bucket whose rows were all
   deleted simply loses its directory (the case dynamic partition
   overwrite cannot express).

At 100 TB the rewrite cost is O(impacted buckets), not O(table) — the
same asymptotics as Delta's COW MERGE; choosing n_buckets trades rewrite
amplification (big buckets) against small-file pressure (many buckets),
and sources/compaction.py's target-size writer applies to the staged
output unchanged.

Reference scope: the reference upserts dimensions row-wise via
INSERT ... ON CONFLICT (/root/reference/etl/etl_ida.py, op38); this is
the same MERGE semantics lifted to immutable columnar storage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__mbucket"


def bucket_of(key: Column, n_buckets: int) -> Column:
    """Deterministic bucket id: non-negative key mod n_buckets (pmod so
    negative keys still land in [0, n))."""
    return F.pmod(key.cast("long"), F.lit(n_buckets)).cast("int")


def write_bucketed(
    df: DataFrame, key: str, n_buckets: int, path: str
) -> None:
    """Materialize `df` as a bucket-partitioned target table."""
    df.withColumn(BUCKET_COL, bucket_of(F.col(key), n_buckets)).write.mode(
        "overwrite"
    ).partitionBy(BUCKET_COL).parquet(path)


def merge_cow(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    n_buckets: int,
    tombstone_col: str | None = None,
) -> dict:
    """Apply a keyed changeset to the bucketed table at `path`:
    rows matching a change key are replaced (or deleted when
    `tombstone_col` is true); unmatched change rows are inserted.
    Change keys must be unique (one decision per key per merge).

    Returns {"n_buckets": ..., "impacted_buckets": [...]} — bounded
    commit metadata, mirroring a table format's commit record."""
    from ..sources.ingest_ledger import _hadoop_fs

    ch = changes.withColumn(BUCKET_COL, bucket_of(F.col(key), n_buckets))
    impacted = sorted(
        r[0] for r in ch.select(BUCKET_COL).distinct().collect()
    )
    if not impacted:
        return {"n_buckets": n_buckets, "impacted_buckets": []}

    target = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(impacted))
    survivors = target.join(
        ch.select(key).distinct(), on=key, how="left_anti"
    )
    upserts = (
        ch.filter(~F.col(tombstone_col)).drop(tombstone_col)
        if tombstone_col
        else ch
    )
    merged = survivors.unionByName(
        upserts.select(*survivors.columns)
    ).withColumn(BUCKET_COL, F.col(BUCKET_COL).cast("int"))

    staging = path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)

    fs, root = _hadoop_fs(spark, path)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    for b in impacted:
        final_dir = Path(f"{path}/{BUCKET_COL}={b}")
        staged_dir = Path(f"{staging}/{BUCKET_COL}={b}")
        if fs.exists(final_dir):
            fs.delete(final_dir, True)
        if fs.exists(staged_dir):
            fs.rename(staged_dir, final_dir)
        # else: every row of bucket b was deleted — directory stays gone
    fs.delete(Path(staging), True)
    return {"n_buckets": n_buckets, "impacted_buckets": impacted}
