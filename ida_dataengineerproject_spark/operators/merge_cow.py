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
from pyspark.sql import types as T

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
    from pyspark.storagelevel import StorageLevel

    from ..sources.ingest_ledger import _hadoop_fs

    # materialize the changeset once — three consumers (impacted
    # collect, anti-join key set, merged write) otherwise re-run its
    # lineage (r13; see merge_versioned)
    ch = changes.withColumn(
        BUCKET_COL, bucket_of(F.col(key), n_buckets)
    ).localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
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
    # Rename-aside commit (the wap.py pattern, per bucket): the live
    # directory is MOVED to <path>__prev — never deleted — before the
    # staged directory is renamed in.  A crash mid-loop therefore never
    # loses a bucket: its data is under __prev (and the merge result
    # under __staging); the recovery sweep below restores it on the next
    # merge.  __prev lives OUTSIDE the table path so a reader listing
    # <path> mid-commit never sees a malformed partition directory.
    prev_root = path.rstrip("/") + "__prev"
    _recover_prev(fs, Path, path, prev_root)
    fs.mkdirs(Path(prev_root))
    try:
        for b in impacted:
            final_dir = Path(f"{path}/{BUCKET_COL}={b}")
            staged_dir = Path(f"{staging}/{BUCKET_COL}={b}")
            prev_dir = Path(f"{prev_root}/{BUCKET_COL}={b}")
            # Hadoop FileSystem signals most failures by RETURNING FALSE,
            # not raising — an unchecked rename would fall through to the
            # staging cleanup below and destroy the only copy of a bucket.
            if fs.exists(final_dir) and not fs.rename(final_dir, prev_dir):
                raise IOError(
                    f"COW commit: could not move {final_dir} aside"
                )
            if fs.exists(staged_dir) and not fs.rename(staged_dir, final_dir):
                if fs.exists(prev_dir) and not fs.rename(prev_dir, final_dir):
                    raise IOError(
                        f"COW commit: rename {staged_dir} -> {final_dir} "
                        f"failed AND rollback failed; previous copy at "
                        f"{prev_dir}, staged data under {staging}"
                    )
                raise IOError(
                    f"COW commit: rename {staged_dir} -> {final_dir} "
                    f"failed; bucket rolled back, staged data left under "
                    f"{staging} for inspection"
                )
            # no staged dir: every row of bucket b was deleted — gone
        fs.delete(Path(prev_root), True)
        fs.delete(Path(staging), True)
    finally:
        # cached file listings of the live path are stale after ANY
        # rename touching it — including the partial-failure paths
        spark.catalog.refreshByPath(path)
    return {"n_buckets": n_buckets, "impacted_buckets": impacted}


def _recover_prev(fs, Path, path: str, prev_root: str) -> None:
    """Self-heal a crashed in-place commit: any bucket directory left
    under ``__prev`` whose live counterpart is MISSING crashed between
    the two renames — restore it (the merge never fully committed, so
    the pre-merge state is the correct rollback).  A __prev bucket whose
    live counterpart EXISTS was superseded by a completed rename — drop
    it.  Bounded metadata work: one listing of __prev."""
    prev = Path(prev_root)
    if not fs.exists(prev):
        return
    for st in fs.listStatus(prev):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(BUCKET_COL + "=")):
            continue
        live = Path(f"{path}/{name}")
        if not fs.exists(live):
            if not fs.rename(st.getPath(), live):
                raise IOError(
                    f"COW recovery: could not restore {st.getPath()}"
                )
    if not fs.delete(prev, True):
        raise IOError(f"COW recovery: could not clear {prev_root}")


# ---------------------------------------------------------------------------
# Versioned commits + time travel
#
# The per-directory swap above mutates in place (one live version).  The
# versioned variant below never deletes data: each commit writes NEW
# directories only for impacted buckets and records a JSON commit log
# mapping bucket -> the commit that owns its current data — exactly a
# table format's snapshot manifest, minimally.  Reading version v
# resolves at most n_buckets directories from the log (bounded commit
# metadata), so time travel costs one small JSON read; storage grows by
# O(impacted buckets) per commit and old versions stay byte-stable.
# ---------------------------------------------------------------------------

import json


def _log_dir(path: str) -> str:
    return path.rstrip("/") + "/_log"


def _read_log(spark: SparkSession, path: str, version: int | None = None) -> dict:
    from ..sources.ingest_ledger import _hadoop_fs

    fs, _ = _hadoop_fs(spark, path)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    if not fs.exists(Path(_log_dir(path))):
        raise FileNotFoundError(f"no commits under {path} (no _log dir)")
    if version is None:
        version = -1
        for st in fs.listStatus(Path(_log_dir(path))):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                version = max(version, int(name[1:-5]))
        if version < 0:
            raise FileNotFoundError(f"no commits under {path}")
    p = Path(f"{_log_dir(path)}/v{version}.json")
    if not fs.exists(p):
        raise FileNotFoundError(f"version {version} does not exist")
    stream = fs.open(p)
    try:
        raw = bytes(stream.readAllBytes()).decode()
    finally:
        stream.close()
    return json.loads(raw)


def _write_log(spark: SparkSession, path: str, log: dict) -> None:
    from ..sources.ingest_ledger import _hadoop_fs

    fs, _ = _hadoop_fs(spark, path)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    out = fs.create(Path(f"{_log_dir(path)}/v{log['version']}.json"), False)
    try:
        out.write(bytearray(json.dumps(log).encode()))
    finally:
        out.close()


class ConcurrentWriteError(RuntimeError):
    """Another writer claimed this commit version first.  Retry the whole
    operation (it will re-read the log and target the next version).  A
    stale ``_log/v{n}.lock`` with no matching ``v{n}.json`` and no live
    writer is a crashed commit — delete the lock to unblock."""


def _claim_commit(spark: SparkSession, path: str, version: int) -> None:
    """Writer-side mutual exclusion: atomically create
    ``_log/v{version}.lock`` (create with overwrite=False is the one
    atomic primitive plain Hadoop FS gives us) BEFORE any data directory
    is written.  Two concurrent writers that both computed
    ``version = latest + 1`` race on this create; the loser fails HERE,
    before it can clobber the winner's ``data/v{version}`` files — the
    window ADVICE r5 flagged (both wrote data with mode=overwrite and
    only collided later at the log write, after the damage)."""
    from ..sources.ingest_ledger import _hadoop_fs

    fs, _ = _hadoop_fs(spark, path)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    lock = Path(f"{_log_dir(path)}/v{version}.lock")
    try:
        fs.create(lock, False).close()
    except Exception as exc:  # JVM FileAlreadyExists surfaces via py4j
        raise ConcurrentWriteError(
            f"commit v{version} of {path} already claimed ({lock}); "
            f"retry, or remove a stale lock left by a crashed writer"
        ) from exc


def _release_commit(spark: SparkSession, path: str, version: int) -> None:
    from ..sources.ingest_ledger import _hadoop_fs

    fs, _ = _hadoop_fs(spark, path)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    fs.delete(Path(f"{_log_dir(path)}/v{version}.lock"), False)


def create_versioned(
    spark: SparkSession, path: str, df: DataFrame, key: str, n_buckets: int
) -> int:
    """Commit v0 of a versioned bucketed table: all buckets written under
    data/v0/, log records the mapping."""
    _claim_commit(spark, path, 0)
    data = path.rstrip("/") + "/data/v0"
    df.withColumn(BUCKET_COL, bucket_of(F.col(key), n_buckets)).write.mode(
        "overwrite"
    ).partitionBy(BUCKET_COL).parquet(data)
    buckets = sorted(
        int(r[0])
        for r in spark.read.parquet(data).select(BUCKET_COL).distinct().collect()
    )
    _write_log(
        spark,
        path,
        {
            "version": 0,
            "key": key,
            "n_buckets": n_buckets,
            "buckets": {str(b): 0 for b in buckets},
        },
    )
    _release_commit(spark, path, 0)
    return 0


def _bucket_dirs(path: str, log: dict, buckets: list[int] | None = None) -> list[str]:
    """Directories owning the given buckets (all buckets when None) as of
    `log` — resolved purely from the commit log, never by listing data.

    A SHALLOW CLONE's log carries ``base``/``base_watermark``: buckets
    owned by a commit ≤ the watermark still live under the base table's
    data tree (zero-copy inheritance); commits above it are the clone's
    own writes under its own path."""
    base = log.get("base")
    wm = log.get("base_watermark", -1)

    def root(commit: int) -> str:
        if base is not None and commit <= wm:
            return base
        return path.rstrip("/")

    items = sorted(log["buckets"].items(), key=lambda kv: int(kv[0]))
    if buckets is not None:
        want = {str(b) for b in buckets}
        items = [kv for kv in items if kv[0] in want]
    return [
        f"{root(int(commit))}/data/v{commit}/{BUCKET_COL}={b}"
        for b, commit in items
    ]


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time travel: the table as of `version` (latest when None).
    Resolves at most n_buckets directories from the commit log."""
    log = _read_log(spark, path, version)
    dirs = _bucket_dirs(path, log)
    if not dirs:
        raise FileNotFoundError(f"version {log['version']} has no data")
    return spark.read.parquet(*dirs)


def merge_versioned(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    tombstone_col: str | None = None,
) -> int:
    """MERGE `changes` into the latest version, committing version n+1.
    Only impacted buckets get new directories; every other bucket entry
    carries over, so old versions remain readable and byte-stable."""
    from pyspark.storagelevel import StorageLevel

    log = _read_log(spark, path)
    key, n_buckets = log["key"], log["n_buckets"]
    new_version = log["version"] + 1
    # claim the version BEFORE any data write: a concurrent merge that
    # computed the same new_version fails here instead of overwriting
    # this writer's data/v{n} directories (ADVICE r5)
    _claim_commit(spark, path, new_version)

    # materialize the changeset ONCE (O(changeset) rows, DISK_ONLY):
    # it is consumed by the impacted-bucket collect, the anti-join key
    # set AND the merged write, and its lineage may be arbitrarily
    # expensive (e.g. a filter over read_version of this very table) —
    # without this every consumer re-ran it (r13).  Materializing
    # pre-commit also pins the change rows before any directory of this
    # table moves.
    ch = changes.withColumn(
        BUCKET_COL, bucket_of(F.col(key), n_buckets)
    ).localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    impacted = sorted(
        int(r[0]) for r in ch.select(BUCKET_COL).distinct().collect()
    )
    live = [b for b in impacted if str(b) in log["buckets"]]
    # read ONLY the impacted buckets' directories, resolved from the log —
    # reading the whole version and row-filtering would scan O(table) per
    # merge (leaf-dir reads carry no partition column to prune on)
    live_dirs = _bucket_dirs(path, log, live)
    target = spark.read.parquet(*live_dirs) if live_dirs else None

    upserts = (
        ch.filter(~F.col(tombstone_col)).drop(tombstone_col)
        if tombstone_col
        else ch
    )
    if target is not None:
        survivors = target.withColumn(
            BUCKET_COL, bucket_of(F.col(key), n_buckets)
        ).join(ch.select(key).distinct(), on=key, how="left_anti")
        merged = survivors.unionByName(upserts.select(*survivors.columns))
    else:
        merged = upserts
    data = f"{path.rstrip('/')}/data/v{new_version}"
    merged.withColumn(BUCKET_COL, F.col(BUCKET_COL).cast("int")).write.mode(
        "overwrite"
    ).partitionBy(BUCKET_COL).parquet(data)

    # list written bucket dirs via the filesystem: an all-deletes commit
    # writes an EMPTY directory, which parquet cannot re-read for schema
    from ..sources.ingest_ledger import _hadoop_fs

    fs, _ = _hadoop_fs(spark, data)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    written = {
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(Path(data))
        if st.isDirectory() and st.getPath().getName().startswith(BUCKET_COL + "=")
    }
    buckets = dict(log["buckets"])
    for b in impacted:
        if b in written:
            buckets[str(b)] = new_version
        else:
            buckets.pop(str(b), None)  # bucket fully deleted this commit
    new_log = {
        "version": new_version,
        "key": key,
        "n_buckets": n_buckets,
        "buckets": buckets,
    }
    for k in ("base", "base_watermark"):  # shallow clones stay clones
        if k in log:
            new_log[k] = log[k]
    _write_log(spark, path, new_log)
    _release_commit(spark, path, new_version)
    return new_version


def vacuum_versioned(spark: SparkSession, path: str, retain_from: int) -> dict:
    """Drop every bucket directory no retained snapshot references and
    the commit-log entries of expired versions — Delta's VACUUM +
    log-retention rolled into one, sized to this table's log layout.

    Retained snapshots are versions ``retain_from..latest``.  The keep
    set is (owning commit, bucket) pairs unioned over THEIR logs — a
    retained snapshot may reference directories written by an expired
    commit (untouched buckets carry over), so liveness is per directory,
    never per commit.  Everything else under data/ is deleted, as are
    the ``_log/v*.json`` files below ``retain_from`` (time travel to an
    expired version then raises, same as the never-existed case).

    Cost is bounded metadata: (versions retained) log reads plus one
    directory listing per commit dir — no data files are opened.  100 TB:
    this is the storage-reclaim half of the COW design; without it the
    table grows by O(impacted buckets) per commit forever.

    Returns {"deleted_dirs", "retained_dirs", "deleted_logs",
    "retain_from", "latest"}."""
    from ..sources.ingest_ledger import _hadoop_fs

    latest = _read_log(spark, path)["version"]
    # a shallow clone's history starts at its watermark, not 0 — its
    # earliest log IS its creation entry, and retaining below it would
    # try to read logs that never existed here
    from ..sources.ingest_ledger import _hadoop_fs as _hfs

    fs0, _ = _hfs(spark, path)
    JPath = spark._jvm.org.apache.hadoop.fs.Path
    earliest = min(
        int(st.getPath().getName()[1:-5])
        for st in fs0.listStatus(JPath(_log_dir(path)))
        if st.getPath().getName().startswith("v")
        and st.getPath().getName().endswith(".json")
    )
    if not earliest <= retain_from <= latest:
        raise ValueError(
            f"retain_from={retain_from} outside committed range "
            f"{earliest}..{latest}"
            + (
                " (shallow clone: history starts at its watermark)"
                if earliest > 0
                else ""
            )
        )

    keep: set[tuple[int, int]] = set()
    for v in range(retain_from, latest + 1):
        log = _read_log(spark, path, v)
        keep.update(
            (int(commit), int(b)) for b, commit in log["buckets"].items()
        )

    fs, _ = _hadoop_fs(spark, path)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    data_root = Path(path.rstrip("/") + "/data")
    deleted = retained = 0
    # a fresh shallow clone owns no data dirs yet — nothing to reclaim
    commit_dirs = fs.listStatus(data_root) if fs.exists(data_root) else []
    for commit_st in commit_dirs:
        name = commit_st.getPath().getName()
        if not (commit_st.isDirectory() and name.startswith("v")):
            continue
        commit = int(name[1:])
        live_left = False
        for st in fs.listStatus(commit_st.getPath()):
            leaf = st.getPath().getName()
            if not (st.isDirectory() and leaf.startswith(BUCKET_COL + "=")):
                continue  # _SUCCESS etc. — removed with the commit dir
            b = int(leaf.split("=", 1)[1])
            if (commit, b) in keep:
                live_left = True
                retained += 1
            else:
                if not fs.delete(st.getPath(), True):
                    raise IOError(f"vacuum: could not delete {st.getPath()}")
                deleted += 1
        if not live_left and not fs.delete(commit_st.getPath(), True):
            raise IOError(f"vacuum: could not delete {commit_st.getPath()}")

    deleted_logs = 0
    for v in range(retain_from):
        p = Path(f"{_log_dir(path)}/v{v}.json")
        if fs.exists(p):
            if not fs.delete(p, False):
                raise IOError(f"vacuum: could not delete {p}")
            deleted_logs += 1
    return {
        "deleted_dirs": deleted,
        "retained_dirs": retained,
        "deleted_logs": deleted_logs,
        "retain_from": retain_from,
        "latest": latest,
    }


def _cdf_inputs(
    spark: SparkSession, path: str, v_from: int, v_to: int
) -> tuple[list[str], list[str], str]:
    """(old dirs, new dirs, key) for the version diff — ONLY buckets whose
    owning commit differs between the two logs.  A bucket with the same
    owner in both versions points at the same immutable directory, so it
    cannot contain a change and is never read (the pruning that makes
    CDF O(changed data), not O(table))."""
    log_a = _read_log(spark, path, v_from)
    log_b = _read_log(spark, path, v_to)
    ba, bb = log_a["buckets"], log_b["buckets"]
    diff = sorted(
        int(b) for b in set(ba) | set(bb) if ba.get(b) != bb.get(b)
    )
    dirs_a = _bucket_dirs(path, log_a, [b for b in diff if str(b) in ba])
    dirs_b = _bucket_dirs(path, log_b, [b for b in diff if str(b) in bb])
    return dirs_a, dirs_b, log_a["key"]


def change_data_feed(
    spark: SparkSession, path: str, v_from: int, v_to: int
) -> DataFrame:
    """Delta-style Change Data Feed between two committed versions:
    row-level (key, change_type, old struct, new struct) where
    change_type ∈ insert/delete/update — derived from STORAGE, not from
    the changesets that produced it, so it also audits the commit path.

    Reads only differing buckets (see :func:`_cdf_inputs`), full-outer
    joins old vs new on the table key within them, and classifies by
    struct equality: survivors of a rewritten bucket compare identical
    and drop out as unchanged.  100 TB: cost is O(rewritten buckets) for
    the scan plus one key-shuffle of just those rows — the primitive
    that feeds incremental downstream maintenance (xs5's rollup merge
    consumes exactly this shape)."""
    dirs_a, dirs_b, key = _cdf_inputs(spark, path, v_from, v_to)

    def _side(dirs: list[str], alias: str) -> DataFrame | None:
        if not dirs:
            return None
        df = spark.read.parquet(*dirs)
        payload = [c for c in df.columns if c != key]
        return df.select(key, F.struct(*payload).alias(alias))

    old, new = _side(dirs_a, "old"), _side(dirs_b, "new")
    if old is None and new is None:
        raise ValueError("versions are identical: no differing buckets")
    # an absent side must still be a TYPED empty frame — a NullType
    # literal would break the feed's schema contract (consumers read
    # struct fields; NullType is unwritable to parquet)
    if old is None:
        schema = T.StructType(
            [new.schema[0], T.StructField("old", new.schema[1].dataType)]
        )
        old = spark.createDataFrame([], schema)
    if new is None:
        schema = T.StructType(
            [old.schema[0], T.StructField("new", old.schema[1].dataType)]
        )
        new = spark.createDataFrame([], schema)
    j = old.join(new, on=key, how="full_outer")
    return j.select(
        key,
        F.when(F.col("old").isNull(), F.lit("insert"))
        .when(F.col("new").isNull(), F.lit("delete"))
        .when(
            ~F.col("old").eqNullSafe(F.col("new")), F.lit("update")
        )  # null-safe: a NULL payload field must not fake an update
        .alias("change_type"),
        "old",
        "new",
    ).filter(F.col("change_type").isNotNull())


def shallow_clone(spark: SparkSession, src_path: str, dst_path: str) -> int:
    """Zero-copy clone of the versioned table's LATEST snapshot: writes a
    single commit-log entry at ``dst_path`` that references the source's
    data directories (``base`` + ``base_watermark``) — no data moves.
    The clone's version counter starts AT the source's latest version,
    so its own commits (watermark+1, …) can never collide with inherited
    commit ids; merges on the clone write under the clone's data tree
    and the source stays byte-stable (tests pin this).

    Semantics and caveat match Delta's shallow CLONE: O(1) metadata to
    fork a 100 TB table for experiments/backfills, reads served from
    shared files — and vacuuming the SOURCE below the clone's watermark
    breaks the clone (the clone's own vacuum only ever lists its own
    data tree, so it cannot damage the source).  Returns the clone's
    starting version."""
    log = _read_log(spark, src_path)
    version = log["version"]
    base = log.get("base", src_path.rstrip("/"))
    clone_log = {
        "version": version,
        "key": log["key"],
        "n_buckets": log["n_buckets"],
        "buckets": dict(log["buckets"]),
        "base": base,
        # a clone of a clone keeps the ORIGINAL base for inherited
        # buckets, but its watermark moves up to cover the middle
        # clone's own commits too — which also live under `base` only if
        # that middle clone never merged; to stay correct we refuse the
        # chain when the middle clone diverged.
        "base_watermark": version,
    }
    if "base" in log:
        mid_wm = log.get("base_watermark", -1)
        if any(int(c) > mid_wm for c in log["buckets"].values()):
            raise ValueError(
                "cannot shallow-clone a clone that has diverged from its "
                "base — materialize it first (read latest + create_versioned)"
            )
    _write_log(spark, dst_path, clone_log)
    return version
