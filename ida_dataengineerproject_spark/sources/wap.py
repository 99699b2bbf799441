"""Write-Audit-Publish (WAP): stage a write, run a declarative audit
suite over the STAGED FILES, and atomically publish only when every
check passes — the Iceberg/Netflix WAP pattern on plain parquet.

The audit reads what was actually written (not the input plan), so it
also covers write-path corruption, and it folds every check into ONE
aggregate pass over the staged data (the xq1 single-scan property —
audit cost is one scan regardless of suite size).  Publishing is the
checked delete+rename directory swap merge_cow.py established: Hadoop
``FileSystem.rename``/``delete`` report failure by RETURNING FALSE, so
every return is asserted; a failed audit deletes staging and leaves the
previously published data untouched and live.

100 TB: the alternative — audit after publish — serves bad data to every
reader between publish and rollback; auditing the staged files costs one
extra scan of the NEW data only (never the table), which is the price of
never publishing a violation.

Reference scope: the reference validates frames in pandas before the
Postgres load (/root/reference/etl/etl_ida.py dropna/invalid-cell
filters) — same gate, lifted to an atomic storage handoff.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class AuditError(RuntimeError):
    """At least one audit found violations; nothing was published."""

    def __init__(self, violations: dict[str, int]):
        self.violations = violations
        bad = {k: v for k, v in violations.items() if v}
        super().__init__(f"audit failed, staging discarded: {bad}")


def row_violations(cond: Column) -> Column:
    """Audit expression: how many rows satisfy the VIOLATION condition."""
    return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))


def duplicate_keys(col: str) -> Column:
    """Audit expression: how many NON-NULL-keyed rows share an
    already-seen key.  count(col) (not count(*)) so NULL keys are the
    null-completeness audit's finding, not phantom duplicates."""
    return F.count(F.col(col)) - F.countDistinct(col)


def write_audit_publish(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    audits: list[tuple[str, Column]],
) -> dict[str, int]:
    """Stage ``df`` at ``<path>__staging``, evaluate every audit
    (``(name, aggregate expression counting violations)`` — see
    :func:`row_violations` / :func:`duplicate_keys`) in one aggregate
    pass over the staged files, then swap staging into ``path``.  On any
    violation the staging directory is deleted and :class:`AuditError`
    raises — the published path is never touched.  Returns the per-audit
    violation counts (all zero on success)."""
    from .ingest_ledger import _hadoop_fs

    staging = path.rstrip("/") + "__staging"
    df.write.mode("overwrite").parquet(staging)

    staged = spark.read.parquet(staging)
    row = staged.agg(
        *[expr.cast("long").alias(name) for name, expr in audits]
    ).collect()[0]
    violations = {name: int(row[name]) for name, _ in audits}

    fs, _ = _hadoop_fs(spark, path)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    if any(violations.values()):
        fs.delete(Path(staging), True)
        raise AuditError(violations)

    # publish by rename-aside, not delete-then-rename: the live table is
    # moved to __prev (metadata op), staging renamed in, then __prev
    # dropped — a failed swap ROLLS BACK to the previous version, so
    # readers never see an empty path; the unprotected window is the
    # instant between the two renames (the best plain-FS can do).
    target = Path(path)
    prev = Path(path.rstrip("/") + "__prev")
    try:
        if fs.exists(prev) and not fs.delete(prev, True):  # stale remnant
            raise IOError(f"WAP publish: could not clear stale {prev}")
        had_live = fs.exists(target)
        if had_live and not fs.rename(target, prev):
            raise IOError(f"WAP publish: could not move live {target} aside")
        if not fs.rename(Path(staging), target):
            if had_live and not fs.rename(prev, target):
                raise IOError(
                    f"WAP publish: swap failed AND rollback failed; previous "
                    f"version is at {prev}, staged data at {staging}"
                )
            raise IOError(
                f"WAP publish: rename {staging} -> {target} failed; previous "
                f"version restored, staged data left under {staging}"
            )
        if had_live and not fs.delete(prev, True):
            raise IOError(
                f"WAP publish: published OK but could not drop {prev}"
            )
    finally:
        # in a finally, not just on success: a failed or rolled-back swap
        # also renamed the live path, so any session that cached its file
        # listing must be invalidated either way (ADVICE r5 — the xio1
        # stale-recache class of bug)
        spark.catalog.refreshByPath(path)
    return violations
