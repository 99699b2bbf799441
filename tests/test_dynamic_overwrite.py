"""xs15 dynamic partition overwrite: only the restated partition moves.

Pins the semantics the registered query relies on:
- untouched month directories are byte-identical after the overwrite
  (dynamic mode never lists or rewrites them);
- the restated month's content is fully replaced (no stale files
  alongside the new ones);
- static mode (the default) would have truncated the other partitions —
  asserted on a separate copy so the failure mode stays documented.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _files(root: str, part: str) -> dict[str, bytes]:
    d = os.path.join(root, part)
    out = {}
    for name in os.listdir(d):
        if name.endswith(".parquet"):
            with open(os.path.join(d, name), "rb") as fh:
                out[name] = fh.read()
    return out


def _write_base(spark, path):
    df = spark.createDataFrame(
        [(1, "2024-01", 10.0), (2, "2024-01", 20.0),
         (3, "2024-02", 30.0), (4, "2024-03", 40.0)],
        ["id", "month", "amount"],
    )
    df.write.partitionBy("month").mode("overwrite").parquet(path)


def test_dynamic_overwrite_touches_only_incoming_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_base(spark, path)
    jan_before = _files(path, "month=2024-01")
    feb_before = _files(path, "month=2024-02")
    restate = spark.createDataFrame(
        [(3, "2024-02", 99.0)], ["id", "month", "amount"]
    )
    (
        restate.write.partitionBy("month")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    # untouched partitions: byte-identical, same file names
    assert _files(path, "month=2024-01") == jan_before
    assert _files(path, "month=2024-03")  # still present
    # restated partition: fully replaced
    feb_after = _files(path, "month=2024-02")
    assert set(feb_after) != set(feb_before) or feb_after != feb_before
    back = spark.read.parquet(path)
    assert {
        (r["id"], r["month"], r["amount"]) for r in back.collect()
    } == {(1, "2024-01", 10.0), (2, "2024-01", 20.0),
          (3, "2024-02", 99.0), (4, "2024-03", 40.0)}


def test_static_overwrite_truncates_table(spark, tmp_path):
    path = str(tmp_path / "t2")
    _write_base(spark, path)
    restate = spark.createDataFrame(
        [(3, "2024-02", 99.0)], ["id", "month", "amount"]
    )
    (
        restate.write.partitionBy("month")
        .mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    months = {r["month"] for r in back.select("month").distinct().collect()}
    assert months == {"2024-02"}  # everything else gone — why xs15 uses dynamic


def test_registered_query_idempotent_rerun(spark):
    """Same-process rerun reuses the scratch dir; state must converge."""
    import __spark_entry__ as e

    q = e.queries()["xs15_dynamic_partition_overwrite"]
    sf = "/root/testdata/sf0.001"
    a = {tuple(r) for r in q(spark, sf).collect()}
    b = {tuple(r) for r in q(spark, sf).collect()}
    assert a == b
