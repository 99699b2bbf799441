"""Partition-spec evolution (Iceberg v2 semantics, xs17): a table whose
partition LAYOUT changed mid-life — old files live under the old spec's
directories, new files under the new spec's — readable as one table with
per-vintage partition pruning.

Iceberg solves this with spec-id-tagged manifests (public spec,
"partition evolution"); Delta cannot do it without rewrite.  Here each
vintage is a directory tree ``data/spec{n}/`` written with Spark's
native ``partitionBy(*spec_cols)``, plus a JSON spec registry
``_spec/v{n}.json``.  The reader prunes each vintage by the INTERSECTION
of the query's equality filters with that vintage's partition columns
(a spec can only prune on its own columns) and re-applies the full
filter as a residual — superset pruning + exact residual, the same
losslessness contract as sources/file_pruning.py.

Why it matters at 100 TB: repartitioning petabytes to adopt a better
layout is exactly the rewrite you cannot afford; spec evolution makes
the layout change O(new data) while old data keeps its old (still
correct, just coarser) pruning.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _spec_dir(path: str) -> str:
    return os.path.join(path, "_spec")


def write_vintage(
    df: DataFrame, path: str, version: int, spec_cols: list[str]
) -> None:
    """Write one vintage under its own spec: data/spec{version}/<hive
    dirs>; record the spec in _spec/v{version}.json.  Rows are clustered
    by the partition columns first so each output directory is written
    by one task (the xs7 lesson: 80-directory writes from round-robin
    input produce 80x partitions-per-dir small files)."""
    data_dir = os.path.join(path, "data", f"spec{version}")
    (
        df.repartition(*[F.col(c) for c in spec_cols])
        .write.mode("overwrite")
        .partitionBy(*spec_cols)
        .parquet(data_dir)
    )
    os.makedirs(_spec_dir(path), exist_ok=True)
    spec = {"version": version, "cols": spec_cols}
    with open(os.path.join(_spec_dir(path), f"v{version}.json"), "w") as f:
        json.dump(spec, f)


def read_specs(path: str) -> list[dict]:
    d = _spec_dir(path)
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def read_evolved(
    spark: SparkSession, path: str, eq_filters: dict[str, list]
) -> DataFrame:
    """Read every vintage with per-spec pruning and union the results.

    ``eq_filters``: {col: [allowed values]} equality/IN predicates.  For
    each vintage, directories are pruned by the filters on THAT spec's
    partition columns (prefix-walk of the hive tree); filters on columns
    the spec doesn't partition by stay residual.  The residual filter is
    re-applied to EVERY vintage, so pruning can only drop provably
    non-matching directories — losslessness by construction."""
    frames = []
    for spec in read_specs(path):
        root = os.path.join(path, "data", f"spec{spec['version']}")
        dirs = [root]
        for col in spec["cols"]:
            allowed = eq_filters.get(col)
            nxt = []
            for d in dirs:
                for name in sorted(os.listdir(d)):
                    full = os.path.join(d, name)
                    if not os.path.isdir(full) or "=" not in name:
                        continue
                    val = name.split("=", 1)[1]
                    # hive dir names are URL-encoded; compare decoded
                    from urllib.parse import unquote

                    if allowed is None or unquote(val) in [
                        str(v) for v in allowed
                    ]:
                        nxt.append(full)
            dirs = nxt
        if not dirs:
            continue
        df = (
            spark.read.option("basePath", root).parquet(*dirs)
        )
        frames.append(df)
    if not frames:
        raise FileNotFoundError(f"no vintage matches filters under {path}")
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2, allowMissingColumns=False)
    # residual: exact predicate on every filter column (pruning is a
    # superset; this is the lossless half of the contract)
    for col, allowed in eq_filters.items():
        out = out.where(F.col(col).isin(list(allowed)))
    return out
