"""xs17 partition-evolution contracts: pruning actually prunes (file-set
evidence), pruning is lossless vs the unpruned union, and adopting the
finer spec never rewrites the old vintage's bytes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ida_dataengineerproject_spark.queries.partition_evolution_ops import (
    MONTHS,
    PRIO,
    build_evolved_orders,
)
from ida_dataengineerproject_spark.sources.partition_evolution import (
    read_evolved,
)

SF = "/root/testdata/sf0.001"


def _walk_parquet(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_pruned_file_set_only_matching_dirs(spark):
    path = build_evolved_orders(spark, SF)
    df = read_evolved(spark, path, {"month": MONTHS, "prio": [PRIO]})
    files = {
        r[0]
        for r in df.select(F.input_file_name()).distinct().collect()
    }
    assert files, "pruned read touched no files"
    for f in files:
        if "/spec1/" in f:
            # spec1 prunes on month only; prio is residual
            assert any(f"month={m}" in f for m in MONTHS), f
        else:
            assert "/spec2/" in f, f
            assert any(f"month={m}" in f for m in MONTHS), f
            assert "prio=1-URGENT" in f, f
    # and pruning actually dropped directories: the full tree has many
    # more months than the two probed ones
    all_files = _walk_parquet(os.path.join(path, "data"))
    assert len(files) < len(all_files) / 3


def test_pruning_lossless_vs_unpruned(spark):
    path = build_evolved_orders(spark, SF)
    pruned = read_evolved(spark, path, {"month": MONTHS, "prio": [PRIO]})
    full = (
        spark.read.option("basePath", os.path.join(path, "data", "spec1"))
        .parquet(os.path.join(path, "data", "spec1"))
        .unionByName(
            spark.read.option(
                "basePath", os.path.join(path, "data", "spec2")
            ).parquet(os.path.join(path, "data", "spec2"))
        )
        .where(F.col("month").isin(MONTHS) & (F.col("prio") == PRIO))
    )
    a = sorted(map(tuple, pruned.select("o_orderkey").collect()))
    b = sorted(map(tuple, full.select("o_orderkey").collect()))
    assert a == b and len(a) > 0


def test_spec_evolution_never_rewrites_old_vintage(spark):
    """Re-writing vintage 2 (the evolution event) must leave every
    spec1 file byte-identical — the O(new data) claim."""
    from ida_dataengineerproject_spark.sources.partition_evolution import (
        write_vintage,
    )
    from ida_dataengineerproject_spark.sources.tables import table

    path = build_evolved_orders(spark, SF)
    before = _walk_parquet(os.path.join(path, "data", "spec1"))
    o = table(spark, SF, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_orderpriority").alias("prio"),
    )
    cut = F.lit("1998-01-01").cast("timestamp")
    write_vintage(
        o.where(F.col("o_orderdate") >= cut), path, 2, ["month", "prio"]
    )
    spark.catalog.refreshByPath(os.path.join(path, "data"))
    after = _walk_parquet(os.path.join(path, "data", "spec1"))
    assert before == after
