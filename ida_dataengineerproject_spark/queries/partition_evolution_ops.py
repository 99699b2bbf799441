"""xs17 — partition-spec evolution read (round 6).

Builds a two-vintage orders table in scratch: history written under
spec1 = (month), the post-1998 era under spec2 = (month, prio) — the
"we learned to partition finer" migration — then answers a filtered
rollup THROUGH sources/partition_evolution.read_evolved.  The DuckDB
oracle recomputes the same rollup straight from orders.parquet, so the
whole write→prune→union→residual path is value-checked, not just
row-counted.  tests/test_partition_evolution.py pins the pruning
evidence (the file set actually read) and losslessness.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.partition_evolution import read_evolved, write_vintage
from ..sources.tables import table
from .scale_ops import _scratch_dir

EVOLVE_AT = "1998-01-01"
MONTHS = ["1997-06", "1999-06"]
PRIO = "1-URGENT"

_BUILT: set[str] = set()


def build_evolved_orders(spark: SparkSession, sf_dir: str) -> str:
    """Memoized two-vintage build (per process, xs7/xs8 convention —
    production maintains the table at write time; reruns measure the
    READ)."""
    path = _scratch_dir("pevolve", sf_dir)
    if path in _BUILT:
        return path
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_orderpriority").alias("prio"),
    )
    cut = F.lit(EVOLVE_AT).cast("timestamp")
    write_vintage(o.where(F.col("o_orderdate") < cut), path, 1, ["month"])
    write_vintage(
        o.where(F.col("o_orderdate") >= cut), path, 2, ["month", "prio"]
    )
    spark.catalog.refreshByPath(os.path.join(path, "data"))
    _BUILT.add(path)
    return path


@register(
    "xs17_partition_evolution",
    f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           o_orderpriority AS prio,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 4)
             AS revenue
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m') IN ('{MONTHS[0]}', '{MONTHS[1]}')
      AND o_orderpriority = '{PRIO}'
    GROUP BY month, prio
    """,
)
def q_xs17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered rollup through a partition-evolved table: one probed
    month lives under spec1 (month-only dirs — pruning uses month, prio
    stays residual) and one under spec2 (month/prio dirs — both prune).

    Scale shape: directory pruning is metadata-only (hive-tree walk of
    the spec roots, never a data scan); each vintage contributes only
    its matching directories to the union, and the residual filter is
    a codegen predicate on the already-pruned scan.  The old vintage is
    never rewritten — adopting the finer spec cost O(new data)."""
    path = build_evolved_orders(spark, sf_dir)
    df = read_evolved(
        spark, path, {"month": MONTHS, "prio": [PRIO]}
    )
    return df.groupBy("month", "prio").agg(
        F.count("*").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast(
                "double"
            ),
            4,
        ).alias("revenue"),
    )
