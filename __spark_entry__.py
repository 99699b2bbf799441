"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``ida_dataengineerproject_spark``; this module only
wires the contract.  Query keys follow SURVEY.md §2 operator IDs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ida_dataengineerproject_spark.registry import QUERIES, ORACLES
from ida_dataengineerproject_spark.session import harden
from ida_dataengineerproject_spark.plans.taxa_variacao import taxa_variacao


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (vw_taxa_variacao semantics, SURVEY.md §3.3) on
    /root/testdata/sf0.001; driver checks rows>0."""
    harden(spark)
    return taxa_variacao(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each (SQL-expressible) query."""
    return dict(ORACLES)
