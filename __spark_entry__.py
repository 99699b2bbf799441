"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``ida_dataengineerproject_spark``; this module only
wires the contract.  Query keys follow SURVEY.md §2 operator IDs.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Make the package importable on BOTH the driver and the Python workers
# regardless of the caller's CWD: workers unpickle mapInPandas closures by
# module reference, so the repo root must be on the worker PYTHONPATH too
# (exported before the lazy worker daemon starts).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)

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
