"""Query registry: name → (spark callable, duckdb oracle SQL).

This is the single source of truth behind ``__spark_entry__.queries()`` /
``oracle_sql()``.  Every Spark callable hardens the session (UTC, ANSI off)
so correctness doesn't depend on the driver's session config.

Conventions (driver contract):
- every computed column is aliased identically in Spark and oracle SQL;
- float aggregates use the exact-decimal pattern (functions/aggs.py) so
  values match DuckDB bit-exact;
- non-SQL-expressible ops register with ``oracle=None`` → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .session import harden

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# undecorated originals — tools/registry_audit.py introspects their source
ORIGINALS: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            harden(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        ORIGINALS[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


# importing the query modules populates the registry
from . import queries as _queries  # noqa: E402,F401
