"""Parquet table sources (the engine's scan layer, SURVEY.md §2.1).

The reference scans ODS spreadsheets via pandas (etl/etl_ida.py:215-235); our
distributed scan surface is parquet with Catalyst predicate pushdown + column
pruning.  Scale notes: `spark.read.parquet` on a directory of files gives
splittable, statistics-pruned scans; never `.collect()` a table to re-create
it — keep everything a lazy DataFrame so filters/projections reach the reader
(`.explain()` must show PushedFilters / a narrow ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Lazy; pushdown-friendly.

    ``events.ts`` is parquet TIMESTAMP(NANOS); Spark timestamps are
    microsecond precision, so (with ``nanosAsLong`` set in session.harden)
    the raw int64 is truncated to micros losslessly via integer division.
    DuckDB oracles must truncate identically:
    ``make_timestamp(epoch_ns(ts)//1000)``.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All testdata tables as lazy DataFrames keyed by name."""
    return {name: table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql() paths.

    Memoized per (session, sf_dir): re-registration re-reads 10 parquet
    footers on the driver (~1 s warm), pure overhead when the views
    already point at the same directory.  Switching sf_dir re-registers.
    """
    key = "spark_graft.registered_sf_dir"
    if spark.conf.get(key, None) == sf_dir:
        return
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    spark.conf.set(key, sf_dir)
