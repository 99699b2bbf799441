"""Interchange-format round-trips (round 5b): the CSV / JSONL source +
sink wrappers (sources/text_formats.py) exercised end-to-end under the
driver's oracle gate — write events out as text, read back with an
EXPLICIT schema (never inference), quarantine injected malformed lines
via PERMISSIVE mode, and aggregate the clean rows.

The oracle aggregates the same parquet source directly plus a literal
for the injected corrupt lines, so parity proves the text round-trip is
LOSSLESS: timestamps travel as epoch micros (BIGINT — the explicit
interchange encoding; ISO strings would re-open the timezone/format
ambiguity the reference hit with ODS dynamic typing,
/root/reference/etl/etl_ida.py:351-359), and doubles survive because
both writers emit shortest-round-trip representations.

Scale notes: text scans are splittable uncompressed (one task per
split); the quarantine split costs one cached pass (see
text_formats.split_quarantine); production lands text at the ingest
boundary and converts to parquet immediately (write_parquet_normalized).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources.tables import table
from .scale_ops import _scratch_dir

_EVENT_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
           CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__quarantined__', 2, 0, 0.0, 0
"""


def _wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )


def _summarize(clean: DataFrame, bad: DataFrame) -> DataFrame:
    per_type = clean.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_value"),
        F.max("ts_us").alias("max_ts_us"),
    )
    quarantine = bad.agg(
        F.lit("__quarantined__").alias("event_type"),
        F.count("*").alias("n_rows"),
        F.lit(0).cast("long").alias("n_users"),
        F.lit(0.0).alias("total_value"),
        F.lit(0).cast("long").alias("max_ts_us"),
    )
    return per_type.unionByName(quarantine)


def _inject_garbage(path: str, lines: list[str]) -> None:
    with open(os.path.join(path, "zz-malformed.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


@register("xio1_jsonl_roundtrip", _ORACLE)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> JSONL sink -> JSONL scan (explicit schema, PERMISSIVE)
    -> quarantine split -> per-type aggregate.  Two garbage lines are
    injected into the landed directory; they must surface as exactly the
    '__quarantined__' audit row, never a job failure — the reference's
    skip-and-log cell posture (etl/etl_ida.py:374-375) at file scale."""
    from ..sources.text_formats import (
        read_jsonl,
        split_quarantine,
        write_jsonl,
    )

    out = _scratch_dir("jsonl_rt", sf_dir) + "/events_jsonl"
    write_jsonl(_wire(spark, sf_dir), out)
    _inject_garbage(out, ['{"event_id": broken', "not json at all"])
    # the overwrite above triggers CacheManager.recacheByPath for any
    # cache a PREVIOUS run of this query left on `out` (split_quarantine
    # caches) — recached BEFORE the garbage landed.  Invalidate so the
    # scan below re-lists the directory; without this, the second run in
    # one session reports 0 quarantined rows.
    spark.catalog.refreshByPath(out)

    clean, bad = split_quarantine(read_jsonl(spark, out, _EVENT_WIRE_SCHEMA))
    return _summarize(clean, bad)


@register("xio2_csv_roundtrip", _ORACLE)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as xio1 over the CSV sink/scan (header, explicit
    schema, PERMISSIVE quarantine) — proving the CSV writer/reader pair
    round-trips longs and doubles losslessly too."""
    from ..sources.text_formats import read_csv, split_quarantine, write_csv

    out = _scratch_dir("csv_rt", sf_dir) + "/events_csv"
    write_csv(_wire(spark, sf_dir), out)
    with open(os.path.join(out, "zz-malformed.csv"), "w") as fh:
        # first line is consumed as this file's header (header=true is
        # per-file); the two lines after it are the injected garbage
        fh.write(
            "event_id,ts_us,user_id,event_type,value\n"
            "one,two\n"
            "not_a_long,xx,yy,zz,0.0\n"
        )
    spark.catalog.refreshByPath(out)  # see xio1: drop any stale recache

    clean, bad = split_quarantine(read_csv(spark, out, _EVENT_WIRE_SCHEMA))
    return _summarize(clean, bad)
