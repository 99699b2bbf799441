"""CSV / JSON(L) source + sink wrappers (scan-format breadth beyond
parquet; reference op04's spreadsheet scan generalized to the text
formats a data-lake ingest actually meets).

Design rules for scale:
- **Always pass an explicit schema.**  Schema inference reads the data
  twice (a full extra pass at 100 TB) and can silently flip types
  between batches; the reference's ODS ingest had exactly this dynamic-
  typing hazard (month columns arriving as Timestamp or string,
  etl/etl_ida.py:351-359).
- **PERMISSIVE mode + _corrupt_record column** mirrors the reference's
  skip-and-log cell handling (etl/etl_ida.py:374-375): bad rows become
  audit rows, never job failures.
- CSV/JSON are splittable only when uncompressed (or bzip2); gzipped
  files serialize to one task each — convert to parquet at the ingest
  boundary (write_parquet_normalized) and query columnar from then on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan with explicit schema and quarantine column for malformed
    rows (PERMISSIVE).  Locale-tolerant numeric parsing (comma decimals,
    '%' suffixes — reference op21) stays a separate explicit transform:
    read as string, then functions/numparse.parse_locale_number."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Newline-delimited JSON scan (one object per line — the splittable
    layout; multiLine=true would make each FILE one record and one task).
    Malformed lines land in the quarantine column."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows) — the audit-trail split the
    reference keeps as stats['erros'] (etl/etl_ida.py:809-812).

    The parsed frame is cached: Spark refuses plans that read ONLY the
    internal corrupt-record column from a raw text scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the split reads the input
    twice anyway — cache once, serve both sides, unpersist after the
    ingest materializes."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV sink (interchange/export only — never the analytic store)."""
    df.write.mode("overwrite").option("header", header).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_parquet_normalized(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """The ingest-boundary conversion: text format → columnar store.
    Everything downstream (pushdown, pruning, statistics) depends on
    landing here before analytics run."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (Spark-native reader; columnar like parquet with its own
    stripe-level statistics — predicate pushdown and column pruning work
    the same way, and the format is splittable).  ORC matters for format
    breadth because Hive-era lakes hold petabytes of it; reading in place
    beats converting 100 TB first."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib default codec; stripe statistics written per file)."""
    df.write.mode(mode).orc(path)
