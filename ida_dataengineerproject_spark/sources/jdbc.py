"""JDBC source/sink wrappers (reference op06: the production sink IS
PostgreSQL — etl/etl_ida.py:461-554 writes batched INSERTs over psycopg2).

Spark's JDBC connector replaces the hand-rolled batching: ``batchsize``
maps to the reference's BATCH_SIZE=1000 (etl_ida.py:79) and
``numPartitions`` bounds the connection fan-out like the reference's
SimpleConnectionPool(1,5) (etl_ida.py:450-453).

No database is reachable in this container, so these helpers only build
the reader/writer (pure plan/driver objects — testable without a
connection); `.load()` / the returned writer's `.save()` are the live
calls a deployment makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession
from pyspark.sql.readwriter import DataFrameWriter

DEFAULT_BATCH_SIZE = 1000  # reference BATCH_SIZE, etl_ida.py:79
DEFAULT_NUM_PARTITIONS = 5  # reference pool max, etl_ida.py:450-453


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrameReader:
    """Partitioned JDBC read: with a numeric ``partition_column`` + bounds
    Spark issues one range-predicate query per partition (parallel scan
    instead of a single-connection pull)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    mode: str = "append",
    **options: str,
) -> DataFrameWriter:
    """Batched JDBC write — the reference's load path (op06) with Spark
    doing the batching/parallelism.  Coalesce to ``num_partitions`` so the
    database sees a bounded number of concurrent connections."""
    writer = (
        df.coalesce(num_partitions)
        .write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer
