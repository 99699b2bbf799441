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


def _execute_statements(
    spark: SparkSession, url: str, statements: list[str], driver: str | None
) -> None:
    """Run DDL/DML statements on ONE driver-side JDBC connection (py4j →
    java.sql.DriverManager).  This is control-plane only — a few
    statements per load, never per-row; the data itself flows through the
    distributed JDBC writer."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for sql in statements:
            st.executeUpdate(sql)
        st.close()
    finally:
        conn.close()


def jdbc_upsert(
    df: DataFrame,
    url: str,
    target_table: str,
    key_cols: list[str],
    staging_table: str | None = None,
    update_on_match: bool = False,
    batch_size: int = DEFAULT_BATCH_SIZE,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    driver: str | None = None,
    **options: str,
) -> None:
    """Idempotent JDBC load — the reference's ``INSERT ... ON CONFLICT
    DO NOTHING`` (etl/etl_ida.py:534) as staging + server-side MERGE.

    Scale shape: the batch lands in ``staging_table`` through the
    DISTRIBUTED batched writer (bounded connection fan-out), then ONE
    set-based ``MERGE INTO target USING staging ON keys WHEN NOT MATCHED
    THEN INSERT`` runs on a single driver-side connection — dedup happens
    in the database as one statement, no per-row driver traffic, and
    re-running the load inserts nothing (exactly the reference's conflict
    semantics).  ``update_on_match=True`` adds ``WHEN MATCHED THEN
    UPDATE`` for full upsert (the reference's dimension refresh shape).

    ANSI MERGE runs on Derby 10.11+, PostgreSQL 15+, and every warehouse
    dialect; on older PostgreSQL the same staging table feeds
    ``INSERT ... SELECT ... ON CONFLICT DO NOTHING`` instead.
    """
    staging = staging_table or f"{target_table}_staging"
    jdbc_writer(
        df,
        url,
        staging,
        batch_size=batch_size,
        num_partitions=num_partitions,
        mode="overwrite",
        **({"driver": driver} if driver else {}),
        **options,
    ).save()

    # Spark's JDBC writer creates columns as quoted (case-sensitive)
    # identifiers, so the MERGE must quote them too
    cols = df.columns
    q = '"{}"'.format
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    insert_cols = ", ".join(q(c) for c in cols)
    insert_vals = ", ".join(f"s.{q(c)}" for c in cols)
    merge = (
        f"MERGE INTO {target_table} t USING {staging} s ON {on} "
    )
    if update_on_match:
        sets = ", ".join(
            f"{q(c)} = s.{q(c)}" for c in cols if c not in key_cols
        )
        merge += f"WHEN MATCHED THEN UPDATE SET {sets} "
    merge += (
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) "
        f"VALUES ({insert_vals})"
    )
    spark = df.sparkSession
    _execute_statements(spark, url, [merge], driver)
    _execute_statements(spark, url, [f"DROP TABLE {staging}"], driver)


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
