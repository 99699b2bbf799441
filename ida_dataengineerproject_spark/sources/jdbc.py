"""JDBC source/sink wrappers (reference op06: the production sink IS
PostgreSQL — etl/etl_ida.py:461-554 writes batched INSERTs over psycopg2).

Spark's JDBC connector replaces the hand-rolled batching: ``batchsize``
maps to the reference's BATCH_SIZE=1000 (etl_ida.py:79) and
``numPartitions`` bounds the connection fan-out like the reference's
SimpleConnectionPool(1,5) (etl_ida.py:450-453).

No PostgreSQL server is reachable in this container, but the load path is
exercised LIVE against the embedded Derby engine that ships in Spark's
jars (tests/test_jdbc_builders.py: plain round-trip, staged MERGE upsert,
and the full star write-then-read-back with value parity); the
PostgreSQL-specific ``ON CONFLICT`` arm is pinned by SQL-generation tests.
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


def dialect_of(url: str) -> str:
    """JDBC dialect from the URL subprotocol: ``jdbc:postgresql:...`` →
    ``postgresql``; everything else takes the ANSI MERGE arm."""
    parts = url.split(":")
    if len(parts) >= 2 and parts[0] == "jdbc" and parts[1] == "postgresql":
        return "postgresql"
    return "ansi"


def upsert_statements(
    target_table: str,
    staging: str,
    cols: list[str],
    key_cols: list[str],
    update_on_match: bool = False,
    dialect: str = "ansi",
) -> list[str]:
    """The server-side set-based upsert as dialect SQL, pure function of
    the schema — testable without a live database.

    ``ansi``: one ``MERGE INTO`` (Derby 10.11+, PostgreSQL 15+, every
    warehouse dialect) — executed for real against embedded Derby in
    tests/test_jdbc_builders.py.
    ``postgresql``: the reference's native shape —
    ``INSERT ... SELECT ... ON CONFLICT (keys) DO NOTHING`` /
    ``DO UPDATE SET col = EXCLUDED.col`` (etl/etl_ida.py:534) — the
    statement a PostgreSQL deployment runs verbatim; no pg server exists
    in this container, so this arm is pinned by SQL-generation tests
    (COVERAGE.md records the live-round-trip gap).

    Spark's JDBC writer creates columns as quoted (case-sensitive)
    identifiers, so both dialects quote them too."""
    q = '"{}"'.format
    insert_cols = ", ".join(q(c) for c in cols)
    non_keys = [c for c in cols if c not in key_cols]
    if dialect == "postgresql":
        conflict_keys = ", ".join(q(k) for k in key_cols)
        stmt = (
            f"INSERT INTO {target_table} ({insert_cols}) "
            f"SELECT {insert_cols} FROM {staging} "
            f"ON CONFLICT ({conflict_keys}) "
        )
        if update_on_match and non_keys:
            sets = ", ".join(f"{q(c)} = EXCLUDED.{q(c)}" for c in non_keys)
            stmt += f"DO UPDATE SET {sets}"
        else:
            stmt += "DO NOTHING"
        return [stmt, f"DROP TABLE {staging}"]
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    insert_vals = ", ".join(f"s.{q(c)}" for c in cols)
    merge = f"MERGE INTO {target_table} t USING {staging} s ON {on} "
    if update_on_match and non_keys:
        sets = ", ".join(f"{q(c)} = s.{q(c)}" for c in non_keys)
        merge += f"WHEN MATCHED THEN UPDATE SET {sets} "
    merge += (
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) "
        f"VALUES ({insert_vals})"
    )
    return [merge, f"DROP TABLE {staging}"]


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
    dialect: str | None = None,
    **options: str,
) -> None:
    """Idempotent JDBC load — the reference's ``INSERT ... ON CONFLICT
    DO NOTHING`` (etl/etl_ida.py:534) as staging + server-side upsert.

    Scale shape: the batch lands in ``staging_table`` through the
    DISTRIBUTED batched writer (bounded connection fan-out), then ONE
    set-based statement (see :func:`upsert_statements` — ANSI MERGE, or
    PostgreSQL ``ON CONFLICT`` push-down when the URL says so) runs on a
    single driver-side connection — dedup happens in the database as one
    statement, no per-row driver traffic, and re-running the load inserts
    nothing (exactly the reference's conflict semantics).
    ``update_on_match=True`` upgrades to full upsert (the reference's
    dimension refresh shape)."""
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

    statements = upsert_statements(
        target_table,
        staging,
        df.columns,
        key_cols,
        update_on_match=update_on_match,
        dialect=dialect or dialect_of(url),
    )
    spark = df.sparkSession
    for stmt in statements:
        _execute_statements(spark, url, [stmt], driver)


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
