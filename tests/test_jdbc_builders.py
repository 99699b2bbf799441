"""JDBC builder plumbing (no live database in the container — the
builders are plan-level objects; .load()/.save() are the live calls)."""

from __future__ import annotations

from .conftest import SF_SMOKE


def test_jdbc_writer_builds_without_connection(spark):
    from ida_dataengineerproject_spark.sources.jdbc import jdbc_writer
    from ida_dataengineerproject_spark.sources.tables import table

    df = table(spark, SF_SMOKE, "nation")
    w = jdbc_writer(
        df,
        url="jdbc:postgresql://db:5432/idadatamart",
        table="ida.fact_ida",
        batch_size=1000,
    )
    assert w is not None  # builder constructed; .save() is the live call


def test_jdbc_reader_builds_partitioned(spark):
    from ida_dataengineerproject_spark.sources.jdbc import jdbc_reader

    r = jdbc_reader(
        spark,
        url="jdbc:postgresql://db:5432/idadatamart",
        table="ida.fact_ida",
        partition_column="fato_key",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=5,
    )
    assert r is not None
