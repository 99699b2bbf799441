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


def test_jdbc_roundtrip_embedded_derby(spark):
    """Live JDBC round-trip against the embedded Derby engine that ships
    in Spark's jars: write nation through jdbc_writer, read it back
    partitioned through jdbc_reader, compare contents — the load path is
    exercised end-to-end, not just builder plumbing."""
    from pyspark.sql import functions as F

    from ida_dataengineerproject_spark.sources.jdbc import jdbc_reader, jdbc_writer
    from ida_dataengineerproject_spark.sources.tables import table

    url = "jdbc:derby:memory:jdbc_rt;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    df = table(spark, SF_SMOKE, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )

    jdbc_writer(
        df, url=url, table="nation_rt", batch_size=10, num_partitions=2,
        mode="overwrite", driver=driver,
    ).save()

    back = jdbc_reader(
        spark, url=url, table="nation_rt",
        partition_column="n_nationkey", lower_bound=0, upper_bound=25,
        num_partitions=4, driver=driver,
    ).load()

    assert back.count() == df.count()
    assert back.rdd.getNumPartitions() == 4  # partitioned range scan
    diff = df.exceptAll(back.select("n_nationkey", "n_name", "n_regionkey"))
    assert diff.count() == 0
