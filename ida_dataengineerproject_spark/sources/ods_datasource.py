"""Spark 4 Python DataSource exposing the ODS reader as a first-class
format: ``spark.read.format("ods").load(dir_or_file)``.

The functional reader (sources/ods.py, binaryFile + mapInPandas) stays the
workhorse; this wrapper is the idiomatic Spark-4 integration surface — a
registered ``DataSource`` whose planner emits ONE InputPartition PER FILE
(file parallelism identical to the binaryFile path) and whose per-partition
``read`` parses that file with the same ``_file_to_long`` logic, yielding
Arrow batches.  Registering once per session makes the format available to
plain ``spark.read`` users and SQL (``CREATE TABLE ... USING ods`` where
catalogs allow), with schema fixed to LONG_SCHEMA so downstream plans are
stable.

Scale note: ``partitions()`` runs on the driver and only LISTS the
directory (no file contents); each executor task opens exactly its own
file.  Listing a million-file directory belongs in a manifest (see
sources/file_pruning.py) — the same consideration the binaryFile reader
has.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .ods import LONG_SCHEMA, _file_to_long


class OdsFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class OdsDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ods datasource requires a path: .load(<path>)")

    def partitions(self):
        p = self.path
        if os.path.isdir(p):
            files = sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.lower().endswith(".ods")
            )
        else:
            files = [p]
        return [OdsFilePartition(f) for f in files]

    def read(self, partition: OdsFilePartition):
        import pyarrow as pa

        with open(partition.path, "rb") as fh:
            data = fh.read()
        pdf = _file_to_long(partition.path, data)
        if len(pdf):
            yield from pa.Table.from_pandas(
                pdf, preserve_index=False
            ).to_batches()


class OdsDataSource(DataSource):
    """``format("ods")`` — one partition per file, LONG_SCHEMA rows."""

    @classmethod
    def name(cls) -> str:
        return "ods"

    def schema(self) -> str:
        return LONG_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return OdsDataSourceReader(self.options)


def register_ods_datasource(spark) -> None:
    """Idempotent session-level registration of the ods format."""
    spark.dataSource.register(OdsDataSource)
