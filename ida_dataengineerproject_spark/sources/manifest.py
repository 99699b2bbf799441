"""Resource-catalog handling (reference op01/op02/op03).

The reference GETs the dados.gov.br dataset API and filters resources by
service × year (/root/reference/etl/etl_ida.py:653-712).  Network I/O stays
driver-side (it is control-plane, not data-plane); the manifest itself
becomes a DataFrame so resource filtering is a relational op and a huge
manifest (millions of files at 100 TB) distributes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SERVICES = ("SMP", "STFC", "SCM")  # etl_ida.py:656-657
YEARS = (2017, 2018, 2019)


@dataclass(frozen=True)
class Resource:
    """A catalog entry (the reference's RecursoIDA, etl_ida.py:92-101)."""

    titulo: str
    url: str
    formato: str


def fetch_catalog_stub(dataset_id: str) -> list[Resource]:
    """Driver-side catalog fetch.  The real implementation GETs
    ``{API}/conjuntos-dados/{dataset_id}`` (etl_ida.py:653-657, 672-682);
    network access is out of scope here, so tests inject fixtures."""
    raise NotImplementedError(
        "network catalog fetch is environment-specific; inject a manifest"
    )


def manifest_df(spark: SparkSession, resources: list[Resource]) -> DataFrame:
    return spark.createDataFrame(
        [(r.titulo, r.url, r.formato) for r in resources],
        "titulo string, url string, formato string",
    )


def filter_resources(
    manifest: DataFrame,
    services: tuple[str, ...] = SERVICES,
    years: tuple[int, ...] = YEARS,
) -> DataFrame:
    """op02 (etl_ida.py:684-712): keep resources whose title names a target
    service and year; attach both as columns.  Pure relational filter —
    rlike + literal arrays, pushdown-friendly."""
    svc = F.coalesce(
        *[F.when(F.upper("titulo").rlike(rf"\b{s}\b"), F.lit(s)) for s in services]
    )
    yr = F.coalesce(
        *[F.when(F.col("titulo").rlike(str(y)), F.lit(y)) for y in years]
    )
    return (
        manifest.withColumn("servico", svc)
        .withColumn("ano", yr)
        .filter(F.col("servico").isNotNull() & F.col("ano").isNotNull())
        .filter(F.lower("formato").isin("ods", "csv", "parquet"))
    )
