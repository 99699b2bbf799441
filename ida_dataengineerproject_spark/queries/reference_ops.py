"""Reference-parity queries (SURVEY.md §2 op01-op42) on driver testdata.

Each query exercises one (or one tight cluster of) reference operators with a
DuckDB oracle twin.  Citations in each docstring point at the reference
implementation being reproduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.taxa_variacao import taxa_variacao, TAXA_VARIACAO_ORACLE_SQL
from ..registry import register


@register("flagship_taxa_variacao", TAXA_VARIACAO_ORACLE_SQL)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vw_taxa_variacao (schema_star.sql:108-164) role-mapped onto testdata.
    Covers op13/14/17/23/26-29/31-35/39-41 in one pipeline."""
    return taxa_variacao(spark, sf_dir)
