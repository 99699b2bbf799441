"""Calendar derivations (reference op24, etl/etl_ida.py:560-579 and
dim_tempo seeds schema_star.sql:198-235).

year / month / quarter are Spark built-ins; semester is arithmetic; pt-BR
month names come from a literal map (locale-independent, matching the
reference's hard-coded list rather than JVM locale formatting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MES_NOME_PT = [
    "Janeiro",
    "Fevereiro",
    "Março",
    "Abril",
    "Maio",
    "Junho",
    "Julho",
    "Agosto",
    "Setembro",
    "Outubro",
    "Novembro",
    "Dezembro",
]


def mes_nome(month_col: Column) -> Column:
    mapping = F.create_map(
        *[x for i, nome in enumerate(_MES_NOME_PT) for x in (F.lit(i + 1), F.lit(nome))]
    )
    return mapping[month_col]


def calendar_columns(df: DataFrame, date_col: str) -> DataFrame:
    """Attach ano/mes/mes_nome/trimestre/semestre derived from ``date_col``."""
    d = F.col(date_col)
    return (
        df.withColumn("ano", F.year(d))
        .withColumn("mes", F.month(d))
        .withColumn("mes_nome", mes_nome(F.month(d)))
        .withColumn("trimestre", F.quarter(d))
        .withColumn("semestre", ((F.month(d) - F.lit(1)) / F.lit(6)).cast("int") + F.lit(1))
    )
