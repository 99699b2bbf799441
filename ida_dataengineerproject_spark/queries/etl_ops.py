"""The ETL transform chain under the oracle gate.

plans/etl.transform_wide (ffill op15 → unpivot op16 → invalid-cell filter
op12 → locale parse op21 → recode op19/20 → clean op18) is exercised by
golden fixtures in tests; this query additionally puts it under the
driver's DuckDB gate by building a deterministic wide sheet from `nation`
(merged-cell nulls every 3rd row, comma decimals, '-' invalid cells) and
letting DuckDB reproduce the whole chain — including the order-dependent
forward-fill via last_value IGNORE NULLS."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.etl import transform_wide
from ..registry import register
from ..sources.tables import table


@register(
    "etl_transform_wide_chain",
    """
    WITH wide AS (
        SELECT n_nationkey AS linha_origem,
               CASE WHEN n_nationkey % 3 = 0 THEN n_name END AS grupo_raw,
               CONCAT(CAST(n_nationkey AS VARCHAR), ',5') AS m1,
               CASE WHEN n_nationkey % 5 = 0 THEN '-'
                    ELSE CAST(n_regionkey AS VARCHAR) END AS m2
        FROM nation),
    filled AS (
        SELECT linha_origem,
               last_value(grupo_raw IGNORE NULLS)
                   OVER (ORDER BY linha_origem
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS grupo,
               m1, m2
        FROM wide),
    long AS (
        SELECT linha_origem, grupo, '2017-01' AS mes, m1 AS raw FROM filled
        UNION ALL
        SELECT linha_origem, grupo, '2017-02', m2 FROM filled)
    SELECT mes,
           grupo AS grupo_economico,
           'SMP' AS servico,
           'TAXA_RESP_5DIAS' AS variavel,
           TRY_CAST(REPLACE(REPLACE(TRIM(raw), ',', '.'), '%', '') AS DOUBLE) AS valor,
           CAST(linha_origem AS INTEGER) AS linha_origem
    FROM long
    WHERE TRIM(raw) NOT IN ('-', '', 'nan')
      AND TRY_CAST(REPLACE(REPLACE(TRIM(raw), ',', '.'), '%', '') AS DOUBLE)
          IS NOT NULL
    """,
)
def q_etl_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    wide = n.select(
        F.col("n_nationkey").cast("int").alias("linha_origem"),
        F.when(F.col("n_nationkey") % 3 == 0, F.col("n_name")).alias(
            "GRUPO_ECONOMICO"
        ),
        F.lit("Taxa de Respondidas em 5 dias Úteis").alias("VARIAVEL"),
        F.concat(F.col("n_nationkey").cast("string"), F.lit(",5")).alias("2017-01"),
        F.when(F.col("n_nationkey") % 5 == 0, F.lit("-"))
        .otherwise(F.col("n_regionkey").cast("string"))
        .alias("2017-02"),
        F.lit("SMP").alias("SERVICO"),
        F.lit("NATION.ods").alias("ARQUIVO_ORIGEM"),
    )
    rec = transform_wide(wide)
    return rec.select(
        F.date_format("ano_mes", "yyyy-MM").alias("mes"),
        "grupo_economico",
        "servico",
        "variavel",
        "valor",
        "linha_origem",
    )
