"""SQL-surface parity: the flagship pipeline expressed through
``spark.sql`` over registered views — Catalyst produces the same plan as
the DataFrame form (the reference's users write SQL against the view,
README.md:148-156, so the engine must expose this surface too)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.tables import register_views

_FLAGSHIP_SPARK_SQL = """
WITH base AS (
    SELECT date_format(o.o_orderdate, 'yyyy-MM') AS mes,
           l.l_returnflag AS grupo,
           l.l_extendedprice AS valor
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_linestatus = 'F'
),
agg AS (
    -- single (grupo, mes)-grain pass: the month grain is derived by
    -- re-aggregating these partials (sum of sums / sum of counts), so
    -- the base join+scan runs ONCE instead of once per grain (CTEs are
    -- inlined by Catalyst — two grains over `base` = two scans)
    SELECT grupo, mes,
           SUM(CAST(valor AS DECIMAL(38,2))) AS s,
           COUNT(valor) AS c
    FROM base GROUP BY grupo, mes
),
media_mensal AS (
    SELECT mes, CAST(SUM(s) AS DOUBLE) / SUM(c) AS valor_medio
    FROM agg GROUP BY mes
),
media_calc AS (
    SELECT mes,
           ROUND((valor_medio - prev) / NULLIF(prev, 0) * 100, 2) AS taxa_variacao_media
    FROM (SELECT mes, valor_medio,
                 LAG(valor_medio) OVER (ORDER BY mes) AS prev
          FROM media_mensal)
    WHERE prev IS NOT NULL
),
grupo_mensal AS (
    SELECT grupo, mes, CAST(s AS DOUBLE) / c AS valor_grupo
    FROM agg
),
grupo_calc AS (
    SELECT grupo, mes,
           ROUND((valor_grupo - prev) / NULLIF(prev, 0) * 100, 2) AS variacao
    FROM (SELECT grupo, mes, valor_grupo,
                 LAG(valor_grupo) OVER (PARTITION BY grupo ORDER BY mes) AS prev
          FROM grupo_mensal)
    WHERE prev IS NOT NULL
)
SELECT g.mes,
       m.taxa_variacao_media,
       MAX(CASE WHEN g.grupo = 'A'
           THEN ROUND(g.variacao - m.taxa_variacao_media, 2) END) AS grp_a,
       MAX(CASE WHEN g.grupo = 'N'
           THEN ROUND(g.variacao - m.taxa_variacao_media, 2) END) AS grp_n,
       MAX(CASE WHEN g.grupo = 'R'
           THEN ROUND(g.variacao - m.taxa_variacao_media, 2) END) AS grp_r
FROM grupo_calc g JOIN media_calc m USING (mes)
GROUP BY g.mes, m.taxa_variacao_media
ORDER BY g.mes
"""


@register(
    "flagship_taxa_variacao_sql",
    # the DuckDB oracle is the same SQL modulo the date-format function
    _FLAGSHIP_SPARK_SQL.replace(
        "date_format(o.o_orderdate, 'yyyy-MM')", "strftime(o.o_orderdate, '%Y-%m')"
    ),
)
def q_flagship_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vw_taxa_variacao via the SQL API (views + spark.sql): identical
    semantics and near-identical plan to the DataFrame form —
    schema_star.sql:108-164 is valid almost verbatim."""
    register_views(spark, sf_dir)
    return spark.sql(_FLAGSHIP_SPARK_SQL)
