"""Flagship analytical pipeline — the reference's ONE query,
``ida.vw_taxa_variacao`` (/root/reference/schema_star.sql:108-164; documented
as the product in README.md:145-156).

Semantics reproduced stage-by-stage (SURVEY.md §3.3):
1. media_mensal  — fact ⋈ dims, variable filter, AVG by month, LAG over global
   month order (schema_star.sql:109-119).
2. media_calc    — pct-change ((cur-prev)/NULLIF(prev,0))*100, ROUND 2, drop
   first month (:120-126).
3. grupo_mensal / grupo_calc — same per group, LAG partitioned (:127-147).
4. final         — inner join USING(mes), pivot to fixed group columns,
   delta = ROUND(group_variation - market_variation, 2) (:148-164).

Applied to driver testdata by role-mapping (FIXTURES.md §3.1):
fact = lineitem ⋈ orders, month = o_orderdate, group = l_returnflag,
variable filter = l_linestatus = 'F', measure = l_extendedprice.

Scale design:
- The join is fact⋈fact (lineitem⋈orders on orderkey) — at 100 TB both sides
  shuffle on l_orderkey once; AQE handles skew.  Aggregation reduces to
  (#months × #groups) rows BEFORE any window, so the global-order LAG
  (a single-partition window — the classic hazard) only ever sees ~10²-10³
  aggregated rows regardless of input scale (SURVEY.md §7.4.2).
- Month grain is a string 'yyyy-MM': lexicographic == chronological, so LAG
  ordering is safe on both engines (schema_star.sql:113).
- AVG uses exact-decimal SUM/COUNT so the DuckDB oracle matches bit-exact
  (functions/aggs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import table

# l_returnflag plays the reference's 10 hard-coded operator groups
# (schema_star.sql:151-160): explicit pivot list, deterministic columns.
GROUPS = ["A", "N", "R"]


def _pct_change(cur, prev):
    """((cur - prev) / NULLIF(prev, 0)) * 100, rounded to 2
    (schema_star.sql:123,144: op26/op27/op28)."""
    return F.round((cur - prev) / F.nullif(prev, F.lit(0.0)) * 100, 2)


def taxa_variacao(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")

    base = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_linestatus") == "F")  # op13 variable filter
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("mes"),  # op23
            F.col("l_returnflag").alias("grupo"),
            F.col("l_extendedprice").alias("valor"),
        )
    )

    # ONE aggregation at the finest shared grain (grupo, mes): decimal sum
    # + count partials.  The market mean per month is derived by re-summing
    # the group partials — decimal addition is associative, so the result
    # is bit-identical to aggregating the base rows directly, and the
    # expensive fact⋈fact join + scan runs ONCE instead of once per grain
    # (same single-scan rewrite the SQL-API twin got in round 3).
    sums = base.groupBy("grupo", "mes").agg(
        F.sum(F.col("valor").cast("decimal(38,2)")).alias("s"),
        F.count("valor").alias("c"),
    ).persist()
    # ^ persist the shared grain: without the cache boundary Catalyst
    # collapses the media branch's re-aggregation into a direct
    # groupBy(mes) over the join, the two branches' partial aggregates
    # stop canonicalizing equal, and the fact⋈fact join runs TWICE (one
    # scan per grain).  The cached relation is #groups × #months rows —
    # bounded and scale-independent — so this is a diamond-reuse cache,
    # not a data cache; both grains read it and lineitem is scanned once
    # (pinned by test_flagship_single_fact_scan).

    # stage 1-2: market mean per month → LAG → pct-change (op33, op39, op26-28)
    prev_m = F.lag("valor_medio").over(Window.orderBy("mes"))
    media = (
        sums.groupBy("mes")
        .agg((F.sum("s").cast("double") / F.sum("c")).alias("valor_medio"))
        .select("mes", "valor_medio", prev_m.alias("prev"))
        .filter(F.col("prev").isNotNull())  # op14
        .select(
            "mes",
            _pct_change(F.col("valor_medio"), F.col("prev")).alias(
                "taxa_variacao_media"
            ),
        )
    )

    # stage 3-4: per-group mean → partitioned LAG → pct-change (op34, op40)
    prev_g = F.lag("valor_grupo").over(Window.partitionBy("grupo").orderBy("mes"))
    grupo = (
        sums.select(
            "grupo", "mes", (F.col("s").cast("double") / F.col("c")).alias("valor_grupo")
        )
        .select("grupo", "mes", "valor_grupo", prev_g.alias("prev"))
        .filter(F.col("prev").isNotNull())
        .select(
            "grupo",
            "mes",
            _pct_change(F.col("valor_grupo"), F.col("prev")).alias("variacao"),
        )
    )

    # stage 5: join USING(mes) (op32), delta vs market, pivot via explicit
    # max(CASE) aggregates (op17/op35 — same rewrite Catalyst applies to
    # .pivot(values), minus the extra aggregate pair the pivot API adds),
    # global sort (op41)
    delta = F.round(F.col("variacao") - F.col("taxa_variacao_media"), 2)
    return (
        grupo.join(media, "mes")  # inner: months missing either side drop
        .groupBy("mes", "taxa_variacao_media")
        .agg(
            *[
                F.max(F.when(F.col("grupo") == g, delta)).alias(
                    f"grp_{g.lower()}"
                )
                for g in GROUPS
            ]
        )
        .orderBy("mes")
    )


# DuckDB twin of the pipeline above — identical arithmetic, identical
# aliases, exact-decimal AVG, so values hash-match bit-exact.
TAXA_VARIACAO_ORACLE_SQL = """
WITH base AS (
    SELECT strftime(o.o_orderdate, '%Y-%m') AS mes,
           l.l_returnflag AS grupo,
           l.l_extendedprice AS valor
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_linestatus = 'F'
),
media_mensal AS (
    SELECT mes,
           CAST(SUM(CAST(valor AS DECIMAL(38,2))) AS DOUBLE) / COUNT(valor) AS valor_medio
    FROM base GROUP BY mes
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
    SELECT grupo, mes,
           CAST(SUM(CAST(valor AS DECIMAL(38,2))) AS DOUBLE) / COUNT(valor) AS valor_grupo
    FROM base GROUP BY grupo, mes
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
