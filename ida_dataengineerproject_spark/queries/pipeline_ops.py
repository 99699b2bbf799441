"""Registry entries for the composed pipeline + two more TPC-H shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.aggs import cents, sum_exact
from ..plans.datapipeline import prepare_documents
from ..registry import ORACLES, register
from ..sources.tables import table


def _pipeline_oracle_sql() -> str:
    """Exact CTE replica of every pipeline stage.  The LSH stage is
    oracle-expressible because its verified output equals the exact
    Jaccard>=0.5 pair set whenever LSH recall is 1, which holds
    deterministically on this corpus (every true pair sits at j>=0.9
    where P(miss) = (1-0.9^3)^10 ~ 2e-6 with a fixed hash family — same
    argument as the x02b oracle).  Shingle lists are hashed to int64 in
    the oracle only (len(intersect) is invariant under an injective map),
    which makes the O(n^2) verify join ~3x faster in DuckDB."""
    from .dedup_ops import _SHINGLES, _TOKS
    from .text_ops import _marker_count_sql

    quality = f"""ROUND((
        (CASE WHEN length(text) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END)
        + (CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS}))
        + least((CAST(len(list_filter({_TOKS},
               t -> list_contains(['the','a','of','and','to','in','is','that'],
                                  lower(t)))) AS DOUBLE)
                 / len({_TOKS})) * 5, 1.0)
      ) / 3.0, 6)"""
    return f"""
    WITH marked AS (
      SELECT doc_id, lang, text,
             {quality} AS quality,
             {_marker_count_sql('en')} AS c_en,
             {_marker_count_sql('es')} AS c_es,
             {_marker_count_sql('fr')} AS c_fr,
             {_marker_count_sql('de')} AS c_de,
             {_marker_count_sql('pt')} AS c_pt
      FROM documents),
    langed AS (
      SELECT *, greatest(c_en, c_es, c_fr, c_de, c_pt) AS m FROM marked),
    kept AS (
      SELECT doc_id, lang, text, quality,
             CASE WHEN m = 0 THEN 'und' WHEN c_en = m THEN 'en'
                  WHEN c_es = m THEN 'es' WHEN c_fr = m THEN 'fr'
                  WHEN c_de = m THEN 'de' ELSE 'pt' END AS lang_pred
      FROM langed
      WHERE quality >= 0.4),
    gated AS (
      SELECT * FROM kept WHERE lang_pred IN ('en', 'und')),
    hashed AS (
      SELECT *, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
               AS fingerprint
      FROM gated),
    dedup AS (
      SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn,
             count(*) OVER (PARTITION BY fingerprint) AS n_dups
      FROM hashed),
    surv AS (SELECT * FROM dedup WHERE rn = 1),
    sh AS MATERIALIZED (
      SELECT doc_id, list_sort(list_transform({_SHINGLES}, s -> hash(s))) AS sh
      FROM surv WHERE len({_TOKS}) >= 3),
    drops AS (
      SELECT DISTINCT b.doc_id AS doc_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.5)
    SELECT doc_id, lang, lang_pred, quality,
           CAST(len({_TOKS}) AS INTEGER) AS n_tok,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_ish,
           fingerprint, n_dups
    FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM drops)
    """


@register("pipeline_prepare_documents", _pipeline_oracle_sql())
def q_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full training-data prep pipeline: quality gate → lang filter →
    exact dedup → MinHash-LSH near-dup removal → stats projection.
    Exact row-level oracle (see _pipeline_oracle_sql); plan invariants
    additionally asserted in tests/test_datapipeline.py."""
    return prepare_documents(spark, sf_dir)


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate — every predicate reaches
    the parquet scan (PushedFilters), result is one row."""
    li = table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    # exact 1e-4-dollar units in a long buffer (aggs.py r9): bit-exact
    # twin of the DECIMAL(38,6) sum for these 2-decimal inputs
    units = cents("l_extendedprice") * cents("l_discount")
    return f.agg(
        (F.sum(units).cast("double") / 10_000).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "tpch_q12_shipmode_priority",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional counting (CASE inside SUM) +
    a non-equi residual predicate on the join output.

    The broadcast build side is SLIMMED before the join: the priority
    string folds to a boolean and ``o_orderdate + 90 days`` evaluates
    once per ORDER (1.5 M rows at the x10 replica) instead of once per
    joined LINEITEM row (6 M) — and the broadcast ships 9 bytes/row
    instead of a 10-char string + date.  Interleaved A/B at x10:
    1.34 → 1.00 s (shuffle-hash arm measured 1.80 s — broadcast is
    right while the build side fits; at 100 TB the size-based
    threshold flips it to sort-merge automatically)."""
    return _q12_from_tables(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    )


@register("tpch_q12_bucketed", ORACLES["tpch_q12_shipmode_priority"])
def q12_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 over the canonical bucketed-at-rest facts (same oracle as
    tpch_q12_shipmode_priority): the orderkey join — the plain arm's
    only shuffle/broadcast — runs exchange-free off the bucketed scans
    (sources/bucketed.bucketed_fact pins shuffle_hash, so the slimmed
    15 M-row orders side is never broadcast-built at scale either);
    only the 3-row returnflag aggregate remains.  Member of the
    bucketed family; production path via queries/production.py."""
    from ..sources.bucketed import bucketed_fact

    return _q12_from_tables(
        bucketed_fact(spark, sf_dir, "lineitem"),
        bucketed_fact(spark, sf_dir, "orders"),
    )


def _q12_from_tables(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    o = orders
    li = lineitem
    hot = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ob = o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("__cut"),
        hot.alias("__hot"),
    )
    return (
        li.select("l_orderkey", "l_shipdate", "l_returnflag")
        .join(ob, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") < F.col("__cut"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("__hot"), 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~F.col("__hot"), 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
