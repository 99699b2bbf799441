"""Window-frame, ranking, explode, and statistical-aggregate breadth.

Variance/correlation use the explicit moment formula over exact-decimal
sums (not the built-in Welford-style accumulators) so both engines compute
identical doubles — the same rationale as functions/aggs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.aggs import sum_exact
from ..registry import register
from ..sources.tables import table


@register(
    "window_moving_avg",
    """
    SELECT mes, receita,
           ROUND(AVG(receita) OVER (ORDER BY mes
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS ma4
    FROM (SELECT strftime(l_shipdate, '%Y-%m') AS mes,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS receita
          FROM lineitem GROUP BY 1)
    """,
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving frame (ROWS 3 PRECEDING): 4-month moving average of revenue.
    Window input is the pre-aggregated month grain (scale rule: aggregate
    before windowing)."""
    li = table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("mes")
    ).agg(sum_exact("l_extendedprice").alias("receita"))
    w = Window.orderBy("mes").rowsBetween(-3, 0)
    return monthly.select(
        "mes", "receita", F.round(F.avg("receita").over(w), 6).alias("ma4")
    )


@register(
    "window_ranking_functions",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(dense_rank() OVER w AS BIGINT) AS drank,
           ROUND(percent_rank() OVER w, 9) AS prank,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           first_value(c_custkey) OVER w AS seg_top
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / percent_rank / ntile / first_value over a partitioned
    ordered window with deterministic tie-break."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.round(F.percent_rank().over(w), 9).alias("prank"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("c_custkey").over(w).alias("seg_top"),
    )


@register(
    "array_explode_token_counts",
    """
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
          FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode + aggregate: corpus token frequencies, top 20 with
    deterministic tie-break — the generated-rows (UNNEST) path."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(20)
    )


@register(
    "agg_variance_corr_exact",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE)
                  - CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE)
                    * CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*))
                 / (COUNT(*) - 1), 6) AS var_qty,
           ROUND((CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
                  - CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE)
                    * CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*))
                 / (COUNT(*) - 1), 6) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance + covariance via explicit moment formula over
    exact-decimal sums — bit-identical across engines, unlike the built-in
    streaming accumulators (var_samp/covar_samp differ in the last ulps)."""
    li = table(spark, sf_dir, "lineitem")
    n = F.count("*")
    s_q = F.sum(F.col("l_quantity").cast("decimal(38,2)")).cast("double")
    s_qq = F.sum(
        (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(38,4)")
    ).cast("double")
    s_p = F.sum(F.col("l_extendedprice").cast("decimal(38,2)")).cast("double")
    s_qp = F.sum(
        (F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(38,4)")
    ).cast("double")
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round((s_qq - s_q * s_q / n) / (n - 1), 6).alias("var_qty"),
        F.round((s_qp - s_q * s_p / n) / (n - 1), 6).alias("covar_qty_price"),
    )


@register(
    "window_lead_nth_cume",
    """
    SELECT s_suppkey, s_nationkey,
           lead(s_acctbal) OVER w AS next_bal,
           nth_value(s_suppkey, 2) OVER (PARTITION BY s_nationkey
                                         ORDER BY s_acctbal DESC, s_suppkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS second_richest,
           ROUND(cume_dist() OVER w, 9) AS cd
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def q_lead_nth_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead / nth_value (full-frame) / cume_dist — the remaining window
    functions after lag/rank/ntile/first_value elsewhere.  nth_value uses
    an unbounded frame so every partition row sees the same 2nd-ranked
    supplier; deterministic tie order throughout."""
    s = table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.lead("s_acctbal").over(w).alias("next_bal"),
        F.nth_value("s_suppkey", 2).over(w_full).alias("second_richest"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    )
