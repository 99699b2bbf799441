"""Breadth queries beyond the reference surface (SURVEY.md §2.10 lists
these as absent from the reference): set operations, outer joins, grouping
sets / rollup, sampling, percentiles, range joins, scalar subqueries.
A user of a general engine expects them; each carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.aggs import sum_exact
from ..registry import register
from ..sources.tables import table


@register(
    "set_union_intersect_except",
    """
    SELECT 'only_orders' AS src, k FROM (
        SELECT o_custkey AS k FROM orders
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    UNION ALL
    SELECT 'both', k FROM (
        SELECT o_custkey AS k FROM orders
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT (distinct set semantics both engines)."""
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c_neg = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("k"))
    )
    only_orders = o.subtract(c_neg)  # EXCEPT (distinct)
    both = o.intersect(c_neg)  # INTERSECT (distinct)
    return only_orders.select(F.lit("only_orders").alias("src"), "k").unionByName(
        both.select(F.lit("both").alias("src"), "k")
    )


@register(
    "outer_join_full",
    """
    SELECT COALESCE(a.k, b.k) AS k, a.n_orders, b.n_neg_cust
    FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders
          FROM orders WHERE o_totalprice > 400000 GROUP BY 1) a
    FULL OUTER JOIN (SELECT c_custkey AS k, COUNT(*) AS n_neg_cust
                     FROM customer WHERE c_acctbal < -900 GROUP BY 1) b
      ON a.k = b.k
    """,
)
def q_fullouter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two sparse aggregates (null-padded both sides)."""
    a = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_orders"))
    )
    b = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < -900)
        .groupBy(F.col("c_custkey").alias("k"))
        .agg(F.count("*").alias("n_neg_cust"))
    )
    return (
        a.join(b, "k", "full_outer")
        .select("k", "n_orders", "n_neg_cust")
    )


@register(
    "rollup_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS revenue,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING markers (subtotal + grand-total rows).

    Pre-aggregate at the full (flag, status) grain FIRST, then ROLLUP the
    handful of partial sums: rolling up the raw fact runs every row
    through Expand×3 into wide-decimal accumulation (measured 3-4× the
    flat aggregate at sf0.1), while rolling up partials is free — decimal
    sums are associative, so values are bit-identical.  At 100 TB this is
    the only sane shape: Expand multiplies the shuffled volume by the
    grouping-set count."""
    li = table(spark, sf_dir, "lineitem")
    flat = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,2)")).alias("s")
    )
    return flat.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("s").cast("double").alias("revenue"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


@register(
    "cube_quantity",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all grouping-set combinations) — same partial-reaggregation
    shape as rollup_revenue: CUBE the 8-row flat aggregate, not the
    fact (Expand×4 over raw rows otherwise)."""
    li = table(spark, sf_dir, "lineitem")
    flat = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("s")
    )
    return flat.cube("l_returnflag", "l_linestatus").agg(
        F.sum("s").cast("double").alias("qty")
    )


@register(
    "grouping_sets_explicit",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-flag and
    per-status subtotals — Expand runs over the 8-row (flag, status)
    partial aggregate, not the fact (see rollup_revenue)."""
    li = table(spark, sf_dir, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("s")
    ).createOrReplaceTempView("li_flat")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(s) AS DOUBLE) AS qty
        FROM li_flat
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "range_join_price_bands",
    """
    SELECT b.band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
    FROM part p
    JOIN (VALUES ('low', 0.0, 930.0), ('mid', 930.0, 970.0),
                 ('high', 970.0, 1e9)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join against a literal band table: broadcast
    nested-loop on a 3-row side — the correct plan when one side is tiny;
    bucketize-then-equi-join is the alternative when both sides are big."""
    p = table(spark, sf_dir, "part")
    bands = p.sparkSession.createDataFrame(
        [("low", 0.0, 930.0), ("mid", 930.0, 970.0), ("high", 970.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            sum_exact("p_retailprice").alias("total_price"),
        )
    )


@register(
    "scalar_subquery_above_avg",
    """
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    GROUP BY c_mktsegment
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (decorrelated to a cross of one row).

    AVG comparison tolerates float-sum ordering here because it's only a
    threshold: values are not output.  (Boundary rows would need the exact
    pattern; none exist at these scales — asserted by the parity gate.)"""
    c = table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE)
                                  / COUNT(c_acctbal) FROM customer)
        GROUP BY c_mktsegment
        """
    )


@register(
    "exact_median_percentiles",
    """
    SELECT l_returnflag,
           ROUND(median(l_extendedprice), 4) AS med_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / continuous percentile per group, WITHOUT a
    per-group sort buffer.

    The naive form — ``percentile(col, array(0.5, 0.9))`` — buffers
    every value of a group inside one aggregation buffer on one task
    (VERDICT r5's last single-task scale cliff: an entire
    ``l_returnflag`` group ≫ executor memory at 100×).  Now on
    ranking.grouped_quantiles_band — the sketch-steered exact form:
    a percentile_approx band bounds each target's rank, one combined
    aggregate counts exact below-band mass and collects the bounded
    in-band values, final projection indexes the exact straddle ranks
    and interpolates (``quantile_cont`` semantics, identical to
    DuckDB's and to Spark's ``percentile``).  TWO scans, zero windows,
    zero data-side joins — the r9 bucketed two-level-rank form ran 4
    scans + an in-bucket window (measured: 3.14 → ~1.1 s at the x10
    replica; parity unchanged, the sketch only steers and the output
    ranks are exact)."""
    from ..operators.ranking import grouped_quantiles_band

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    return grouped_quantiles_band(
        li,
        "l_extendedprice",
        ["l_returnflag"],
        {"med_price": 0.5, "p90_price": 0.9},
    ).select(
        "l_returnflag",
        F.round("med_price", 4).alias("med_price"),
        F.round("p90_price", 4).alias("p90_price"),
    )


def approx_percentiles(
    spark: SparkSession, sf_dir: str, verify: bool = False
) -> DataFrame:
    """approx_percentile sketch — the constant-memory scale path for
    quantiles (exact percentile sorts each group).

    PRODUCTION path (``verify=False``, default): the sketch aggregate
    alone — mergeable partial sketches, no per-group sort, the only
    shape that survives 100 TB.
    VERIFY path (``verify=True``, registered oracle query only): joins
    the sketch back against the data to check its true rank and returns
    the exact median + ``approx_rank_ok`` = the approx answer's true
    rank sits within ±0.5% of the 0.5 quantile (tie-safe two-sided
    check; the sketch's guarantee at default accuracy=10000 is ±0.01%).
    """
    li = table(spark, sf_dir, "lineitem")
    ap = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median")
    )
    if not verify:
        return ap
    eps = 0.005
    return (
        li.join(F.broadcast(ap), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
                "exact_median"
            ),
            F.count("*").alias("n"),
            F.sum(
                (F.col("l_extendedprice") < F.col("approx_median")).cast("long")
            ).alias("n_below"),
            F.sum(
                (F.col("l_extendedprice") > F.col("approx_median")).cast("long")
            ).alias("n_above"),
        )
        .select(
            "l_returnflag",
            "exact_median",
            (
                (F.col("n_below") <= (0.5 + eps) * F.col("n"))
                & (F.col("n_above") <= (0.5 + eps) * F.col("n"))
            ).alias("approx_rank_ok"),
        )
    )


@register(
    "approx_percentiles",
    """
    SELECT l_returnflag,
           ROUND(median(l_extendedprice), 4) AS exact_median,
           TRUE AS approx_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle registration for ``approx_percentiles`` — VERIFY arm (exact
    median + rank check in-plan) so DuckDB can assert the bound;
    bench/production use the sketch-only ``verify=False`` path."""
    return approx_percentiles(spark, sf_dir, verify=True)


@register(
    "sample_fraction",
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                     || CAST(l_linenumber AS VARCHAR)), 1, 2) <= '02'
    """,
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sample (~3/256 ≈ 1.2%): keep rows whose key-md5
    falls in a fixed hex prefix range — the reproducible-sampling
    primitive a training pipeline needs (membership is stable across
    runs, engines and machines, unlike RNG-seeded Bernoulli whose
    sequence is engine-specific).  Scale: a map-side filter, no shuffle,
    no RNG state; md5 is identical everywhere, so the sample is
    bit-exactly reproducible in the oracle."""
    li = table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return li.filter(F.substring(F.md5(key), 1, 2) <= "02").select(
        "l_orderkey", "l_linenumber"
    )


@register(
    "sample_stratified",
    """
    SELECT lang, COUNT(*) AS n_sampled FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
          CASE lang WHEN 'en' THEN '7f' WHEN 'pt' THEN 'ff'
                    WHEN 'es' THEN '3f' ELSE '' END
    GROUP BY lang ORDER BY lang
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic hash sample: per-stratum hex-prefix
    thresholds on md5(doc_id) — the corpus-balancing primitive a training
    pipeline uses to re-weight sources/languages (en 128/256 = 50%,
    pt 256/256 = 100%, es 64/256 = 25%, everything else dropped).
    Membership is content-independent and stable across runs/engines;
    a map-side filter per row, no shuffle beyond the final aggregate."""
    d = table(spark, sf_dir, "documents")
    threshold = (
        F.when(F.col("lang") == "en", "7f")
        .when(F.col("lang") == "pt", "ff")
        .when(F.col("lang") == "es", "3f")
        .otherwise("")
    )
    return (
        d.filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= threshold)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("lang")
    )


@register(
    "x12_resample_gap_fill",
    """
    WITH b AS (
        SELECT date_trunc('month', min(o_orderdate)) AS lo,
               date_trunc('month', max(o_orderdate)) AS hi
        FROM orders),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m FROM b),
    rev AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
                 AS revenue
        FROM orders WHERE o_totalprice > 400000 GROUP BY 1)
    SELECT strftime(s.m, '%Y-%m') AS mes,
           r.revenue IS NULL AS was_gap,
           COALESCE(r.revenue,
                    last_value(r.revenue IGNORE NULLS) OVER (
                        ORDER BY s.m
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             AS revenue_filled
    FROM spine s LEFT JOIN rev r ON s.m = r.m
    ORDER BY mes
    """,
)
def q_x12_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: a generated monthly calendar spine left-
    joined to sparse monthly revenue, gaps forward-filled from the last
    observed month — the resample + ffill every metrics pipeline needs
    (missing months must EXIST as rows, carrying the last value, before
    window math is meaningful).

    Scale: the spine is sequence+explode from one min/max aggregate (a
    few hundred rows at any input scale — aggregate-before-window rule),
    the revenue side is a partial-aggregated groupBy; the ffill window
    orders the ~10^2 aggregated months, never raw rows."""
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("m")
    )
    rev = (
        o.filter(F.col("o_totalprice") > 400000)
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("m"))
        .agg(sum_exact("o_totalprice", scale=2).alias("revenue"))
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    return (
        spine.join(rev, "m", "left")
        .select(
            F.date_format("m", "yyyy-MM").alias("mes"),
            F.col("revenue").isNull().alias("was_gap"),
            F.coalesce(
                F.col("revenue"),
                F.last("revenue", ignorenulls=True).over(w),
            ).alias("revenue_filled"),
        )
        .orderBy("mes")
    )
