"""TPC-H-style star joins & aggregations on testdata (SURVEY.md §2.11 x10).

These supply the join/aggregation coverage the reference exercises through
PostgreSQL (schema_star.sql:108-164) at benchmark-standard shapes.  Scale
notes per query in docstrings; every aggregate uses the exact-decimal
pattern for oracle fidelity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.aggs import (
    avg_exact,
    avg_exact_2dp,
    sum_charge_exact,
    sum_disc_price_exact,
    sum_exact,
    sum_exact_2dp,
)
from ..registry import ORACLES, register
from ..sources.bucketed import bucketed_fact
from ..sources.tables import table


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(38,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: single scan, filter pushed to parquet,
    partial+final hash aggregate to 6 rows — zero shuffle pressure at any
    scale (group cardinality is constant)."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # integer-units fast path (aggs.py r9): bit-exact twins of
            # the decimal forms for these exact-2-decimal columns; the
            # decimal buffers were ~half the q1 aggregate cost at x10
            sum_exact_2dp("l_quantity").alias("sum_qty"),
            sum_exact_2dp("l_extendedprice").alias("sum_base_price"),
            sum_disc_price_exact("l_extendedprice", "l_discount").alias(
                "sum_disc_price"
            ),
            sum_charge_exact("l_extendedprice", "l_discount", "l_tax").alias(
                "sum_charge"
            ),
            avg_exact_2dp("l_quantity").alias("avg_qty"),
            avg_exact_2dp("l_extendedprice").alias("avg_price"),
            avg_exact_2dp("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 via TakeOrderedAndProject (heap per partition, no
    global sort materialization).

    Plan choice (r10, the q5/q7 recipe): the BUILDING predicate reaches
    orders only through customer, and without CBO stats Catalyst keeps
    the dim join ABOVE the fact-fact join — the r9 form shuffled the
    full lineitem⋈orders pair (35 M × 14.5 M at x100; the date filter
    keeps ~97% of orders) and only then dropped ~80% at the broadcast
    customer.  Here orders broadcast-joins the BUILDING-only customer
    side FIRST, so the fact-fact exchange carries a ~5× smaller orders
    side (~3 M rows, 3 pruned columns).  The aggregate keys lead with
    the join key, so the grain aggregate reuses the join partitioning —
    no extra exchange (pinned by the plan staying at one exchange per
    fact side + the final sort's)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return _q3_from_tables(li, o, c)


_Q3_ORACLE = ORACLES["tpch_q3_shipping_priority"]


@register("tpch_q3_bucketed", _Q3_ORACLE)
def q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 over bucketed-at-rest fact tables (same oracle as
    tpch_q3_shipping_priority): lineitem and orders live as catalog
    bucketed tables on their orderkeys (sources/bucketed.py), so the
    fact-fact join — the whole residual cost of the plain arm's x100
    profile (join 4.5 s of 4.4 s wall beyond the two 0.6 s scans) —
    runs Exchange-free straight off the bucketed scans.  Second
    demonstrator of the flagship's storage posture: any orderkey-keyed
    TPC-H query gets the same deletion from the same two tables at
    rest.  One-time bucketed write memoized per process; a real
    warehouse pays it at ingest."""
    li_b = bucketed_fact(spark, sf_dir, "lineitem")
    o_b = bucketed_fact(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return _q3_from_tables(li_b, o_b, c)


def _q3_from_tables(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame
) -> DataFrame:
    c = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    o = orders.filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue = sum_disc_price_exact("l_extendedprice", "l_discount")
    return (
        li.join(oc, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_region_revenue",
    """
    SELECT n.n_name AS nacao,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nacao
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume.

    Plan choice (r9): the ASIA predicate reaches lineitem only through
    supplier and orders only through customer, and Catalyst won't reorder
    the fact-fact join below those dim joins without CBO stats — the
    earlier form shuffled the FULL lineitem⋈orders join first and then
    dropped ~80% of rows at the broadcast dims.  Here the region filter
    is applied on BOTH entry paths before the facts meet: lineitem
    broadcast-joins the ASIA-only (supplier ⋈ nation ⋈ region) side,
    orders broadcast-joins the ASIA-only customer side, and the one
    fact-fact shuffle carries the ~1/5 survivors of each.  The x100 wall
    is scan-bound and unchanged (4.6 → 4.8 s — the 60 M-row lineitem
    scan+probe dominates either way), but the exchange payload drops
    ~5× on each side, which is the term that matters on a real cluster
    where shuffle crosses the network.  The c_nationkey = s_nationkey
    local-supplier equality runs as the residual condition on the joined
    set, exactly as in the oracle."""
    return _q5_from_tables(
        spark,
        sf_dir,
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
    )


@register("tpch_q5_bucketed", ORACLES["tpch_q5_region_revenue"])
def q5_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 over the canonical bucketed-at-rest facts (same oracle as
    tpch_q5_region_revenue): after the r9 restructure every dim join is
    a broadcast on BOTH entry paths, so the sole remaining exchange pair
    is the lineitem⋈orders join on the orderkey — the facts' at-rest
    bucket key.  Broadcast joins preserve the streamed side's
    partitioning, so the ASIA-supplier join on lineitem and the
    ASIA-customer join on orders both carry the bucketed distribution
    through to the fact join, which then runs Exchange-free straight
    off the scans; the only shuffle left is the 5-row nation aggregate.
    Member of the bucketed family (VERDICT r11 #1); production path via
    queries/production.py."""
    return _q5_from_tables(
        spark,
        sf_dir,
        bucketed_fact(spark, sf_dir, "lineitem"),
        bucketed_fact(spark, sf_dir, "orders"),
        rehint_fact_join=True,
    )


def _q5_from_tables(
    spark: SparkSession,
    sf_dir: str,
    lineitem: DataFrame,
    orders: DataFrame,
    rehint_fact_join: bool = False,
) -> DataFrame:
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    n_asia = (
        table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    s2 = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n_asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    c2 = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(n_asia.select(F.col("n_nationkey").alias("cn_key"))),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey", "c_nationkey")
    )
    # bucketed arm: re-hint after the dim joins — a join-strategy hint
    # binds to the FIRST join above the hinted node, so bucketed_fact's
    # scan-level shuffle_hash is consumed by the broadcast dim join
    # (where the broadcast hint wins) and the fact join would fall back
    # to SMJ — still exchange-free off the buckets, but re-sorting every
    # bucket (Spark 4 drops bucket-file sort order; A/B in bucketed.py)
    li2 = li.join(F.broadcast(s2), li.l_suppkey == s2.s_suppkey)
    if rehint_fact_join:
        li2 = li2.hint("shuffle_hash")
    o2 = o.join(F.broadcast(c2), o.o_custkey == c2.c_custkey)
    revenue = sum_disc_price_exact("l_extendedprice", "l_discount")
    return (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nacao"))
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nacao"))
    )


@register(
    "tpch_q18_large_orders",
    """
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 150)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers — aggregate-once form: the HAVING
    subquery's per-order quantity sum IS the output's total_qty (the final
    GROUP BY is keyed by o_orderkey; the other keys are functionally
    dependent), so the aggregate is carried through the join instead of
    re-scanning lineitem.  ONE lineitem scan + one shuffle; the filtered
    per-order rows are few, so AQE broadcasts them against orders.

    The per-order sum aggregates LONG, not DECIMAL(38,2): l_quantity is
    integer-valued (1–50 in this data; the parity gate asserts equality
    with the decimal-summing oracle), so the long sum is exact and
    order-independent, and the long aggregation buffer measured
    1.51 → 0.87 s on the x10 agg (decimal-128 buffer updates are the
    cost).  The final cast to double is exact for any integer < 2^53."""
    return _q18_from_tables(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
    )


@register("tpch_q18_bucketed", ORACLES["tpch_q18_large_orders"])
def q18_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 over the canonical bucketed-at-rest facts (same oracle as
    tpch_q18_large_orders): the per-order quantity aggregate AND the
    orders join both key the facts' at-rest bucket key — the q21 shape
    exactly — so the aggregate runs partition-local and the join
    consumes the scans with no Exchange; the only shuffle left is the
    20-row TakeOrdered merge.  Sixth member of the bucketed family;
    production path via queries/production.py."""
    from ..sources.bucketed import bucketed_fact

    return _q18_from_tables(
        bucketed_fact(spark, sf_dir, "lineitem"),
        bucketed_fact(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
    )


def _q18_from_tables(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame
) -> DataFrame:
    c = customer
    o = orders
    li = lineitem
    big = (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q") > 150)
    )
    return (
        o.join(big, "o_orderkey")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("q").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )
