"""xq20 — FIFO supply allocation (round 6).

The classic warehouse matching problem: demand lines consume a per-key
supply budget in arrival order; each line is filled, partially filled,
or stocked out depending on where its cumulative-demand interval falls
against the budget.  SQL-wise this is a prefix sum + clamp — the same
windowed-prefix shape as xq5's sweep line — and the scale contract is
that the window partitions by part (high-cardinality key), never
globally.

Supply here is the synthesized partsupp availability folded to %1000 so
all three outcomes occur at every SF (raw availability sums dwarf toy
demand; the fold is deterministic and oracle-mirrored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table
from .tpch_partsupp import _PS_SQL, synth_partsupp


@register(
    "xq20_fifo_allocation",
    f"""
    {_PS_SQL},
    sup AS (
        SELECT ps_partkey, SUM(ps_availqty) % 1000 AS supply
        FROM partsupp GROUP BY ps_partkey),
    d AS (
        SELECT l.l_partkey, p.p_brand,
               CAST(l.l_quantity AS BIGINT) AS qty,
               SUM(CAST(l.l_quantity AS BIGINT)) OVER (
                   PARTITION BY l.l_partkey
                   ORDER BY l.l_shipdate, l.l_orderkey, l.l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS prefix
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    a AS (
        SELECT p_brand, qty,
               GREATEST(CAST(0 AS BIGINT),
                   LEAST(qty, sup.supply - (prefix - qty))) AS filled
        FROM d JOIN sup ON sup.ps_partkey = d.l_partkey)
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(*) FILTER (WHERE filled = qty) AS BIGINT) AS n_filled,
           CAST(COUNT(*) FILTER (WHERE filled > 0 AND filled < qty)
                AS BIGINT) AS n_partial,
           CAST(COUNT(*) FILTER (WHERE filled = 0) AS BIGINT) AS n_stockout,
           ROUND(CAST(SUM(filled) AS DOUBLE) / CAST(SUM(qty) AS DOUBLE), 6)
             AS fill_rate
    FROM a GROUP BY p_brand
    """,
)
def q_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO allocation of lineitem demand against per-part supply,
    rolled up to brand: a line is filled iff its cumulative-demand
    interval [prefix−qty, prefix) fits under the part's budget, clamped
    otherwise — filled = max(0, min(qty, supply − (prefix − qty))).

    Scale shape: ONE window partitioned by l_partkey (millions of small
    partitions at 100 TB, no global sort), supply is a part-keyed
    aggregate of the 4-rows-per-part partsupp, the brand dimension joins
    from `part` (broadcastable), and the rollup is map-side combined.
    All quantities are BIGINT end-to-end; fill_rate is the single final
    IEEE division."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    sup = (
        synth_partsupp(spark, sf_dir)
        .groupBy("ps_partkey")
        .agg((F.sum("ps_availqty") % 1000).alias("supply"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    d = li.withColumn("prefix", F.sum("qty").over(w))
    a = (
        d.join(sup, d.l_partkey == sup.ps_partkey)
        .join(F.broadcast(p), d.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            "qty",
            F.greatest(
                F.lit(0).cast("long"),
                F.least(
                    F.col("qty"),
                    F.col("supply") - (F.col("prefix") - F.col("qty")),
                ),
            ).alias("filled"),
        )
    )
    return a.groupBy("p_brand").agg(
        F.count("*").alias("n_lines"),
        F.sum((F.col("filled") == F.col("qty")).cast("long")).alias(
            "n_filled"
        ),
        F.sum(
            ((F.col("filled") > 0) & (F.col("filled") < F.col("qty"))).cast(
                "long"
            )
        ).alias("n_partial"),
        F.sum((F.col("filled") == 0).cast("long")).alias("n_stockout"),
        F.round(
            F.sum("filled").cast("double") / F.sum("qty").cast("double"), 6
        ).alias("fill_rate"),
    )
