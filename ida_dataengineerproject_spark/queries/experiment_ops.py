"""Experimentation + recommendation operators (round 5d).

xq10_ab_test_lift — A/B conversion lift with the two-proportion
z-statistic.  Arm assignment is the deterministic md5 coin shared with
xt1/xt16 (reproducible on any engine, no RNG state), conversion counts
are exact integers, and the z formula uses only IEEE-correctly-rounded
ops (+ - * / sqrt — sqrt IS exact under IEEE 754, unlike log/exp which
ROUND_NOTES bans) in one fixed expression tree, so the statistic is
bit-identical across engines with zero tolerance.

x21_item_cooccurrence — "customers also bought": item-item
co-occurrence counts with cosine normalization n_ij/sqrt(n_i*n_j).
The pair generation self-joins the per-user item set ON user_id — cost
is sum over users of (items-per-user choose 2), NOT catalog², and a
deterministic per-user cap (smallest 50 item ids) bounds any
hoarder-user blowup at 100 TB, the same reasoning as xt17's
segment-frequency bound.  Item frequencies broadcast back for the
normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

USER_ITEM_CAP = 50
MIN_COOCCUR = 3


@register(
    "xq10_ab_test_lift",
    """
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                         < '80000000' THEN 'A' ELSE 'B' END AS arm
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
               CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        FROM u
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS lift,
           (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / sqrt(
               (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
               * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
               * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
           ) AS z
    FROM a
    """,
)
def q_xq10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on md5-coin arm assignment."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    ).withColumn(
        "arm",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8)
            < "80000000",
            "A",
        ).otherwise("B"),
    )
    a = u.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("conv")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("conv")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (pa - pb) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return a.select(
        "n_a", "conv_a", "n_b", "conv_b", (pa - pb).alias("lift"), z.alias("z")
    )


@register(
    "x21_item_cooccurrence",
    f"""
    WITH ui0 AS (
        SELECT DISTINCT user_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS item
        FROM events WHERE event_type = 'purchase'
    ),
    ui AS (
        SELECT user_id, item FROM (
            SELECT user_id, item,
                   row_number() OVER (PARTITION BY user_id ORDER BY item)
                       AS rn
            FROM ui0)
        WHERE rn <= {USER_ITEM_CAP}
    ),
    f AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM ui GROUP BY item),
    p AS (
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM ui a JOIN ui b
          ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY a.item, b.item HAVING COUNT(*) >= {MIN_COOCCUR}
    )
    SELECT item_a, item_b, n_ab,
           CAST(n_ab AS DOUBLE)
           / sqrt(CAST(fa.n AS DOUBLE) * CAST(fb.n AS DOUBLE)) AS cosine
    FROM p
    JOIN f fa ON fa.item = p.item_a
    JOIN f fb ON fb.item = p.item_b
    """,
)
def q_x21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence with cosine normalization."""
    ev = table(spark, sf_dir, "events")
    ui0 = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("item")
    ui = (
        ui0.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= USER_ITEM_CAP)
        .drop("rn")
    )
    f = ui.groupBy("item").agg(F.count("*").alias("n"))
    a = ui.select("user_id", F.col("item").alias("item_a"))
    b = ui.select("user_id", F.col("item").alias("item_b"))
    p = (
        a.join(b, "user_id")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= MIN_COOCCUR)
    )
    fa = f.select(F.col("item").alias("item_a"), F.col("n").alias("na"))
    fb = f.select(F.col("item").alias("item_b"), F.col("n").alias("nb"))
    return (
        p.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_ab",
            (
                F.col("n_ab").cast("double")
                / F.sqrt(
                    F.col("na").cast("double") * F.col("nb").cast("double")
                )
            ).alias("cosine"),
        )
    )
