"""Scalar-function breadth queries: regex, string, datetime, conditional —
the function surface a reference user exercises through PostgreSQL
(SURVEY.md §2.4 covers what the reference itself uses; these round out the
general-engine surface).  Every expression has a DuckDB twin with matching
semantics, asserted by the parity gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table


@register(
    "fn_regex",
    r"""
    SELECT o_orderkey,
           CAST(regexp_extract(o_orderpriority, '^([0-9])-', 1) AS INTEGER) AS prio_num,
           regexp_extract(o_orderpriority, '-(.*)$', 1) AS prio_name,
           regexp_matches(o_orderpriority, 'URGENT|HIGH') AS is_hot,
           regexp_replace(o_orderpriority, '[0-9]-', '', 'g') AS no_prefix
    FROM orders
    """,
)
def q_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract (group capture), rlike, regexp_replace."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^([0-9])-", 1)
        .cast("int")
        .alias("prio_num"),
        F.regexp_extract("o_orderpriority", r"-(.*)$", 1).alias("prio_name"),
        F.col("o_orderpriority").rlike("URGENT|HIGH").alias("is_hot"),
        F.regexp_replace("o_orderpriority", r"[0-9]-", "").alias("no_prefix"),
    )


@register(
    "fn_string",
    """
    SELECT c_custkey,
           upper(c_name) AS up,
           substr(c_name, 10, 9) AS digits,
           CAST(length(c_name) AS INTEGER) AS n_chars,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
           reverse(c_mktsegment) AS rev,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS lev,
           concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS joined,
           CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos
    FROM customer
    """,
)
def q_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/substr/length/lpad/reverse/levenshtein/concat_ws/instr."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.substring("c_name", 10, 9).alias("digits"),
        F.length("c_name").alias("n_chars"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev"),
        F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "joined"
        ),
        F.instr("c_name", "#").alias("hash_pos"),
    )


@register(
    "fn_datetime",
    """
    SELECT o_orderkey,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)
             AS days_since_epoch_start,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(datetrunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start
    FROM orders
    """,
)
def q_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dayofweek/dayofyear/date arithmetic/datediff/last_day/trunc.

    NB Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday —
    normalized via +1."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("days_since_epoch_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_trunc("quarter", F.col("o_orderdate")).alias("quarter_start"),
    )


@register(
    "fn_conditional",
    """
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_recode,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_band,
           GREATEST(c_acctbal, 0.0) AS floored,
           LEAST(CAST(c_nationkey AS INTEGER), 10) AS capped_nation
    FROM customer
    """,
)
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif/case/greatest/least."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_recode"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("floored"),
        F.least(F.col("c_nationkey"), F.lit(10)).alias("capped_nation"),
    )
