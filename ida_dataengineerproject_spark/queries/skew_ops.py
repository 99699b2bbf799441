"""Skew-handling query: salted two-stage aggregation must be value-
identical to the direct GROUP BY (the oracle runs the direct form)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.skew import salted_sum
from ..registry import register
from ..sources.tables import table


@register(
    "skew_salted_revenue",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted SUM over a 3-value key (maximal skew: every key is hot).
    16-way salt spreads each key across reducers; decimal-exact partials
    make the two-stage result bit-identical to the direct aggregate."""
    li = table(spark, sf_dir, "lineitem")
    return salted_sum(li, ["l_returnflag"], "l_extendedprice", "revenue", salt=16)
