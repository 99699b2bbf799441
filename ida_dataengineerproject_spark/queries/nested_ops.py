"""Nested-type surface: array element access/slicing over embeddings,
schema-driven JSON parsing into structs (the production form of x07 —
from_json parses once; get_json_object re-parses per call)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources.tables import table


@register(
    "fn_array_access",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 9) AS first_val,
           ROUND(CAST(embedding[64] AS DOUBLE), 9) AS last_val,
           ROUND(CAST(list_aggregate(CAST(embedding[1:8] AS DOUBLE[]), 'sum') AS DOUBLE), 9)
             AS head_sum
    FROM embeddings
    """,
)
def q_array_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / slice / aggregate over array columns.

    The slice is cast to double BEFORE summing on both engines so the
    accumulation runs in double (float32 partial sums would diverge)."""
    e = table(spark, sf_dir, "embeddings")
    head = F.slice("embedding", 1, 8).cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 9).alias("first_val"),
        F.round(F.element_at("embedding", 64).cast("double"), 9).alias("last_val"),
        F.round(
            F.aggregate(head, F.lit(0.0), lambda acc, x: acc + x), 9
        ).alias("head_sum"),
    )


_PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


@register(
    "fn_from_json_struct",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema → struct field access (parse
    once per row; the scale form of get_json_object)."""
    ev = table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", _PROPS_SCHEMA))
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("p.k").alias("min_k"),
        F.max("p.k").alias("max_k"),
    )
