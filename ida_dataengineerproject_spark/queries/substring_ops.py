"""Exact-substring duplication audit (round 5d) — xt21.

The other dedup family in the LLM-data literature: Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") remove
verbatim substrings that repeat ACROSS documents, which Jaccard-style
whole-document dedup (x02*) and containment (xt20) both miss when the
shared span is a small part of each document.  Implemented here at
k-token-gram granularity (k=8): a gram occurrence is "duplicated" iff
an identical gram occurs earlier in global (doc_id, pos) order —
i.e. every occurrence except the global first.  Output is the per-doc
audit (total grams, duplicated grams, a >=20% flag) a pipeline uses to
route documents to span-removal.

Plan shape (all JVM-side, no Python stages):
  tokenize (posexplode) → k-gram assembly as ONE window over
  (doc_id, pos) with k-1 LEADs — a single shuffle keyed by doc_id →
  md5 gram hash → row_number over (hash) ordered by (doc_id, pos) —
  the second and last shuffle, keyed by the 128-bit hash, uniform by
  construction → per-doc aggregate.  At 100 TB both shuffles are
  linear in token count and key-uniform; nothing is quadratic and no
  driver-side state exists.  Memory per task is bounded by the largest
  single document's grams for the doc_id window (documents are
  chunk-bounded upstream by xt3_doc_chunking).

The oracle builds the identical gram stream with DuckDB lateral
unnest(generate_series) + list slicing and the same row_number rule;
md5 renders identically on both engines.  Position base (0- vs 1-) is
irrelevant to correctness: first-occurrence only needs the ORDER of
(doc_id, pos), which is shift-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

K = 8  # tokens per gram


@register(
    "xt21_dup_span_stats",
    f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               md5(array_to_string(toks[i:i+{K - 1}], ' ')) AS h
        FROM d, unnest(generate_series(1, len(toks) - {K - 1})) AS t(i)
    ),
    r AS (
        SELECT doc_id,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
        FROM g
    ),
    p AS (
        SELECT doc_id, COUNT(*) AS total_grams,
               CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_grams
        FROM r GROUP BY doc_id
    )
    SELECT docs.doc_id,
           COALESCE(total_grams, 0) AS total_grams,
           COALESCE(dup_grams, 0) AS dup_grams,
           COALESCE(dup_grams, 0) * 5 >= COALESCE(total_grams, 0)
               AND COALESCE(total_grams, 0) > 0 AS span_dup_flag
    FROM (SELECT doc_id FROM documents) docs
    LEFT JOIN p USING (doc_id)
    """,
)
def q_xt21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-k-gram audit; global first occurrence wins."""
    return dup_span_stats(table(spark, sf_dir, "documents"))


def dup_span_stats(docs: DataFrame, k: int = K) -> DataFrame:
    """The audit plan on any (doc_id, text) frame — single definition
    shared by the registered query and the golden tests."""
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    grams = (
        tok.select(
            "doc_id",
            "pos",
            F.lead("tok", k - 1).over(w).alias("_tail"),
            F.md5(F.concat_ws(" ", *parts)).alias("h"),
        )
        .where(F.col("_tail").isNotNull())
        .drop("_tail")
    )
    wh = Window.partitionBy("h").orderBy("doc_id", "pos")
    flagged = grams.withColumn("rn", F.row_number().over(wh))
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").alias("total_grams"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("dup_grams"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("total_grams", F.lit(0)).alias("total_grams"),
            F.coalesce("dup_grams", F.lit(0)).alias("dup_grams"),
            (
                (F.coalesce("dup_grams", F.lit(0)) * 5
                 >= F.coalesce("total_grams", F.lit(0)))
                & (F.coalesce("total_grams", F.lit(0)) > 0)
            ).alias("span_dup_flag"),
        )
    )
