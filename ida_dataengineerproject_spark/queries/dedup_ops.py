"""Deduplication queries (driver extensions x01/x02) over `documents`.

Exact + normalized hash dedup (oracle-checked), exact n-gram Jaccard pairs
(oracle-checked), MinHash-LSH and SimHash near-dup pairs (rows-only: hash
functions aren't available in DuckDB; their recall is asserted against the
exact baseline in tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import text_fingerprint
from ..operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..registry import register
from ..sources.tables import table


@register(
    "x01_exact_dedup",
    """
    SELECT doc_id, hash_registro, n_dups
    FROM (SELECT doc_id, md5(text) AS hash_registro,
                 row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
                 count(*) OVER (PARTITION BY md5(text)) AS n_dups
          FROM documents)
    WHERE rn = 1
    """,
)
def q_x01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by full-text md5 (x01; reference semantics
    etl/etl_ida.py:534): deterministic lowest-id winner + duplicate count."""
    d = table(spark, sf_dir, "documents")
    return exact_dedup(d, F.md5("text"), "doc_id").select(
        "doc_id", "hash_registro", "n_dups"
    )


@register(
    "x01b_normalized_dedup",
    """
    SELECT doc_id, hash_registro, n_dups
    FROM (SELECT doc_id,
                 md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS hash_registro,
                 row_number() OVER (PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
                                    ORDER BY doc_id) AS rn,
                 count(*) OVER (PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))) AS n_dups
          FROM documents)
    WHERE rn = 1
    """,
)
def q_x01b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup after case-fold + whitespace-collapse normalization (x01;
    clean-then-hash, etl/etl_ida.py:398-404 + :124-131)."""
    d = table(spark, sf_dir, "documents")
    return exact_dedup(d, text_fingerprint("text"), "doc_id").select(
        "doc_id", "hash_registro", "n_dups"
    )


_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_SHINGLES = f"""
    list_distinct(list_transform(
        range(1, greatest(len({_TOKS}) - 1, 1)),
        i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1], {_TOKS}[i+2])))
"""


@register(
    "x02_ngram_jaccard_pairs",
    f"""
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        FROM (SELECT doc_id, {_SHINGLES} AS sh FROM documents
              WHERE doc_id < 300 AND len({_TOKS}) >= 3) a
        JOIN (SELECT doc_id, {_SHINGLES} AS sh FROM documents
              WHERE doc_id < 300 AND len({_TOKS}) >= 3) b
          ON a.doc_id < b.doc_id)
    WHERE jaccard >= 0.5
    """,
)
def q_x02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (x02 baseline), bounded to
    doc_id<300 — the O(n²) ground truth the LSH paths are tested against."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)


@register("x02b_minhash_lsh_pairs")  # rows-only: xxhash64 not in DuckDB
def q_x02b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (x02 scale path): 30 hashes, 10 bands (r=3) —
    candidates from band-hash equi-join, verified by exact Jaccard.
    Recall vs the exact baseline is asserted in tests."""
    d = table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", n=3, k=30, bands=10, threshold=0.5)


@register("x02c_simhash_pairs")  # rows-only: xxhash64 not in DuckDB
def q_x02c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (x02): 64-bit additive bit-vote signatures,
    candidates via 16-bit chunk banding (pigeonhole over Hamming ≤ 3)."""
    d = table(spark, sf_dir, "documents")
    return simhash_pairs(d, "doc_id", "text", max_hamming=3)


@register("x02d_dedup_components")  # rows-only: iterative, not SQL-expressible
def q_x02d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the exact-Jaccard
    pair graph (doc_id<300 slice) → one row per dedup group with size and
    canonical (min) doc.  The iterative min-label propagation is the
    non-SQL-expressible step (operators/graph.py); correctness vs a
    union-find reference is asserted in tests/test_dedup_similarity.py."""
    from ..operators.graph import connected_components

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    labels = connected_components(pairs, "id_a", "id_b")
    return (
        labels.groupBy("comp")
        .agg(
            F.count("*").alias("group_size"),
            F.max("node").alias("max_doc"),
        )
        .withColumnRenamed("comp", "canonical_doc")
        .orderBy("canonical_doc")
    )
