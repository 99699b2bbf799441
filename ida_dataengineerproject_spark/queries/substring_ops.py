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

Plan shape (all JVM-side, no Python stages, ZERO windows — see
dup_span_stats): per-row polynomial gram hashing over once-hashed
tokens, one explode, one map-side-combinable min(struct) aggregate per
distinct gram, one per-doc count.  At 100 TB the only non-trivial
shuffle carries one partial row per distinct gram per task (hash-
uniform by construction); nothing is quadratic, nothing sorts, and no
driver-side state exists.

The oracle builds the gram stream with DuckDB lateral
unnest(generate_series) + list slicing, md5 identity, and a
row_number-over-hash first-occurrence rule — a DIFFERENT hash and plan
whose per-doc counts must agree exactly (gram equality is preserved by
any collision-free hash; 128 bits across the two polynomial schemes).
Position base (0- vs 1-) is irrelevant to correctness:
first-occurrence only needs the ORDER of (doc_id, pos), which is
shift-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    shared by the registered query and the golden tests.

    r9 rewrite — ZERO windows (the r8 form ran two: k−1 LEADs over
    (doc_id, pos) to assemble grams — a full tokenize shuffle — and a
    row_number over the 32-char md5 hash — a full sort shuffle of every
    gram occurrence; 8.0 s at x10):

    - gram assembly is per-ROW and string-free: each token hashes ONCE
      (two independent xxhash64 schemes), and a k-gram's identity is
      the degree-k polynomial combine of its token hashes in wrapping
      64-bit arithmetic — 2×8 multiply-adds per gram instead of an
      ~50-char concat + hash (A/B: slice+concat form 4.36 s at x10,
      polynomial 2.77 s; both equal).  128 collision bits across the
      two schemes — the identity contract md5 provided, at an
      8+8-byte shuffle payload instead of a 32-char string.  No
      tokenize explode, no window, no shuffle.
    - total_grams is arithmetic (max(n_tokens−k+1, 0)) — no gram pass.
    - the global-first rule (earliest (doc_id, pos) per distinct gram)
      is min(struct(doc_id, pos)) — a map-side-combinable AGGREGATE, so
      the shuffle carries one partial row per distinct gram per task,
      not every occurrence, and nothing sorts.
      dup_grams(doc) = total_grams(doc) − #(grams whose global first
      occurrence lies in doc) — identical semantics to the oracle's
      rn > 1 count.  Measured at x10: 8.04 s (r8) → 2.77 s."""
    toks = F.split("text", " ")
    base = docs.select("doc_id", toks.alias("__toks")).select(
        "doc_id",
        F.size("__toks").alias("__n"),
        F.transform("__toks", lambda t: F.xxhash64(t)).alias("__th1"),
        F.transform("__toks", lambda t: F.xxhash64(F.lit(1), t)).alias(
            "__th2"
        ),
    )
    # two independent coefficient ladders (FNV prime / CPython string
    # prime), reduced into signed-long range; Java multiplication wraps
    # mod 2^64 deterministically
    C1 = [1099511628211**j % (2**63) for j in range(k)]
    C2 = [1000003**j % (2**63) for j in range(k)]

    def gram(i, arr, coeffs):
        e = None
        for j, c in enumerate(coeffs):
            term = F.element_at(arr, i + j + 1) * F.lit(c)
            e = term if e is None else e + term
        return e

    def gram_hashes(n_col):
        def one(i):
            return F.struct(
                i.alias("pos"),
                gram(i, F.col("__th1"), C1).alias("h1"),
                gram(i, F.col("__th2"), C2).alias("h2"),
            )

        return F.when(
            n_col >= k, F.transform(F.sequence(F.lit(0), n_col - k), one)
        ).otherwise(F.array().cast("array<struct<pos:int,h1:bigint,h2:bigint>>"))

    exploded = base.select(
        "doc_id",
        F.explode(gram_hashes(F.col("__n"))).alias("g"),
    ).select("doc_id", F.col("g.pos"), F.col("g.h1"), F.col("g.h2"))
    firsts = (
        exploded.groupBy("h1", "h2")
        .agg(F.min(F.struct("doc_id", "pos")).alias("f"))
        .groupBy(F.col("f.doc_id").alias("doc_id"))
        .agg(F.count("*").alias("__n_firsts"))
    )
    totals = base.select(
        "doc_id",
        F.greatest(F.col("__n") - (k - 1), F.lit(0))
        .cast("long")
        .alias("total_grams"),
    )
    return (
        totals.join(firsts, "doc_id", "left")
        .select(
            "doc_id",
            "total_grams",
            (
                F.col("total_grams") - F.coalesce("__n_firsts", F.lit(0))
            ).alias("dup_grams"),
        )
        .select(
            "doc_id",
            "total_grams",
            "dup_grams",
            (
                (F.col("dup_grams") * 5 >= F.col("total_grams"))
                & (F.col("total_grams") > 0)
            ).alias("span_dup_flag"),
        )
    )
