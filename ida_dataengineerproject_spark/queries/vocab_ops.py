"""Vocabulary/frequency operators over the corpus (round 6).

- x26_heavyhitter_bigrams — EXACT frequent word-bigrams found with a
  bounded-memory Misra-Gries candidate pass + candidate-filtered exact
  confirm (operators/sketch.py::heavy_hitters).  The classic "frequent
  items in one pass with k counters" sketch (Misra & Gries 1982;
  mergeable-summaries merge rule), which is how frequency mining
  survives a vocabulary that dwarfs executor memory.
- xt23_bpe_pair_stats — one BPE merge-step statistic: adjacent
  character-pair frequencies, computed over the WORD-FREQUENCY table
  rather than the raw stream (the standard tokenizer-training trick:
  Zipf makes |vocab| ≪ corpus, so the explode that matters runs on
  distinct words weighted by their counts).

Honesty note on test scale: the synthetic corpus has a ~31-word
vocabulary (≤961 bigrams), below the MG capacity, so the decrement
branch never fires in the registered query — tests/test_vocab_ops.py
drives it with a 50k-key Zipf stream and pins the superset guarantee
there.  The registered query still exercises the full two-pass plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import heavy_hitters
from ..registry import register
from ..sources.tables import table

HH_DENOM = 1000
HH_CAPACITY = 1024
TOP_K = 20


def _bigram_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(key) word-bigram stream: codegen explode, no window/shuffle.
    Parent doc rows are round-robined to defaultParallelism FIRST so the
    downstream Arrow stage isn't single-threaded (trap 9)."""
    docs = table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("t")
    )
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    return docs.where(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t)-1),"
                " i -> concat(element_at(t,i), ' ', element_at(t,i+1)))"
            )
        ).alias("key")
    )


@register(
    "x26_heavyhitter_bigrams",
    f"""
    WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
    p AS (
        SELECT t[i] || ' ' || t[i+1] AS key
        FROM d, unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p)
    SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM p, tot
    GROUP BY key, n
    HAVING COUNT(*) * {HH_DENOM} > n
    """,
)
def q_x26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigrams with frequency > N/{HH_DENOM} via Misra-Gries
    candidates + exact confirm.

    Scale shape: pass 1 is map-only (≤{HH_CAPACITY} counters per task,
    ≤{HH_CAPACITY} emitted rows per partition); pass 2 broadcast-filters
    the stream to candidates so the exact count's hash state is
    candidate-bounded, never vocabulary-bounded.  The output is exact —
    the sketch only proposes, the confirm disposes — which is why a
    plain SQL oracle can check it."""
    pairs = _bigram_stream(spark, sf_dir)
    return heavy_hitters(
        pairs, threshold_denom=HH_DENOM, capacity=HH_CAPACITY
    )


@register(
    "xt23_bpe_pair_stats",
    f"""
    WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    v AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM w WHERE w <> '' GROUP BY w),
    p AS (
        SELECT unnest(list_transform(range(1, length(w)),
                      i -> substring(w, CAST(i AS INT), 2))) AS pair,
               cnt
        FROM v WHERE length(w) >= 2)
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair LIMIT {TOP_K}
    """,
)
def q_xt23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} adjacent character pairs weighted by word frequency —
    the statistic one BPE merge step maximizes (Sennrich et al. 2016).

    Scale shape: the corpus-sized explode is avoided entirely — tokens
    aggregate to the word-frequency table first (vocabulary-bounded,
    Zipf ⇒ tiny vs corpus), and the char-pair explode runs over DISTINCT
    words with counts as weights.  At 100 TB of text this is one
    map-side-combined groupBy(word) plus work proportional to |vocab|;
    the naive per-occurrence pair explode would be corpus × word-length
    rows.  Top-k is TakeOrderedAndProject over the ≤ alphabet² pair
    aggregate; ordering (n DESC, pair) is total so the LIMIT boundary
    is deterministic."""
    docs = table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    pairs = vocab.where(F.length("w") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w)-1),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(TOP_K)
    )


@register(
    "xt28_chao1_vocab_coverage",
    """
    WITH w AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents),
    v AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM w WHERE w <> '' GROUP BY source, w),
    f AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS d_obs,
               CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS f1,
               CAST(COUNT(*) FILTER (WHERE c = 2) AS BIGINT) AS f2,
               CAST(SUM(c) AS BIGINT) AS n_tokens
        FROM v GROUP BY source)
    SELECT source, n_tokens, d_obs, f1, f2,
           ROUND(CAST(d_obs AS DOUBLE)
                 + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE)
                   / (2.0 * CAST(GREATEST(f2, 1) AS DOUBLE)), 4)
             AS chao1_richness
    FROM f
    """,
)
def q_xt28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 vocabulary-richness estimate per source: observed distinct
    tokens plus the capture-recapture correction f1²/(2·f2) for the
    vocabulary the sample HASN'T seen yet (Chao 1984) — the standard
    answer to 'how much more vocabulary would more data from this
    source add', which drives corpus-mixing decisions.

    Exactness: singleton/doubleton counts are exact BIGINTs off one
    (source, token) rollup; the estimator is a short identical IEEE
    expression (GREATEST(f2,1) guards the f2=0 degenerate case on both
    engines the same way).  Scale shape: one vocabulary-bounded
    groupBy(source, token) with map-side combine, then a source-bounded
    frequency-of-frequencies aggregate — the same two-level shape as
    xt14's vocab estimate, no shuffle beyond the token rollup."""
    docs = table(spark, sf_dir, "documents")
    v = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    f = v.groupBy("source").agg(
        F.count("*").alias("d_obs"),
        F.sum((F.col("c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).alias("f2"),
        F.sum("c").alias("n_tokens"),
    )
    chao1 = F.col("d_obs").cast("double") + (
        F.col("f1").cast("double") * F.col("f1").cast("double")
    ) / (F.lit(2.0) * F.greatest(F.col("f2"), F.lit(1)).cast("double"))
    return f.select(
        "source",
        "n_tokens",
        "d_obs",
        "f1",
        "f2",
        F.round(chao1, 4).alias("chao1_richness"),
    )


_HEAPS_BUCKETS = 20


@register(
    "xt29_heaps_vocab_growth",
    f"""
    WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    tokc AS (
        SELECT CAST(doc_id * {_HEAPS_BUCKETS} // t.n AS INTEGER) AS bucket,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
        FROM documents, t GROUP BY 1),
    first AS (
        SELECT w, MIN(doc_id) AS fd FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
        GROUP BY w),
    newt AS (
        SELECT CAST(fd * {_HEAPS_BUCKETS} // t.n AS INTEGER) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS types
        FROM first, t GROUP BY 1)
    SELECT tokc.bucket,
           CAST(SUM(tokc.toks) OVER (ORDER BY tokc.bucket
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(newt.types, 0)) OVER (ORDER BY tokc.bucket
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
    FROM tokc LEFT JOIN newt ON newt.bucket = tokc.bucket
    """,
)
def q_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative token count vs
    cumulative distinct-type count over the corpus in doc_id order,
    sampled at 20 corpus-fraction checkpoints — the diagnostic behind
    "how much NEW vocabulary does more data buy" (tokenizer sizing,
    dedup-effectiveness monitoring: a flattening type curve on a
    supposedly-fresh crawl slice means duplicated content).

    Exact prefix-distinct without quadratic rescans: the x17 identity —
    a type contributes to the cumulative count at exactly its FIRST
    occurrence — turns COUNT(DISTINCT) over every prefix into one
    groupBy(token) MIN(doc_id) plus a 20-row prefix sum.  Token totals
    per bucket use size(split(...)) with no explode.  Scale shape: one
    vocabulary-keyed aggregate (linear, Zipf-skew tolerated by partial
    aggregation), one doc-bucket aggregate, windows only over the
    20-row checkpoint frame."""
    d = table(spark, sf_dir, "documents")
    tot = d.agg(F.count("*").alias("n"))
    db = d.crossJoin(F.broadcast(tot))
    bucket = F.expr(f"CAST(doc_id * {_HEAPS_BUCKETS} div n AS INT)")
    tokc = db.groupBy(bucket.alias("bucket")).agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("toks")
    )
    first = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("fd"))
    )
    newt = (
        first.crossJoin(F.broadcast(tot))
        .groupBy(
            F.expr(f"CAST(fd * {_HEAPS_BUCKETS} div n AS INT)").alias("bucket")
        )
        .agg(F.count("*").alias("types"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    j = tokc.join(newt, "bucket", "left")
    return j.select(
        "bucket",
        F.sum("toks").over(w).cast("long").alias("cum_tokens"),
        F.sum(F.coalesce(F.col("types"), F.lit(0)))
        .over(w)
        .cast("long")
        .alias("cum_types"),
    )
