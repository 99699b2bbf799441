"""Corpus-preparation operators round 2 (xt8-xt12): the quality /
safety gates a pretraining-data pipeline runs between crawl and tokenizer
that round 1 didn't cover — benchmark-contamination checks, repetition
filters (Gopher-style), sequence packing, vocabulary building, and
incremental cross-corpus dedup.  All pure built-in expressions with exact
DuckDB oracle twins.

Scale notes common to all five: per-document signals are single-projection
maps (no shuffle, whole-stage codegen); the only shuffles are the final
aggregates (contamination join is a broadcast of the eval-set n-gram
index; packing windows are partitioned by shard, never global).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import text_fingerprint
from ..functions.textstats import ngram_shingles, token_count_bpe_ish, tokens
from ..registry import register
from ..sources.tables import table

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def _shingles_sql(n: int, toks: str = _TOKS) -> str:
    """DuckDB distinct word n-gram shingles (mirrors textstats.ngram_shingles)."""
    parts = ", ".join(f"{toks}[i+{k}]" for k in range(n))
    return f"""
    list_distinct(list_transform(
        range(1, greatest(len({toks}) - {n - 2}, 1)),
        i -> concat_ws(' ', {parts})))
    """


@register(
    "xt8_contamination_overlap",
    f"""
    WITH g AS (
        SELECT doc_id, unnest({_shingles_sql(5)}) AS g FROM documents),
    idx AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
    tr AS (
        SELECT doc_id, CASE WHEN g IN (SELECT g FROM idx) THEN 1 ELSE 0 END AS hit
        FROM g WHERE doc_id % 97 <> 0)
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_grams,
           CAST(sum(hit) AS INTEGER) AS n_hit,
           ROUND(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS overlap_frac,
           (CAST(sum(hit) AS DOUBLE) / count(*)) > 0.1 AS contaminated
    FROM tr GROUP BY doc_id
    """,
)
def q_xt8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: flag training documents whose 5-gram
    overlap with a held-out eval set (docs with doc_id % 97 == 0 playing
    the benchmark) exceeds 10% — the n-gram decontamination step every
    LLM data pipeline runs (GPT-3-style 13-gram dedup, here 5-gram).

    Scale: the eval index is DISTINCT n-grams of the (small) benchmark —
    broadcast to every executor; the training side is one explode +
    broadcast-hash probe + per-doc aggregate.  No shuffle touches the
    full corpus-side n-gram stream except the final doc_id agg."""
    docs = table(spark, sf_dir, "documents")
    grams5 = lambda df: df.select(  # noqa: E731
        "doc_id", F.explode(ngram_shingles("text", 5)).alias("g")
    )
    idx = grams5(docs.filter(F.col("doc_id") % 97 == 0)).select("g").distinct()
    train = grams5(docs.filter(F.col("doc_id") % 97 != 0))
    frac = F.col("n_hit").cast("double") / F.col("n_grams")
    return (
        train.join(F.broadcast(idx.withColumn("hit", F.lit(1))), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("int").alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            F.round(frac, 6).alias("overlap_frac"),
            (frac > 0.1).alias("contaminated"),
        )
    )


@register(
    "xt9_repetition_filter",
    f"""
    SELECT doc_id,
           ROUND(CAST(list_max(list_transform(list_distinct(lt),
                     t -> len(list_filter(lt, x -> x = t)))) AS DOUBLE)
                 / len(lt), 6) AS top_word_frac,
           ROUND(CAST(list_max(list_transform(list_distinct(bg),
                     t -> len(list_filter(bg, x -> x = t)))) AS DOUBLE)
                 / len(bg), 6) AS top_bigram_frac,
           (CAST(list_max(list_transform(list_distinct(lt),
                     t -> len(list_filter(lt, x -> x = t)))) AS DOUBLE)
                 / len(lt)) > 0.2
           OR (CAST(list_max(list_transform(list_distinct(bg),
                     t -> len(list_filter(bg, x -> x = t)))) AS DOUBLE)
                 / len(bg)) > 0.18 AS repetitive
    FROM (
        SELECT doc_id, lt,
               list_transform(range(1, greatest(len(lt), 1)),
                              i -> lt[i] || ' ' || lt[i+1]) AS bg
        FROM (SELECT doc_id,
                     list_transform({_TOKS}, t -> lower(t)) AS lt
              FROM documents)
        WHERE len(lt) >= 2)
    """,
)
def q_xt9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: fraction of tokens taken by the
    single most frequent word, and of bigrams by the most frequent
    bigram; a doc is `repetitive` above 0.2 / 0.18 (the published Gopher
    rule thresholds for the analogous signals).

    Scale: explode → two-level aggregate (count per (doc, gram), then
    max/sum per doc) — everything stays in whole-stage codegen with
    map-side partial aggregation.  (A per-doc count-per-distinct-token
    lambda expression is O(unique x len) *interpreted* — higher-order
    functions never codegen — measured ~10x slower at sf0.1.)"""
    docs = table(spark, sf_dir, "documents").filter(F.size(tokens("text")) >= 2)
    lt = docs.select(
        "doc_id", F.transform(tokens("text"), lambda t: F.lower(t)).alias("lt")
    )

    def top_frac(exploded: DataFrame, out: str) -> DataFrame:
        per_gram = exploded.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        return per_gram.groupBy("doc_id").agg(
            (F.max("c").cast("double") / F.sum("c")).alias(out)
        )

    words = top_frac(
        lt.select("doc_id", F.explode("lt").alias("g")), "w"
    )
    bigrams_arr = F.zip_with(
        F.slice(F.col("lt"), 1, F.size("lt") - 1),
        F.slice(F.col("lt"), 2, F.size("lt") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bigrams = top_frac(
        lt.select("doc_id", F.explode(bigrams_arr).alias("g")), "b"
    )
    return words.join(bigrams, "doc_id").select(
        "doc_id",
        F.round(F.col("w"), 6).alias("top_word_frac"),
        F.round(F.col("b"), 6).alias("top_bigram_frac"),
        ((F.col("w") > 0.2) | (F.col("b") > 0.18)).alias("repetitive"),
    )


@register(
    "xt10_sequence_packing",
    """
    WITH sized AS (
        SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
               len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tok
        FROM documents),
    packed AS (
        SELECT shard, n_tok,
               SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM sized)
    SELECT shard,
           CAST(FLOOR((cum - n_tok) / 2048.0) AS INTEGER) AS bin,
           CAST(count(*) AS INTEGER) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           ROUND(CAST(sum(n_tok) AS DOUBLE) / 2048.0, 6) AS fill_ratio
    FROM packed GROUP BY shard, CAST(FLOOR((cum - n_tok) / 2048.0) AS INTEGER)
    """,
)
def q_xt10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for the tokenizer: greedy sequential packing of
    documents into 2048-token context bins, per shard — docs are laid
    into a bin until the cumulative token count crosses the context
    length (a doc starts in the bin its preceding cumsum falls in).

    Scale: the cumsum window is PARTITIONED BY shard (docs are sharded by
    id hash), never a global single-partition window — each shard packs
    independently, which is exactly how a distributed tokenizer feeds
    writers.  One shuffle on shard, one aggregate."""
    ctx = 2048
    docs = table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).cast("int").alias("shard"),
        token_count_bpe_ish("text").cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.withColumn("cum", F.sum("n_tok").over(w))
    return (
        packed.withColumn(
            "bin", F.floor((F.col("cum") - F.col("n_tok")) / float(ctx)).cast("int")
        )
        .groupBy("shard", "bin")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.round(F.sum("n_tok").cast("double") / ctx, 6).alias("fill_ratio"),
        )
    )


@register(
    "xt11_vocab_topk",
    f"""
    SELECT token, n, rank FROM (
        SELECT token, CAST(count(*) AS BIGINT) AS n,
               CAST(row_number() OVER (ORDER BY count(*) DESC, token) AS INTEGER)
                 AS rank
        FROM (SELECT unnest(list_transform({_TOKS}, t -> lower(t))) AS token
              FROM documents)
        WHERE token <> ''
        GROUP BY token)
    WHERE rank <= 100
    """,
)
def q_xt11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build: global top-100 lowercased whitespace tokens with
    deterministic tie-break (count DESC, token ASC) — the frequency table
    a tokenizer trainer starts from.

    Scale: explode + partial-aggregated count (map-side combine), then an
    EXPLICIT top-k limit BEFORE the window (r11, VERDICT r10 #4): the
    vocabulary grain grows ~Heaps-law with corpus size (10⁷-10⁸ tokens at
    100 TB), so the unpartitioned row_number must never be able to see
    it.  The r10 form relied on Catalyst's LimitPushDownThroughWindow to
    move the rank<=100 filter below the window — correct, but one
    optimizer-rule regression away from a full-vocabulary single
    partition.  Here the limit(100) is structural: TakeOrderedAndProject
    (per-partition top-100 heap + tree-ordered merge) bounds the window
    input to exactly 100 rows by construction, and the window re-ranks
    those 100 in the SAME total order (count DESC, token ASC), so
    results are identical.  Plan pinned in tests/test_plan_quality.py:
    the Window must sit ABOVE TakeOrderedAndProject."""
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .select(F.lower("token").alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(100)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


@register(
    "xt12_cross_corpus_dedup",
    """
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    WHERE doc_id % 7 <> 0
      AND md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) NOT IN (
          SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
          FROM documents WHERE doc_id % 7 = 0)
    """,
)
def q_xt12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-corpus dedup: drop new-crawl documents whose
    normalized-text fingerprint already exists in the reference corpus
    (docs with doc_id % 7 == 0 playing yesterday's crawl) — the
    snapshot-over-snapshot dedup step of a rolling crawl pipeline.

    Scale: LEFT ANTI join on the md5 fingerprint; the existing-corpus
    fingerprint set is the small side here (broadcast), at parity scale
    it degrades gracefully to a shuffled anti-join on the hash — the
    exact shape of operators/upsert.dedup_against."""
    docs = table(spark, sf_dir, "documents")
    existing = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(text_fingerprint("text").alias("fp"))
        .distinct()
    )
    return (
        docs.filter(F.col("doc_id") % 7 != 0)
        .withColumn("fp", text_fingerprint("text"))
        .join(F.broadcast(existing), "fp", "left_anti")
        .select("doc_id", "fp")
    )


@register(
    "xt12_bucketed",
    """
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    WHERE doc_id % 7 <> 0
      AND md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) NOT IN (
          SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
          FROM documents WHERE doc_id % 7 = 0)
    """,
)
def q_xt12_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xt12 over the content-addressed at-rest layout (same oracle as
    xt12_cross_corpus_dedup): both the new crawl and the reference
    corpus are snapshots of the SAME fingerprint-bucketed store
    (sources/bucketed.bucketed_documents_by_fingerprint), so the LEFT
    ANTI join on fp — the plain arm's broadcast, which at real scale
    would be a both-sides shuffle (yesterday's crawl does not fit in a
    broadcast) — consumes the two bucketed scans co-located, with the
    fingerprint computed once at ingest instead of once per side per
    run.  Production path via queries/production.py."""
    from ..sources.bucketed import bucketed_documents_by_fingerprint

    d = bucketed_documents_by_fingerprint(spark, sf_dir)
    existing = (
        d.filter(F.col("doc_id") % 7 == 0).select("fp").distinct()
    )
    return (
        d.filter(F.col("doc_id") % 7 != 0)
        .join(existing.hint("shuffle_hash"), "fp", "left_anti")
        .select("doc_id", "fp")
    )


@register(
    "xt13_per_source_cap",
    """
    SELECT source, CAST(count(*) AS INTEGER) AS n_kept,
           CAST(min(keep_rank) AS INTEGER) AS min_rank,
           CAST(max(keep_rank) AS INTEGER) AS max_rank
    FROM (
        SELECT source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS keep_rank
        FROM documents)
    WHERE keep_rank <= 40
    GROUP BY source ORDER BY source
    """,
)
def q_xt13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: keep at most 40 docs per source, chosen
    by a content-independent hash rank (md5 of doc_id) — the
    cap-per-domain rule crawl pipelines apply so one hot site cannot
    dominate the corpus, with a deterministic, engine-independent choice
    of survivors (unlike `LIMIT` per group, which is order-undefined).

    Scale: one hash-partitioned window per source; the rank<=cap filter
    is a WindowGroupLimit (per-partition top-k before the full sort).
    Output is the per-source audit (kept count + rank bounds)."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("keep_rank", F.row_number().over(w))
        .filter(F.col("keep_rank") <= 40)
        .groupBy("source")
        .agg(
            F.count("*").cast("int").alias("n_kept"),
            F.min("keep_rank").cast("int").alias("min_rank"),
            F.max("keep_rank").cast("int").alias("max_rank"),
        )
        .orderBy("source")
    )


def ngram_vocab_estimate(
    spark: SparkSession, sf_dir: str, verify: bool = False
) -> DataFrame:
    """Corpus 3-gram vocabulary size via HLL — the corpus statistic that
    sizes tokenizer/dedup structures before a full pass.

    PRODUCTION path (``verify=False``, the default): one constant-memory
    HLL pass — partial sketches merge map-side, the n-gram stream itself
    is never shuffled.  This is the only shape that survives 100 TB.

    VERIFY path (``verify=True``, used only by the registered oracle
    query): additionally computes the exact ``countDistinct`` over the
    exploded 3-gram stream — a full shuffle of every distinct n-gram,
    affordable only at oracle scale — and returns the bounded-oracle
    contract ``hll_ok`` = |approx − exact| <= 2.3%·exact (±2.3σ at
    rsd=0.01)."""
    docs = table(spark, sf_dir, "documents")
    grams = docs.select(F.explode(ngram_shingles("text", 3)).alias("g"))
    if not verify:
        return grams.agg(
            F.approx_count_distinct("g", rsd=0.01).alias("approx_vocab")
        )
    return grams.agg(
        F.countDistinct("g").alias("exact_vocab"),
        F.approx_count_distinct("g", rsd=0.01).alias("approx_vocab"),
    ).select(
        "exact_vocab",
        (
            F.abs(F.col("approx_vocab") - F.col("exact_vocab"))
            <= 0.023 * F.col("exact_vocab")
        ).alias("hll_ok"),
    )


@register(
    "xt14_ngram_vocab_estimate",
    f"""
    SELECT CAST(count(DISTINCT g) AS BIGINT) AS exact_vocab, TRUE AS hll_ok
    FROM (SELECT unnest({_shingles_sql(3)}) AS g FROM documents)
    """,
)
def q_xt14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle registration for ``ngram_vocab_estimate`` — runs the VERIFY
    arm (exact ground truth in-plan) so DuckDB can check the HLL bound.
    Production callers and the bench use ``verify=False`` (sketch-only)."""
    return ngram_vocab_estimate(spark, sf_dir, verify=True)
