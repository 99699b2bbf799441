"""Pipeline-guard + incremental-maintenance operators (round 5b).

Five operators a production 100 TB pipeline runs around its analytic core,
each oracle-paired:

- x14_bloom_membership_filter — explicit Bloom-filter membership prefilter
  (bit-position table, Carter-Wegman integer hash family) ahead of an
  exact confirm join: the pattern behind Spark's own runtime bloom
  pruning, made oracle-checkable.  Demonstrates the no-false-negative
  contract and the measured false-positive rate per partition.
- x15_event_rate_anomaly — per-minute event-rate outliers by median /
  median-absolute-deviation (robust, rational arithmetic only: exact
  discrete medians averaged over the two middle ranks — no libm).
- xs5_incremental_rollup_merge — materialized-view maintenance: a stored
  partial rollup (count + exact decimal sum per group) is merged with a
  delta partition's partials by re-aggregation, never rescanning history.
- xt17_segment_dedup — CCNet-style segment-level corpus dedup: chunk each
  document into fixed token segments, drop segments that occur in >= 2
  distinct documents anywhere in the corpus, reassemble the survivors in
  order.
- xt18_tfidf_rarity_topk — top-k corpus-specific terms per source by a
  rational tf * (N / df) rarity score (no log(): libm differs across
  engines in the last ulp; the rational score has the same ordering for
  fixed N).

Reference scope: the reference pipeline validates and dedups rows before
load (/root/reference/etl/etl_ida.py: dropna/invalid filters op11-op12,
hash dedup op37) and re-runs idempotently against an existing warehouse
(op38 insert-if-absent); these operators are that posture generalized to
corpus scale — membership prefilters, incremental partial-merge instead of
full recompute, robust rate gates, and segment-grain dedup.

Determinism contract: the bloom hash family is Carter-Wegman integer
arithmetic over the Mersenne prime 2^31-1 (overflow-free in signed
64-bit, hence bit-identical on any engine); all floats come from integer
or decimal arithmetic plus at most one IEEE division, so both engines
round identically with zero tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table
from .scale_ops import _scratch_dir

# Bloom geometry: fixed bit-space m (the broadcast stays bounded no matter
# how large the reference key set grows) and k independent hash functions.
_BLOOM_M = 65536
_BLOOM_K = 3
_REF_PRICE = 475000.0  # ~top-5% of o_totalprice: the "flagged orders" set
_SEG_LEN = 4  # tokens per dedup segment (CCNet dedups lines; the synthetic
#               corpus is a flat word stream, so fixed 4-token segments
#               play the role of lines)
_CUTOFF = "1999-01-01"  # stored-rollup / delta boundary for xs5


# Hash family: Kirsch-Mitzenmacher double hashing over the shared
# Carter-Wegman integer base family (functions/hashing.km_pos; the CW
# family itself measured ~9x cheaper than an md5-based family on the
# sf0.1 probe projection — 1.77s -> ~0.2s; string keys would first fold
# to an integer via a portable digest).


def _bloom_pos(key: Column, seed: int) -> Column:
    """x14's bloom family (r11): Kirsch-Mitzenmacher double hashing over
    the same CW base family — 2 CW evals derive all k positions
    (functions/hashing.km_pos; measured 2.17 → 1.72 s on the x100
    probe+agg pass, same no-false-negative contract).  file_pruning's
    per-partition bloom index keeps the independent-CW family."""
    from ..functions.hashing import km_pos

    return km_pos(key, seed, _BLOOM_M).alias(f"pos{seed}")


def _bloom_pos_sql(key: str, seed: int) -> str:
    from ..functions.hashing import km_pos_sql

    return km_pos_sql(key, seed, _BLOOM_M)


@register(
    "x14_bloom_membership_filter",
    f"""
    WITH refk AS (
        SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_totalprice > {_REF_PRICE}),
    bloom AS (
        SELECT DISTINCT {_bloom_pos_sql('k', 1)} AS pos FROM refk
        UNION
        SELECT DISTINCT {_bloom_pos_sql('k', 2)} AS pos FROM refk
        UNION
        SELECT DISTINCT {_bloom_pos_sql('k', 3)} AS pos FROM refk),
    probe AS (
        SELECT substr(CAST(l_shipdate AS VARCHAR), 1, 7) AS mes,
               l_orderkey,
               {_bloom_pos_sql('l_orderkey', 1)} AS p1,
               {_bloom_pos_sql('l_orderkey', 2)} AS p2,
               {_bloom_pos_sql('l_orderkey', 3)} AS p3
        FROM lineitem),
    flagged AS (
        SELECT mes,
               (p1 IN (SELECT pos FROM bloom)
                AND p2 IN (SELECT pos FROM bloom)
                AND p3 IN (SELECT pos FROM bloom)) AS bloom_pass,
               l_orderkey IN (SELECT k FROM refk) AS in_ref
        FROM probe)
    SELECT mes,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           CAST(sum(CASE WHEN bloom_pass AND in_ref THEN 1 ELSE 0 END) AS BIGINT)
               AS n_confirmed
    FROM flagged GROUP BY mes
    """,
)
def bloom_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership prefilter + exact confirm, per ship-month.

    The reference set (orders above the ~p95 price) is folded into a
    PACKED BITMAP — a dense array of m/64 = 1024 64-bit words riding
    ONE broadcast row — and every lineitem probes its k = 3 positions
    with pure codegen bit arithmetic
    (functions/hashing.bloom_bitmap_probe): ZERO joins on the probe
    side until the exact confirm.  The r8 row-per-position form ran one
    broadcast hash join per hash function (the three renamed markers
    defeated exchange reuse, so the reference aggregation re-executed
    per join); same-session r9 A/B: wash at toy scale (old 1.10/new
    1.28 s at sf0.1; old 1.28/new 1.17 s at x10) — the bitmap arm is
    kept for the scale posture: an 8 KB broadcast value versus a
    65k-row hash relation built k times, and no join machinery on the
    probe path at all.  Rows passing all three are candidates, and
    the exact confirm join (in_ref) measures the false-positive rate.
    The no-false-negative contract (in_ref => bloom_pass, so
    n_confirmed is exact membership) is what lets the expensive confirm
    join run on survivors only at scale.

    Reference scope: generalizes the insert-if-absent membership check of
    /root/reference/etl/etl_ida.py (op38 anti-join) to a
    constant-memory prefilter.  100 TB: probe side never shuffles; the
    bloom bitmap is ~8 KB broadcast; the confirm side would be a
    shuffle-join on the ~(FP + true) survivors only."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    from ..functions.hashing import bloom_bitmap, bloom_bitmap_probe

    # No .distinct(): o_orderkey is the orders primary key, so the
    # filtered projection is already a set — the DISTINCT in the oracle
    # SQL is a no-op there too, while here it would be a real 10%-of-
    # orders shuffle ahead of BOTH broadcast builds (measured r9: the
    # shuffle was ~0.5 s of the x10 wall and removing it changes no
    # values at any SF).
    refk = orders.filter(F.col("o_totalprice") > _REF_PRICE).select(
        F.col("o_orderkey").alias("k")
    )
    bitmap = bloom_bitmap(refk, "k", _BLOOM_K, _BLOOM_M, family="km")

    # Integer month key through the hot path; format "YYYY-MM" AFTER the
    # aggregate (≈84 rows).  substr(cast(ts AS string), 1, 7) runs the
    # full timestamp formatter on every row — measured 1.02 s of the
    # x10 wall by itself vs 0.46 s for year()*100+month() (field
    # extraction is integer julian arithmetic, and the group-by key
    # becomes a fixed-width int instead of a string).
    probe = li.select(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("__mk"),
        "l_orderkey",
        *[_bloom_pos(F.col("l_orderkey"), j) for j in range(1, _BLOOM_K + 1)],
    ).crossJoin(F.broadcast(bitmap))
    bloom_pass = (
        bloom_bitmap_probe(F.col("pos1"))
        & bloom_bitmap_probe(F.col("pos2"))
        & bloom_bitmap_probe(F.col("pos3"))
    )
    ref_marker = refk.withColumn("in_ref", F.lit(1))
    out = probe.join(
        F.broadcast(ref_marker), probe["l_orderkey"] == ref_marker["k"], "left"
    )
    return (
        out.groupBy("__mk")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(bloom_pass, 1).otherwise(0)).alias("n_bloom_pass"),
            F.sum(
                F.when(bloom_pass & F.col("in_ref").isNotNull(), 1).otherwise(0)
            ).alias("n_confirmed"),
        )
        .select(
            F.format_string(
                "%04d-%02d",
                (F.col("__mk") / 100).cast("int"),
                F.col("__mk") % 100,
            ).alias("mes"),
            "n_rows",
            "n_bloom_pass",
            "n_confirmed",
        )
    )


_MED_SQL = """
    SELECT CAST(SUM({val}) AS DOUBLE) / COUNT(*) AS {alias}
    FROM {src} WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
"""


def _median_of(df: DataFrame, val: str, alias: str) -> DataFrame:
    """Exact discrete median (average of the two middle ranks) as a
    1-row DataFrame — rational, engine-portable."""
    r = df.select(
        F.col(val),
        F.row_number().over(Window.orderBy(val, "minute")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    mid = r.filter(
        (F.col("rn") == F.expr("(n + 1) DIV 2"))
        | (F.col("rn") == F.expr("(n + 2) DIV 2"))
    )
    return mid.agg((F.sum(val).cast("double") / F.count("*")).alias(alias))


def minute_counts(ev: DataFrame) -> DataFrame:
    return ev.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute")).agg(
        F.count("*").alias("n_events")
    )


def rate_baseline(ev: DataFrame) -> DataFrame:
    """1-row (med_rate, mad) robust baseline of per-minute event rates —
    the batch half of the anomaly gate; streaming/events.py
    rate_anomaly_stream applies it to a live stream."""
    cnt = minute_counts(ev)
    med = _median_of(cnt, "n_events", "med_rate")
    d = cnt.crossJoin(F.broadcast(med)).withColumn(
        "abs_dev", F.abs(F.col("n_events").cast("double") - F.col("med_rate"))
    )
    return d.crossJoin(F.broadcast(_median_of(d, "abs_dev", "mad"))).select(
        "med_rate", "mad"
    ).limit(1)


@register(
    "x15_event_rate_anomaly",
    f"""
    WITH c AS (
        SELECT date_trunc('minute', ts) AS minute, count(*) AS n_events
        FROM events GROUP BY 1),
    r AS (
        SELECT minute, n_events,
               row_number() OVER (ORDER BY n_events, minute) AS rn,
               count(*) OVER () AS n
        FROM c),
    med AS ({_MED_SQL.format(val='n_events', alias='med_rate', src='r')}),
    d AS (
        SELECT minute, n_events,
               abs(CAST(n_events AS DOUBLE) - med_rate) AS abs_dev, med_rate
        FROM r, med),
    r2 AS (
        SELECT minute, n_events, abs_dev, med_rate,
               row_number() OVER (ORDER BY abs_dev, minute) AS rn,
               count(*) OVER () AS n
        FROM d),
    madt AS ({_MED_SQL.format(val='abs_dev', alias='mad', src='r2')})
    SELECT minute, CAST(n_events AS BIGINT) AS n_events, med_rate, mad,
           abs_dev, (abs_dev > 3 * mad) AS is_anomaly
    FROM d, madt
    ORDER BY abs_dev DESC, minute LIMIT 10
    """,
)
def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust event-rate gate: the 10 most deviant minutes by
    |rate - median| against a 3x median-absolute-deviation threshold.

    Median/MAD instead of mean/stddev so a single hot minute can't drag
    its own threshold, and exact discrete medians (average of the two
    middle ranks) instead of interpolated quantiles so both engines agree
    bit-for-bit — all arithmetic is integers, halves, and one IEEE
    division.

    100 TB: the only full-data pass is the minute-grain count (map-side
    combined); every window/median below it runs on the bounded aggregate
    (1 row per minute = ~526k rows/year), the same agg-before-window rule
    the flagship uses (SURVEY.md §7.4.2)."""
    ev = table(spark, sf_dir, "events")
    cnt = minute_counts(ev)

    med = _median_of(cnt, "n_events", "med_rate")
    d = cnt.crossJoin(F.broadcast(med)).withColumn(
        "abs_dev", F.abs(F.col("n_events").cast("double") - F.col("med_rate"))
    )
    mad = _median_of(d, "abs_dev", "mad")
    return (
        d.crossJoin(F.broadcast(mad))
        .select(
            "minute",
            "n_events",
            "med_rate",
            "mad",
            "abs_dev",
            (F.col("abs_dev") > 3 * F.col("mad")).alias("is_anomaly"),
        )
        .orderBy(F.desc("abs_dev"), "minute")
        .limit(10)
    )


@register(
    "xs5_incremental_rollup_merge",
    f"""
    WITH agg AS (
        SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS mes,
               o_orderstatus,
               count(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS tp
        FROM orders GROUP BY 1, 2)
    SELECT mes, o_orderstatus,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(tp AS DOUBLE) AS total_price,
           CAST(tp AS DOUBLE) / n_orders AS avg_price
    FROM agg
    """,
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: merge a STORED partial rollup with a
    delta partition's partials instead of re-aggregating history.

    The base rollup (orders before {_CUTOFF}) is written to parquet as
    partials — (count, exact decimal sum) per (month, status) — then read
    back and merged with the delta's partials by re-aggregation.  Counts
    and decimal sums are associative, so merged == full recompute exactly
    (the oracle IS the full recompute); averages are derived only after
    the merge, never stored — the classic partial-agg rule Spark itself
    uses map-side, lifted to cross-run persistence.

    Reference scope: the reference re-ingests idempotently against an
    existing warehouse (/root/reference/etl/etl_ida.py op37/op38); this is
    the aggregate-side analogue.  100 TB: history is never rescanned —
    the stored rollup is O(groups) (~months x statuses), the delta scan is
    O(new data), and the merge shuffles only group-grain rows."""
    orders = table(spark, sf_dir, "orders")
    mes = F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias("mes")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(mes, "o_orderstatus").agg(
            F.count("*").alias("n_orders_p"),
            F.sum(F.col("o_totalprice").cast("decimal(38,2)")).alias("tp_p"),
        )

    store = _scratch_dir("xs5", sf_dir) + "/base_rollup"
    partials(orders.filter(F.col("o_orderdate") < _CUTOFF)).write.mode(
        "overwrite"
    ).parquet(store)
    base = spark.read.parquet(store)
    delta = partials(orders.filter(F.col("o_orderdate") >= _CUTOFF))

    merged = (
        base.unionByName(delta)
        .groupBy("mes", "o_orderstatus")
        .agg(
            F.sum("n_orders_p").alias("n_orders"),
            F.sum("tp_p").alias("tp"),
        )
    )
    return merged.select(
        "mes",
        "o_orderstatus",
        "n_orders",
        F.col("tp").cast("double").alias("total_price"),
        (F.col("tp").cast("double") / F.col("n_orders")).alias("avg_price"),
    )


@register(
    "xt17_segment_dedup",
    f"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
    seg AS (
        SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
               array_to_string(list_slice(toks, (i - 1) * {_SEG_LEN} + 1,
                                          i * {_SEG_LEN}), ' ') AS seg
        FROM t, unnest(range(1,
                 CAST(ceil(len(toks) / {_SEG_LEN}.0) AS BIGINT) + 1)) AS u(i)),
    k AS (
        SELECT doc_id, seg_idx, seg,
               (count(DISTINCT doc_id) OVER (PARTITION BY seg)) = 1 AS kept
        FROM seg)
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_segments,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS INTEGER) AS n_kept,
           coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
                        FILTER (WHERE kept), '') AS text_clean
    FROM k GROUP BY doc_id
    """,
)
def segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style segment-level corpus dedup: chunk each document into
    fixed {_SEG_LEN}-token segments, drop every segment that occurs in two
    or more DISTINCT documents anywhere in the corpus (boilerplate), and
    reassemble the survivors in original order.

    The corpus-wide frequency is a collect_set window partitioned by
    segment — ONE shuffle keyed on segment text — followed by the per-doc
    reassembly shuffle; no join back against a frequency table (which
    would add a third segment-keyed exchange).  Reassembly is
    order-deterministic: sort_array over (seg_idx, seg) structs, then
    array_join.

    100 TB: both shuffles are linear in corpus token count; the window
    state per segment key is the distinct-doc set of that segment, which
    boilerplate truncates at "2 means drop" — a production variant would
    cap the set (count > 1 is all that's consumed).  Reference scope:
    segment-grain generalization of the row-grain hash dedup op37
    (/root/reference/etl/etl_ida.py)."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    seg = base.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1), F.ceil(F.size("toks") / F.lit(float(_SEG_LEN))).cast("int")
            )
        ).alias("seg_idx"),
        "toks",
    ).select(
        "doc_id",
        "seg_idx",
        F.expr(
            f"array_join(slice(toks, (seg_idx - 1) * {_SEG_LEN} + 1, {_SEG_LEN}), ' ')"
        ).alias("seg"),
    )
    kept = F.size(F.collect_set("doc_id").over(Window.partitionBy("seg"))) == 1
    k = seg.withColumn("kept", kept)
    return k.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_segments"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("kept"),
                            F.struct(
                                F.col("seg_idx").alias("i"), F.col("seg").alias("s")
                            ),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
            " ",
        ).alias("text_clean"),
    )


@register(
    "xt18_tfidf_rarity_topk",
    """
    WITH tok AS (
        SELECT doc_id, source,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    tfreq AS (SELECT source, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    n AS (SELECT count(*) AS nd FROM documents),
    s AS (
        SELECT source, tfreq.term, tf, df,
               CAST(tf * nd AS DOUBLE) / df AS score
        FROM tfreq JOIN dfreq ON tfreq.term = dfreq.term, n)
    SELECT source, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           score, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, row_number() OVER (
              PARTITION BY source ORDER BY score DESC, term) AS rnk
          FROM s)
    WHERE rnk <= 5
    """,
)
def tfidf_rarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 corpus-distinctive terms per source by a rational TF-IDF
    variant: score = tf * (N / df), where df is corpus-wide document
    frequency and N the corpus size.  For fixed N the ordering equals
    classic tf * idf without calling log() — libm log differs across
    engines in the last ulp, so the rational form is what stays
    oracle-exact (same rule that shaped xq2's chi-square).

    Plan: one explode pass feeds BOTH aggregates (per-(source,term) tf and
    per-term df); the df side is vocabulary-sized and broadcast into the
    join; the final top-k is a WindowGroupLimit per source, never a global
    sort.  100 TB: shuffles are keyed on term (vocabulary-bounded) —
    Zipf makes the reduce side tiny relative to the token stream."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tfreq = tok.groupBy("source", "term").agg(F.count("*").alias("tf"))
    n = docs.agg(F.count("*").alias("nd"))
    s = (
        tfreq.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "term",
            "tf",
            "df",
            ((F.col("tf") * F.col("nd")).cast("double") / F.col("df")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), "term")
    return (
        s.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("source", "term", "tf", "df", "score", "rnk")
    )
