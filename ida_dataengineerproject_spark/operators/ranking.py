"""Distributed global ranking without a single-partition sort (round 5d).

``row_number() OVER (ORDER BY v)`` with no PARTITION BY moves the whole
table through one task — the classic Spark scaling cliff (WindowExec
warns, and at 100 TB it simply doesn't run).  The exact rewrite:

1. pick ~``n_buckets`` approximate quantile boundaries of the order
   column (``approxQuantile`` — Greenwald-Khanna, deterministic, one
   pass, driver gets a bounded float list);
2. assign each row a bucket with a monotone chain of codegen'd
   comparisons (equal values always share a bucket, so bucket order
   refines to total order);
3. per-bucket offsets = running sum over the bucket COUNTS — a window
   over <= n_buckets rows (bounded, the only single-partition step);
4. global rank = offset + row_number within the bucket (window
   partitioned by bucket).

Ranks are EXACT and identical to the naive global window for any
boundary choice — boundaries only balance work.  Skewed order columns
degrade gracefully: a bucket holding one hot value processes that
value's rows in one task, same as any rank-by definition must.

Used by xq7_gini_revenue; the same primitive serves ECDF, exact
top-percent cuts, and rank-based statistics at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _with_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    bounds: list[float] | None = None,
) -> DataFrame:
    """Attach ``__bucket``: a monotone, codegen'd bucket id from
    approximate quantile boundaries (equal values always share a
    bucket, so bucket order refines to total order).  ``bounds`` lets a
    caller ranking several columns of one frame batch all boundary
    probes into a single multi-column approxQuantile job.

    NULL ``value_col`` rows land in a dedicated bucket -1 that sorts
    before every boundary bucket — NULLS FIRST, matching Spark's default
    ascending ``ORDER BY`` the naive global window would apply.  (Without
    the guard, ``v > lit(b)`` is NULL for NULL v, the bucket id is NULL,
    and the offsets join silently DROPPED those rows — ADVICE r5.)"""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    if bounds is None:
        bounds = df.approxQuantile(value_col, probs, 0.001)
    # dedupe preserving order (constant columns yield repeated bounds)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    v = F.col(value_col)
    # balanced addition tree, not a left-deep reduce chain: identical
    # codegen'd per-row work (one comparison per boundary, whole-stage
    # codegen intact), but depth log2(n) instead of n — Catalyst
    # re-analyzes this expression inside every operator that embeds the
    # bucketed frame, and deep left-nested trees made that planning walk
    # the dominant cost of the whole primitive at toy scale (measured
    # 3.7 s → 2.3 s cold on a minimal 64-bucket DAG).
    terms: list[Column] = [(v > F.lit(b)).cast("int") for b in uniq]
    if not terms:
        terms = [F.lit(0)]
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    bucket = F.when(v.isNull(), F.lit(-1)).otherwise(terms[0])
    return df.withColumn("__bucket", bucket)


def _with_buckets_fused(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
) -> DataFrame:
    """``_with_buckets`` with the boundary probe INSIDE the plan: a
    1-row min/max aggregate broadcast-cross-joined onto the rows,
    bucket id = equal-width bin index between min and max (codegen'd
    floor arithmetic, no Python, no sketch).

    Removes the eager driver-side ``approxQuantile`` job entirely —
    boundary probing, bucket counting, and ranking all run in ONE
    Spark job (the r8 profiles showed the eager probe is ~60-70% of
    the wall for small single-statistic queries).  A plan-embedded
    ``percentile_approx`` HOF variant was built and MEASURED SLOWER
    than the eager form it replaced (2.44 s vs 1.34 s on xq8 at
    sf0.1): Catalyst does NOT reuse the aggregate across the branches
    that embed the bucketed frame, so the sketch pass ran once per
    branch.  min/max pays the same per-branch duplication but each
    pass is a cheap codegen'd hash aggregate (measured 0.82 s total).

    Tradeoff vs quantile boundaries: equal-width bins balance work
    only for roughly-uniform value distributions — heavy value skew
    concentrates rows in few buckets and fattens the in-bucket window
    task.  Callers with unknown/skewed distributions should keep the
    eager quantile probe (``fused=False``); correctness is unaffected
    either way (buckets only balance work).  Same contract as
    ``_with_buckets``: monotone buckets (equal values share one),
    NULLs in dedicated bucket -1.  A constant column (max == min)
    degenerates to one bucket, never a NULL bucket."""
    mm = df.agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )
    v = F.col(value_col)
    span = (F.col("__hi") - F.col("__lo")).cast("double")
    idx = F.floor(
        (v - F.col("__lo")).cast("double") / (span / n_buckets)
    ).cast("int")
    bucket = F.when(v.isNull(), F.lit(-1)).otherwise(
        F.when(span <= 0, F.lit(0)).otherwise(
            F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), idx))
        )
    )
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn("__bucket", bucket)
        .drop("__lo", "__hi")
    )


def global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    n_buckets: int = 32,
    rank_col: str = "rank",
    bounds: list[float] | None = None,
    group_cols: list[str] | None = None,
    fused: bool = False,
) -> DataFrame:
    """Attach a 1-based dense row number ordered by
    (value_col, *tiebreak_cols) — globally, or WITHIN each distinct
    ``group_cols`` tuple when given (the scale-safe replacement for
    ``row_number() OVER (PARTITION BY g ORDER BY v)`` when single groups
    are too big for one task).  Requires (value_col, tiebreaks) unique
    per row (per group) for a deterministic total order; rank-position
    consumers that only read the VALUE at a rank (quantiles) tolerate
    duplicate values with an empty tiebreak.

    One quantile-boundary set serves every group — boundaries only
    balance work, never affect correctness; the offsets frame grows to
    (groups × buckets) rows, still bounded commit metadata for the
    grouped-aggregate cardinalities this serves.  ``fused=True`` embeds
    the boundary probe in the plan (_with_buckets_fused) instead of an
    eager driver-side approxQuantile job — right when the caller has no
    shared multi-column probe to batch into."""
    g = list(group_cols or [])
    with_bucket = (
        _with_buckets_fused(df, value_col, n_buckets)
        if fused and bounds is None
        else _with_buckets(df, value_col, n_buckets, bounds)
    )
    counts = with_bucket.groupBy(*g, "__bucket").agg(
        F.count("*").alias("__n")
    )
    w_off = Window.partitionBy(*g).orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        *g,
        "__bucket",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
    )
    w_in = Window.partitionBy(*g, "__bucket").orderBy(
        value_col, *tiebreak_cols
    )
    return (
        with_bucket.join(F.broadcast(offsets), g + ["__bucket"])
        .withColumn(
            rank_col, F.col("__offset") + F.row_number().over(w_in)
        )
        .drop("__bucket", "__offset")
    )


def grouped_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: dict[str, float],
    n_buckets: int = 32,
    bounds: list[float] | None = None,
    fused: bool = False,
) -> DataFrame:
    """Exact continuous quantiles (``quantile_cont`` semantics — linear
    interpolation at position q·(n−1)) per group, WITHOUT a per-group
    sort buffer: one grouped two-level rank (bounded windows only), one
    broadcast of the (groups × quantiles) target-rank frame, one
    filtered interpolating aggregate.  Returns one row per group with a
    column per ``quantiles`` key.  ``fused=True`` embeds the boundary
    probe in the plan (_with_buckets_fused — equal-width min/max bins,
    no eager approxQuantile job); right for roughly-uniform value
    columns, see that docstring for the skew tradeoff.

    NULL values are excluded, matching SQL ``median``/``percentile``.
    The scale-safe replacement for ``percentile(col, array(...))``
    GROUP BY — which buffers an entire group in one task's aggregation
    buffer (the r5 scale cliff).

    Unlike a full grouped rank, NO window ever touches the data: the
    per-(group, bucket) COUNT aggregate (map-side combined, tiny) gives
    both the bucket offsets and the group totals; each target rank is
    located in its owning bucket relationally; only the rows of TARGET
    buckets (≈ quantiles/n_buckets of the data) are re-read through a
    broadcast join and ranked locally per bucket.  The full table is
    scanned, never shuffled."""
    g = list(group_cols)
    src = df.select(*g, value_col).filter(F.col(value_col).isNotNull())
    wb = (
        _with_buckets_fused(src, value_col, n_buckets)
        if fused and bounds is None
        else _with_buckets(src, value_col, n_buckets, bounds)
    )
    counts = wb.groupBy(*g, "__bucket").agg(F.count("*").alias("__n"))
    w_off = Window.partitionBy(*g).orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        *g,
        "__bucket",
        "__n",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    totals = counts.groupBy(*g).agg(F.sum("__n").alias("__tot"))
    targets = totals.select(
        *g,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("__qname"),
                        (F.lit(q) * (F.col("__tot") - 1)).alias("__pos"),
                    )
                    for name, q in quantiles.items()
                ]
            )
        ).alias("__t"),
    ).select(
        *g,
        F.col("__t.__qname").alias("__qname"),
        (F.floor("__t.__pos") + 1).alias("__lo"),
        (F.col("__t.__pos") - F.floor("__t.__pos")).alias("__frac"),
    )
    # the bucket(s) owning ranks {lo, lo+1}: [__off+1, __off+__n] must
    # intersect that pair — __off <= lo and __off + __n >= lo (equal
    # values always share a bucket, so the straddle spans <= 2 buckets)
    target_buckets = (
        targets.join(offs, g)
        .filter(
            (F.col("__off") <= F.col("__lo"))
            & (F.col("__off") + F.col("__n") >= F.col("__lo"))
        )
        .select(*g, "__bucket", "__qname", "__lo", "__frac", "__off")
    )
    v = F.col(value_col)
    cand = wb.join(F.broadcast(target_buckets), g + ["__bucket"])
    w_in = Window.partitionBy(*g, "__bucket", "__qname").orderBy(value_col)
    per_q = (
        cand.withColumn("__r", F.col("__off") + F.row_number().over(w_in))
        .filter(F.col("__r").between(F.col("__lo"), F.col("__lo") + 1))
        .groupBy(*g, "__qname")
        .agg(
            F.sum(
                F.when(F.col("__r") == F.col("__lo"), v * (1 - F.col("__frac")))
                .when(F.col("__r") == F.col("__lo") + 1, v * F.col("__frac"))
            ).alias("__qv")
        )
    )
    return (
        per_q.groupBy(*g).pivot("__qname", list(quantiles)).agg(F.first("__qv"))
    )


def grouped_robust_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    trim_frac: float = 0.05,
    quantiles: dict[str, float] | None = None,
    n_buckets: int = 32,
    bounds: list[float] | None = None,
    sum_scale: int = 6,
    trimmed_col: str = "trimmed_mean",
) -> DataFrame:
    """Two-sided trimmed mean AND exact continuous quantiles per group
    from ONE histogram and ONE candidate pass — one row per group:
    ``group_cols + [trimmed_col] + list(quantiles)``.

    Trimmed mean: drop the k = floor(n·trim_frac) smallest and largest
    values, average the rest.  The naive form ranks the whole group
    (``row_number() OVER (PARTITION BY g ORDER BY v)``) just to discard
    2k rows; at 100 TB that is a full-data shuffle plus a per-group sort
    buffer.  Bucket-targeted instead: the per-(group, bucket) COUNT +
    exact-decimal SUM aggregate (map-side combined, tiny) plus the
    bounded offsets frame classify every bucket as fully kept (rank
    interval inside (k, n−k] — its presummed decimal total counts
    as-is), fully dropped, or boundary; only boundary buckets and
    quantile-straddle buckets (≈(2+2q)/n_buckets of the data) are
    re-read through one broadcast join and ranked in-bucket.  Quantile
    values interpolate at position q·(n−1) (``quantile_cont``), exactly
    as grouped_quantiles.  No full-data shuffle, no unbounded window —
    and, versus composing grouped_trimmed_mean + grouped_quantiles, one
    table scan and one Catalyst planning pass fewer (planning of the
    n_buckets-term bucket expression is the dominant toy-scale cost).

    Exactness: sums accumulate in DECIMAL(38, sum_scale) end to end
    (order-independent), cast to double only for the final division —
    bit-identical to the oracle's ``SUM(CAST(v AS DECIMAL(38,s)))
    FILTER (...) / COUNT(...)``.  The trimmed count is n − 2k
    analytically.  Ties need no tiebreak column: any choice of which
    equal-valued rows fall at rank ≤ k removes the same multiset of
    values, so the trimmed sum is invariant.  NULL values are excluded
    (matching aggregate semantics).  ``bounds`` lets the caller reuse
    one approxQuantile boundary probe across primitives on the same
    column (boundaries only balance work, never affect the result)."""
    if not 0 <= trim_frac < 0.5:
        # the divisor n - 2k is positive iff trim_frac < 0.5 (k = floor
        # (n·tf) ≤ n·tf < n/2); at 0.5+ the trimmed mean is undefined
        # and would silently yield NULL/garbage (ADVICE r6)
        raise ValueError(
            f"trim_frac must be in [0, 0.5), got {trim_frac}"
        )
    g = list(group_cols)
    q = dict(quantiles or {})
    dec = f"decimal(38,{sum_scale})"
    v = F.col(value_col)
    src = df.select(*g, value_col).filter(v.isNotNull())
    wb = _with_buckets(src, value_col, n_buckets, bounds)
    hist = wb.groupBy(*g, "__bucket").agg(
        F.count("*").alias("__n"), F.sum(v.cast(dec)).alias("__s")
    )
    w_off = Window.partitionBy(*g).orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = hist.select(
        *g,
        "__bucket",
        "__n",
        "__s",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    params = hist.groupBy(*g).agg(F.sum("__n").alias("__tot")).select(
        *g,
        "__tot",
        F.floor(F.col("__tot") * trim_frac).alias("__k"),
    )
    tagged = offs.join(F.broadcast(params), g)
    kept_lo, kept_hi = F.col("__k"), F.col("__tot") - F.col("__k")
    # bucket rank interval is (__off, __off + __n]
    is_full = (F.col("__off") >= kept_lo) & (
        F.col("__off") + F.col("__n") <= kept_hi
    )
    is_dropped = (F.col("__off") + F.col("__n") <= kept_lo) | (
        F.col("__off") >= kept_hi
    )
    zero = F.lit(0).cast(dec)
    fulls = (
        tagged.filter(is_full)
        .groupBy(*g)
        .agg(F.sum("__s").alias("__full"))
    )
    # candidate buckets needing in-bucket ranks, one row per purpose:
    # trim-boundary rows (__qname '__trim') and quantile-straddle rows
    # (one per quantile name; a bucket serving several purposes appears
    # several times — the rank window partitions by __qname so each
    # copy is ranked independently)
    trim_cand = tagged.filter(~is_full & ~is_dropped).select(
        *g,
        "__bucket",
        "__off",
        "__k",
        "__tot",
        F.lit("__trim").alias("__qname"),
        F.lit(None).cast("long").alias("__lo"),
        F.lit(None).cast("double").alias("__frac"),
    )
    cand = trim_cand
    if q:
        targets = params.select(
            *g,
            "__k",
            "__tot",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("__qname"),
                            (F.lit(p) * (F.col("__tot") - 1)).alias("__pos"),
                        )
                        for name, p in q.items()
                    ]
                )
            ).alias("__t"),
        ).select(
            *g,
            "__k",
            "__tot",
            F.col("__t.__qname").alias("__qname"),
            (F.floor("__t.__pos") + 1).alias("__lo"),
            (F.col("__t.__pos") - F.floor("__t.__pos")).alias("__frac"),
        )
        q_cand = (
            targets.join(offs.select(*g, "__bucket", "__n", "__off"), g)
            .filter(
                (F.col("__off") <= F.col("__lo"))
                & (F.col("__off") + F.col("__n") >= F.col("__lo"))
            )
            .select(
                *g, "__bucket", "__off", "__k", "__tot",
                "__qname", "__lo", "__frac",
            )
        )
        cand = trim_cand.unionByName(q_cand)
    w_in = Window.partitionBy(*g, "__bucket", "__qname").orderBy(value_col)
    ranked = wb.join(F.broadcast(cand), g + ["__bucket"]).withColumn(
        "__r", F.col("__off") + F.row_number().over(w_in)
    )
    agg_cols = [
        F.sum(
            F.when(
                (F.col("__qname") == "__trim")
                & (F.col("__r") > F.col("__k"))
                & (F.col("__r") <= F.col("__tot") - F.col("__k")),
                v.cast(dec),
            )
        ).alias("__part")
    ] + [
        F.sum(
            F.when(
                (F.col("__qname") == name)
                & (F.col("__r") == F.col("__lo")),
                v * (1 - F.col("__frac")),
            ).when(
                (F.col("__qname") == name)
                & (F.col("__r") == F.col("__lo") + 1),
                v * F.col("__frac"),
            )
        ).alias(name)
        for name in q
    ]
    row_stats = ranked.groupBy(*g).agg(*agg_cols)
    return (
        params.join(fulls, g, "left")
        .join(row_stats, g, "left")
        .select(
            *g,
            (
                (
                    F.coalesce(F.col("__full"), zero)
                    + F.coalesce(F.col("__part"), zero)
                ).cast("double")
                / (F.col("__tot") - 2 * F.col("__k"))
            ).alias(trimmed_col),
            *[F.col(name) for name in q],
        )
    )


def grouped_trimmed_mean(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    trim_frac: float = 0.05,
    n_buckets: int = 32,
    bounds: list[float] | None = None,
    sum_scale: int = 6,
    out_col: str = "trimmed_mean",
) -> DataFrame:
    """Two-sided trimmed mean per group; grouped_robust_stats with no
    quantile arm — see that docstring for the bucket-targeted design."""
    return grouped_robust_stats(
        df,
        value_col,
        group_cols,
        trim_frac,
        None,
        n_buckets,
        bounds,
        sum_scale,
        out_col,
    )


def weighted_quantile_crossing(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    q_num: int = 1,
    q_den: int = 2,
    n_buckets: int = 32,
    out_col: str = "weighted_median",
    total_col: str = "w_total",
    fused: bool = True,
) -> DataFrame:
    """One-row frame (out_col, total_col): the smallest value whose
    cumulative weight in value order reaches q_num/q_den of the total —
    the weighted median for the default 1/2, tested as
    ``q_den·cum ≥ q_num·W`` in exact integer arithmetic.

    Bucket-targeted (the grouped_quantiles shape): per-bucket weight
    totals (map-side-combined aggregate, tiny) locate the single
    crossing bucket via the bounded offsets frame; only THAT bucket's
    rows (≈1/n_buckets of the data) take the in-bucket cumulative
    window.  No full-data shuffle, no prefix sum over every row —
    against ``SUM(w) OVER (ORDER BY v)``'s single-partition sort.

    ``fused`` (default) embeds the boundary probe in the SAME plan
    (_with_buckets_fused) — no eager driver-side approxQuantile job;
    the r8 profile showed that eager job was 0.58 s of xq8's 1.00 s
    wall at sf0.1.

    Duplicate values need no pre-aggregation: the filtered set is a
    suffix of the value order, so MIN(value) over it is the crossing
    value regardless of tie order inside the window."""
    src = df.select(value_col, weight_col).filter(
        F.col(value_col).isNotNull()
    )
    wb = (
        _with_buckets_fused(src, value_col, n_buckets)
        if fused
        else _with_buckets(src, value_col, n_buckets)
    )
    bt = wb.groupBy("__bucket").agg(F.sum(weight_col).alias("__w"))
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = bt.select(
        "__bucket",
        "__w",
        F.coalesce(F.sum("__w").over(w_off), F.lit(0)).alias("__off"),
    )
    tot = bt.agg(F.sum("__w").alias("__tot"))
    target = (
        offs.crossJoin(F.broadcast(tot))  # 1-row total
        .filter(
            q_den * (F.col("__off") + F.col("__w"))
            >= q_num * F.col("__tot")
        )
        .orderBy("__bucket")
        .limit(1)  # bounded: <= n_buckets rows enter this sort
        .select("__bucket", "__off", "__tot")
    )
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        wb.join(F.broadcast(target), "__bucket")
        .withColumn(
            "__cum", F.col("__off") + F.sum(weight_col).over(w_in)
        )
        .filter(q_den * F.col("__cum") >= q_num * F.col("__tot"))
        .agg(
            F.min(value_col).alias(out_col),
            F.first("__tot").alias(total_col),
        )
    )


def global_prefix_sum(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = 32,
    out_col: str = "cum_weight",
) -> DataFrame:
    """Attach the inclusive running sum of ``weight_col`` in global
    (value_col, *tiebreak_cols) order — same bucket decomposition as
    global_rank with per-bucket WEIGHT totals as the carry.  Exact for
    integer weights (long accumulation in both levels).  This is the
    primitive behind weighted quantiles/medians at scale: the naive
    ``SUM(w) OVER (ORDER BY v)`` is a single-partition sort."""
    with_bucket = _with_buckets(df, value_col, n_buckets)
    totals = with_bucket.groupBy("__bucket").agg(
        F.sum(weight_col).alias("__w")
    )
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__w").over(w_off), F.lit(0)).alias("__offset"),
    )
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(value_col, *(tiebreak_cols or []))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        with_bucket.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            out_col, F.col("__offset") + F.sum(weight_col).over(w_in)
        )
        .drop("__bucket", "__offset")
    )


def global_prefix_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = 32,
    out_col: str = "prev_max",
) -> DataFrame:
    """Attach the running MAX of ``value_col`` over all rows STRICTLY
    BEFORE each row in global (order_col, *tiebreak_cols) order — NULL
    for the first row.  The naive ``MAX(v) OVER (ORDER BY o ROWS
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` is a single-partition sort;
    this is the same bucket decomposition as global_prefix_sum with a
    MAX carry: per-bucket maxima, an exclusive running max over the
    bounded bucket frame, and an intra-bucket exclusive-max window
    partitioned by bucket.

    The exclusive frame is what 2D skyline/Pareto pruning needs: a
    point survives iff its second dimension exceeds every strictly
    earlier point's."""
    with_bucket = _with_buckets(df, order_col, n_buckets)
    totals = with_bucket.groupBy("__bucket").agg(
        F.max(value_col).alias("__m")
    )
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__bucket", F.max("__m").over(w_off).alias("__carry")
    )
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(order_col, *(tiebreak_cols or []))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = F.max(value_col).over(w_in)
    return (
        with_bucket.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.greatest(F.col("__carry"), intra))
        .withColumn(
            out_col,
            F.coalesce(
                F.col(out_col), F.col("__carry"), intra
            ),
        )
        .drop("__bucket", "__carry")
    )


def grouped_quantiles_band(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: dict[str, float],
    accuracy: int = 2000,
) -> DataFrame:
    """Exact continuous quantiles per group (``quantile_cont`` semantics,
    identical to :func:`grouped_quantiles`) in TWO table scans, zero
    windows, zero joins on the data — the sketch-steered band rewrite.

    Pass 1 (one scan): per group, a Greenwald-Khanna sketch
    (``percentile_approx``, rank error ≤ n/accuracy guaranteed) locates
    a VALUE BAND [blo, bhi] around each target quantile, probed at
    q ± 4/accuracy; plus the exact group count.  Pass 2 (one scan, the
    band frame broadcast back on the group key): one combined aggregate
    computes, per quantile, the exact ``count(v < blo)`` and a bounded
    ``collect_list`` of the in-band values.  The final projection sorts
    each ≤ O(n/accuracy)-element band array and indexes the two straddle
    ranks — exact order statistics, so the OUTPUT is deterministic even
    though the sketch's merge order is not (the band only steers).

    Rank-slack proof, dual regime (margins must be literals — Spark
    requires a foldable percentage — so the regime switch is in-plan):
    - n ≥ 2·accuracy: ε·n ≥ 2 where ε = 1/accuracy.  blo probed at
      q−4ε has true rank ≤ (q−3ε)n ≤ qn−3 < r_lo; bhi probed at q+4ε
      has rank ≥ (q+3ε)n ≥ qn+3 > r_lo+1.  Both straddle ranks land
      inside the band with ≥1 rank of slack.
    - n < 2·accuracy: the sketch bound εn < 2 cannot cover the ±2-rank
      gap between the q·n and q·(n−1) conventions, so the band widens
      to the WHOLE group — an exact bounded collect (< 2·accuracy
      values, the same order of state as the sketch itself).

    Per-group state is ≤ max(10n/accuracy + tie mass, 2·accuracy)
    values — tunable; heavy ties at a band edge widen the collect by
    the tie mass (equal values are interchangeable at a rank, but all
    must be carried to index through them).  The replacement for the
    4-scan bucketed form when the caller wants plain quantiles; keep
    :func:`grouped_quantiles` for shared-bounds batch probes.

    ALL band probes ride ONE sketch per group — ``percentile_approx``
    with an array percentage (measured at the x10 replica: 4 separate
    sketch aggregates 2.20 s vs one 4-probe sketch 0.80 s at
    accuracy 10000, 0.44 s at 1000 — sketch maintenance, not probing,
    is the cost).  Default accuracy 2000 balances sketch insert cost
    against band collect size.

    EAGER/SNAPSHOT CONTRACT: building this plan runs one Spark job (the
    band scan is collected to the driver so the ≤64-group literal path
    can inline bounds as codegen'd literals; the >64-group path
    localCheckpoints the same frame).  The returned DataFrame therefore
    snapshots the SOURCE AS OF BUILD TIME for its band bounds and group
    counts: re-executing it after the underlying data changes reuses
    the stale bounds (the in-band confirm re-reads live data, so the
    result could be silently wrong, not just stale).  Rebuild the plan
    after any source mutation.  This is an intentional exception to the
    repo's "never an action in the plan-building path" pattern — the
    literal inlining is worth 3× on the hot pass (see measurements
    above) and the band grain is bounded by the grouping semantics.

    r11 (ADVICE r10): violation is now DETECTED at runtime — the confirm
    pass carries a live per-group count and every output value is gated
    on ``assert_true(live == snapshot)``, so executing a stale plan
    against mutated data fails the job with an explicit message instead
    of returning wrong quantiles (tests/test_band_paths.py).
    """
    g = list(group_cols)
    src = df.select(*g, value_col).filter(F.col(value_col).isNotNull())
    eps = 1.0 / accuracy
    names = list(quantiles)
    probes: list[float] = []
    for q in quantiles.values():
        probes.append(max(0.0, q - 4 * eps))
        probes.append(min(1.0, q + 4 * eps))
    # __chk: order-independent value checksum (bit_xor of xxhash64) —
    # with the count alone, an equal-count substitution (swap one
    # in-group value for another) passed the staleness guard silently
    # (ADVICE r11); the xor rides the same codegen aggregate for ~one
    # hash per row.  Residual blind spot: a mutation whose added AND
    # removed multisets each xor to the same value (e.g. swapping a
    # duplicate PAIR {a,a} for {b,b}) — count and xor both unchanged.
    bands = src.groupBy(*g).agg(
        F.count("*").alias("__tot"),
        F.bit_xor(F.xxhash64(value_col)).alias("__chk"),
        F.min(value_col).alias("__mn"),
        F.max(value_col).alias("__mx"),
        F.percentile_approx(
            value_col, F.array(*[F.lit(p) for p in probes]), F.lit(accuracy)
        ).alias("__bp"),
    )
    v = F.col(value_col)

    # Pass-2 structure (r9, measured at the x100 exact_median):
    # 1. SPLIT aggregates — a single aggregate carrying both the
    #    below-band sums AND the in-band collect_lists ran as ONE
    #    ObjectHashAggregate (collect_list is TypedImperative, dropping
    #    the sums out of whole-stage codegen too: ~10 s interpreted).
    #    Counts now ride a codegen HashAggregate over the full frame;
    #    collects run on a band-PREFILTERED frame that only ever holds
    #    the O(n/accuracy + ties) in-band rows.
    # 2. LITERAL band frame for bounded group counts — re-attaching the
    #    group-grain band row by broadcast join cost ~62 ns/row (a 3-row
    #    build measured 0.9 → 4.6 s on a 60 M-row sum pass: probe + row
    #    concat per row), and the un-materialized band frame re-ran the
    #    full GK sketch scan inside EVERY consumer.  For ≤ 64 groups the
    #    band row collapses to null-safe when-chains of literals — no
    #    join, no recompute, every hot pass pure codegen.  12.5 → ~4 s.
    #    Above 64 groups (or when a value resists F.lit) the broadcast-
    #    join form below is the scale path — when-chain width is per-row
    #    compare COUNT, fine at 64, wrong at 10^6 groups.
    band_rows = bands.collect()  # one job; grain = group count (bounded
    # by the caller's grouping semantics, same readout the sketch makes)
    literal_ok = 0 < len(band_rows) <= 64

    def _match(row):
        cond = None
        for k in g:
            e = F.col(k).eqNullSafe(F.lit(row[k]))
            cond = e if cond is None else (cond & e)
        return cond

    def _chain(rows, fn):
        """when-chain over groups: fn(row) -> literal value."""
        if not g:
            return F.lit(fn(rows[0]))
        e = None
        for row in rows:
            val = F.lit(fn(row))
            e = F.when(_match(row), val) if e is None else e.when(
                _match(row), val
            )
        return e

    if literal_ok:
        try:
            blos, bhis = {}, {}
            for i, name in enumerate(names):
                def lo_of(row, i=i):
                    if row["__tot"] < 2 * accuracy:
                        return row["__mn"]
                    return row["__bp"][2 * i]

                def hi_of(row, i=i):
                    if row["__tot"] < 2 * accuracy:
                        return row["__mx"]
                    return row["__bp"][2 * i + 1]

                blos[name] = _chain(band_rows, lo_of)
                bhis[name] = _chain(band_rows, hi_of)
            tot_expr = _chain(band_rows, lambda r: r["__tot"])
            chk_expr = _chain(band_rows, lambda r: r["__chk"])
        except Exception:  # noqa: BLE001 — unliteralizable value type
            literal_ok = False

    if not literal_ok:
        bands = bands.localCheckpoint()  # band scan must not re-run per
        # consumer; checkpoint replaces the collected literals
        if g:
            # NULL-SAFE band attach: a NULL group key is a legal grouping
            # value (groupBy puts all NULLs in one group), and a plain
            # equi-join here would silently drop every such row ONLY on
            # this >64-group path — the literal path's eqNullSafe
            # when-chains and the final rejoin already handle it.  Same
            # input must yield the same group set regardless of group
            # cardinality (tests/test_band_paths.py::
            # test_fallback_path_null_group_key).
            battach = bands
            for k in g:
                battach = battach.withColumnRenamed(k, f"__b_{k}")
            jcond = None
            for k in g:
                e = F.col(k).eqNullSafe(F.col(f"__b_{k}"))
                jcond = e if jcond is None else (jcond & e)
            # LEFT join (ADVICE r11): a live group ABSENT from the
            # snapshot (added after build) must reach the guard — the
            # old inner join silently dropped its rows here, so the new
            # group never surfaced at all.  With the left join its rows
            # carry NULL __tot/__chk, the guard condition evaluates
            # NULL, and assert_true(NULL) fails the job.
            joined = src.join(F.broadcast(battach), jcond, "left").drop(
                *[f"__b_{k}" for k in g]
            )
        else:
            joined = src.crossJoin(F.broadcast(bands))
        small = F.col("__tot") < F.lit(2 * accuracy)
        blos, bhis = {}, {}
        for i, name in enumerate(names):
            blos[name] = F.when(small, F.col("__mn")).otherwise(
                F.element_at("__bp", 2 * i + 1)
            )
            bhis[name] = F.when(small, F.col("__mx")).otherwise(
                F.element_at("__bp", 2 * i + 2)
            )
        tot_expr = F.col("__tot")
        chk_expr = F.col("__chk")
        src = joined

    # live per-group count + value checksum alongside the snapshots:
    # the runtime staleness guard (ADVICE r10/r11) — see the
    # assert_true below
    cnt_aggs = [
        F.first(tot_expr).alias("__tot"),
        F.count("*").alias("__tot_live"),
        F.first(chk_expr).alias("__chk"),
        F.bit_xor(F.xxhash64(v)).alias("__chk_live"),
    ]
    in_any_band = None
    for name in names:
        blo, bhi = blos[name], bhis[name]
        cnt_aggs.append(F.sum((v < blo).cast("long")).alias(f"__nb_{name}"))
        band_pred = (v >= blo) & (v <= bhi)
        in_any_band = (
            band_pred if in_any_band is None else (in_any_band | band_pred)
        )
    counts = (
        src.groupBy(*g).agg(*cnt_aggs) if g else src.groupBy().agg(*cnt_aggs)
    )
    col_aggs = []
    for name in names:
        blo, bhi = blos[name], bhis[name]
        col_aggs.append(
            F.sort_array(
                F.collect_list(F.when((v >= blo) & (v <= bhi), v))
            ).alias(f"__band_{name}")
        )
    jf = src.filter(in_any_band)
    collects = (
        jf.groupBy(*g).agg(*col_aggs) if g else jf.groupBy().agg(*col_aggs)
    )
    # group keys are the aggregate's own grain — the rejoin is tiny and
    # broadcast.  A group whose every row fell outside all bands cannot
    # exist (each band contains its straddle ranks by construction), but
    # a left join keeps the failure mode visible (NULL band → NULL out)
    # rather than silently dropping the group.  NULL-SAFE key equality:
    # a NULL group key is a legal grouping value on both sides, and a
    # plain equi-join would orphan its counts row from its collects row
    # (caught by tests/test_band_paths.py::test_literal_path_null_group_key).
    if g:
        right = collects
        for k in g:
            right = right.withColumnRenamed(k, f"__r_{k}")
        cond = None
        for k in g:
            e = F.col(k).eqNullSafe(F.col(f"__r_{k}"))
            cond = e if cond is None else (cond & e)
        got = counts.join(F.broadcast(right), cond, "left").drop(
            *[f"__r_{k}" for k in g]
        )
    else:
        got = counts.crossJoin(F.broadcast(collects))
    # RUNTIME STALENESS GUARD (ADVICE r10, strengthened r11→r12): the
    # band bounds, __tot and __chk are a BUILD-TIME snapshot; the
    # confirm pass reads LIVE data.  If the source mutated between
    # build and execution the result would be silently wrong — so every
    # output value is gated on BOTH the live per-group count and the
    # live value checksum matching their snapshots (assert_true returns
    # NULL on success and fails the job otherwise; per-GROUP-row cost
    # plus one hash per row in the counts aggregate).  Detection scope:
    # any add/remove of non-null values within a snapshotted group
    # (count), any equal-count substitution of values (checksum), a
    # wholly NEW group on either path (its snapshot columns are NULL —
    # unmatched when-chain on the literal path, LEFT-join miss on the
    # fallback path — and assert_true(NULL) throws).  A group fully
    # REMOVED from the source yields no live row at all: detectable
    # only by the caller (the output loses that group's row), not by a
    # row-level guard.  Residual blind spot: mutations whose added and
    # removed value multisets have equal size and equal xor (see the
    # __chk comment at the bands aggregate).
    stale_ok = F.assert_true(
        (F.col("__tot_live") == F.col("__tot"))
        & (F.col("__chk_live") == F.col("__chk")),
        F.lit(
            "grouped_quantiles_band: source changed since the plan was "
            "built (band bounds are a build-time snapshot) — rebuild the "
            "plan after any source mutation"
        ),
    )
    out = list(g)
    for name, q in quantiles.items():
        pos = F.lit(q) * (F.col("__tot") - 1).cast("double")
        lo_rank = F.floor(pos) + 1  # 1-based global rank of the floor value
        frac = pos - F.floor(pos)
        arr = F.col(f"__band_{name}")
        v_lo = F.element_at(arr, (lo_rank - F.col(f"__nb_{name}")).cast("int"))
        v_hi = F.element_at(
            arr, (lo_rank + 1 - F.col(f"__nb_{name}")).cast("int")
        )
        # frac == 0 is exact (q·(n−1) hits an integer only when the double
        # product is integral), and v_lo·1.0 ≡ v_lo bitwise — emit v_lo
        # directly so a missing rank-(lo+1) row can never inject a NULL.
        expr = F.when(frac == 0, v_lo.cast("double")).otherwise(
            v_lo.cast("double") * (F.lit(1.0) - frac)
            + v_hi.cast("double") * frac
        )
        out.append(F.when(stale_ok.isNull(), expr).alias(name))
    return got.select(*out)


def order_statistic_tuples(
    df: DataFrame,
    value_cols: list[str],
    tiebreak_col: str,
    rank_fracs: dict[str, tuple[int, int]],
    accuracy: int = 2000,
) -> DataFrame:
    """Exact (value, tiebreak) tuples at global rank positions
    ``(n·num) div den`` for EVERY dimension in ``value_cols`` — ONE row
    out, one struct column ``{vc}_{name}`` per (dimension, cut).
    Targets are RATIONAL on purpose: ``floor(n·(1/3))`` in doubles can
    land one rank off ``n div 3`` when the truncated binary fraction
    rounds down across an integer; integer arithmetic is
    convention-exact against a ``CAST(x // 3 AS ...)`` oracle.  Same
    sketch-band + in-band-confirm plan as
    :func:`grouped_quantiles_band` (two scans, zero windows).

    The boundary consumer's contract: ``row_number() OVER (ORDER BY v,
    tb)`` ≤ floor(frac·n)  ⇔  struct(v, tb) ≤ the returned boundary
    tuple (row_number over a UNIQUE (v, tb) order is exactly the tuple's
    rank).  A caller classifying rows into rank buckets (terciles,
    deciles at fixed fracs) therefore needs only these boundary tuples
    broadcast back — per-row classification is a codegen'd struct
    comparison, no rank column ever materializes.

    Band regime as in grouped_quantiles_band: whole-domain collect for
    n < 2·accuracy, sketch band at frac ± 4/accuracy otherwise (the
    target rank (n·num) div den sits strictly inside by ≥ 2 ranks).
    Ties in a value column are resolved by the in-band sort on (v, tb);
    the band is value-only, so all tuples sharing a boundary value ride
    the collect — tie mass bounds the state, exactly as the grouped
    form.  A rank target of 0 (num = 0, or n < den/num) has no boundary
    tuple: the struct is NULL and the caller must coalesce its
    comparison (no row has rank ≤ 0).

    ALL dimensions and ALL cut fractions share ONE bands pass and ONE
    confirm pass — per dimension a single array-probe sketch (sketch
    maintenance dominates; see grouped_quantiles_band).  Per-dimension
    NULL values are excluded from that dimension's count/band (aggregate
    semantics), matching a per-dimension ``WHERE v IS NOT NULL`` rank.

    EAGER/SNAPSHOT CONTRACT (same as :func:`grouped_quantiles_band`):
    plan construction collects the one-row band frame and inlines every
    bound, count, and rank target as a literal — including ``n`` itself.
    The returned DataFrame snapshots the source as of build time;
    re-executing after a source mutation mixes stale bounds/targets with
    live in-band data.  Rebuild after any mutation.  r11 (ADVICE r10):
    as in grouped_quantiles_band, violation now fails at runtime — the
    confirm aggregate carries live counts and every output is gated on
    ``assert_true(live == snapshot)``."""
    eps = 1.0 / accuracy
    src = df.select(*value_cols, F.col(tiebreak_col).alias("__tb"))
    probes: list[float] = []
    for num, den in rank_fracs.values():
        q = num / den
        probes.append(max(0.0, q - 4 * eps))
        probes.append(min(1.0, q + 4 * eps))
    def _vchk(vc: str) -> F.Column:
        # order-independent per-dimension value checksum (r12, same
        # rationale as grouped_quantiles_band's __chk): NULLs are
        # excluded so the checksum tracks exactly the values __n_{vc}
        # counts (bit_xor ignores NULL inputs; the when() maps null
        # rows to NULL)
        v = F.col(vc)
        return F.bit_xor(F.when(v.isNotNull(), F.xxhash64(v)))

    band_aggs = [F.count("*").alias("__tot")]
    for vc in value_cols:
        band_aggs += [
            F.count(vc).alias(f"__n_{vc}"),
            _vchk(vc).alias(f"__chk_{vc}"),
            F.min(vc).alias(f"__mn_{vc}"),
            F.max(vc).alias(f"__mx_{vc}"),
            F.percentile_approx(
                vc, F.array(*[F.lit(p) for p in probes]), F.lit(accuracy)
            ).alias(f"__bp_{vc}"),
        ]
    bands = src.groupBy().agg(*band_aggs)
    # The band frame is ONE row — read it out and inline every bound as
    # a literal (r9; same two defects grouped_quantiles_band had): the
    # un-materialized crossJoin re-ran the sketch scan inside the
    # confirm job, and one ObjectHashAggregate carrying sums +
    # collect_lists evaluated every row interpreted.  Now: counts ride a
    # codegen HashAggregate over literal comparisons, collects see only
    # the band-prefiltered rows, targets are exact driver-side integer
    # arithmetic.  Measured on xq11 (3 dimensions × 2 cuts over the
    # per-customer grain): 8.8 → ~5 s at the x100 replica.
    brow = bands.collect()[0]
    bounds: dict[tuple[str, str], tuple] = {}
    for vc in value_cols:
        n_vc = brow[f"__n_{vc}"]
        small = n_vc < 2 * accuracy
        for i, name in enumerate(rank_fracs):
            bp = brow[f"__bp_{vc}"]
            blo_v = brow[f"__mn_{vc}"] if small else (bp[2 * i] if bp else None)
            bhi_v = (
                brow[f"__mx_{vc}"] if small else (bp[2 * i + 1] if bp else None)
            )
            bounds[(vc, name)] = (blo_v, bhi_v)
    # live counts alongside the snapshot literals: the runtime staleness
    # guard (ADVICE r10) — see the assert_true gating below
    cnt_aggs = [F.count("*").alias("__tot_live")]
    for vc in value_cols:
        cnt_aggs += [
            F.count(vc).alias(f"__n_live_{vc}"),
            _vchk(vc).alias(f"__chk_live_{vc}"),
        ]
    in_any_band = None
    for vc in value_cols:
        v = F.col(vc)
        for name in rank_fracs:
            blo_v, bhi_v = bounds[(vc, name)]
            cnt_aggs.append(
                F.sum((v < F.lit(blo_v)).cast("long")).alias(
                    f"__nb_{vc}_{name}"
                )
            )
            band_pred = (v >= F.lit(blo_v)) & (v <= F.lit(bhi_v))
            in_any_band = (
                band_pred
                if in_any_band is None
                else (in_any_band | band_pred)
            )
    counts = src.groupBy().agg(*cnt_aggs)
    col_aggs = []
    for vc in value_cols:
        v = F.col(vc)
        for name in rank_fracs:
            blo_v, bhi_v = bounds[(vc, name)]
            col_aggs.append(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            (v >= F.lit(blo_v)) & (v <= F.lit(bhi_v)),
                            F.struct(
                                v.alias("v"), F.col("__tb").alias("tb")
                            ),
                        )
                    )
                ).alias(f"__band_{vc}_{name}")
            )
    collects = src.filter(in_any_band).groupBy().agg(*col_aggs)
    got = counts.crossJoin(F.broadcast(collects))
    _stale_msg = (
        "order_statistic_tuples: source changed since the plan was built "
        "(bounds/targets are a build-time snapshot) — rebuild the plan "
        "after any source mutation"
    )
    tot_ok = F.assert_true(
        F.col("__tot_live") == F.lit(brow["__tot"]), F.lit(_stale_msg)
    )
    out = [
        F.when(tot_ok.isNull(), F.lit(brow["__tot"]))
        .cast("long")
        .alias("n")
    ]
    for vc in value_cols:
        # count + checksum (r12): count alone passed an equal-count
        # value substitution silently; NULL-safe equality on the
        # checksum — both sides are NULL when the dimension has no
        # non-null values at all, which is a MATCH, not a mutation
        vc_ok = F.assert_true(
            (F.col(f"__n_live_{vc}") == F.lit(brow[f"__n_{vc}"]))
            & F.col(f"__chk_live_{vc}").eqNullSafe(
                F.lit(brow[f"__chk_{vc}"])
            ),
            F.lit(_stale_msg),
        )
        for name, (num, den) in rank_fracs.items():
            target = (brow[f"__n_{vc}"] * num) // den  # exact int, driver
            idx = (F.lit(target) - F.col(f"__nb_{vc}_{name}")).cast("int")
            out.append(
                # the when() keeps the struct type even when target <= 0
                # is decided at the driver (a bare F.lit(None) would be
                # NullType and break callers' struct comparisons)
                F.when(F.lit(target <= 0), F.lit(None))
                .otherwise(
                    F.when(
                        vc_ok.isNull(),
                        F.element_at(F.col(f"__band_{vc}_{name}"), idx),
                    )
                )
                .alias(f"{vc}_{name}")
            )
    return got.select(*out)
