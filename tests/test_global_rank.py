"""Contract tests for operators/ranking.global_rank.

The bucketed two-level rank must equal the naive single-partition
window rank exactly, for any bucket boundaries — including the
degenerate constant-column case where every boundary dedupes away.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ida_dataengineerproject_spark.operators.ranking import global_rank
from ida_dataengineerproject_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def _naive(df, value_col, tiebreaks):
    w = Window.orderBy(value_col, *tiebreaks)
    return df.withColumn("rank", F.row_number().over(w))


def test_equals_naive_window_rank(spark):
    rev = (
        table(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").cast("long").alias("v"))
    )
    got = {
        r["o_custkey"]: r["rank"]
        for r in global_rank(rev, "v", ["o_custkey"]).collect()
    }
    want = {
        r["o_custkey"]: r["rank"]
        for r in _naive(rev, "v", ["o_custkey"]).collect()
    }
    assert got == want
    n = len(want)
    assert sorted(got.values()) == list(range(1, n + 1))


def test_constant_column_degenerates_to_one_bucket(spark):
    df = spark.createDataFrame(
        [(i, 42) for i in range(100)], ["id", "v"]
    )
    got = {
        r["id"]: r["rank"] for r in global_rank(df, "v", ["id"]).collect()
    }
    # all values equal -> rank follows the tiebreak alone
    assert got == {i: i + 1 for i in range(100)}


def test_heavy_skew_still_exact(spark):
    # 90% of rows share one hot value; boundaries collapse around it
    rows = [(i, 7) for i in range(900)] + [(900 + i, i) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = global_rank(df, "v", ["id"]).collect()
    want = {r["id"]: r["rank"] for r in _naive(df, "v", ["id"]).collect()}
    assert {r["id"]: r["rank"] for r in got} == want


def test_only_bounded_single_partition_exchange(spark):
    rev = (
        table(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").cast("long").alias("v"))
    )
    df = global_rank(rev, "v", ["o_custkey"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # exactly one SinglePartition exchange: the <=n_buckets offset cumsum
    assert plan.count("Arguments: SinglePartition") == 1, plan


def test_prefix_sum_equals_naive(spark):
    from ida_dataengineerproject_spark.operators.ranking import (
        global_prefix_sum,
    )

    li = table(spark, SF, "lineitem")
    g = li.groupBy(F.col("l_extendedprice").alias("v")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("wgt")
    )
    got = {
        r["v"]: r["cum_weight"]
        for r in global_prefix_sum(g, "v", "wgt").collect()
    }
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["v"]: r["cw"]
        for r in g.withColumn("cw", F.sum("wgt").over(w)).collect()
    }
    assert got == want


def test_weighted_median_crossing_semantics(spark):
    from ida_dataengineerproject_spark.operators.ranking import (
        global_prefix_sum,
    )

    # weights: 1,1,8 over values 10,20,30 -> half of 10 is 5, first value
    # whose cumulative weight (1,2,10) doubles past 10 is 30
    df = spark.createDataFrame(
        [(10.0, 1), (20.0, 1), (30.0, 8)], ["v", "wgt"]
    )
    ps = global_prefix_sum(df, "v", "wgt", out_col="cumw")
    got = (
        ps.where(2 * F.col("cumw") >= 10)
        .agg(F.min("v").alias("m"))
        .collect()[0]["m"]
    )
    assert got == 30.0


def test_null_values_rank_first_not_dropped(spark):
    """ADVICE r5: NULL value_col rows were silently dropped (NULL bucket
    id fails the offsets join).  They must rank FIRST, matching the
    naive window's NULLS FIRST default."""
    df = spark.createDataFrame(
        [(i, None if i % 7 == 0 else float(i * 3 % 50)) for i in range(200)],
        "id long, v double",
    )
    got = {
        (r["id"], r["rank"])
        for r in global_rank(df, "v", ["id"], n_buckets=8).collect()
    }
    want = {
        (r["id"], r["rank"]) for r in _naive(df, "v", ["id"]).collect()
    }
    assert got == want  # same cardinality AND same ranks


def test_prefix_sum_null_values_kept_nulls_first(spark):
    from ida_dataengineerproject_spark.operators.ranking import (
        global_prefix_sum,
    )

    df = spark.createDataFrame(
        [(i, None if i % 5 == 0 else float(i % 13), i % 3 + 1)
         for i in range(100)],
        "id long, v double, w long",
    )
    got = global_prefix_sum(df, "v", "w", tiebreak_cols=["id"], n_buckets=6)
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("cum_weight", F.sum("w").over(w))
    assert {
        (r["id"], r["cum_weight"]) for r in got.collect()
    } == {(r["id"], r["cum_weight"]) for r in want.collect()}


def test_grouped_rank_equals_naive_partitioned_window(spark):
    df = spark.createDataFrame(
        [(i % 4, float((i * 7) % 23), i) for i in range(300)],
        "g int, v double, id long",
    )
    got = {
        (r["g"], r["id"], r["rank"])
        for r in global_rank(
            df, "v", ["id"], n_buckets=8, group_cols=["g"]
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r["g"], r["id"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_exact_percentiles_plan_has_no_group_buffer(spark):
    """VERDICT r5 #3: exact_median_percentiles must not buffer a whole
    group in one percentile() aggregation buffer, and every window must
    carry a partition spec (parallel or bounded input)."""
    from ida_dataengineerproject_spark.queries.extras import q_percentiles

    df = q_percentiles(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "percentile(" not in plan
    for line in plan.splitlines():
        if "Window [" in line:
            assert "windowspecdefinition(" in line
            # both windows are partitioned: row-rank by (group, bucket),
            # offsets by group over ≤ groups×buckets count rows
            assert "l_returnflag" in line


def test_grouped_quantiles_matches_percentile_and_ignores_nulls(spark):
    from ida_dataengineerproject_spark.operators.ranking import (
        grouped_quantiles,
    )

    df = spark.createDataFrame(
        [
            (i % 3, None if i % 11 == 0 else float((i * 13) % 97))
            for i in range(400)
        ],
        "g int, v double",
    )
    got = {
        (r["g"], round(r["q25"], 9), round(r["q50"], 9), round(r["q90"], 9))
        for r in grouped_quantiles(
            df, "v", ["g"], {"q25": 0.25, "q50": 0.5, "q90": 0.9}, n_buckets=8
        ).collect()
    }
    want = {
        (r["g"], round(r["p"][0], 9), round(r["p"][1], 9), round(r["p"][2], 9))
        for r in df.groupBy("g")
        .agg(F.expr("percentile(v, array(0.25, 0.5, 0.9))").alias("p"))
        .collect()
    }
    assert got == want


def test_grouped_trimmed_mean_matches_naive_with_ties_and_nulls(spark):
    from ida_dataengineerproject_spark.operators.ranking import (
        grouped_trimmed_mean,
    )

    # heavy duplicate values (mod 7) so trim boundaries cut inside tie
    # runs; group 2 is tiny (k=0 → plain mean); NULLs excluded
    rows = [
        (i % 3 if i < 390 else 2, None if i % 29 == 0 else float((i * 5) % 7))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {
        r["g"]: round(r["trimmed_mean"], 9)
        for r in grouped_trimmed_mean(
            df, "v", ["g"], 0.1, n_buckets=4
        ).collect()
    }
    want = {}
    for gk in {r[0] for r in rows}:
        vals = sorted(v for g_, v in rows if g_ == gk and v is not None)
        k = int(len(vals) * 0.1)
        kept = vals[k : len(vals) - k]
        want[gk] = round(sum(kept) / len(kept), 9)
    assert got == want


def test_grouped_trimmed_mean_bounds_reuse_is_result_invariant(spark):
    from ida_dataengineerproject_spark.operators.ranking import (
        grouped_trimmed_mean,
    )

    df = spark.createDataFrame(
        [(i % 2, float((i * 13) % 101)) for i in range(300)],
        "g int, v double",
    )
    a = {
        r["g"]: r["trimmed_mean"]
        for r in grouped_trimmed_mean(df, "v", ["g"], 0.05).collect()
    }
    # deliberately terrible boundaries: all mass in one bucket
    b = {
        r["g"]: r["trimmed_mean"]
        for r in grouped_trimmed_mean(
            df, "v", ["g"], 0.05, bounds=[1000.0, 2000.0]
        ).collect()
    }
    assert a == b


def test_weighted_quantile_crossing_matches_naive_and_handles_ties(spark):
    from ida_dataengineerproject_spark.operators.ranking import (
        weighted_quantile_crossing,
    )

    # duplicate values across rows on purpose: crossing MIN must be
    # tie-order invariant without pre-aggregation
    df = spark.createDataFrame(
        [(float((i * 7) % 40), (i % 5) + 1) for i in range(500)],
        "v double, w long",
    )
    got = weighted_quantile_crossing(df, "v", "w").collect()[0]
    rows = sorted((r["v"], r["w"]) for r in df.collect())
    total = sum(w for _, w in rows)
    cum = 0
    naive_m = None
    for v, w in rows:
        cum += w
        if 2 * cum >= total:
            naive_m = v
            break
    assert got["weighted_median"] == naive_m
    assert got["w_total"] == total


def test_global_prefix_max_equals_naive_window(spark):
    """Bucketed exclusive prefix max == the single-partition window it
    replaces, including NULL for the global first row and descending
    tiebreaks."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ida_dataengineerproject_spark.operators.ranking import (
        global_prefix_max,
    )

    rows = [
        (i, random.Random(i).randint(0, 40), random.Random(i * 13).randint(0, 999))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "id long, o long, v long").withColumn(
        "negv", -F.col("v")
    )
    got = {
        r["id"]: r["pm"]
        for r in global_prefix_max(
            df, "o", "v", ["negv", "id"], n_buckets=16, out_col="pm"
        ).collect()
    }
    w = Window.orderBy("o", "negv", "id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = {
        r["id"]: r["pm"]
        for r in df.withColumn("pm", F.max("v").over(w)).collect()
    }
    assert got == want


def test_skyline_is_pareto_optimal(spark):
    """Every skyline point is undominated, and every non-skyline point
    IS dominated — checked against the full point set in Python."""
    from ida_dataengineerproject_spark.queries.allocation_ops import (
        q_pareto_skyline,
    )
    from ida_dataengineerproject_spark.queries.tpch_partsupp import (
        synth_partsupp,
    )
    from pyspark.sql import functions as F

    SF = "/root/testdata/sf0.001"
    pp = (
        synth_partsupp(spark, SF)
        .groupBy("ps_partkey")
        .agg(
            F.min("ps_supplycost").alias("cost"),
            F.sum("ps_availqty").alias("avail"),
        )
    )
    pts = {
        (round(r["cost"], 2), r["avail"])
        for r in pp.select("cost", "avail").distinct().collect()
    }
    sky = {
        (r["cost"], r["avail"])
        for r in q_pareto_skyline(spark, SF).collect()
    }
    def dominated(p, qs):
        return any(
            q[0] <= p[0] and q[1] >= p[1] and q != p for q in qs
        )
    for p in sky:
        assert not dominated(p, pts), p
    for p in pts - sky:
        assert dominated(p, pts), p


def test_robust_stats_rejects_degenerate_trim_frac(spark):
    """ADVICE r6: trim_frac >= 0.5 makes the divisor n - 2k zero or
    negative — must raise, not return NULL/garbage."""
    import pytest

    from ida_dataengineerproject_spark.operators.ranking import (
        grouped_robust_stats,
    )

    df = spark.range(10).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(ValueError, match="trim_frac"):
        grouped_robust_stats(df, "v", ["g"], trim_frac=0.5)


def test_grouped_quantiles_band_matches_percentile_both_regimes(spark):
    """Sketch-band exact quantiles == Spark's exact percentile, in the
    small-n whole-collect regime AND the sketch-band regime (accuracy
    forced below n/2), with duplicate values and NULLs in play."""
    from ida_dataengineerproject_spark.operators.ranking import (
        grouped_quantiles_band,
    )

    rows = []
    for g in ("a", "b"):
        for i in range(501):
            rows.append((g, float((i * 7) % 101)))  # heavy ties
        rows.append((g, None))
    df = spark.createDataFrame(rows, ["g", "v"])
    qs = {"p10": 0.1, "med": 0.5, "p90": 0.9}
    want = {
        r["g"]: (r["p10"], r["med"], r["p90"])
        for r in df.groupBy("g")
        .agg(
            *[
                F.expr(f"percentile(v, {q})").alias(n)
                for n, q in qs.items()
            ]
        )
        .collect()
    }
    for acc in (10000, 100):  # 1002 rows: whole-collect vs sketch band
        got = {
            r["g"]: (r["p10"], r["med"], r["p90"])
            for r in grouped_quantiles_band(
                df, "v", ["g"], qs, accuracy=acc
            ).collect()
        }
        assert got == want, f"accuracy={acc}"


def test_order_statistic_tuples_match_naive_ranks(spark):
    """Boundary tuples equal the naive row_number scan at (n·k) div 3,
    per dimension, with value ties broken by the tiebreak column —
    both regimes."""
    from ida_dataengineerproject_spark.operators.ranking import (
        order_statistic_tuples,
    )

    rows = [(i, (i * 13) % 50, (i * 7) % 23) for i in range(700)]
    df = spark.createDataFrame(rows, ["ck", "x", "y"])
    cuts = {"b1": (1, 3), "b2": (2, 3)}
    naive = {}
    for dim in ("x", "y"):
        ordered = sorted(rows, key=lambda r: (r[{"x": 1, "y": 2}[dim]], r[0]))
        n = len(ordered)
        for name, (num, den) in cuts.items():
            t = (n * num) // den
            v, ck = (
                (None, None)
                if t == 0
                else (ordered[t - 1][{"x": 1, "y": 2}[dim]], ordered[t - 1][0])
            )
            naive[f"{dim}_{name}"] = (v, ck)
    for acc in (2000, 100):
        row = order_statistic_tuples(df, ["x", "y"], "ck", cuts, accuracy=acc).collect()[0]
        for key, (v, ck) in naive.items():
            tup = row[key]
            assert (tup["v"], tup["tb"]) == (v, ck), f"{key} accuracy={acc}"
