"""Round-5 quality/composition operators: constraint audit, domain
mixture epochs, quality-weighted sampling, CDC apply — plus the bloom
runtime-filter plan evidence."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------- xq1


def test_constraint_audit_detects_injected_violations(spark, tmp_path):
    """Doctor a copy of the smoke tables with known violations and assert
    the audit counts each one exactly (not just zeros on clean data)."""
    from ida_dataengineerproject_spark.queries.quality_ops import (
        constraint_audit,
    )
    from ida_dataengineerproject_spark.sources.tables import table

    sf = str(tmp_path)
    o = table(spark, SF_SMOKE, "orders").limit(50)
    # duplicate 2 orderkeys, null 3 custkeys, 1 bad status, 2 negative prices
    dup = o.limit(2)
    o2 = (
        o.unionByName(dup)
        .withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 17 < 1, None).otherwise(
                F.col("o_custkey")
            ),
        )
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") == 3, "X").otherwise(
                F.col("o_orderstatus")
            ),
        )
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey").isin(5, 7), -1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
    )
    n_null = o2.filter(F.col("o_custkey").isNull()).count()
    o2.coalesce(1).write.parquet(f"{sf}/orders.parquet")
    li = table(spark, SF_SMOKE, "lineitem").limit(100)
    li2 = li.withColumn(
        "l_quantity",
        F.when(F.col("l_linenumber") == 1, F.lit(0.0)).otherwise(
            F.col("l_quantity")
        ),
    )
    n_zero_qty = li2.filter(F.col("l_quantity") <= 0).count()
    li2.coalesce(1).write.parquet(f"{sf}/lineitem.parquet")

    got = {
        r["constraint_name"]: r["violations"]
        for r in constraint_audit(spark, sf).collect()
    }
    assert got["orders.o_orderkey_unique"] == 2
    assert got["orders.o_custkey_complete"] == n_null
    assert got["orders.o_orderstatus_in_set"] == 1
    assert got["orders.o_totalprice_nonnegative"] == 2
    assert got["lineitem.l_quantity_positive"] == n_zero_qty
    assert got["lineitem.l_discount_in_unit_range"] == 0
    assert got["lineitem.l_shipdate_complete"] == 0


def test_constraint_audit_single_scan_per_table(spark):
    """The suite must stay one aggregate pass per table: exactly one
    orders scan and one lineitem scan in the physical plan."""
    from ida_dataengineerproject_spark.queries.quality_ops import (
        constraint_audit,
    )

    plan = (
        constraint_audit(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("orders.parquet") == 1
    assert plan.count("lineitem.parquet") == 1


# ---------------------------------------------------------------- xt15


def test_domain_mixture_epochs_is_deterministic_and_conserving(spark):
    from ida_dataengineerproject_spark.queries.quality_ops import (
        domain_mixture_epochs,
    )

    a = domain_mixture_epochs(spark, SF_SMOKE).collect()
    b = domain_mixture_epochs(spark, SF_SMOKE).collect()
    assert a == b  # md5 coin: same membership every run

    total_in = sum(r["n_in"] for r in a)
    total_out = sum(r["n_out"] for r in a)
    # budget preservation up to binomial noise on the fractional parts:
    # each source contributes at most n_in coin flips
    assert abs(total_out - total_in) < total_in * 0.5
    for r in a:
        # per-source: n_out within [floor(e)*n, ceil(e)*n]
        import math

        lo = math.floor(r["epochs"]) * r["n_in"]
        hi = math.ceil(r["epochs"]) * r["n_in"]
        assert lo <= r["n_out"] <= hi, r
    # weighting direction: weighted sources (idx<5) get ~2x the epochs
    eps = {r["source"]: r["epochs"] for r in a}
    assert eps["src0"] == pytest.approx(2 * eps["src5"], rel=1e-9)


def test_domain_mixture_no_wide_shuffle_before_summary(spark):
    """The corpus side must reach the explode via broadcast only — the
    only exchanges are for the tiny per-source aggregates and the final
    20-row summary, never a repartition of the full corpus."""
    from ida_dataengineerproject_spark.queries.quality_ops import (
        domain_mixture_epochs,
    )

    df = domain_mixture_epochs(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # documents joins the plan via BroadcastHashJoin, not SortMergeJoin
    assert "SortMergeJoin" not in plan, plan


# ---------------------------------------------------------------- xt16


def test_quality_weighted_sample_prefers_long_docs(spark):
    """Keep-rate must increase with doc length: compare empirical keep
    rates of short vs long halves of the corpus."""
    from ida_dataengineerproject_spark.queries.quality_ops import _coin
    from ida_dataengineerproject_spark.sources.tables import table

    docs = table(spark, SF_SMOKE, "documents")
    p = F.col("n_chars").cast("double") / (F.col("n_chars") + F.lit(200.0))
    med = docs.approxQuantile("n_chars", [0.5], 0.01)[0]
    kept = docs.withColumn("keep", _coin(F.col("doc_id"), p).cast("int"))
    rates = (
        kept.groupBy((F.col("n_chars") > med).alias("long_doc"))
        .agg(F.avg("keep").alias("rate"))
        .collect()
    )
    by = {r["long_doc"]: r["rate"] for r in rates}
    assert by[True] > by[False]


# ---------------------------------------------------------------- x13


def test_cdc_apply_latest_state_small_golden(spark, tmp_path):
    """Hand-built changelog: upserts win by (ts, event_id), tombstone
    ('error') as the latest record deletes the key."""
    import datetime as dt

    from ida_dataengineerproject_spark.queries.quality_ops import (
        cdc_apply_latest_state,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two upserts — latest value wins
        (1, t0, 1, "view", 10.0, "{}"),
        (2, t0 + dt.timedelta(hours=1), 1, "click", 20.0, "{}"),
        # user 2: upsert then tombstone — deleted
        (3, t0, 2, "view", 30.0, "{}"),
        (4, t0 + dt.timedelta(hours=1), 2, "error", 0.0, "{}"),
        # user 3: tombstone then upsert — alive (tombstone not latest)
        (5, t0, 3, "error", 0.0, "{}"),
        (6, t0 + dt.timedelta(hours=1), 3, "purchase", 40.0, "{}"),
        # user 4: same ts tie — higher event_id wins
        (7, t0, 4, "view", 1.0, "{}"),
        (8, t0, 4, "click", 2.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = {
        r["user_id"]: (r["last_type"], r["last_value"], r["n_events"])
        for r in cdc_apply_latest_state(spark, sf).collect()
    }
    assert got == {
        1: ("click", 20.0, 2),
        3: ("purchase", 40.0, 2),
        4: ("click", 2.0, 2),
    }


def test_cdc_apply_single_key_shuffle(spark):
    """State apply must shuffle exactly once on the key: both window
    functions share one partition spec → one Exchange hashpartitioning
    over user_id (plus only the final output sort)."""
    from ida_dataengineerproject_spark.queries.quality_ops import (
        cdc_apply_latest_state,
    )

    df = cdc_apply_latest_state(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(user_id") == 1, plan


# ------------------------------------------------- bloom runtime filter


def test_bloom_runtime_filter_injects_might_contain(spark):
    """100 TB posture evidence: with runtime bloom filters enabled Spark
    injects a bloom-filter semi-join reduction (might_contain on the fact
    side) for a selective dim filter — the engine-native version of a
    manual bloom pre-filter.  Thresholds are lowered for toy data, then
    restored."""
    from ida_dataengineerproject_spark.sources.tables import table

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in [
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "1B",
        )
        # force a shuffle join: bloom injection only helps non-broadcast
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = table(spark, SF_SMOKE, "lineitem")
        p = table(spark, SF_SMOKE, "part").filter(F.col("p_brand") == "Brand#1")
        j = li.join(p, li.l_partkey == p.p_partkey).groupBy("p_brand").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


# ---------------------------------------------------------------- xq2


def test_drift_chisq_detects_injected_shift(spark, tmp_path):
    """Shift one category's second-half frequency and assert its
    contribution dominates; on unshifted data all contributions are
    near-zero relative to the shifted case."""
    import datetime as dt

    from ida_dataengineerproject_spark.queries.quality_ops import drift_chisq

    jan = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # balanced 200 view / 200 click in each half...
    for half_start in (jan, dt.datetime(2024, 1, 20)):
        for i in range(200):
            rows.append((eid, half_start + dt.timedelta(minutes=i), i % 50, "view", 1.0, "{}")); eid += 1
        for i in range(200):
            rows.append((eid, half_start + dt.timedelta(minutes=i), i % 50, "click", 1.0, "{}")); eid += 1
    # ...plus a burst of 300 extra 'error' only in the second half
    for i in range(300):
        rows.append((eid, dt.datetime(2024, 1, 25) + dt.timedelta(minutes=i), i % 50, "error", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = {r["event_type"]: r["chisq_contrib"] for r in drift_chisq(spark, sf).collect()}
    assert got["error"] > 100  # the injected drift dominates
    assert got["error"] > 3 * max(got["view"], got["click"])


def test_drift_chisq_single_scan(spark):
    from ida_dataengineerproject_spark.queries.quality_ops import drift_chisq

    plan = (
        drift_chisq(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("events.parquet") == 1  # both periods in one pass


# ---------------------------------------------------------------- xq3


def test_snapshot_diff_classifies_all_four_ways(spark):
    """Hand-built version pair covering every category, including
    'added' (absent from the registered derivation, which only drops and
    modifies): the classification logic must handle all four."""
    from ida_dataengineerproject_spark.queries.quality_ops import _coin  # noqa: F401

    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, h string"
    )
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "doc_id2 long, h2 string"
    )
    joined = v1.join(v2, v1.doc_id == v2.doc_id2, "full_outer")
    status = (
        F.when(F.col("doc_id2").isNull(), "removed")
        .when(F.col("doc_id").isNull(), "added")
        .when(F.col("h") != F.col("h2"), "changed")
        .otherwise("unchanged")
    )
    got = {
        r["status"]: r["n"]
        for r in joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_totals_consistent(spark):
    """On the registered derivation: removed ≈ 5%, changed ≈ 10% of
    survivors, unchanged the rest; categories partition v1 ∪ v2."""
    from ida_dataengineerproject_spark.queries.quality_ops import snapshot_diff
    from ida_dataengineerproject_spark.sources.tables import table

    got = {r["status"]: r["n_docs"] for r in snapshot_diff(spark, SF_SMOKE).collect()}
    n = table(spark, SF_SMOKE, "documents").count()
    assert got.get("added", 0) == 0
    assert sum(got.values()) == n
    assert 0 < got["removed"] < n * 0.15
    assert 0 < got["changed"] < n * 0.25


def test_regression_matches_numpy_polyfit(spark):
    """xq4's integer-exact normal equations agree with numpy's
    least-squares fit on the same (x, y) points to float precision."""
    import numpy as np

    from ida_dataengineerproject_spark.queries.quality_ops import (
        revenue_trend_regression,
    )
    from ida_dataengineerproject_spark.sources.tables import table

    got = {
        r["c_mktsegment"]: (r["slope"], r["intercept"])
        for r in revenue_trend_regression(spark, SF_SMOKE).collect()
    }

    o = table(spark, SF_SMOKE, "orders")
    c = table(spark, SF_SMOKE, "customer")
    pts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            (
                (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
            ).alias("x"),
        )
        .agg(
            F.floor(F.sum(F.col("o_totalprice").cast("decimal(38,6)")))
            .cast("long")
            .alias("y")
        )
        .collect()
    )
    by_seg: dict[str, list[tuple[int, int]]] = {}
    for r in pts:
        by_seg.setdefault(r["c_mktsegment"], []).append((r["x"], r["y"]))
    assert set(by_seg) == set(got)
    for seg, xy in by_seg.items():
        xs = np.array([p[0] for p in xy], dtype=float)
        ys = np.array([p[1] for p in xy], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(got[seg][0] - slope) < 1e-4, seg
        assert abs(got[seg][1] - intercept) < 1e-2 * max(1.0, abs(intercept)), seg
