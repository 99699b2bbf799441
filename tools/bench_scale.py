"""At-scale bench: Spark vs DuckDB oracle, per query, at a replicated
factor of sf0.1 (default x10 ≈ sf1: 6 M lineitem, 600 k documents).

Why: at sf0.1 most bench rows measure Spark's fixed per-job cost
(188/221 rows have a DuckDB denominator < 0.2 s — the "overhead floor").
This tool re-bases the adjudication one decade up, where both engines do
real data work, using the SAME same-session discipline as the r8 x24
crossover: one process, Spark and DuckDB interleaved per query, replica
materialized once (tools/scale_probe.py's re-keyed replication — joins,
groups, and similarity structure scale realistically, no artificial
cross-copy collisions).

Timing discipline (mirrors bench.py / BASELINE.md):
- Spark: per-table warm-up (listing+footers), then best of 2 runs per
  query through the noop sink with the result cache cleared between runs;
  sketch queries run their production (verify=False) path.
- DuckDB: one run per oracle (no JIT warm-up to absorb), default thread
  count (all cores — the same configuration the sf0.1 baseline used), a
  watchdog interrupts any oracle at --cap seconds (default 300) and the
  row records duckdb = null with a ">cap" note: Spark completed, the
  oracle did not.

Usage: python tools/bench_scale.py [--factor=10] [--cap=300] [names...]
       [--assert-ratios=PREV.json]
Prints one JSON line (full detail in artifacts/bench_scale_full.json).

--assert-ratios=PREV.json (r11, VERDICT r10 #6) turns the run into a
CI-shaped regression gate: after timing, every query that was <= 2x vs
DuckDB in PREV (a prior run of this tool at the same factor, e.g.
BENCH_SCALE100_r10.json) must still be within 2x * 1.2 now — the 20%
margin absorbs host jitter on top of the best-of-2 discipline both
engines already get.  Any regression past the margin lists the rows and
exits nonzero; the emitted JSON carries the verdict either way
("ratio_guard" key), so the same command both produces the round's
BENCH_SCALE100 artifact and asserts no at-scale row quietly rotted.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

# The data-bound slice of the registry: every query whose sf0.1 DuckDB
# denominator is >= 0.15 s or whose Spark wall is >= 0.8 s, all 22 TPC-H
# forms, the weak/retired perf rows, and the steep-slope probe queries.
DEFAULT_QUERIES = [
    "agg_variance_corr_exact", "exact_median_percentiles",
    "flagship_taxa_variacao", "flagship_taxa_variacao_bucketed",
    "fn_datetime", "fn_regex",
    "op16_unpivot_measures", "op20_variable_recode", "op25_record_hash",
    "pipeline_prepare_documents", "sample_fraction",
    "tpch_q1_pricing_summary", "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority", "tpch_q3_bucketed",
    "tpch_q4_priority_exists",
    "tpch_q5_region_revenue", "tpch_q5_bucketed",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q7_bucketed",
    "tpch_q8_market_share",
    "tpch_q9_product_profit", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q12_shipmode_priority", "tpch_q12_bucketed",
    "tpch_q13_customer_distribution", "tpch_q14_promo_effect",
    "tpch_q15_top_supplier", "tpch_q16_supplier_cnt",
    "tpch_q17_small_quantity", "tpch_q18_large_orders",
    "tpch_q18_bucketed",
    "tpch_q19_disjunctive", "tpch_q20_excess_availability",
    "tpch_q21_suppliers_kept_waiting", "tpch_q21b_aggregate_rewrite",
    "tpch_q21_bucketed", "tpch_q22_global_sales_opportunity",
    "tpch_q8_bucketed", "tpch_q10_bucketed",
    "x01_exact_dedup", "x01_bucketed",
    "x02_ngram_jaccard_pairs", "x02b_minhash_lsh_pairs",
    "x02c_simhash_pairs", "x02d_dedup_components",
    "x03b_cosine_topk_lsh", "x03d_cosine_topk_ivf",
    "x03f_semantic_dedup_keep", "x03g_semantic_dedup_lsh",
    "x03h_cosine_topk_pq",
    "x04b_lang_id", "x04c_quality_score", "x04e_fingerprint",
    "x05_sessionize_events",
    "x14_bloom_membership_filter", "x16_pagerank_bipartite",
    "x17b_rolling_active_users",
    "x22_corpus_source_jaccard", "x23_group_outlier_mad",
    "x24_triangle_count", "x26_heavyhitter_bigrams",
    "x30_rrf_fusion", "x31_ppjoin_pairs",
    "xmm_frame_sample",
    "xq8_weighted_median_price", "xq11_rfm_segmentation",
    "xq12_robust_group_stats", "xq16_time_weighted_value",
    "xq20_fifo_allocation", "xq23_basket_lift", "xq25_pareto_skyline",
    "xq29_target_encoding", "xq30_winsorized_mean",
    "xq32_fd_violation_audit", "xq34_promo_window_rollup",
    "xq35_pit_feature_join", "xq37_holt_trend_forecast",
    "xq41_star_ddl_audit",
    "xs4_zorder_pruned_scan", "xs10_vacuum_latest_state",
    "xs11_write_audit_publish", "xs13_mv_incremental_refresh",
    "xs14_shallow_clone_divergence", "xs15_dynamic_partition_overwrite",
    "xs16_merge_on_read_state", "xs6_merge_cow_state",
    "xt8_contamination_overlap", "xt9_repetition_filter",
    "xt12_cross_corpus_dedup", "xt12_bucketed",
    "xt14_ngram_vocab_estimate", "xt17_segment_dedup",
    "xt20_ngram_containment_pairs", "xt21_dup_span_stats",
    "xt27_dataset_datasheet", "xt31_length_token_correlation",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_view_sql(sf_dir: str, t: str) -> str:
    """Spark writes directory-parquet; plain sf dirs hold single files —
    glob both shapes."""
    p = os.path.join(sf_dir, f"{t}.parquet")
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    return f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet({src})"


def run_duck(oracles: dict, name: str, sf_dir: str, cap: float):
    """Best-of-2 timed oracle runs with an interrupt watchdog — the SAME
    discipline as the Spark side.  r9 change (was: one run): successive
    invocations of identical oracles measured up to 5× apart at the x10
    replica (xq20: 1.12 s vs 6.40 s; xt21: 1.04 s vs 2.48 s) — page-
    cache and host-CPU noise, not the engine — and a one-shot sample
    made the weak-row classification a coin flip.  Best-of-N on both
    engines compares the engines, not the noise floor.  Fresh connection
    per run: an interrupted connection's state is not worth trusting."""
    import duckdb

    best = None
    for _ in range(2):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(duck_view_sql(sf_dir, t))
        timer = threading.Timer(cap, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            con.execute(oracles[name]).fetchall()
            wall = time.perf_counter() - t0
            best = wall if best is None else min(best, wall)
        except Exception as exc:  # noqa: BLE001 — interrupted or real error
            wall = time.perf_counter() - t0
            if best is None:
                kind = (
                    f">{cap:g}s cap"
                    if wall >= cap * 0.95
                    else f"err: {exc}"[:200]
                )
                return None, kind
        finally:
            timer.cancel()
            con.close()
    return round(best, 3), None


def check_ratio_guard(prev_path: str, factor: int, rows: dict) -> dict:
    """Compare this run's ratios against a prior run's.  EVERY common
    row is guarded against its own prior ratio (r12; was: only rows
    previously <= 2x): a row's bound is ``max(2.0, prev_ratio) * 1.2``
    — rows inside the 2x contract must stay <= 2.4x, rows already
    outside it (retired/overhead-class) may not regress a further 20%.
    The old <=2x-only rule let a row that drifted 1.46x -> 2.02x fall
    OUT of the next round's guard set entirely (x26 in r12) — silent
    rot with the gate nominally green.  Returns the guard verdict dict
    ("ok" / "regressions" / skip note)."""
    with open(prev_path) as fh:
        prev = json.load(fh)
    if prev.get("factor") != factor:
        return {
            "skipped": f"factor mismatch: prev={prev.get('factor')}, "
            f"this run={factor}"
        }
    regressions = {}
    n_guarded = 0
    for name, pr in prev.get("queries", {}).items():
        if pr.get("ratio") is None:
            continue
        cur = rows.get(name, {})
        if cur.get("ratio") is None:
            continue  # not timed this run (err or capped oracle) — visible elsewhere
        n_guarded += 1
        bound = max(2.0, pr["ratio"]) * 1.2
        if cur["ratio"] > bound:
            regressions[name] = {
                "was": pr["ratio"],
                "now": cur["ratio"],
                "bound": round(bound, 2),
            }
    return {
        "prev": os.path.basename(prev_path),
        "margin": "max(2.0, prev_ratio) * 1.2 per row",
        "n_guarded": n_guarded,
        "ok": not regressions,
        **({"regressions": regressions} if regressions else {}),
    }


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    factor, cap, out_root = 10, 300.0, "/tmp/scale_probe"
    assert_prev = None
    for a in sys.argv[1:]:
        if a.startswith("--factor"):
            factor = int(a.split("=", 1)[1])
        if a.startswith("--cap"):
            cap = float(a.split("=", 1)[1])
        if a.startswith("--out"):
            out_root = a.split("=", 1)[1]
        if a.startswith("--assert-ratios"):
            assert_prev = a.split("=", 1)[1]

    import __spark_entry__ as e
    from scale_probe import materialize

    from ida_dataengineerproject_spark.queries.production import (
        production_overrides,
    )
    from ida_dataengineerproject_spark.session import get_spark
    from ida_dataengineerproject_spark.sources.tables import load_tables

    spark = get_spark("bench_scale")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = materialize(spark, src, factor, out_root)

    qs = {**e.queries(), **production_overrides()}
    oracles = e.oracle_sql()
    names = names or [n for n in DEFAULT_QUERIES if n in qs]

    for df in load_tables(spark, sf_dir).values():  # warm listing/footers
        try:
            df.limit(1).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass

    rows: dict[str, dict] = {}
    for i, name in enumerate(names):
        row: dict = {}
        try:
            best = 1e18
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            row["spark"] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 — isolate per query
            row["spark_err"] = f"{type(exc).__name__}: {exc}"[:300]
        if name in oracles:
            d, note = run_duck(oracles, name, sf_dir, cap)
            if d is not None:
                row["duckdb"] = d
            else:
                row["duckdb_note"] = note
        if "spark" in row and row.get("duckdb"):
            row["ratio"] = round(row["spark"] / row["duckdb"], 2)
        rows[name] = row
        print(f"# [{i+1}/{len(names)}] {name}: {row}", file=sys.stderr, flush=True)

    timed = [r for r in rows.values() if "spark" in r and "duckdb" in r]
    result = {
        "metric": "bench_scale_wall_sec",
        "factor": factor,
        "base_sf_dir": src,
        "replica_dir": sf_dir,
        "duckdb_cap_sec": cap,
        "n_queries": len(names),
        "spark_total": round(
            sum(r["spark"] for r in rows.values() if "spark" in r), 3
        ),
        "duckdb_total_completed": round(
            sum(r["duckdb"] for r in timed), 3
        ),
        "spark_total_on_completed": round(
            sum(r["spark"] for r in timed), 3
        ),
        "n_duckdb_capped": sum(
            1 for r in rows.values() if "cap" in r.get("duckdb_note", "")
        ),
        "weak_rows_gt2x": sorted(
            n for n, r in rows.items() if r.get("ratio", 0) > 2
        ),
        "queries": rows,
    }
    if assert_prev:
        result["ratio_guard"] = check_ratio_guard(assert_prev, factor, rows)
    full = os.path.join(REPO, "artifacts", "bench_scale_full.json")
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    guard = result.get("ratio_guard", {})
    if guard.get("regressions"):
        print(
            f"# RATIO GUARD FAILED: {guard['regressions']}",
            file=sys.stderr,
        )
        sys.exit(1)
    if guard.get("skipped"):
        # ADVICE r11: a factor/file mis-wiring must not silently disable
        # the regression gate while appearing to run it — the caller
        # asked for assertion, so a skipped guard is a failed invocation
        print(
            f"# RATIO GUARD SKIPPED (treated as failure): "
            f"{guard['skipped']}",
            file=sys.stderr,
        )
        sys.exit(2)


if __name__ == "__main__":
    main()
