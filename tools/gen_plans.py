"""Regenerate PLANS.md — formatted physical plans of headline queries
with reviewer notes.  Usage: python tools/gen_plans.py"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PICKS = {
    "flagship_taxa_variacao": "the reference's one query: joins -> filter -> monthly AVG -> LAG -> pct-change -> pivot",
    "tpch_q5_region_revenue": "star join: one fact-fact shuffle, all dims broadcast",
    "tpch_q5_bucketed": "r12 production arm: same star join, fact-fact exchange DELETED by the bucketed-at-rest layout (broadcast dim joins preserve the scans' distribution)",
    "op16_unpivot_measures": "wide->long with zero shuffles (single Expand)",
    "x02b_minhash_lsh_pairs": "MinHash banding: candidates via equi-join, no cartesian",
    "x08_topk_per_key": "ranked filter compiled to WindowGroupLimit",
    "tpch_q6_forecast_revenue": "full predicate pushdown into the parquet scan",
    "tpch_q19_disjunctive": "OR-of-ANDs: Catalyst derives per-table prefilters and pushes both scans",
    "tpch_q21_suppliers_kept_waiting": "EXISTS/NOT EXISTS -> LeftSemi + LeftAnti on the same shuffle key",
    "xt3_doc_chunking": "overlap chunking: Generate from array intrinsics, no hash shuffle",
    "xt7_zscore_by_group": "group stats aggregated then broadcast back -- no corpus-wide Window",
    "xt8_contamination_overlap": "eval-set n-gram index probed via BroadcastHashJoin; corpus n-gram stream never shuffles for the join",
    "xt10_sequence_packing": "packing cumsum is a shard-partitioned window, never a global single partition",
    "xt11_vocab_topk": "rank<=100 pushed below the window as TakeOrderedAndProject",
    "x11_funnel_conversion": "ordered funnel as conditional-min aggregates: two hash aggregates, no per-stage self-joins",
    "tpch_q18_large_orders": "aggregate-once rewrite: the HAVING sum is carried through the join; ONE lineitem scan (r4)",
    "xs1_zorder_key_orders": "Morton key as pure shift/mask expressions inside WholeStageCodegen; top-10 via TakeOrderedAndProject (r4)",
    "xq1_constraint_audit": "whole constraint suite = ONE aggregate pass per table (conditional counts), inline() unpack (r5)",
    "xt15_domain_mixture_epochs": "tiny per-source plan broadcast back onto the corpus; explode materialization is a pure map stage (r5)",
    "x13_cdc_apply_latest_state": "changelog apply: both windows share one key shuffle; tombstone filter after rank (r5)",
    "x14_bloom_membership_filter": "bounded bit-position table probed via 3 BroadcastHashJoins -- the probe side never shuffles before the final per-month aggregate (r5b)",
    "xs5_incremental_rollup_merge": "stored partials (parquet scan, O(groups)) + delta partials (pushed date filter) merged by re-aggregation -- history never rescanned (r5b)",
    "xt17_segment_dedup": "corpus-wide segment frequency as a collect_set window: exactly two exchanges (segment, doc) for the whole dedup (r5b)",
    "xt18_tfidf_rarity_topk": "one explode feeds both tf and df aggregates; df side broadcast; top-5 per source via partial+final WindowGroupLimit (r5b)",
    "xs9_bucketed_join_colocated": "both fact scans Bucketed: true; ZERO Exchange below the fact-fact SMJ -- the only shuffle is the 5-group final aggregate (r5c)",
    "xs12_change_data_feed": "version diff reads ONLY buckets whose owning commit differs (commit-log pruning); full-outer join + null-safe struct classify within them (r5c)",
    "xt19_inverted_index_search": "term probe is a pushed In(token) filter on token-sorted postings -- row-group skip, not a posting-table scan (r5c)",
    "xq4_revenue_trend_regression": "broadcast dim join, monthly aggregate with map-side partials, 5-row regroup; normal equations stay integer-exact to the last division (r5c)",
    "xt20_ngram_containment_pairs": "shingle posting self-equi-join: candidate cost is shared-content mass, never n-squared (r5c)",
    "xq7_gini_revenue": "global-rank statistic with NO full-data single partition: bucket ids from quantile bounds, offset cumsum over <=64 rows, rank windows partitioned by bucket (r5d)",
    "xq8_weighted_median_price": "weighted quantile via global prefix sum: per-bucket weight carries, integer crossing test -- the naive SUM OVER (ORDER BY v) form never appears (r5d)",
    "xq5_concurrent_sessions": "sweep line as two-level prefix sum: intra-day cumsum windows partitioned by day; the only SinglePartition exchange carries one row per day (r5d)",
    "x19_fuzzy_entity_match": "deletion-neighborhood blocking: both sides explode to delete-1 variants, hash equi-join, exact levenshtein confirm -- no CartesianProduct/BNLJ anywhere (r5d)",
    "xt21_dup_span_stats": "k-gram assembly is ONE doc-keyed window (7 LEADs share a sort); first-occurrence flagging is ONE hash-keyed window; both partitioned, two linear shuffles total (r5d)",
    "xt22_collocations_pmi": "bigram counts from the same token explode as unigrams; both unigram joins broadcast; top-20 is TakeOrderedAndProject on the exact log-free ratio (r5d)",
    "x17b_rolling_active_users": "rolling 7-day distinct: fixed fan-out explode + broadcast day spine + two-phase distinct count -- no range join, no windowed COUNT DISTINCT (r5d)",
}


def _scale_slopes() -> dict[str, str]:
    """Measured wall-vs-data slopes per query from the latest replicated
    scale probe (artifacts/SCALE_PROBE_r5.json), rendered as one line to
    sit next to the audited plan — plan shape says what executes, the
    slope says it holds when the data grows."""
    import json

    path = Path(__file__).resolve().parent.parent / "artifacts" / "SCALE_PROBE_r5.json"
    if not path.exists():
        return {}
    probe = json.loads(path.read_text())
    lines = {}
    for name, r in probe["queries"].items():
        by_factor = ", ".join(f"{k}×: {v:.2f}s" for k, v in sorted(r.items(), key=lambda kv: int(kv[0])))
        slopes = ", ".join(f"{k}: {v}×" for k, v in probe["slopes"].get(name, {}).items())
        lines[name] = f"**Measured scale slope** ({by_factor}; wall growth {slopes})"
    return lines


def main() -> None:
    import __spark_entry__ as e
    from ida_dataengineerproject_spark.session import get_spark

    spark = get_spark("plans-doc")
    qs = e.queries()
    slopes = _scale_slopes()
    out = [
        "# PLANS — formatted physical plans of headline queries",
        "",
        "Generated by tools/gen_plans.py at sf0.001 (plan shape is scale-invariant;",
        "AQE may further improve joins at runtime). What to look for is noted per plan;",
        "tests/test_plan_quality.py pins these properties.  Queries covered by the",
        "replicated scale probe (tools/scale_probe.py, BASELINE.md round-5 table)",
        "carry their measured wall-vs-data slope next to the plan.",
        "",
    ]
    for name, note in PICKS.items():
        df = qs[name](spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", f"*{note}*", ""]
        if name in slopes:
            out += [slopes[name], ""]
        out += ["```", tree, "```", ""]
    Path("PLANS.md").write_text("\n".join(out))
    print(f"PLANS.md written ({len(out)} sections/lines)")


if __name__ == "__main__":
    main()
