"""Replicated-scale probe: does wall time scale ~linearly with data?

The correctness gate runs at sf0.01/sf0.1; this tool manufactures
10x/100x replicas of sf0.1 (re-keyed so join/group cardinalities scale
realistically) and times the headline queries at each factor.  The claim
under test is the 100 TB posture: Spark's fixed per-job cost dominates at
toy scale (the "overhead-floor" bench rows), so wall time should grow
MUCH slower than data until data cost takes over, and ~linearly after.

Re-keying, per copy i (SHIFT = 10^9 per copy):
- orders/lineitem/customer/part/supplier: every key column shifted by
  i*SHIFT — each copy is a disjoint key range, so joins match only within
  a copy and per-key group sizes stay constant (no artificial hot keys);
- events: event_id/user_id shifted — per-user session structure constant;
- documents: doc_id shifted AND every whitespace token prefixed with
  "c<i>x" — a token bijection, so within-copy shingle/Jaccard structure
  is EXACTLY preserved while cross-copy MinHash/SimHash collisions are
  eliminated (naive replication would add ~N^2 cross-copy near-dup pairs
  per original document — an artifact that measures the replication, not
  the engine);
- embeddings: id shifted, each vector component deterministically
  perturbed by +/-5e-4 (hash of id and position) — identical vectors
  across copies would pile into the same LSH buckets (x03b) with x N
  density, again an artifact.

Replicas are materialized once under --out (default /tmp/scale_probe)
and reused; timing is bench-style (noop sink, 2 runs, best).

Usage: python tools/scale_probe.py [--factors 1,10,100] [--out DIR] [names...]
Prints one JSON line; the round workflow records it as SCALE_PROBE.json
and BASELINE.md carries the slope table.
"""

from __future__ import annotations

import json
import os
import sys
import time

SHIFT = 10**9

# key columns to shift per table (disjoint key ranges per copy)
KEY_SHIFTS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DEFAULT_QUERIES = [
    "flagship_taxa_variacao",
    "flagship_taxa_variacao_sql",
    "tpch_q1_pricing_summary",
    "tpch_q9_product_profit",
    "tpch_q18_large_orders",
    "tpch_q21b_aggregate_rewrite",
    "x02b_minhash_lsh_pairs",
    "x02d_dedup_components",
    "x03b_cosine_topk_lsh",
    "x05_sessionize_events",
    "pipeline_prepare_documents",
    "xt15_domain_mixture_epochs",
    "x13_cdc_apply_latest_state",
    "x14_bloom_membership_filter",
    "xs5_incremental_rollup_merge",
    "xt17_segment_dedup",
    "xt18_tfidf_rarity_topk",
]

# dims that stay small at any scale — replicated (keys must exist per
# copy? no: region/nation keys are NOT shifted, one copy suffices)
SINGLE_COPY = {"region", "nation"}


def replicate_table(spark, src_dir: str, name: str, factor: int, out_dir: str):
    from pyspark.sql import functions as F

    from ida_dataengineerproject_spark.sources.tables import table

    base = table(spark, src_dir, name)
    copies = []
    for i in range(factor):
        df = base
        for k in KEY_SHIFTS[name]:
            df = df.withColumn(k, F.col(k) + F.lit(i * SHIFT))
        if name == "documents" and factor > 1:
            # token bijection: prefix every non-space run — preserves
            # within-copy similarity structure exactly, kills cross-copy
            # shingle collisions
            df = df.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"c{i}x$1")
            )
        if name == "embeddings" and factor > 1:
            # deterministic +/-5e-4 perturbation per (id, position)
            df = df.withColumn(
                "embedding",
                F.expr(
                    "transform(embedding, (x, j) -> "
                    "cast(x + (pmod(hash(vec_id, j), 1001) - 500) / 1000000.0 "
                    "as float))"
                ),
            )
        copies.append(df)
        if name in SINGLE_COPY:
            break
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def materialize(spark, src_dir: str, factor: int, root: str) -> str:
    """Build (or reuse) the replicated sf directory for `factor`."""
    out_dir = os.path.join(root, f"x{factor}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for name in KEY_SHIFTS:
        replicate_table(spark, src_dir, name, factor, out_dir)
    with open(marker, "w") as fh:
        fh.write(str(factor))
    return out_dir


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    factors = [1, 10, 100]
    out_root = "/tmp/scale_probe"
    for a in sys.argv[1:]:
        if a.startswith("--factors"):
            factors = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--out"):
            out_root = a.split("=", 1)[1]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e
    from ida_dataengineerproject_spark.session import get_spark
    from ida_dataengineerproject_spark.sources.tables import load_tables

    spark = get_spark("scale_probe")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = e.queries()
    names = args or [n for n in DEFAULT_QUERIES if n in qs]

    # global warm pass: run every query once at the smallest factor,
    # untimed — the first query executed in a fresh session otherwise
    # absorbs one-time JIT/codegen/threadpool costs into its reading
    warm_dir = materialize(spark, src, factors[0], out_root)
    for n in names:
        try:
            qs[n](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass

    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for factor in factors:
        print(f"# materializing x{factor} ...", file=sys.stderr, flush=True)
        sf_dir = materialize(spark, src, factor, out_root)
        # warm-up: listing + footers, excluded from timings
        for df in load_tables(spark, sf_dir).values():
            try:
                df.limit(1).write.format("noop").mode("overwrite").save()
            except Exception:  # noqa: BLE001
                pass
        for n in names:
            try:
                best = 1e18
                for _ in range(2):
                    # clear persisted grains: the wall-vs-data slope must
                    # measure engine compute, not result-cache reads
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    qs[n](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                results[n][str(factor)] = round(best, 3)
                print(f"#   x{factor} {n}: {best:.2f}s", file=sys.stderr, flush=True)
            except Exception as exc:  # noqa: BLE001 — isolate per query
                results[n][str(factor)] = -1.0
                print(f"#   x{factor} {n}: ERR {exc}", file=sys.stderr, flush=True)

    slopes = {}
    for n in names:
        r = results[n]
        pairs = [
            (lo, hi)
            for lo, hi in zip(factors, factors[1:])
            if r.get(str(lo), -1) > 0 and r.get(str(hi), -1) > 0
        ]
        slopes[n] = {
            f"x{lo}->x{hi}": round(r[str(hi)] / r[str(lo)], 2) for lo, hi in pairs
        }
    print(
        json.dumps(
            {
                "metric": "scale_probe_wall_sec",
                "base_sf_dir": src,
                "factors": factors,
                "queries": results,
                "slopes": slopes,
            }
        )
    )


if __name__ == "__main__":
    main()
