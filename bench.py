"""Benchmark harness (driver contract + BASELINE.md procedure).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (no driver collect
overhead, no result caching).  First a warm-up pass touches every input file
so JVM/classloader/page-cache effects don't pollute query timings.

Usage: python bench.py [--duckdb] [names...]
  --duckdb also times the DuckDB oracle per query (fills BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def spark_time(fn, spark, sf_dir) -> float:
    # drop any persisted/cached relations first: queries that persist a
    # shared grain (flagship) would otherwise serve the SECOND timed run
    # from the result cache, and min-of-N would report cache-read time
    # instead of engine time.  The DuckDB denominator recomputes every
    # run — clearing Spark's result cache is the like-for-like timing.
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_duckdb = "--duckdb" in sys.argv

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as e
    from ida_dataengineerproject_spark.session import get_spark

    spark = get_spark("bench")

    # Sketch queries are timed on their PRODUCTION (verify=False) path:
    # the registered forms carry an exact-ground-truth contract arm for
    # the oracle, which is verification-harness cost, not engine cost.
    from ida_dataengineerproject_spark.queries.production import (
        production_overrides,
    )

    overrides = production_overrides()
    qs = {**e.queries(), **overrides}
    names = args or list(qs)

    # warm-up: materialize one tiny query per input table (file listing,
    # footer reads, codegen warmup) — excluded from timings
    from ida_dataengineerproject_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        try:
            df.limit(1).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001 — warm-up only, never fatal
            pass

    # two runs per query, keep the best: BASELINE.md measures warm runs;
    # run 1 absorbs codegen/classloader warmup for that plan shape.
    # Per-query isolation: one broken query records an "err" row and the
    # rest keep timing — a single failure must never zero the whole bench.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            timings[name] = round(
                min(spark_time(qs[name], spark, sf_dir) for _ in range(2)), 3
            )
        except Exception as exc:  # noqa: BLE001 — isolate, record, continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # timed on the sketch-only production path (registered oracle
        # forms add an exact ground-truth arm for correctness checking)
        "production_paths": sorted(n for n in names if n in overrides),
    }
    if errors:
        result["errors"] = errors

    if with_duckdb:
        import duckdb

        con = duckdb.connect()
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        duck: dict[str, float] = {}
        oracles = e.oracle_sql()
        for name in names:
            if name not in oracles:
                continue
            try:
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                duck[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001 — isolate per oracle
                result.setdefault("errors", {})[f"duckdb:{name}"] = (
                    f"{type(exc).__name__}: {exc}"[:500]
                )
        result["duckdb"] = duck

    # Full per-query detail goes to a file (and one full stdout line for
    # humans); the FINAL stdout line must parse out of the driver's
    # 2000-char tail capture: BENCH_r01..r06 (full dict last, >2000
    # chars) record `parsed: null`, while r08+ (compact line last) parse
    # — so the full 235-row dict cannot ride the final line.  Instead
    # the final line inlines as many per-query timings as fit, slowest
    # first (the head rows carry nearly all of the wall), so the
    # driver's per-query comparison has real data (VERDICT r12 #2).
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "bench_full.json"
    )
    try:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as fh:
            json.dump(result, fh)
    except OSError:
        out_path = None
    print(json.dumps(result))
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "queries": {},
        "queries_inline": "slowest-first subset sized to the 2000-char tail",
        "queries_file": out_path,
    }
    if with_duckdb and "duckdb" in result:
        compact["duckdb_total"] = round(sum(result["duckdb"].values()), 3)
    inline = compact["queries"]
    for name, secs in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0])):
        inline[name] = secs
        if len(json.dumps(compact)) > 1900:  # margin under the 2000B window
            del inline[name]
            break
    print(json.dumps(compact))
    # exit 0 as long as at least one query produced a timing: partial bench
    # beats no bench, and "errors" carries the red rows for the record
    sys.exit(0 if timings else 1)


if __name__ == "__main__":
    main()
