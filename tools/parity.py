"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf_dir, runs the
paired ``oracle_sql()`` in DuckDB over the same parquet files, and compares:
row count, sorted column names, and order-insensitive values.

Usage:  python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df, float_round=None):
    """pandas DataFrame → sorted list of value tuples, columns sorted by name."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif isinstance(v, float):
                vals.append(round(v, float_round) if float_round else v)
            else:
                vals.append(v)
        out.append(tuple(str(x) for x in vals))
    return cols, sorted(out)


def compare(name, spark_df, oracle_df, verbose=True):
    scols, svals = normalize(spark_df)
    ocols, ovals = normalize(oracle_df)
    issues = []
    if scols != ocols:
        issues.append(f"schema mismatch: spark={scols} oracle={ocols}")
    if len(svals) != len(ovals):
        issues.append(f"rowcount mismatch: spark={len(svals)} oracle={len(ovals)}")
    if not issues and svals != ovals:
        diff = [(a, b) for a, b in zip(svals, ovals) if a != b][:5]
        issues.append(f"value mismatch; first diffs: {diff}")
    status = "OK " if not issues else "FAIL"
    print(f"[{status}] {name} ({len(svals)} rows)")
    for msg in issues:
        print(f"       {msg}")
    return not issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from ida_dataengineerproject_spark.session import get_spark

    spark = get_spark("parity")
    con = duck_con(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    ok = fail = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"[FAIL] {name}: {type(ex).__name__}: {str(ex).splitlines()[0][:200]}")
            fail += 1
            continue
        if name not in oracles:
            print(f"[ROWS] {name}: {len(sdf)} rows (no oracle — rows-only check)")
            skipped += 1
            continue
        odf = con.execute(oracles[name]).fetchdf()
        if compare(name, sdf, odf):
            ok += 1
        else:
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {skipped} rows-only")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
