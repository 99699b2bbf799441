"""Regenerate the BASELINE.md per-query table from a bench --duckdb JSON."""
import json
import sys

data = json.load(open(sys.argv[1]))
sp, du = data["queries"], data.get("duckdb", {})
rows = []
for name in sorted(sp):
    s_ms = round(sp[name] * 1000)
    if name in du:
        d_ms = max(1, round(du[name] * 1000))
        ratio = s_ms / d_ms
        if ratio <= 2:
            status = "within 2x" if ratio > 1 else "faster than oracle"
        elif s_ms < 1000:
            status = "overhead-bound"
        else:
            status = "slower"
        rows.append(f"| {name} | {d_ms} | {s_ms} | {ratio:.1f}x | {status} |")
    else:
        rows.append(f"| {name} | — | {s_ms} | — | no oracle |")
print("| query | duckdb sf0.1 (ms) | pyspark sf0.1 (ms) | ratio | status |")
print("|---|---|---|---|---|")
print("\n".join(rows))
n_within = sum("within 2x" in r or "faster" in r for r in rows)
tot_s = sum(sp.values()); tot_d = sum(du.values())
print(f"\nTotals: spark {tot_s:.1f}s, duckdb {tot_d:.1f}s, aggregate ratio "
      f"{tot_s/tot_d:.2f}x, {n_within}/{len(rows)} queries <=2x")
