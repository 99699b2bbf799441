"""Round-close gate: refuse to snapshot with a red query or red test.

Runs the full-registry parity sweep (tools/parity.py) at TWO scale
factors and the full pytest suite (NO stop-on-first-failure), tees their
transcripts to artifacts/, and exits non-zero if any reports a failure —
so a known-red row can never be silently committed in a round snapshot
again (round-3 lesson).  Two SFs because regressions can be
scale-dependent: the round-3 TIMESTAMP_NTZ incident was an encoding
change; the next one may only manifest at the larger SF (partition
counts, AQE thresholds, broadcast cutoffs all shift with size).

Usage:  python tools/gate.py [sf_dir ...]
        # default: /root/testdata/sf0.01 AND /root/testdata/sf0.1
Writes: artifacts/PARITY_gate_<sf>.txt, artifacts/pytest_gate.log
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_tee(cmd: list[str], log: Path) -> tuple[int, str]:
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=7200
    )
    out = proc.stdout + proc.stderr
    log.parent.mkdir(exist_ok=True)
    log.write_text(out)
    return proc.returncode, out


def main() -> None:
    sf_dirs = (
        sys.argv[1:]
        if len(sys.argv) > 1
        else ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    )
    art = REPO / "artifacts"
    failures: list[str] = []

    def summary(out: str, pattern: str) -> str:
        hits = re.findall(pattern, out, re.M)
        return hits[-1] if hits else "(no summary line found)"

    parity_pat = r"^.*\bok, .*\bfail.*$"
    pytest_pat = r"^.*\b(?:passed|failed|error).*$"

    for sf_dir in sf_dirs:
        tag = Path(sf_dir).name
        rc, out = run_tee(
            [sys.executable, "tools/parity.py", sf_dir],
            art / f"PARITY_gate_{tag}.txt",
        )
        n_fail = len(re.findall(r"^\[FAIL\]", out, re.M))
        print(f"parity[{tag}]: rc={rc} — {summary(out, parity_pat)}")
        if rc != 0 or n_fail:
            failures.append(f"parity[{tag}]: {n_fail} [FAIL] rows (rc={rc})")

    rc, out = run_tee(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-p", "no:cacheprovider"],
        art / "pytest_gate.log",
    )
    print(f"pytest: rc={rc} — {summary(out, pytest_pat)}")
    if rc != 0:
        failures.append(f"pytest: rc={rc}")

    if failures:
        print("\nGATE RED — do NOT snapshot:")
        for f in failures:
            print(f"  - {f}")
        sys.exit(1)
    print("\nGATE GREEN — safe to snapshot.")


if __name__ == "__main__":
    main()
