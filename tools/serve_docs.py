"""API-docs service — parity with the reference's docs container.

The reference ships a pydoc docs service on :8756
(/root/reference/docker-compose.yml:36-55: pydoc -w over the ETL
modules, then a static HTTP server).  This is the same surface for this
repo: generate pydoc HTML for every package module into --out, then
serve the directory.

Usage:
    python tools/serve_docs.py [--out DIR] [--port 8756] [--no-serve]

--no-serve generates the HTML and exits (CI/artifact mode).  Pure
stdlib; no network use beyond the local listener.
"""

from __future__ import annotations

import argparse
import http.server
import os
import pkgutil
import pydoc
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def iter_modules(pkg_name: str):
    pkg = __import__(pkg_name)
    yield pkg_name
    for _, name, _ in pkgutil.walk_packages(pkg.__path__, pkg_name + "."):
        yield name


def generate(out_dir: Path) -> list[str]:
    out_dir.mkdir(parents=True, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(out_dir)
    written = []
    try:
        for mod in iter_modules("ida_dataengineerproject_spark"):
            try:
                pydoc.writedoc(mod)
                written.append(mod)
            except Exception as exc:  # noqa: BLE001 — skip unimportable
                print(f"skip {mod}: {exc}", file=sys.stderr)
        index = "\n".join(
            f'<li><a href="{m}.html">{m}</a></li>' for m in sorted(written)
        )
        Path("index.html").write_text(
            "<html><head><title>ida-spark API docs</title></head><body>"
            f"<h1>ida-spark API docs</h1><ul>{index}</ul></body></html>"
        )
    finally:
        os.chdir(cwd)
    return written


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "artifacts" / "docs"))
    ap.add_argument("--port", type=int, default=8756)
    ap.add_argument("--no-serve", action="store_true")
    args = ap.parse_args()
    out = Path(args.out)
    written = generate(out)
    print(f"wrote {len(written)} module pages + index.html under {out}")
    if args.no_serve:
        return
    os.chdir(out)
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", args.port), http.server.SimpleHTTPRequestHandler
    )
    print(f"serving docs at http://127.0.0.1:{args.port}/ (Ctrl-C to stop)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
