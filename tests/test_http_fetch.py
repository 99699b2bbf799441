"""Live http:// arm of op01/op03 (reference fetches over real HTTP with an
auth header, /root/reference/etl/etl_ida.py:653-657, 672-682, 714-730).

The sandbox has no outbound network, but an in-process localhost
``http.server`` exercises the exact urllib code path the live deployment
runs — including executor-side fetches (local mode shares the loopback),
the ``chave-api-dados-abertos`` auth header arriving on the wire, the
scheme allowlist, and the MAX_RETRIES budget against a flaky endpoint.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ida_dataengineerproject_spark.sources.manifest import (
    API_KEY_HEADER,
    Resource,
    fetch_catalog,
    fetch_to_memory,
    filter_resources,
    manifest_df,
)


class _Handler(BaseHTTPRequestHandler):
    """Serves bytes from the server's ``routes`` dict; records each
    request's (path, auth-header) into ``seen``; ``fail_first[path]``
    makes the first N hits return 500 (retry-budget fixture)."""

    def do_GET(self):  # noqa: N802 (stdlib contract)
        srv = self.server
        srv.seen.append((self.path, self.headers.get(API_KEY_HEADER)))
        remaining = srv.fail_first.get(self.path, 0)
        if remaining > 0:
            srv.fail_first[self.path] = remaining - 1
            self.send_response(500)
            self.end_headers()
            return
        body = srv.routes.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture()
def http_srv():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.routes = {}
    srv.seen = []
    srv.fail_first = {}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    srv.base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield srv
    srv.shutdown()
    t.join(timeout=5)


def test_fetch_catalog_over_http_sends_auth_header(http_srv):
    """op01 over real HTTP: the catalog GET carries the
    ``chave-api-dados-abertos`` header (etl_ida.py:667,677) ON THE WIRE,
    not just on the constructed Request object."""
    http_srv.routes["/api/ida-dataset"] = json.dumps(
        {
            "recursos": [
                {"titulo": "IDA SMP 2017", "link": f"{http_srv.base}/smp.ods",
                 "formato": "ODS"},
            ]
        }
    ).encode()
    res = fetch_catalog(
        "ida-dataset", api_base=f"{http_srv.base}/api", api_key="sekret-9"
    )
    assert [r.titulo for r in res] == ["IDA SMP 2017"]
    assert http_srv.seen == [("/api/ida-dataset", "sekret-9")]


def test_fetch_to_memory_http_retry_budget(http_srv):
    """MAX_RETRIES contract (etl_ida.py:80): two 500s then a 200 succeeds
    within a 3-attempt budget; a 1-attempt budget propagates the error."""
    http_srv.routes["/blob"] = b"\x00\x01payload"
    http_srv.fail_first["/blob"] = 2
    got = fetch_to_memory(f"{http_srv.base}/blob", max_retries=3, backoff=0.01)
    assert got == b"\x00\x01payload"
    assert len(http_srv.seen) == 3  # 500, 500, 200

    http_srv.fail_first["/blob"] = 1
    with pytest.raises(Exception):
        fetch_to_memory(f"{http_srv.base}/blob", max_retries=1, backoff=0.01)


def test_scheme_allowlist_blocks_file_urls(tmp_path):
    """The manifest comes from an UNTRUSTED catalog: a file:/// entry
    must not read executor-local files unless the CALLER opted in."""
    p = tmp_path / "secret.txt"
    p.write_bytes(b"local-bytes")
    with pytest.raises(ValueError, match="scheme 'file' not allowed"):
        fetch_to_memory(p.as_uri())
    with pytest.raises(ValueError, match="not allowed"):
        fetch_to_memory("ftp://example.invalid/x")
    assert fetch_to_memory(p.as_uri(), allow_file=True) == b"local-bytes"


def test_fetch_ods_long_over_http(spark, http_srv, tmp_path):
    """op03's distributed-fetch form over REAL http://: executors fetch
    their manifest slice from the localhost server (closing the
    only-file://-ever-ran gap).  An auth-less GET is correct here — the
    reference authenticates the CATALOG call; resource downloads are
    plain GETs (etl_ida.py:714-730)."""
    from ida_dataengineerproject_spark.sources.ods import (
        fetch_ods_long,
        write_minimal_ods,
    )

    grid = [
        ["Indicadores IDA", None],
        [None],
        ["GRUPO ECONOMICO", "VARIAVEL", "2019-01", "2019-02"],
        ["ACME", "Taxa de Respondidas em 5 dias Úteis", "10,5", "12,0"],
        ["OUTRA", "Taxa de Respondidas em 5 dias Úteis", "3,0", "-"],
    ]
    ods_path = tmp_path / "smp_2019.ods"
    write_minimal_ods(str(ods_path), {"Móvel_Pessoal": grid})
    http_srv.routes["/smp_2019.ods"] = ods_path.read_bytes()

    resources = [
        Resource("IDA 2019 - SMP", f"{http_srv.base}/smp_2019.ods", "ods"),
        # decoy op02 must drop — the URL would 404 if fetched
        Resource("IDA 1999 - SMP", f"{http_srv.base}/nope.ods", "ods"),
    ]
    man = filter_resources(
        manifest_df(spark, resources), services=("SMP",), years=(2019,)
    )
    rows = fetch_ods_long(man).collect()  # default: http(s) only
    assert len(rows) == 4  # 2 data rows x 2 months
    assert {r.ARQUIVO_ORIGEM for r in rows} == {"smp_2019.ods"}
    paths = [p for p, _ in http_srv.seen]
    assert paths == ["/smp_2019.ods"] and "/nope.ods" not in paths
