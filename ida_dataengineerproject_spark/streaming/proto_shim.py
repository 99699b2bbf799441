"""Activation for the vendored minimal protobuf runtime (vendor/google/).

``transformWithStateInPandas`` needs ``google.protobuf`` in the PYTHON
WORKERS (the TWS state protocol: pyspark/sql/streaming/proto/
StateMessage_pb2.py + stateful_processor_api_client.py).  This container
ships no protobuf wheel and has no network, so we vendor the minimal
runtime the generated module needs and activate it ONLY when the real
distribution is absent:

- driver side: prepend vendor/ to sys.path;
- task workers: ship vendor/ as a zip via ``sc.addPyFile`` — the public
  mechanism that lands on every worker's PYTHONPATH (zipimport), exactly
  how user code distributes pure-Python deps to executors;
- the TWS *driver worker* (StreamingPythonRunner): it takes PYTHONPATH
  from the JVM's environment and does NOT process spark files, so the
  vendor dir must be in ``os.environ['PYTHONPATH']`` BEFORE the JVM
  launches — ``session.get_spark`` calls :func:`export_pythonpath`
  ahead of ``getOrCreate`` for exactly this.

If a real protobuf is ever installed, this function is a no-op and the
real runtime wins everywhere.
"""

from __future__ import annotations

import os
import sys
import zipfile

from pyspark.sql import SparkSession

_VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "vendor",
)


def _build_zip() -> str:
    """Deterministic zip of vendor/google for addPyFile (rebuilt only
    when missing or stale vs the sources)."""
    zip_path = os.path.join(_VENDOR_DIR, "protobuf_shim.zip")
    sources = []
    for root, _dirs, files in os.walk(os.path.join(_VENDOR_DIR, "google")):
        for f in sorted(files):
            if f.endswith(".py"):
                sources.append(os.path.join(root, f))
    if os.path.exists(zip_path) and os.path.getmtime(zip_path) >= max(
        os.path.getmtime(s) for s in sources
    ):
        return zip_path
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for s in sorted(sources):
            arcname = os.path.relpath(s, _VENDOR_DIR)
            zf.write(s, arcname)
    return zip_path


def _real_protobuf_installed() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return "vendor" not in getattr(google.protobuf, "__file__", "vendor")
    except ImportError:
        return False


def export_pythonpath() -> None:
    """Put vendor/ on os.environ['PYTHONPATH'] (pre-JVM-launch hook): a
    JVM started after this hands the vendored runtime to every Python
    process it spawns — including the TWS driver worker, which ignores
    spark files.  No-op when a real protobuf is installed."""
    if _real_protobuf_installed():
        return
    current = os.environ.get("PYTHONPATH", "")
    if _VENDOR_DIR not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _VENDOR_DIR + (os.pathsep + current if current else "")
        )


def ensure_protobuf(spark: SparkSession | None = None) -> bool:
    """Make ``google.protobuf`` importable on the driver and (when a
    session is given) on all Python workers.  Returns True if the
    vendored shim was activated, False if a real protobuf exists."""
    if _real_protobuf_installed():
        return False

    export_pythonpath()
    if _VENDOR_DIR not in sys.path:
        sys.path.insert(0, _VENDOR_DIR)
    if spark is not None:
        zip_path = _build_zip()
        shipped = getattr(spark.sparkContext, "_graft_proto_shim", None)
        if shipped != zip_path:
            spark.sparkContext.addPyFile(zip_path)
            spark.sparkContext._graft_proto_shim = zip_path
    return True
