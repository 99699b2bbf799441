"""Row/document hashing (reference op25, etl/etl_ida.py:124-131).

The reference computes ``md5('{ano_mes}|{grupo}|{servico}|{variavel}|{valor}')``
per record for dedup (UNIQUE(hash_registro), schema_star.sql:93).  Spark's
built-in ``F.md5`` is JVM-side and codegen'd — no UDF needed, and md5 is also
available in DuckDB so the oracle can reproduce it bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def record_hash(*cols: Column | str, sep: str = "|") -> Column:
    """MD5 hex of pipe-joined column values (NULL-safe via concat_ws)."""
    return F.md5(F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols]))


def text_fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of case-folded,
    whitespace-collapsed text.  Used for exact near-normalization dedup;
    mirrors the reference's clean-then-hash pattern (etl/etl_ida.py:398-404
    + :124-131) but applied to documents.
    """
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return F.md5(normalized)
