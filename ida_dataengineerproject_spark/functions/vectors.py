"""Vector math over array columns (driver extension x03).

Pure built-in higher-order functions (zip_with / aggregate): JVM-side,
no UDF, no Python serialization — the 100 TB-safe way to score embeddings.
The left-to-right fold order of F.aggregate is deterministic, so results
are reproducible (and match DuckDB's sequential list_* kernels bit-exact
when both run in double precision).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    """float32 embeddings → array<double> so arithmetic runs in double
    (float32 products differ between engines; double products don't)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
