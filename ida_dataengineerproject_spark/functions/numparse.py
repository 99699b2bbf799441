"""Locale-tolerant numeric parsing (reference op21, etl/etl_ida.py:422-429).

The reference strips '%' and swaps ',' for '.' before float(); failures map
to None.  Spark equivalent is pure built-ins: two regexp_replace + a cast,
which under ``spark.sql.ansi.enabled=false`` yields NULL on bad input —
exactly the reference's None semantics.  Stays inside whole-stage codegen
(no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_locale_number(col: Column | str) -> Column:
    """'12,34' → 12.34; '56,7%' → 56.7; '-', '', 'abc' → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.regexp_replace(F.trim(c), ",", "."), "%", "")
    return cleaned.cast("double")
