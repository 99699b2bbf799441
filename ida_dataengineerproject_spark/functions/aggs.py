"""Aggregation helpers with oracle-exact numerics.

Floating-point SUM/AVG are order-dependent; Spark's partial aggregation order
differs from DuckDB's, so a naive ``AVG(double)`` hash-mismatches the oracle
in the last bits.  Fix (SURVEY.md §4.3): aggregate in DECIMAL (exact,
order-independent integer arithmetic), then cast to DOUBLE.  Both engines
produce the identical decimal, hence the identical double, hence identical
downstream arithmetic — bit-exact with zero tolerance needed.

At 100 TB this costs nothing: decimal sum is still a single-pass partial+final
hash aggregate with map-side combine; only the accumulator type changes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sum_exact(col: Column | str, scale: int = 2, precision: int = 38) -> Column:
    """Order-independent SUM: cast to decimal first, emit double.

    Oracle-SQL twin: ``CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def avg_exact(col: Column | str, scale: int = 2, precision: int = 38) -> Column:
    """Order-independent AVG as exact-decimal SUM / COUNT in double.

    Oracle-SQL twin:
    ``CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return sum_exact(c, scale, precision) / F.count(c)
