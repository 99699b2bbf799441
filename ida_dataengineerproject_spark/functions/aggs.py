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


# ---------------------------------------------------------------------------
# Integer-units fast path (r9).  The decimal aggregation buffer costs ~2× a
# long buffer per row (measured at the x10 replica: SUM(DECIMAL(38,2)) of
# l_extendedprice 0.52 s vs the cents sum 0.27 s; the revenue product 0.71 s
# vs 0.36 s).  When the inputs are EXACT 2-DECIMAL DOUBLES — true of every
# money column in this data at every SF (l_extendedprice, l_discount, l_tax,
# o_totalprice, c_acctbal, s_acctbal, p_retailprice; asserted continuously by
# the bit-exact parity gate against decimal-summing oracles) — the same
# bit-exact double emerges from summing exact integer UNITS:
#
#   round(v·100) recovers the exact cent count (the double error of v·100 is
#   ≪ 0.5), integer sums/products are exact and order-independent, and while
#   |Σunits| < 2^53 the final units→double conversion is exact, so the single
#   rounding happens at the ÷10^s — the same one rounding the oracle's
#   DECIMAL(38,s)→DOUBLE cast performs on the identical exact value.
#
# Bounds (document per call site): bit-exactness to |Σunits| < 2^53
# (9·10^12 dollars at 1e-4 units, 9·10^9 at 1e-6); exact-integer overflow at
# 2^63.  Beyond that, use the decimal forms above — only the buffer type
# changes, never the semantics.
# ---------------------------------------------------------------------------


def cents(col: Column | str) -> Column:
    """Exact cent count of an exact-2-decimal double, as a LONG.

    ``floor(v·100 + 0.5)`` — NOT ``round``: Spark's Round on DoubleType
    codegens to a per-row ``BigDecimal.valueOf(x).setScale(...)``
    allocation, measured at 1.13 s of tpch_q1's 2.44 s x100 wall (5
    cents() calls per row); ``floor`` is a single ``Math.floor``.

    Bit-exact equivalence for exact-2dp inputs (sign-independent): the
    stored double v is the nearest double to k/100, so v·100 = k(1+δ)
    with |kδ| ≪ 0.5; floor(k ± ε + 0.5) = k for any |ε| < 0.5, including
    negative k (c_acctbal).  A tie (x·100 exactly halfway) cannot occur
    because the true value is an integer and the error is sub-ulp-scale.
    NULL propagates (floor(NULL) = NULL) exactly as round did."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5))


_cents = cents  # internal alias (pre-r10 name)


def sum_exact_2dp(col: Column | str) -> Column:
    """Bit-exact twin of ``sum_exact(col, scale=2)`` for exact-2-decimal
    double inputs: cents sum in a LONG buffer, one rounding at ÷100.

    Oracle-SQL twin: ``CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE)``."""
    return F.sum(_cents(col)).cast("double") / 100


def avg_exact_2dp(col: Column | str) -> Column:
    """Bit-exact twin of ``avg_exact(col, scale=2)`` for exact-2-decimal
    double inputs.

    Oracle-SQL twin:
    ``CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE) / COUNT(x)``."""
    c = F.col(col) if isinstance(col, str) else col
    return sum_exact_2dp(c) / F.count(c)


def sum_disc_price_exact(price: Column | str, discount: Column | str) -> Column:
    """Bit-exact twin of ``sum_exact(price*(1-discount), scale=6)`` for
    exact-2-decimal inputs: Σ cents(price)·(100 − cents(discount)) in a
    LONG buffer (exact 1e-4-dollar units), one rounding at ÷10^4.

    Why the decimal twin matches: the double product price·(1−discount)
    errs by ~1 ulp (≈1e-11) from the exact ≤4-decimal rational, so the
    oracle's rounding cast to DECIMAL(38,6) recovers that exact rational
    — the same value these integer units encode.

    Oracle-SQL twin:
    ``CAST(SUM(CAST(p * (1 - d) AS DECIMAL(38,6))) AS DOUBLE)``."""
    p = F.col(price) if isinstance(price, str) else price
    d = F.col(discount) if isinstance(discount, str) else discount
    return (
        F.sum(_cents(p) * (F.lit(100) - _cents(d))).cast("double") / 10_000
    )


def sum_charge_exact(
    price: Column | str, discount: Column | str, tax: Column | str
) -> Column:
    """Bit-exact twin of ``sum_exact(price*(1-discount)*(1+tax), scale=6)``
    for exact-2-decimal inputs: exact 1e-6-dollar units in a LONG buffer.
    The chained double product errs ≈2 ulp — still ≪ the 5e-7 the
    DECIMAL(38,6) rounding absorbs.  Tighter Σ bound than the others
    (1e-6 units): bit-exact to 9·10^9 dollars per group.

    Oracle-SQL twin:
    ``CAST(SUM(CAST(p * (1-d) * (1+t) AS DECIMAL(38,6))) AS DOUBLE)``."""
    p = F.col(price) if isinstance(price, str) else price
    d = F.col(discount) if isinstance(discount, str) else discount
    t = F.col(tax) if isinstance(tax, str) else tax
    return (
        F.sum(
            _cents(p) * (F.lit(100) - _cents(d)) * (F.lit(100) + _cents(t))
        ).cast("double")
        / 1_000_000
    )
