"""Expression combinators.

``let1`` — a per-row let-binding for expensive sub-expressions.

Catalyst's CollapseProject merges adjacent projections by INLINING alias
expressions into every downstream reference.  An expression like a MinHash
signature (30 array transforms over shingles) referenced k times therefore
gets *recomputed k times per row* — measured 8× slowdowns on the dedup
pipeline.  Wrapping the shared value in a single-element array and
accessing it through one ``transform`` lambda forces exactly-once
evaluation regardless of how many times the lambda body references it:

    let1(expensive, lambda v: f(v, v, v))   # `expensive` evaluated once

This is pure expression-level (no caching, no barrier, no shuffle) and
composes inside any projection.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let1(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row, feed it to ``body``."""
    return F.element_at(F.transform(F.array(value), body), 1)
