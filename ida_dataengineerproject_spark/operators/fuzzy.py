"""Fuzzy string matching via deletion-neighborhood blocking (round 5d).

Entity resolution's core primitive: find catalog strings within edit
distance 1 of each probe string WITHOUT the probe×catalog cross join.

The blocking key is the SymSpell identity (public-domain algorithm,
Garbe 2012): for any two strings u, v with levenshtein(u, v) <= 1, the
sets {u} ∪ deletes1(u) and {v} ∪ deletes1(v) intersect —
  * u == v: u itself is shared;
  * one substitution at i: deleting position i from both yields the
    same string;
  * one insert/delete: deleting the inserted character from the longer
    string yields the shorter one.
So exploding each side to its (L+1)-element delete variants and
equi-joining on the variant produces a candidate superset with ZERO
false negatives; a final exact levenshtein() confirms.  Index size is
O(n·L) rows, the join is a hash equi-join on a short string — no n²
anywhere, and both sides partition by variant so the plan survives
100 TB catalogs (candidate volume is governed by variant collisions,
exactly like the MinHash band join in operators/dedup.py:163).

Reference scope: the reference resolves entities by exact key equality
only (/root/reference/etl/etl_ida.py dimension lookups, op30); fuzzy
resolution is the standard extension when keys are human-typed strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delete_variants(col, out: str = "variant"):
    """Array of the string itself plus every single-character deletion.

    Built with ``F.transform`` over ``sequence(0, length)``: index 0 maps
    to the unchanged string, index i >= 1 to the string with character i
    removed.  The lambda evaluates interpreted per element (HOF), but the
    array is bounded by the string length — this is metadata-scale work
    per row, not corpus-scale (ROUND_NOTES trap 8 does not bite).
    """
    s = col
    return F.transform(
        F.sequence(F.lit(0), F.length(s)),
        lambda i: F.when(i == 0, s).otherwise(
            F.concat(
                F.substr(s, F.lit(1), i - 1),
                F.substr(s, i + 1, F.length(s)),
            )
        ),
    ).alias(out)


def fuzzy_match_lev1(
    probe: DataFrame, catalog: DataFrame, probe_col: str, catalog_col: str
) -> DataFrame:
    """All (probe, catalog) pairs with levenshtein <= 1.

    probe/catalog: one string column each (pre-deduplicated by caller).
    Returns columns (probe_col, catalog_col, dist).
    """
    p = probe.select(
        F.col(probe_col),
        F.explode(delete_variants(F.col(probe_col))).alias("variant"),
    )
    c = catalog.select(
        F.col(catalog_col),
        F.explode(delete_variants(F.col(catalog_col))).alias("variant"),
    )
    cand = (
        p.join(c, "variant")
        .select(probe_col, catalog_col)
        .distinct()
    )
    return cand.select(
        probe_col,
        catalog_col,
        F.levenshtein(F.col(probe_col), F.col(catalog_col)).alias("dist"),
    ).where(F.col("dist") <= 1)
