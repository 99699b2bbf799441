"""Entity-resolution operators (round 5d): fuzzy key matching.

x19_fuzzy_entity_match — resolve a probe set of corrupted names against
the part-name catalog at edit distance <= 1 using SymSpell
deletion-neighborhood blocking (operators/fuzzy.py) instead of the
probe×catalog cross join the oracle runs.  The probe set is derived
deterministically from the catalog itself (drop each name's 3rd
character) so the operator is self-contained on testdata and the same
corruption is expressible in both engines.

The oracle IS the brute force: every (probe, catalog) pair scored with
levenshtein and filtered.  Quadratic in distinct names — fine for a
correctness gate, the thing the blocked plan exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fuzzy import fuzzy_match_lev1
from ..registry import register
from ..sources.tables import table


@register(
    "x19_fuzzy_entity_match",
    """
    WITH cat AS (SELECT DISTINCT p_name AS match_name FROM part),
    probe AS (
        SELECT DISTINCT substr(match_name, 1, 2) || substr(match_name, 4)
               AS probe_name
        FROM cat WHERE length(match_name) >= 5
    )
    SELECT probe_name, match_name,
           CAST(levenshtein(probe_name, match_name) AS INTEGER) AS dist
    FROM probe, cat
    WHERE levenshtein(probe_name, match_name) <= 1
    """,
)
def q_x19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy match: explode both sides to delete-1 variants,
    hash equi-join on the variant, confirm with exact levenshtein.
    Zero false negatives by the SymSpell identity; no cross join."""
    cat = (
        table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("match_name"))
        .distinct()
    )
    probe = (
        cat.where(F.length("match_name") >= 5)
        .select(
            F.concat(
                F.substring("match_name", 1, 2),
                F.substr(
                    F.col("match_name"), F.lit(4), F.length("match_name")
                ),
            ).alias("probe_name")
        )
        .distinct()
    )
    return fuzzy_match_lev1(probe, cat, "probe_name", "match_name")
