"""Synthesized-partsupp invariants (queries/tpch_partsupp.py).

The five partsupp TPC-H forms are only as good as the synthesis: it must
be deterministic across partitionings (the oracle rebuilds it in SQL and
compares bit-exact), keyed into the real supplier domain, and built
without a shuffle (a |part|x4 map over the dim scan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def _ps(spark, sf_dir=SF_SMOKE):
    from ida_dataengineerproject_spark.queries.tpch_partsupp import (
        synth_partsupp,
    )

    return synth_partsupp(spark, sf_dir)


def test_partsupp_shape_and_domains(spark):
    from ida_dataengineerproject_spark.sources.tables import table

    ps = _ps(spark)
    n_part = table(spark, SF_SMOKE, "part").count()
    n_supp = table(spark, SF_SMOKE, "supplier").count()
    stats = ps.agg(
        F.count("*").alias("n"),
        F.countDistinct("ps_partkey", "ps_suppkey").alias("n_pairs"),
        F.min("ps_suppkey").alias("min_s"),
        F.max("ps_suppkey").alias("max_s"),
        F.min("ps_availqty").alias("min_q"),
        F.max("ps_availqty").alias("max_q"),
        F.min("ps_supplycost").alias("min_c"),
        F.max("ps_supplycost").alias("max_c"),
    ).first()
    assert stats.n == 4 * n_part
    # the dbgen formula never assigns the same supplier twice to a part
    assert stats.n_pairs == stats.n
    assert 0 <= stats.min_s and stats.max_s < n_supp
    assert 1 <= stats.min_q and stats.max_q <= 9999
    assert 1.0 <= stats.min_c and stats.max_c < 1000.0


def test_partsupp_deterministic_across_partitionings(spark):
    a = _ps(spark).orderBy("ps_partkey", "ps_suppkey").collect()
    b = (
        _ps(spark)
        .repartition(13, "ps_suppkey")
        .orderBy("ps_partkey", "ps_suppkey")
        .collect()
    )
    assert a == b


def test_partsupp_builds_without_shuffle(spark):
    # the only exchange allowed is the broadcast of the 1-row supplier
    # count — no hash-partition exchange to construct the table
    from tests.test_plan_quality import _plan

    plan = _plan(_ps(spark))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "hashpartitioning" not in plan


def test_q9_fold_guard_fires_on_toy_supplier_table(spark, tmp_path):
    """The q9 membership-predicate fold is join-equivalent only for
    S >= 4; the in-plan assert_true must fail LOUDLY (not silently
    diverge from the oracle) when a toy dataset violates it."""
    import shutil

    import pytest
    from ida_dataengineerproject_spark.queries.tpch_partsupp import q9
    from ida_dataengineerproject_spark.sources.tables import table

    toy = tmp_path / "toy_sf"
    toy.mkdir()
    for name in ("lineitem", "part", "orders", "nation"):
        shutil.copy(f"{SF_SMOKE}/{name}.parquet", toy / f"{name}.parquet")
    table(spark, SF_SMOKE, "supplier").limit(3).write.parquet(
        str(toy / "supplier.parquet")
    )
    with pytest.raises(Exception, match="S >= 4"):
        q9(spark, str(toy)).collect()
