"""Invariants of the composed training-data prep pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_prepare_documents_invariants(spark):
    from ida_dataengineerproject_spark.plans.datapipeline import prepare_documents
    from ida_dataengineerproject_spark.operators.dedup import ngram_jaccard_pairs
    from ida_dataengineerproject_spark.sources.tables import table

    out = prepare_documents(spark, SF_SMOKE).cache()
    docs = table(spark, SF_SMOKE, "documents")

    n_in, n_out = docs.count(), out.count()
    assert 0 < n_out <= n_in

    rows = out.collect()
    # quality gate held
    assert all(r.quality >= 0.4 for r in rows)
    # language filter held
    assert all(r.lang_pred in ("en", "und") for r in rows)
    # fingerprints unique (exact dedup held)
    assert len({r.fingerprint for r in rows}) == len(rows)

    # no surviving pair is a near-duplicate at the threshold
    surviving = docs.join(out.select("doc_id"), "doc_id", "left_semi")
    leftover_pairs = ngram_jaccard_pairs(
        surviving, "doc_id", "text", threshold=0.5
    ).count()
    assert leftover_pairs == 0
    out.unpersist()
