"""Golden test for xt21 exact-substring duplication audit.

Builds a 3-doc corpus where the duplicated-gram counts are computable by
hand, pinning: global-first-occurrence semantics (the earlier doc keeps
its grams unflagged), intra-doc repeats count as duplicates too, and
docs shorter than k grams report zeros.  Uses the SAME plan definition
as the registered query (substring_ops.dup_span_stats).
"""

from __future__ import annotations

from ida_dataengineerproject_spark.queries.substring_ops import (
    K,
    dup_span_stats,
)


def _audit(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        r["doc_id"]: (r["total_grams"], r["dup_grams"], r["span_dup_flag"])
        for r in dup_span_stats(df).collect()
    }


def test_cross_doc_span_flagged_once(spark):
    span = " ".join(f"w{i}" for i in range(K))  # exactly one k-gram
    docs = [
        (1, span + " tail1 tail2"),          # first occurrence: clean
        (2, "head1 head2 " + span),          # later doc: 1 dup gram
        (3, "a b c"),                        # shorter than k: zeros
    ]
    got = _audit(spark, docs)
    # doc1: K+2 tokens -> 3 grams, none dup (it is globally first)
    assert got[1] == (3, 0, False)
    # doc2: K+2 tokens -> 3 grams; only the exact span gram repeats;
    # 1*5 >= 3 -> the >=20% routing flag fires
    assert got[2] == (3, 1, True)
    assert got[3] == (0, 0, False)


def test_intra_doc_repeat_counts(spark):
    span = " ".join(f"v{i}" for i in range(K))
    # span twice in ONE doc separated by a unique token: the second
    # occurrence's identical gram is a duplicate of the first.
    docs = [(7, span + " sep " + span)]
    total, dup, _flag = _audit(spark, docs)[7]
    # 2K+1 tokens -> K+2 grams; exactly one gram (the second exact span)
    # hashes equal to an earlier one.
    assert total == K + 2
    assert dup == 1
