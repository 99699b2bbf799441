"""Streaming KMV maintenance == batch build: mergeability, measured.

The KMV bottom-k sample is a mergeable summary, so the sketch maintained
incrementally across micro-batches must equal (bit-for-bit, per group)
the sketch built over all data in one batch job — however the stream was
chopped.  Also pins replay idempotency (a re-run batch must not
double-merge)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ida_dataengineerproject_spark.operators.sketch import kmv_sketch
from ida_dataengineerproject_spark.sources.tables import table
from ida_dataengineerproject_spark.streaming.sketches import (
    kmv_stream_sink,
    merge_kmv,
    read_kmv_state,
)

SF = "/root/testdata/sf0.001"
K = 64


def _norm(df):
    return sorted(
        (r["g"], tuple(r["sk"])) for r in df.select("g", "sk").collect()
    )


def test_stream_sketch_equals_batch_sketch(spark, tmp_path):
    from ida_dataengineerproject_spark.streaming.events import (
        read_events_stream,
    )

    state = str(tmp_path / "kmv_state")
    ev = read_events_stream(spark, SF).select("event_type", "user_id")
    q = (
        ev.writeStream.outputMode("append")
        .foreachBatch(kmv_stream_sink(state, "event_type", "user_id", k=K))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = read_kmv_state(spark, state)
    want = kmv_sketch(
        table(spark, SF, "events").select("event_type", "user_id"),
        "event_type",
        "user_id",
        k=K,
    ).withColumnRenamed("g", "g")
    assert _norm(got) == _norm(want)


def test_merge_is_order_and_chop_invariant(spark):
    ev = table(spark, SF, "events").select("event_type", "user_id")
    full = kmv_sketch(ev, "event_type", "user_id", k=K)
    a = ev.where(F.col("user_id") % 3 == 0)
    b = ev.where(F.col("user_id") % 3 == 1)
    c = ev.where(F.col("user_id") % 3 == 2)
    sks = [kmv_sketch(x, "event_type", "user_id", k=K) for x in (a, b, c)]
    left = merge_kmv(merge_kmv(sks[0], sks[1], k=K), sks[2], k=K)
    right = merge_kmv(sks[2], merge_kmv(sks[1], sks[0], k=K), k=K)
    assert _norm(left) == _norm(right) == _norm(full)


def test_replayed_batch_never_double_merges(spark, tmp_path):
    state = str(tmp_path / "kmv_state")
    ev = table(spark, SF, "events").select("event_type", "user_id")
    sink = kmv_stream_sink(state, "event_type", "user_id", k=K)
    half = ev.where(F.col("user_id") % 2 == 0)
    rest = ev.where(F.col("user_id") % 2 == 1)
    sink(half, 0)
    sink(rest, 1)
    once = _norm(read_kmv_state(spark, state))
    sink(rest, 1)  # replay of batch 1
    twice = _norm(read_kmv_state(spark, state))
    assert once == twice


def test_mg_stream_state_keeps_guarantee(spark, tmp_path):
    """Chop a skewed stream into 3 batches; the maintained MG state must
    stay capacity-bounded and contain every key whose TOTAL count
    exceeds N/(capacity+1)."""
    from collections import Counter

    from ida_dataengineerproject_spark.streaming.sketches import (
        mg_stream_sink,
    )

    capacity = 128
    n_rows, n_distinct = 60_000, 50_000
    keys = spark.range(n_rows).select(
        F.concat(
            F.lit("k"),
            (
                F.lit(n_distinct)
                / (F.pmod(F.col("id") * F.lit(2654435761), F.lit(n_distinct)) + 1)
            )
            .cast("long")
            .cast("string"),
        ).alias("key"),
        (F.col("id") % 3).alias("b"),
    )
    truth = Counter(r["key"] for r in keys.collect())
    n = sum(truth.values())
    must_have = {k for k, c in truth.items() if c > n / (capacity + 1)}
    assert must_have

    state = str(tmp_path / "mg_state")
    sink = mg_stream_sink(state, "key", capacity)
    for i in range(3):
        sink(keys.where(F.col("b") == i).select("key"), i)
    rows = spark.read.parquet(f"{state}/v2").collect()
    cands = {r["key"] for r in rows}
    assert len(cands) <= capacity
    assert must_have <= cands
    # replay safety: re-running the last batch changes nothing
    sink(keys.where(F.col("b") == 2).select("key"), 2)
    again = {r["key"] for r in spark.read.parquet(f"{state}/v2").collect()}
    assert again == cands


def test_state_dir_uri_rejected_loudly(spark, tmp_path):
    """ADVICE r6: an object-store URI would make os.listdir-based
    version discovery silently restart state every batch — refuse."""
    import pytest

    from ida_dataengineerproject_spark.streaming.sketches import (
        _latest_version,
    )

    with pytest.raises(ValueError, match="driver-local"):
        _latest_version("s3a://bucket/state")


def test_kmv_filtered_equals_unfiltered_build(spark):
    """kmv_sketch_filtered must produce the SAME sketch as kmv_sketch —
    the threshold filter only removes hashes that could never reach the
    bottom-k — on both a filtered (n >> margin*k) and an unfiltered
    (n < margin*k, f=1) group, including duplicate-heavy streams."""
    from pyspark.sql import functions as F

    from ida_dataengineerproject_spark.operators.sketch import (
        kmv_sketch,
        kmv_sketch_filtered,
    )

    k = 32
    rows = (
        # big group: 10k distinct keys, each duplicated 3x
        [("big", f"k{i}") for i in range(10_000) for _ in range(3)]
        # small group: 10 distinct (< k) — must stay complete (sk_n < k)
        + [("small", f"s{i}") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "g string, key string")
    base = {r.g: (r.sk, r.sk_n) for r in kmv_sketch(df, "g", "key", k=k).collect()}
    filt = {
        r.g: (r.sk, r.sk_n)
        for r in kmv_sketch_filtered(df, "g", "key", k=k).collect()
    }
    assert filt == base
    assert filt["small"][1] == 10  # completeness survives the filter


def test_kmv_filtered_jaccard_accuracy(spark):
    """x22's production path: jaccard from filtered sketches within 15%
    relative of the exact jaccard on a 2-group overlap corpus."""
    from pyspark.sql import functions as F

    from ida_dataengineerproject_spark.operators.sketch import (
        kmv_overlap,
        kmv_sizes,
        kmv_sketch_filtered,
    )

    k = 256
    # A: 0..5999, B: 3000..8999 → inter 3000, union 9000, J = 1/3
    rows = [("A", f"k{i}") for i in range(6000)] + [
        ("B", f"k{i}") for i in range(3000, 9000)
    ]
    df = spark.createDataFrame(rows, "g string, key string")
    sk = kmv_sketch_filtered(df, "g", "key", k=k).localCheckpoint()
    inter = kmv_overlap(sk, k=k).collect()[0]
    sizes = {r.g: r.est_n for r in kmv_sizes(sk, k=k).collect()}
    j = inter.est_inter / (sizes["A"] + sizes["B"] - inter.est_inter)
    assert abs(j - 1 / 3) / (1 / 3) < 0.15
