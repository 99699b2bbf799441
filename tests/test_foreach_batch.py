"""foreachBatch exactly-once sink pattern: idempotent per-batch writes
keyed by batchId — replays of a batch overwrite instead of duplicating
(the streaming equivalent of the reference's ON CONFLICT idempotency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    from ida_dataengineerproject_spark.streaming.events import (
        read_events_stream,
        tumbling_counts,
    )

    out_dir = str(tmp_path / "agg")

    def write_batch(batch_df, batch_id: int) -> None:
        # deterministic per-batch target → replay-safe overwrite
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    stream = tumbling_counts(read_events_stream(spark, SF_SMOKE))
    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    written = spark.read.parquet(f"{out_dir}/batch_id=0")
    assert written.count() > 0

    # replay the same batch (simulated retry): same path, same rows, no
    # dupes.  Materialize the replay rows first — overwriting a directory
    # while lazily scanning it is a read-your-own-deletes hazard.
    replay = written.drop("batch_id")
    rows = replay.collect()
    n_before = len(rows)
    write_batch(spark.createDataFrame(rows, replay.schema), 0)
    assert spark.read.parquet(f"{out_dir}/batch_id=0").count() == n_before


def test_foreach_batch_crash_recovery_no_duplicates(spark, tmp_path):
    """Kill-and-restart-from-checkpoint: a crash in the window AFTER the
    sink write but BEFORE the checkpoint commit forces Spark to replay
    that batch on restart — the exactly-once claim is that the replayed
    write overwrites its own batchId-keyed directory instead of
    duplicating.  Asserts (a) the crashed batch really ran twice and
    (b) every source row appears exactly once in the sink."""
    import glob
    import shutil

    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    # 3-file source so the stream has 3 distinct batches (1 file/trigger)
    src = tmp_path / "src"
    src.mkdir()
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_src = events.count()
    for i in range(3):
        part_dir = str(tmp_path / f"_stage{i}")
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(
            part_dir
        )
        part = glob.glob(part_dir + "/part-*.parquet")[0]
        shutil.move(part, str(src / f"chunk{i}.parquet"))
        shutil.rmtree(part_dir)

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    seen: list[int] = []  # batch ids the sink ran, across both query runs

    def make_sink(crash_once_on: int | None):
        armed = {"live": crash_once_on is not None}

        def write_batch(batch_df, batch_id: int) -> None:
            seen.append(batch_id)
            batch_df.write.mode("overwrite").parquet(
                f"{out}/batch_id={batch_id}"
            )
            if armed["live"] and batch_id == crash_once_on:
                armed["live"] = False
                raise RuntimeError(
                    "injected crash: after sink write, before checkpoint commit"
                )

        return write_batch

    def start(sink):
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q1 = start(make_sink(crash_once_on=1))
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q1.awaitTermination()

    q2 = start(make_sink(crash_once_on=None))  # restart from checkpoint
    q2.awaitTermination()

    assert seen.count(1) == 2, seen  # the crashed batch genuinely replayed
    assert sorted(set(seen)) == [0, 1, 2]

    sunk = spark.read.parquet(out)
    assert sunk.count() == n_src  # every row exactly once
    assert sunk.select("event_id").distinct().count() == n_src


def test_compacting_batch_sink(spark, tmp_path):
    """Streaming sink compaction: each micro-batch lands as few
    target-size files (not one per shuffle partition), replay-safe."""
    from ida_dataengineerproject_spark.streaming.events import (
        compacting_batch_sink,
        read_events_stream,
    )

    out_dir = str(tmp_path / "compact_sink")
    # repartition wide so the naive write WOULD produce many small files
    stream = read_events_stream(spark, SF_SMOKE).repartition(32)
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(compacting_batch_sink(out_dir, target_file_mb=128))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch0 = spark.read.parquet(f"{out_dir}/batch_id=0")
    files = batch0.inputFiles()
    assert len(files) < 8, len(files)  # compacted, not 32 shards
    from ida_dataengineerproject_spark.sources.tables import table

    assert batch0.count() == table(spark, SF_SMOKE, "events").count()
