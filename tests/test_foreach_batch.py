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
