"""Stateful offset-sync emitter (S9 streaming form, applyInPandasWithState):
syncs fire at stream start and on numbering divergence — including
divergences only visible ACROSS micro-batches (the cross-trigger state)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kp_data_replication_spark.streaming.state import offset_sync_stream


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "partition int, lsn long, tgt_offset long"
    ).coalesce(1).write.mode("append").parquet(path)


def test_offset_sync_stream_emits_start_and_divergence(spark, tmp_path):
    src_dir = str(tmp_path / "events")
    # trigger 1: p0 contiguous 0..3 (src==tgt), p1 contiguous but tgt shifted
    _write_batch(
        spark, src_dir,
        [(0, i, i) for i in range(4)] + [(1, i, i + 7) for i in range(3)],
    )

    stream = (
        spark.readStream.schema("partition int, lsn long, tgt_offset long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        offset_sync_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    syncs = {
        (r.partition, r.sync_src_offset): r.reason
        for r in spark.read.parquet(out_dir).collect()
    }
    # exactly one START sync per partition, nothing else (contiguous runs)
    assert syncs == {(0, 0): "start", (1, 0): "start"}

    # trigger 2 (separate query run, SAME checkpoint -> state restored):
    # p0 continues 4,5 then JUMPS to 9 (src gap); p1 continues but its
    # target offset diverges (+1 extra). Both are cross-trigger facts:
    # within this batch alone, lsn 4 looks like a fresh sequence.
    _write_batch(
        spark, src_dir,
        [(0, 4, 4), (0, 5, 5), (0, 9, 9), (1, 3, 11), (1, 4, 12)],
    )
    q2 = (
        offset_sync_stream(
            spark.readStream.schema("partition int, lsn long, tgt_offset long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    rows = spark.read.parquet(out_dir).collect()
    got = {(r.partition, r.sync_src_offset, r.sync_tgt_offset): r.reason for r in rows}
    # p0: state knew last=(3,3), so 4 continues silently; 9 diverges
    assert got[(0, 9, 9)] == "divergence"
    assert (0, 4, 4) not in got  # continuation across triggers NOT re-emitted
    # p1: last=(2,9); src 3 continues but tgt jumps 9->11 -> divergence
    assert got[(1, 3, 11)] == "divergence"
    assert (1, 4, 12) not in got
    # still exactly two start rows in total
    assert sum(1 for v in got.values() if v == "start") == 2
