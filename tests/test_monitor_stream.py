"""Streaming windowed throughput with watermark (SURVEY.md §2.4 A4 live
twin): append-mode windows match the batch aggregate exactly, and an event
later than the watermark is dropped from the monitoring series only (the
apply path has no lateness — order is by lsn)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kp_data_replication_spark.datagen import (
    ChangelogSpec,
    read_changelog,
    write_changelog,
)
from kp_data_replication_spark.schema import CHANGELOG_SCHEMA_EVOLVED
from kp_data_replication_spark.streaming.monitor import (
    throughput_batch_twin,
    throughput_stream,
)


def _drain(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_windows_match_batch_twin(spark, tmp_path):
    d = str(tmp_path / "cl")
    write_changelog(
        spark, d,
        ChangelogSpec(n_keys=200, versions_per_key=3, n_partitions=4,
                      files=4, dup_every=0),
    )
    # generator event time spans ~30s (seq * 50ms): 10s windows, and a
    # huge watermark so every window is final when the stream drains
    stream = throughput_stream(
        spark, d, CHANGELOG_SCHEMA_EVOLVED,
        window="10 seconds", watermark="0 seconds", max_files_per_trigger=2,
    )
    _drain(stream, "tp_all")
    got = spark.table("tp_all")

    exp = throughput_batch_twin(read_changelog(spark, d), window="10 seconds")
    cols = ["window_start", "window_end", "partition", "n_events", "n_bytes"]
    got_rows = sorted(map(tuple, got.select(*cols).collect()))
    exp_rows = sorted(map(tuple, exp.select(*cols).collect()))
    # availableNow + watermark 0: every window whose end <= max event time
    # is emitted; the trailing partial window may be withheld (not final).
    assert got_rows, "stream emitted no windows"
    assert set(got_rows) <= set(exp_rows)
    missing = set(exp_rows) - set(got_rows)
    max_end = max(r[1] for r in exp_rows)
    assert all(r[1] == max_end for r in missing), (
        "only the trailing (non-final) window may be withheld"
    )


def test_late_event_beyond_watermark_is_dropped_from_monitor_only(spark, tmp_path):
    d = str(tmp_path / "cl2")
    write_changelog(
        spark, d,
        ChangelogSpec(n_keys=100, versions_per_key=2, n_partitions=2,
                      files=2, dup_every=0),
    )
    # append a LATE file: one event whose ts_ms is far before the
    # watermark frontier the earlier files advanced
    base = read_changelog(spark, d)
    late = (
        base.orderBy("partition", "lsn").limit(1)
        .withColumn("ts_ms", F.col("ts_ms") - F.expr("INTERVAL 1 HOUR"))
        .withColumn("lsn", F.col("lsn") + 100000)
    )
    cols = [f.name for f in CHANGELOG_SCHEMA_EVOLVED.fields]
    tmp = d + "/_tmp_late"
    late.select(*cols).coalesce(1).write.parquet(tmp)
    src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.replace(os.path.join(tmp, src), os.path.join(d, "batch-z998-late.parquet"))

    stream = throughput_stream(
        spark, d, CHANGELOG_SCHEMA_EVOLVED,
        window="10 seconds", watermark="0 seconds", max_files_per_trigger=2,
    )
    _drain(stream, "tp_late")
    got = spark.table("tp_late")
    # the late event's (1-hour-early) window must not appear
    n_late_windows = got.filter(
        F.col("window_start") < F.expr("timestamp '2024-01-01 00:00:00'")
    ).count()
    assert n_late_windows == 0
