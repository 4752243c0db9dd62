"""Streaming monitoring: event-time windowed throughput with watermarked
state eviction (SURVEY.md §2.4 A4 as a LIVE query).

The reference surfaces replication throughput as dashboard time series
(record-rate / byte-rate panels over the JMX metrics,
mirror-maker-2/mm2-jmx-exporter.yaml:28-43; docs/perf-tests.md:228 quotes
the sustained records/sec). The batch twin is
``operators.metrics.throughput_windows``; this module computes the same
per-window per-partition series as a Structured Streaming query over the
changelog tail, so a monitoring sink gets rates continuously while the
apply engine runs.

Scale shape: the aggregation state is bounded by the WATERMARK — windows
older than (max event time - watermark) are finalized, emitted (append
mode), and their state evicted, so a stream that runs for months holds
state for only the trailing watermark horizon, not the whole history.
Events arriving later than the watermark are dropped from the monitor
(they were still APPLIED by the engine — the apply path orders by lsn and
has no lateness concept; only the monitoring series ignores them, exactly
like a JMX rate counter sampled after the fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def throughput_stream(
    spark: SparkSession,
    changelog_path: str,
    read_schema: T.StructType,
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming per-(window, partition) event/byte rates over the changelog.

    Returns an unstarted streaming DataFrame; write it with
    ``outputMode("append")`` (windows emit once, when the watermark passes
    their end — the monitoring-series contract: one final row per window).

    Columns: window_start, window_end, partition, n_events, n_bytes.
    """
    src = spark.readStream.schema(read_schema)
    if max_files_per_trigger is not None:
        src = src.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = src.parquet(changelog_path)
    return (
        events.withWatermark("ts_ms", watermark)
        .groupBy(F.window("ts_ms", window), "partition")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.length(F.col("after.content"))).alias("n_bytes"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "partition",
            "n_events",
            "n_bytes",
        )
    )


def throughput_batch_twin(
    events: DataFrame, window: str = "1 hour"
) -> DataFrame:
    """Batch equivalent of :func:`throughput_stream` over the same envelope
    columns — the parity oracle for tests (no watermark: batch sees
    everything, so equality holds exactly when no event is later than the
    stream's watermark)."""
    return (
        events.groupBy(F.window("ts_ms", window), "partition")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.length(F.col("after.content"))).alias("n_bytes"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "partition",
            "n_events",
            "n_bytes",
        )
    )
