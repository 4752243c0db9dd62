"""Replication observability aggregations (SURVEY.md §2.4 A3-A7, §2.9 T6).

Spark re-expression of the reference's measurement surface:
  * producer perf report: per-interval records/sec + MB/sec and run-level
    latency stats incl. p50/p95/p99/p99.9 (docs/perf-tests.md:222-228)
  * consumer lag dashboards (monitoring/grafana, docs/index.md:156-158)
  * per-partition record-rate / byte-rate / record-age / replication-latency
    JMX metrics (mirror-maker-2/mm2-jmx-exporter.yaml:28-43)
  * count-equality validation (docs/perf-tests.md:92-131)

All are plain hash aggregations / windowed aggregations — partial
aggregation map-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def record_count(df: DataFrame) -> DataFrame:
    """A3: count equality oracle ("should be 500", docs/perf-tests.md:92-93)."""
    return df.agg(F.count(F.lit(1)).alias("n_records"))


def throughput_windows(
    df: DataFrame,
    ts_col: str = "ts_ms",
    size_col: str | None = None,
    window: str = "1 minute",
) -> DataFrame:
    """A4: tumbling-window throughput — records/sec + bytes/sec per interval
    (the producer tool's per-interval report, docs/perf-tests.md:222-228)."""
    secs = _window_seconds(window)
    aggs = [
        F.count(F.lit(1)).alias("n_records"),
        (F.count(F.lit(1)) / F.lit(secs)).alias("records_per_sec"),
    ]
    if size_col:
        aggs += [
            F.sum(F.length(F.col(size_col))).alias("n_bytes"),
            (F.sum(F.length(F.col(size_col))) / F.lit(secs)).alias("bytes_per_sec"),
        ]
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*aggs)
        .select(F.col("w.start").alias("window_start"), *[c for c in
                ["n_records", "records_per_sec", "n_bytes", "bytes_per_sec"]
                if size_col or not c.startswith(("n_bytes", "bytes"))])
    )


def latency_stats(df: DataFrame, latency_col: str = "latency_ms") -> DataFrame:
    """A5: avg/min/max + exact percentiles p50/p95/p99/p99.9
    (docs/perf-tests.md:228 report line). Uses exact `percentile` — swap to
    `percentile_approx` at 10^10 rows where a t-digest sketch is the right
    trade (single-pass, fixed memory)."""
    c = F.col(latency_col)
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(c).alias("avg_ms"),
        F.min(c).alias("min_ms"),
        F.max(c).alias("max_ms"),
        F.percentile(c, F.lit(0.5)).alias("p50_ms"),
        F.percentile(c, F.lit(0.95)).alias("p95_ms"),
        F.percentile(c, F.lit(0.99)).alias("p99_ms"),
        F.percentile(c, F.lit(0.999)).alias("p999_ms"),
    )


def consumer_lag(source_marks: DataFrame, lineage: DataFrame) -> DataFrame:
    """A6: per-partition lag = max source offset - applied offset
    (kafka_consumergroup_lag analogue, monitoring/grafana dashboards).

    source_marks: partition, max_lsn (from the changelog head)
    lineage:      partition, applied_lsn
    """
    return (
        source_marks.join(F.broadcast(lineage.select("partition", "applied_lsn")), "partition", "left")
        .select(
            "partition",
            "max_lsn",
            F.coalesce("applied_lsn", F.lit(-1)).alias("applied_lsn"),
            (F.col("max_lsn") - F.coalesce("applied_lsn", F.lit(-1))).alias("lag"),
        )
    )


def replication_latency(
    df: DataFrame, produce_ts: str = "ts_ms", apply_ts: str = "apply_ts"
) -> DataFrame:
    """T6: per-partition replication-latency-ms stats (ts3 - ts2 in the
    reference's four-timestamp model, docs/perf-tests.md:173-187)."""
    lat = (F.col(apply_ts).cast("double") - F.col(produce_ts).cast("double")) * 1000.0
    return df.select("partition", lat.alias("latency_ms")).groupBy("partition").agg(
        F.avg("latency_ms").alias("avg_ms"),
        F.max("latency_ms").alias("max_ms"),
        F.percentile(F.col("latency_ms"), F.lit(0.95)).alias("p95_ms"),
    )


def _window_seconds(window: str) -> float:
    qty, unit = window.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit]
    return float(qty) * mult


# --------------------------------------------------------------------- #
# Prometheus text exposition (monitoring/kafka-metrics.yaml +
# mm2-jmx-exporter.yaml analogue)
# --------------------------------------------------------------------- #
_PROM_METRICS = [
    # (name, type, help, per-partition field or callable)
    ("cdc_partition_records_total", "counter",
     "Change events read from the log per partition "
     "(kafka_server_BrokerTopicMetrics_MessagesIn_total analogue)",
     "n_events"),
    ("cdc_partition_applied_total", "counter",
     "Events applied to the target table per partition "
     "(MirrorSourceConnector record-count analogue, "
     "mm2-jmx-exporter.yaml record-count)",
     "n_applied"),
    ("cdc_partition_duplicates_total", "counter",
     "Re-delivered events dropped by the applied-offset watermark",
     "n_duplicates"),
    ("cdc_partition_bytes_in_total", "counter",
     "Payload bytes read per partition (byte-rate analogue)",
     "bytes_in"),
    ("cdc_partition_applied_lsn", "gauge",
     "Per-partition applied-offset watermark "
     "(kafka_consumergroup_current_offset analogue)",
     "applied_lsn"),
    ("cdc_partition_replication_latency_ms", "gauge",
     "Apply wall clock minus newest producer event time, ts3-ts2 of the "
     "reference's four-timestamp model (docs/perf-tests.md:173-187; "
     "mm2-jmx-exporter.yaml replication-latency-ms)",
     "replication_latency_ms"),
]

_TABLE_METRICS = [
    ("cdc_table_version", "gauge", "Committed table version", "version"),
    ("cdc_table_buckets", "gauge", "Bucket count of the current layout",
     "n_buckets"),
    ("cdc_table_bytes", "gauge", "Total data bytes in the current version",
     "bytes"),
    ("cdc_alerts_firing", "gauge", "Alert rows firing by the rules CLI",
     "alerts_firing"),
    ("cdc_txn_open", "gauge",
     "Open (unresolved) transactions withheld by the read_committed gate",
     "txn_open"),
]


def _prom_escape(v: str) -> str:
    return str(v).replace("\\", r"\\").replace('"', r"\"").replace("\n", r"\n")


def prometheus_exposition(
    partition_rows: list[dict],
    table_stats: dict | None = None,
    job: str = "cdc-engine",
) -> str:
    """Render per-partition replication metrics + table-level gauges in the
    Prometheus text exposition format (the output shape the reference's
    JMX exporter + ServiceMonitor feed to Prometheus,
    monitoring/kafka-metrics.yaml, mm2-service-monitor.yaml — so the
    reference's prometheus-rules.yaml / Grafana dashboards point at this
    endpoint unchanged in spirit).

    Pure formatting over control-plane rows (per-partition aggregates —
    bounded by partition count, never O(data)); the caller supplies rows
    from the metrics table (CLI ``metrics --format prometheus``) or its
    own aggregation. Missing/None fields are skipped, not zero-filled —
    absent is honest, zero is a claim.
    """
    out: list[str] = []
    for name, mtype, help_, field in _PROM_METRICS:
        rows = [r for r in partition_rows if r.get(field) is not None]
        if not rows:
            continue
        out.append(f"# HELP {name} {help_}")
        out.append(f"# TYPE {name} {mtype}")
        for r in sorted(rows, key=lambda r: r["partition"]):
            val = r[field]
            out.append(
                f'{name}{{job="{_prom_escape(job)}",'
                f'partition="{r["partition"]}"}} {val}'
            )
    for name, mtype, help_, field in _TABLE_METRICS:
        if table_stats is None or table_stats.get(field) is None:
            continue
        out.append(f"# HELP {name} {help_}")
        out.append(f"# TYPE {name} {mtype}")
        out.append(f'{name}{{job="{_prom_escape(job)}"}} {table_stats[field]}')
    return "\n".join(out) + ("\n" if out else "")
