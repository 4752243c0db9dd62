"""Threshold alert evaluation over the replication metrics tables.

The reference ships its alerting as Prometheus rules over the MM2/Kafka
JMX metrics (``monitoring/prometheus-rules.yaml`` — e.g.
``KafkaRunningOutOfSpace: available_bytes < 5Gi``,
``UnderReplicatedPartitions: underreplicatedpartitions > 0``) plus
Grafana consumer-lag dashboards (``docs/index.md:156-158``). This module
is the engine-native analogue: every underlying signal the rules need
(lag, replication latency, sequence gaps, DLQ volume, bucket bytes,
heartbeat liveness) is already computed by the metrics operators /
manifest; a rule is a named boolean SQL expression over one of those
frames, and evaluation is a pure Catalyst ``filter`` + projection per
rule, unioned into one uniform alerts table.

Scale shape: the metric frames are per-partition / per-bucket aggregates
— control-plane sized (thousands of rows at 100 TB, never O(data)) — so
rule evaluation is trivially cheap. No UDFs, no collects; the alerts
table is an ordinary DataFrame a caller can sink, stream, or join.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class AlertRule:
    """One threshold rule: fire on every row of ``source`` where ``expr``
    (an ANSI-SQL boolean over that frame's columns) holds.

    ``summary_expr`` is an optional SQL *string* expression rendered per
    firing row (the Prometheus annotation-template analogue — use
    ``format_string(...)``/``concat(...)`` instead of ``{{ $value }}``).
    """

    name: str
    source: str
    expr: str
    severity: str = "warning"
    summary_expr: str | None = None


# prometheus-rules.yaml analogues, adapted to the engine's signals:
#  * ReplicationLagHigh     — kafka_consumergroup_lag panels (docs/index.md:156)
#  * ReplicationLatencyHigh — ts3-ts2 latency (docs/perf-tests.md:173-187)
#  * SequenceGapDetected    — offset divergence (docs/consideration.md:46)
#  * DlqNonEmpty            — errors.tolerance=all quarantine growth
#  * BucketOversized        — KafkaRunningOutOfSpace, per-bucket bytes vs
#                             budget from the manifest (auto-rebucket's probe)
#  * DerivedConsumerStale   — consumer-group lag at the TABLE level: a
#                             registered changefeed consumer (cascade,
#                             dedup/ANN index, agg view) falling behind
#                             the source head — it pins retention and its
#                             eventual catch-up diff grows
#  * PartitionStalled       — heartbeat liveness: a known partition whose
#                             last epochs applied nothing while others moved
DEFAULT_RULES: list[AlertRule] = [
    AlertRule(
        "ReplicationLagHigh", "lag", "lag > 1000",
        summary_expr="format_string('partition %s lags %s offsets behind "
                     "the source head', partition, lag)",
    ),
    AlertRule(
        "ReplicationLatencyHigh", "latency", "p95_ms > 30000",
        summary_expr="format_string('partition %s p95 replication latency "
                     "%.0f ms', partition, p95_ms)",
    ),
    AlertRule(
        "SequenceGapDetected", "gaps", "gap != 1",
        summary_expr="format_string('partition %s jumps lsn %s -> %s',"
                     " partition, prev_lsn, lsn)",
    ),
    AlertRule(
        "DlqNonEmpty", "dlq", "n_rows > 0", severity="critical",
        summary_expr="format_string('%s quarantined envelopes await "
                     "repair', n_rows)",
    ),
    AlertRule(
        "BucketOversized", "buckets", "bytes > budget_bytes",
        summary_expr="format_string('bucket %s holds %s bytes (budget %s)"
                     " — rebucket or raise auto_rebucket_target_bytes',"
                     " bucket, bytes, budget_bytes)",
    ),
    AlertRule(
        "DerivedConsumerStale", "consumers",
        "versions_behind > stale_budget_versions",
        summary_expr="format_string('%s is %s versions behind the source "
                     "head (%s/%s) — stalled derived flow pins retention "
                     "and grows catch-up cost', consumer_group, "
                     "versions_behind, applied_version, head_version)",
    ),
    AlertRule(
        "PartitionStalled", "liveness",
        "n_applied_recent = 0 AND n_events_recent > 0", severity="critical",
        summary_expr="format_string('partition %s received %s events in "
                     "the last %s epochs but applied none', partition, "
                     "n_events_recent, window_epochs)",
    ),
    AlertRule(
        "ThroughputDrop", "anomaly",
        "n_epochs >= 4 AND ewma > 0 AND n_last < 0.25 * ewma",
        summary_expr="format_string('partition %s applied %s rows last "
                     "epoch vs EWMA baseline %.1f — >75%% drop', "
                     "partition, n_last, ewma)",
    ),
]

ALERT_SCHEMA = T.StructType([
    T.StructField("alert", T.StringType(), False),
    T.StructField("severity", T.StringType(), False),
    T.StructField("source", T.StringType(), False),
    T.StructField("summary", T.StringType(), True),
    T.StructField("labels", T.StringType(), True),
])


def evaluate_alerts(
    spark: SparkSession,
    sources: dict[str, DataFrame],
    rules: list[AlertRule] | None = None,
) -> DataFrame:
    """Evaluate ``rules`` over the named metric frames; one row per firing
    (rule, metric-row) pair. Rules whose source frame is absent are
    skipped (a store without a DLQ simply has no DLQ signal), mirroring
    Prometheus' behavior on absent series.

    ``labels`` carries the full firing row as JSON — the alert consumer's
    equivalent of Prometheus labels, without freezing a per-source schema
    into the alerts table.
    """
    out: list[DataFrame] = []
    for r in rules if rules is not None else DEFAULT_RULES:
        df = sources.get(r.source)
        if df is None:
            continue
        summary = (
            F.expr(r.summary_expr).cast("string")
            if r.summary_expr
            else F.lit(r.name)
        )
        out.append(
            df.filter(F.expr(r.expr)).select(
                F.lit(r.name).alias("alert"),
                F.lit(r.severity).alias("severity"),
                F.lit(r.source).alias("source"),
                summary.alias("summary"),
                F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias(
                    "labels"
                ),
            )
        )
    if not out:
        return spark.createDataFrame([], ALERT_SCHEMA)
    return reduce(lambda a, b: a.unionByName(b), out)


def throughput_anomaly(
    metrics: DataFrame, alpha: float = 0.3
) -> DataFrame:
    """Per-partition EWMA throughput baseline vs the LAST epoch — the
    adaptive-threshold signal a static rule cannot express (Prometheus'
    ``predict_linear``/``avg_over_time`` deviation idiom): a partition
    whose apply rate collapses relative to ITS OWN recent history fires
    even when the absolute volume would pass any fixed floor.

    The EWMA folds over all epochs BEFORE the last (the candidate), so the
    anomalous epoch never contaminates its own baseline. Per-partition
    epoch history is control-plane sized (one row per epoch), so the
    collect_list + fold runs over tiny arrays — never O(data).

    Output: (partition, n_epochs, ewma, n_last).
    """
    hist = metrics.groupBy("partition").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("epoch"), F.col("n_applied")))
        ).alias("h")
    )
    base = F.slice(F.col("h"), 1, F.size("h") - 1)
    ewma = F.aggregate(
        base,
        F.lit(0.0),
        lambda acc, x: acc * F.lit(1.0 - alpha)
        + F.lit(alpha) * x["n_applied"].cast("double"),
    )
    return hist.select(
        "partition",
        F.size("h").alias("n_epochs"),
        F.round(ewma, 4).alias("ewma"),
        F.element_at("h", -1)["n_applied"].alias("n_last"),
    )


def engine_alert_sources(
    spark: SparkSession,
    store,
    changelog_dir: str | None = None,
    dlq_dir: str | None = None,
    whitelist: str = "^repos$",
    bucket_budget_bytes: int | None = None,
    liveness_epochs: int = 5,
    consumer_stale_versions: int = 10,
) -> dict[str, DataFrame]:
    """Assemble the standard signal frames for :data:`DEFAULT_RULES` from a
    target :class:`TableStore` (+ optionally the changelog for lag/gaps and
    the DLQ dir). Every frame is per-partition/bucket aggregate sized;
    the bucket frame is pure manifest metadata (no file reads at all).
    """
    from pyspark.errors import AnalysisException

    from ..sources.table_store import TableStore  # noqa: F401 (typing aid)
    from .dedup_cdc import gap_audit
    from .filters import select_topics
    from .metrics import consumer_lag

    sources: dict[str, DataFrame] = {}

    if changelog_dir is not None:
        events = select_topics(
            spark.read.option("mergeSchema", "true").parquet(changelog_dir),
            whitelist,
        )
        head = events.groupBy("partition").agg(F.max("lsn").alias("max_lsn"))
        lineage = (
            store.read_lineage(spark)
            .groupBy("partition")
            .agg(F.min("applied_lsn").alias("applied_lsn"))
        )
        sources["lag"] = consumer_lag(head, lineage)
        sources["gaps"] = gap_audit(events)

    mdir = f"{store.root}/metrics"
    try:
        m = spark.read.parquet(mdir)
        have_metrics = True
    except AnalysisException:
        have_metrics = False
    if have_metrics:
        last = m.agg(F.max("epoch")).first()[0] or 0
        recent = m.filter(F.col("epoch") > last - liveness_epochs)
        lat = (
            F.col("apply_ts").cast("double") - F.col("max_ts").cast("double")
        ) * 1000.0
        sources["latency"] = (
            recent.filter(F.col("max_ts").isNotNull())
            .select("partition", lat.alias("latency_ms"))
            .groupBy("partition")
            .agg(
                F.avg("latency_ms").alias("avg_ms"),
                F.max("latency_ms").alias("max_ms"),
                F.percentile(F.col("latency_ms"), F.lit(0.95)).alias("p95_ms"),
            )
        )
        sources["liveness"] = (
            recent.groupBy("partition")
            .agg(
                F.sum("n_events").alias("n_events_recent"),
                F.sum("n_applied").alias("n_applied_recent"),
            )
            .withColumn("window_epochs", F.lit(liveness_epochs))
        )
        sources["anomaly"] = throughput_anomaly(m)

    if dlq_dir is not None:
        try:
            dlq = spark.read.parquet(dlq_dir)
            sources["dlq"] = dlq.agg(F.count(F.lit(1)).alias("n_rows"))
        except AnalysisException:
            sources["dlq"] = spark.createDataFrame(
                [(0,)], T.StructType([T.StructField("n_rows", T.LongType())])
            )

    cons = store.consumers()
    if cons:
        head_v = store.current_version()
        rows = [
            (g, int(v), int(head_v), int(head_v) - int(v),
             int(consumer_stale_versions))
            for g, v in sorted(cons.items())
        ]
        sources["consumers"] = spark.createDataFrame(
            rows,
            T.StructType([
                T.StructField("consumer_group", T.StringType()),
                T.StructField("applied_version", T.LongType()),
                T.StructField("head_version", T.LongType()),
                T.StructField("versions_behind", T.LongType()),
                T.StructField("stale_budget_versions", T.LongType()),
            ]),
        )

    manifest = store.current_manifest()
    if manifest is not None and bucket_budget_bytes is not None:
        bb = manifest.get("bucket_bytes", {})
        rows = [
            (str(b), int(bb.get(str(b), 0)), int(bucket_budget_bytes))
            for b in manifest["buckets"]
        ]
        sources["buckets"] = spark.createDataFrame(
            rows,
            T.StructType([
                T.StructField("bucket", T.StringType()),
                T.StructField("bytes", T.LongType()),
                T.StructField("budget_bytes", T.LongType()),
            ]),
        )

    return sources
