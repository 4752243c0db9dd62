"""Alert-rule evaluation over the replication metrics (round-4 #9).

The reference's alerting surface is Prometheus threshold rules over the
MM2/Kafka metrics (monitoring/prometheus-rules.yaml) plus Grafana lag
dashboards (docs/index.md:156-158). These tests plant each failure the
rules exist to catch — a lag spike, a sequence gap, a non-empty DLQ, an
oversized bucket — and assert the matching alert rows fire by rule name;
the healthy twin of each signal stays silent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog
from kp_data_replication_spark.operators.alerts import (
    AlertRule,
    DEFAULT_RULES,
    engine_alert_sources,
    evaluate_alerts,
)
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def _names(alerts_df):
    return {r["alert"] for r in alerts_df.collect()}


def test_alerts_fire_on_planted_lag_gap_dlq_and_oversize(spark, tmp_path):
    raw = str(tmp_path / "cl_raw")
    write_changelog(
        spark, raw,
        ChangelogSpec(n_keys=80, versions_per_key=2, n_partitions=2,
                      files=2, dup_every=0),
    )
    ev = spark.read.option("mergeSchema", "true").parquet(raw)

    # plant a SEQUENCE GAP: drop one mid-sequence whitelisted lsn from
    # partition 0. (The generator's lsn is the global produce ordinal, so
    # the ^repos$ whitelist already leaves natural holes where off-topic
    # events sat — the planted hole must be NEW relative to that baseline.)
    from kp_data_replication_spark.operators.dedup_cdc import gap_audit
    from kp_data_replication_spark.operators.filters import select_topics

    repos = select_topics(ev, "^repos$")
    p0_lsns = sorted(
        r["lsn"] for r in repos.filter("partition = 0").select("lsn").collect()
    )
    victim = int(p0_lsns[len(p0_lsns) // 2])
    baseline_gaps = {
        (r["partition"], r["prev_lsn"], r["lsn"])
        for r in gap_audit(repos).collect()
    }
    cl = str(tmp_path / "cl")
    ev.filter(
        ~((F.col("partition") == 0) & (F.col("lsn") == victim))
    ).write.parquet(cl)
    events = spark.read.parquet(cl)

    # plant a LAG SPIKE: apply only the older half of each partition's lsn
    # range, so lineage trails the changelog head
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig())
    cut = int(events.agg(F.percentile(F.col("lsn"), F.lit(0.5))).first()[0])
    engine.apply_batch(events.filter(F.col("lsn") <= cut), 0)

    # plant a NON-EMPTY DLQ
    dlq = str(tmp_path / "dlq")
    spark.range(3).write.parquet(f"{dlq}/epoch=0")

    # plant a STALE DERIVED CONSUMER: a registered flow pinned at v0 while
    # the table head advances (threshold 0 versions at toy scale)
    store.record_consumer("cascade:stale", 0)

    rules = [r for r in DEFAULT_RULES if r.name != "ReplicationLagHigh"] + [
        # toy-scale threshold; prod keeps the 1000-offset default
        AlertRule(
            "ReplicationLagHigh", "lag", "lag > 5",
            summary_expr=DEFAULT_RULES[0].summary_expr,
        ),
    ]
    sources = engine_alert_sources(
        spark, store, changelog_dir=cl, dlq_dir=dlq,
        bucket_budget_bytes=1,  # plant BUCKET OVERSIZE: any live byte fires
        consumer_stale_versions=0,
    )
    alerts = evaluate_alerts(spark, sources, rules)
    assert alerts.columns == ["alert", "severity", "source", "summary", "labels"]
    names = _names(alerts)
    assert {
        "ReplicationLagHigh", "SequenceGapDetected", "DlqNonEmpty",
        "BucketOversized", "DerivedConsumerStale",
    } <= names

    # the planted hole shows up as a NEW gap row spanning the victim lsn
    import json as _json

    gap_rows = [
        _json.loads(r["labels"])
        for r in alerts.filter("alert = 'SequenceGapDetected'").collect()
    ]
    new_gaps = [
        g for g in gap_rows
        if (g["partition"], g["prev_lsn"], g["lsn"]) not in baseline_gaps
    ]
    assert any(
        g["partition"] == 0 and g["prev_lsn"] < victim < g["lsn"]
        for g in new_gaps
    )
    assert any(
        r["severity"] == "critical" for r in alerts.collect()
    )  # DlqNonEmpty escalates

    # HEALTHY TWIN: catch up fully, give buckets a sane budget, no DLQ —
    # those rules go silent (gap alerts stay: the changelog itself is holed)
    engine.apply_batch(events.filter(F.col("lsn") > cut), 1)
    store.record_consumer("cascade:stale", store.current_version())
    healthy = engine_alert_sources(
        spark, store, changelog_dir=cl, bucket_budget_bytes=1 << 30,
        consumer_stale_versions=0,
    )
    silent = _names(evaluate_alerts(spark, healthy, rules))
    assert not silent & {
        "ReplicationLagHigh", "DlqNonEmpty", "BucketOversized",
        "PartitionStalled", "DerivedConsumerStale",
    }
    assert "SequenceGapDetected" in silent


def test_alerts_skip_absent_sources_and_empty_ruleset(spark, tmp_path):
    """Prometheus semantics on absent series: a rule over a signal the
    deployment doesn't produce simply never fires."""
    store = TableStore(str(tmp_path / "t"), n_buckets=2)
    out = evaluate_alerts(spark, engine_alert_sources(spark, store))
    assert out.count() == 0
    assert out.columns == ["alert", "severity", "source", "summary", "labels"]


def test_alerts_cli(tmp_path):
    """CLI surface: firing alerts print as JSON lines + a summary line."""
    import json

    from test_cli import _run

    cl = str(tmp_path / "cl")
    tgt = str(tmp_path / "tgt")
    _run("gen", cl, "--keys", "40", "--versions", "2",
         "--partitions", "2", "--files", "2")
    _run("replay", cl, tgt)

    out = _run("alerts", tgt, "--changelog", cl,
               "--bucket-budget-bytes", "1")
    summary = json.loads(out)
    assert summary["n_alerts"] > 0 and "buckets" in summary["sources"]


def test_throughput_drop_fires_on_ewma_anomaly(spark):
    """A partition whose last-epoch apply count collapses vs its own EWMA
    baseline fires ThroughputDrop; a steady partition and a too-short
    history do not. The anomalous epoch never contaminates its baseline."""
    from kp_data_replication_spark.operators.alerts import (
        DEFAULT_RULES,
        evaluate_alerts,
        throughput_anomaly,
    )

    rows = []
    # p0: steady 100/epoch over 6 epochs -> no alert
    rows += [(0, e, 100) for e in range(6)]
    # p1: 100/epoch for 5 epochs then 3 -> fires (3 < 0.25 * ewma)
    rows += [(1, e, 100) for e in range(5)] + [(1, 5, 3)]
    # p2: only 2 epochs of history -> below n_epochs floor, no alert
    rows += [(2, 0, 100), (2, 1, 0)]
    m = spark.createDataFrame(rows, "partition int, epoch long, n_applied long")

    anom = {r.partition: r for r in throughput_anomaly(m).collect()}
    assert anom[0].n_last == 100 and anom[0].ewma > 50
    assert anom[1].n_last == 3 and anom[1].ewma > 50  # baseline excludes the drop
    assert anom[2].n_epochs == 2

    fired = evaluate_alerts(spark, {"anomaly": throughput_anomaly(m)},
                            [r for r in DEFAULT_RULES
                             if r.name == "ThroughputDrop"]).collect()
    assert [r.alert for r in fired] == ["ThroughputDrop"]
    assert '"partition":1' in fired[0].labels
    assert "partition 1 applied 3" in fired[0].summary


def test_grafana_dashboard_references_only_exposed_metrics():
    """grafana/cdc-replication.json is dashboards-as-code over the
    engine's own exposition surface (the reference ships
    monitoring/grafana/*.json over its JMX exporter): every metric name a
    panel queries must exist in the exposition module's metric tables, so
    the dashboard cannot rot silently when metrics are renamed."""
    import json
    import os
    import re

    from kp_data_replication_spark.operators.metrics import (
        _PROM_METRICS,
        _TABLE_METRICS,
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "grafana", "cdc-replication.json",
    )
    with open(path) as f:
        dash = json.load(f)
    exposed = {m[0] for m in _PROM_METRICS} | {m[0] for m in _TABLE_METRICS}
    referenced = set()
    for p in dash["panels"]:
        for t in p.get("targets", []):
            referenced |= set(re.findall(r"\bcdc_[a-z_]+", t["expr"]))
    # the datasource variable's label_values query counts too
    for v in dash.get("templating", {}).get("list", []):
        q = v.get("query")
        if isinstance(q, str):
            referenced |= set(re.findall(r"\bcdc_[a-z_]+", q))
    assert referenced, "dashboard queries no metrics at all"
    unknown = referenced - exposed
    assert not unknown, f"dashboard references unexposed metrics: {unknown}"
    # and the dashboard covers the headline series, not a token subset
    assert {"cdc_partition_applied_total",
            "cdc_partition_replication_latency_ms",
            "cdc_partition_applied_lsn",
            "cdc_table_version"} <= referenced
