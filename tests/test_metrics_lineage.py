"""Per-epoch metrics table + lineage bookkeeping (SURVEY.md §2.4 A6-A7, §2.9 T6).

Mirrors the MM2 JMX metric surface (mm2-jmx-exporter.yaml:28-43): per
(partition, epoch) record counts, duplicates masked, byte totals, lag inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog
from kp_data_replication_spark.operators.metrics import consumer_lag
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig

SPEC = ChangelogSpec(n_keys=100, versions_per_key=3, n_partitions=4, files=3, dup_every=0)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cl"))
    write_changelog(spark, d, SPEC)
    store = TableStore(str(tmp_path_factory.mktemp("t")), n_buckets=8)
    engine = CdcApplyEngine(store, EngineConfig(metrics=True))
    return d, store, engine


def test_metrics_count_duplicates_masked(spark, setup):
    d, store, engine = setup
    df = spark.read.option("mergeSchema", "true").parquet(d)
    engine.apply_batch(df, 0)
    # epoch 1 re-delivers a slice of already-applied events -> all duplicates
    engine.apply_batch(df.limit(120), 1)

    m = spark.read.parquet(store.root + "/metrics")
    e0 = m.filter(F.col("epoch") == 0)
    e1 = m.filter(F.col("epoch") == 1)
    agg0 = e0.agg(F.sum("n_events"), F.sum("n_applied"), F.sum("n_duplicates")).collect()[0]
    # first epoch: everything on the whitelisted topic is fresh
    assert agg0[0] == agg0[1] and agg0[2] == 0
    agg1 = e1.agg(F.sum("n_events"), F.sum("n_applied"), F.sum("n_duplicates")).collect()[0]
    assert agg1[1] == 0 and agg1[2] == agg1[0] > 0  # all masked as duplicates
    assert e0.count() == SPEC.n_partitions  # one row per partition


def test_lineage_rows_roundtrip(spark, setup):
    d, store, engine = setup
    rows = store.read_lineage_rows()
    assert len(rows) == SPEC.n_partitions
    assert all(r["applied_lsn"] >= 0 and r["n_applied"] > 0 for r in rows)
    # Spark-facing view agrees with the pyarrow rows
    df_rows = {r["partition"]: r["applied_lsn"] for r in store.read_lineage(spark).collect()}
    assert df_rows == {r["partition"]: r["applied_lsn"] for r in rows}


def test_consumer_lag_zero_after_drain(spark, setup):
    d, store, engine = setup
    head = (
        spark.read.option("mergeSchema", "true").parquet(d)
        .filter(F.col("source_topic") == "repos")
        .groupBy("partition").agg(F.max("lsn").alias("max_lsn"))
    )
    lag = consumer_lag(head, store.read_lineage(spark))
    assert all(r.lag == 0 for r in lag.collect())


def test_bytes_in_positive(spark, setup):
    d, store, _ = setup
    m = spark.read.parquet(store.root + "/metrics").filter(F.col("epoch") == 0)
    assert all(r.bytes_in > 0 for r in m.collect())


def test_heartbeat_apply_ts_and_idle_rows(spark, tmp_path):
    """T6/S10: every metrics row carries a wall-clock apply_ts (ts3 of the
    four-timestamp model); an epoch whose batch misses a known partition
    still emits a heartbeat row for it (n_events=0) so latency/liveness
    monitors see 'idle but alive'."""
    d = str(tmp_path / "cl")
    write_changelog(spark, d, SPEC)
    store = TableStore(str(tmp_path / "t"), n_buckets=8)
    engine = CdcApplyEngine(store, EngineConfig(metrics=True))
    df = spark.read.option("mergeSchema", "true").parquet(d)
    engine.apply_batch(df, 0)
    # epoch 1: only partition 0's events -> partitions 1..3 are idle
    engine.apply_batch(df.filter(F.col("partition") == 0), 1)

    m = spark.read.parquet(store.root + "/metrics")
    assert m.filter(F.col("apply_ts").isNull()).count() == 0
    # replication latency is measurable: apply happened after produce
    e0 = m.filter(F.col("epoch") == 0)
    assert all(r.apply_ts >= r.max_ts for r in e0.filter(F.col("max_ts").isNotNull()).collect())
    e1 = m.filter(F.col("epoch") == 1)
    assert e1.count() == SPEC.n_partitions  # heartbeats for idle partitions
    idle = e1.filter(F.col("n_events") == 0)
    assert idle.count() == SPEC.n_partitions - 1
    assert all(r.apply_ts is not None for r in idle.collect())

    from kp_data_replication_spark.operators.metrics import replication_latency

    lat = replication_latency(
        e0.filter(F.col("max_ts").isNotNull()), produce_ts="max_ts", apply_ts="apply_ts"
    )
    assert all(r.avg_ms >= 0 for r in lat.collect())


def test_per_group_lineage_is_independent(spark, tmp_path):
    """Checkpoint lineage is keyed on (consumer_group, partition)
    (docs/consideration.md:37-48): two flows into the same target track
    independent watermarks — a second flow's first apply is NOT deduped by
    the first flow's lineage, and each flow's rows survive the other's
    commits."""
    d = str(tmp_path / "cl")
    write_changelog(spark, d, SPEC)
    store = TableStore(str(tmp_path / "t"), n_buckets=8)
    df = spark.read.option("mergeSchema", "true").parquet(d)

    a = CdcApplyEngine(store, EngineConfig(metrics=False, consumer_group="flow-a"))
    b = CdcApplyEngine(store, EngineConfig(metrics=False, consumer_group="flow-b"))

    s_a = a.apply_batch(df, 0, writer_id="wa")
    assert s_a["keys_changed"] > 0
    rows = store.read_lineage_rows()
    assert {r["consumer_group"] for r in rows} == {"flow-a"}

    # flow-b re-applies the same events: ITS lineage is empty, so nothing
    # is deduped away — the events process and b's watermarks appear,
    # while a's rows are preserved untouched
    s_b = b.apply_batch(df, 0, writer_id="wb")
    assert s_b["status"] == "committed" and s_b["keys_changed"] > 0
    rows = store.read_lineage_rows()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["consumer_group"], {})[r["partition"]] = r["applied_lsn"]
    assert set(by_group) == {"flow-a", "flow-b"}
    assert by_group["flow-a"] == by_group["flow-b"]  # both fully drained

    # a re-delivery to flow-a IS deduped by a's own lineage
    s_a2 = a.apply_batch(df, 1, writer_id="wa")
    assert s_a2["keys_changed"] == 0


# --------------------------------------------------------------------- #
# Prometheus text exposition (monitoring/kafka-metrics.yaml analogue)
# --------------------------------------------------------------------- #
def test_prometheus_exposition_format():
    import re

    from kp_data_replication_spark.operators.metrics import (
        prometheus_exposition,
    )

    rows = [
        {"partition": 1, "n_events": 10, "n_applied": 9, "n_duplicates": 1,
         "bytes_in": 2048, "applied_lsn": 42,
         "replication_latency_ms": 12.5},
        {"partition": 0, "n_events": 5, "n_applied": 5, "n_duplicates": 0,
         "bytes_in": 1024, "applied_lsn": 7,
         "replication_latency_ms": None},  # absent, not zero-filled
    ]
    text = prometheus_exposition(
        rows, {"version": 3, "n_buckets": 8, "bytes": 3072}, job="flow-a"
    )
    lines = text.strip().splitlines()
    # every non-comment line is a well-formed sample
    sample = re.compile(
        r'^[a-z_]+\{job="flow-a"(,partition="\d+")?\} -?[\d.]+$'
    )
    for ln in lines:
        assert ln.startswith("# ") or sample.match(ln), ln
    # counters sorted by partition under their HELP/TYPE header
    i = lines.index("# TYPE cdc_partition_records_total counter")
    assert lines[i + 1].endswith('partition="0"} 5')
    assert lines[i + 2].endswith('partition="1"} 10')
    # None latency row is skipped; partition 1's survives
    lat = [ln for ln in lines if ln.startswith(
        "cdc_partition_replication_latency_ms")]
    assert lat == ['cdc_partition_replication_latency_ms{job="flow-a",'
                   'partition="1"} 12.5']
    # table gauges present
    assert 'cdc_table_version{job="flow-a"} 3' in lines
    assert 'cdc_table_bytes{job="flow-a"} 3072' in lines
    # empty input renders empty, not a lone newline
    assert prometheus_exposition([], None) == ""
