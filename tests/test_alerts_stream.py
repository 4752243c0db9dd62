"""Streaming alert evaluation — Prometheus `for:` duration semantics over
the engine's per-epoch metrics feed (streaming/alerts_stream.py).

Scenario: an at-least-once redelivery storm. Epoch 0 applies normally;
epochs 1-2 re-deliver the same batch (every event a duplicate ->
n_events > 0, n_applied = 0); epoch 3 delivers fresh events. With
for_epochs=2 the PartitionStalled alert must stay PENDING after one dup
epoch, transition to FIRING on the second consecutive one, and emit
RESOLVED when the partition recovers — once per partition, edges only.
The ratchet state must survive a query restart (checkpoint), since
"consecutive" spans micro-batches.
"""

from __future__ import annotations

import os

from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.alerts_stream import (
    EpochRule,
    alert_stream_from_store,
)
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig

RULES = [
    EpochRule("PartitionStalled", "n_events > 0 AND n_applied = 0",
              for_epochs=2, severity="critical"),
    EpochRule("DuplicateStorm", "n_duplicates > n_applied AND n_events > 0",
              for_epochs=3),
]


def _drain(spark, store, out_dir, cp):
    q = (
        alert_stream_from_store(spark, store, RULES)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .option("maxFilesPerTrigger", "1")  # one epoch file per trigger
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _rows(spark, out_dir):
    from pyspark.errors import AnalysisException

    try:
        return sorted(
            (
                (r["alert"], r["partition"], r["epoch"], r["status"],
                 r["held_epochs"], r["severity"])
                for r in spark.read.parquet(out_dir).collect()
            ),
        )
    except AnalysisException:
        return []


def test_for_epochs_ratchet_fires_once_and_resolves(spark, tmp_path):
    d = str(tmp_path / "cl")
    write_changelog(
        spark, d,
        ChangelogSpec(n_keys=60, versions_per_key=2, n_partitions=2, files=2,
                      dup_every=0),
    )
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    a = spark.read.option("mergeSchema", "true").parquet(f"{d}/{files[0]}")
    b = spark.read.option("mergeSchema", "true").parquet(f"{d}/{files[1]}")

    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig())  # metrics on
    out, cp = str(tmp_path / "alerts"), str(tmp_path / "cp")

    # epochs 0-1: normal apply, then the first redelivery. Drain the alert
    # stream NOW so the ratchet's count=1 state must cross a query restart.
    engine.apply_batch(a, 0)
    engine.apply_batch(a, 1)  # all duplicates
    _drain(spark, store, out, cp)
    assert _rows(spark, out) == []  # pending, not firing — edges only

    # epoch 2: second consecutive dup epoch -> FIRING; epoch 3: recovery
    engine.apply_batch(a, 2)
    engine.apply_batch(b, 3)
    _drain(spark, store, out, cp)

    rows = _rows(spark, out)
    partitions = {
        r["partition"]
        for r in spark.read.parquet(os.path.join(store.root, "metrics")).collect()
    }
    expected = sorted(
        [("PartitionStalled", p, 2, "firing", 2, "critical")
         for p in partitions]
        + [("PartitionStalled", p, 3, "resolved", 0, "critical")
           for p in partitions]
    )
    # DuplicateStorm (for_epochs=3) never reaches its duration: 2 dup epochs
    assert rows == expected


def test_alert_stream_cli(tmp_path):
    """CLI: `alerts <target> --stream-out` drains the metrics feed through
    the duration evaluator (no transitions on a healthy single epoch)."""
    import json

    from test_cli import _run

    cl = str(tmp_path / "cl")
    tgt = str(tmp_path / "tgt")
    _run("gen", cl, "--keys", "40", "--versions", "2",
         "--partitions", "2", "--files", "2")
    _run("replay", cl, tgt)
    out = json.loads(_run("alerts", tgt,
                          "--stream-out", str(tmp_path / "alerts"),
                          "--checkpoint", str(tmp_path / "cp")))
    assert out["status"] == "drained"
