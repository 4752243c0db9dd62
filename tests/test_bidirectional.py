"""Bi-directional replication without loops (SURVEY.md §2.2 F5; reference
mirror-maker-2/bi-directional/accounts-mirroring-mm2.yml:43-69,
docs/consideration.md:29-35).

Two clusters each produce a local topic; each flow replicates the OTHER
cluster's local topic into a prefixed replica table. Loop prevention is
DefaultReplicationPolicy's prefix rename + a whitelist that matches only
unprefixed local topics: a record that already crossed once becomes
`kp-<src>.<topic>` and can never match `^repos$` again, so a second pass
replicates nothing (no ping-pong growth) — exactly the convergence the
reference's active/active accounts scenario relies on.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kp_data_replication_spark.datagen import (
    ChangelogSpec,
    compute_expected_state_pandas,
    write_changelog,
)
from kp_data_replication_spark.operators.filters import cluster_prefix
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import (
    CdcApplyEngine,
    EngineConfig,
    final_state,
)

FLOW = dict(metrics=False, whitelist="^repos$")


def _sha_set(pdf):
    return sorted(hashlib.sha256(c.encode()).hexdigest() for c in pdf["content"])


def test_bidirectional_flows_converge_without_ping_pong(spark, tmp_path):
    # two clusters with different-sized local keyspaces
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    write_changelog(spark, a_dir, ChangelogSpec(n_keys=90, versions_per_key=2, n_partitions=2, files=2))
    write_changelog(spark, b_dir, ChangelogSpec(n_keys=40, versions_per_key=2, n_partitions=2, files=2))
    a_events = spark.read.option("mergeSchema", "true").parquet(a_dir)
    b_events = spark.read.option("mergeSchema", "true").parquet(b_dir)

    # replica tables: A's topic at cluster B, and B's topic at cluster A
    rep_a_at_b = TableStore(str(tmp_path / "rep_a_at_b"), n_buckets=4)
    rep_b_at_a = TableStore(str(tmp_path / "rep_b_at_a"), n_buckets=4)
    flow_ab = CdcApplyEngine(rep_a_at_b, EngineConfig(**FLOW, consumer_group="a-to-b"))
    flow_ba = CdcApplyEngine(rep_b_at_a, EngineConfig(**FLOW, consumer_group="b-to-a"))

    # round 1, A -> B
    s = flow_ab.apply_batch(a_events, 0, writer_id="ab")
    assert s["keys_changed"] > 0

    # what MM2 re-emits into B's log: the replicated records under the
    # PREFIXED topic name (DefaultReplicationPolicy rename)
    a_reemitted = (
        cluster_prefix(a_events, "kp-a", col="source_topic", out_col="source_topic2")
        .drop("source_topic")
        .withColumnRenamed("source_topic2", "source_topic")
        .select(*a_events.columns)
    )
    b_combined = b_events.unionByName(a_reemitted)

    # round 1, B -> A over B's FULL log (local + replicated-from-A):
    # the whitelist must admit only B-local records
    s = flow_ba.apply_batch(b_combined, 0, writer_id="ba")
    assert s["keys_changed"] > 0

    exp_a = compute_expected_state_pandas(a_dir)
    exp_b = compute_expected_state_pandas(b_dir)
    got_a = final_state(spark, rep_a_at_b).select("content_sha").toPandas()
    got_b = final_state(spark, rep_b_at_a).select("content_sha").toPandas()
    # replica of A at B == A alone; replica of B at A == B alone —
    # NOT B ∪ A: the prefixed copies never re-replicated
    assert sorted(got_a["content_sha"]) == _sha_set(exp_a)
    assert sorted(got_b["content_sha"]) == _sha_set(exp_b)

    # round 2: run both flows again over logs that now contain every
    # replicated record — convergence means zero new keys on both sides
    b_reemitted = (
        cluster_prefix(b_events, "kp-b", col="source_topic", out_col="source_topic2")
        .drop("source_topic")
        .withColumnRenamed("source_topic2", "source_topic")
        .select(*b_events.columns)
    )
    a_combined = a_events.unionByName(b_reemitted)
    s2_ab = flow_ab.apply_batch(a_combined, 1, writer_id="ab")
    s2_ba = flow_ba.apply_batch(b_combined, 1, writer_id="ba")
    assert s2_ab["keys_changed"] == 0
    assert s2_ba["keys_changed"] == 0
    # state unchanged: no infinite loop, no duplicate growth
    assert final_state(spark, rep_a_at_b).count() == len(exp_a)
    assert final_state(spark, rep_b_at_a).count() == len(exp_b)
