"""Consumer-group failover across a replication hop (MM2
RemoteClusterUtils.translateOffsets / MirrorClient analogue,
docs/consideration.md:37-48): when primary A dies, a downstream consumer
C re-points at replica B and resumes from the as-of-translated version —
no reprocessing from earliest, nothing skipped, replica lag surfaced.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog
from kp_data_replication_spark.operators.changefeed import cascade_catchup
from kp_data_replication_spark.operators.failover import (
    cascade_writer_id,
    failover_consumer,
    sync_points,
    translate_version,
)
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig

FAST = EngineConfig(metrics=False)
SPEC = ChangelogSpec(n_keys=80, versions_per_key=3, n_partitions=4, files=6, dup_every=0)


def _sha(spark, store):
    return sorted(
        (r["repo"], r["path"], r["sha"])
        for r in store.read_state(spark)
        .select("repo", "path", F.sha2("content", 256).alias("sha"))
        .collect()
    )


def _engine(root):
    return CdcApplyEngine(TableStore(root, n_buckets=8), FAST)


@pytest.fixture()
def primary(spark, tmp_path):
    """A built in 3 epochs; returns (changelog_dir, store, per-epoch batches)."""
    d = str(tmp_path / "cl")
    write_changelog(spark, d, SPEC)
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    batches = [files[0:2], files[2:4], files[4:6]]
    a = TableStore(str(tmp_path / "A"), n_buckets=8)
    eng = CdcApplyEngine(a, FAST)

    def apply_epoch(i):
        batch = spark.read.option("mergeSchema", "true").parquet(
            *[f"{d}/{f}" for f in batches[i]]
        )
        assert eng.apply_batch(batch, i)["status"] == "committed"

    return a, apply_epoch


def test_failover_resumes_from_translated_position(spark, tmp_path, primary):
    a, apply_epoch = primary
    apply_epoch(0)
    apply_epoch(1)  # A at v2
    b_eng = _engine(str(tmp_path / "B"))
    c_eng = _engine(str(tmp_path / "C"))
    cascade_catchup(spark, a, b_eng)   # B: v1(s=1), v2(s=2)
    cascade_catchup(spark, a, c_eng)   # C consumed A through k=2
    apply_epoch(2)                     # A at v3
    cascade_catchup(spark, a, b_eng)   # B: v3(s=3) — then A "dies"
    c = c_eng.store
    assert c.writer_epoch(cascade_writer_id(a.root)) == 2

    out = failover_consumer(c, a.root, b_eng.store)
    assert out["old_position"] == 2
    assert out["resume_version"] == 2      # B version whose s(v) == 2
    assert out["unreplicated"] == 0 and out["seeded"]
    # resume the flow as B -> C: only B's (2, 3] range is applied
    res = cascade_catchup(spark, b_eng.store, c_eng)
    assert res["applied_versions"] == [3]
    assert _sha(spark, c) == _sha(spark, b_eng.store) == _sha(spark, a)
    # C's position on B is now registered for vacuum retention pinning
    assert b_eng.store.consumers()[f"cascade:{os.path.abspath(c.root)}"] >= 2
    # failover is idempotent: re-running neither re-seeds nor regresses
    again = failover_consumer(c, a.root, b_eng.store)
    assert not again["seeded"]


def test_fresh_consumer_fails_over_to_full_replay(spark, tmp_path, primary):
    a, apply_epoch = primary
    for i in range(3):
        apply_epoch(i)
    b_eng = _engine(str(tmp_path / "B"))
    cascade_catchup(spark, a, b_eng)
    c_eng = _engine(str(tmp_path / "C"))  # never consumed A at all
    out = failover_consumer(c_eng.store, a.root, b_eng.store)
    assert out["resume_version"] == 0 and not out["seeded"]
    cascade_catchup(spark, b_eng.store, c_eng)
    assert _sha(spark, c_eng.store) == _sha(spark, b_eng.store)


def test_translate_sparse_sync_points_and_replica_lag(spark, tmp_path, primary):
    a, apply_epoch = primary
    apply_epoch(0)                      # v1 data
    a.rewrite_buckets(spark, min_files=0)  # v2 maintenance (content-identical)
    apply_epoch(1)                      # v3 data
    a.rewrite_buckets(spark, min_files=0)  # v4 maintenance
    apply_epoch(2)                      # v5 data
    b_eng = _engine(str(tmp_path / "B"))
    cascade_catchup(spark, a, b_eng)
    b = b_eng.store
    pts = sync_points(b, a.root)
    assert [(p["replica_version"], p["source_version"]) for p in pts
            if p["kind"] == "sync"] == [(1, 1), (2, 3), (3, 5)]
    # as-of rounding: maintenance source versions translate DOWN
    expect = {1: (1, 1), 2: (1, 1), 3: (2, 3), 4: (2, 3), 5: (3, 5)}
    for k, (v, s) in expect.items():
        tr = translate_version(b, a.root, k)
        assert (tr["replica_version"], tr["source_high"]) == (v, s), k
    # replica lag: a consumer ahead of the replica must SEE the gap
    tr = translate_version(b, a.root, 99)  # consumer position beyond replica
    assert tr["replica_version"] == 3 and tr["source_high"] == 5
    assert tr["unreplicated"] == 94  # upper bound in version-number space


def test_foreign_writer_clamps_resume_point(spark, tmp_path, primary):
    a, apply_epoch = primary
    apply_epoch(0)
    b_eng = _engine(str(tmp_path / "B"))
    cascade_catchup(spark, a, b_eng)    # B v1 (s=1)
    # a DIRECT write lands on B from another flow (bidirectional topology)
    b = b_eng.store
    direct = b.read_state(spark).limit(5).withColumn(
        "content", F.concat(F.col("content"), F.lit(" direct"))
    )
    env = direct.select(
        F.lit(0).cast("int").alias("partition"),
        F.monotonically_increasing_id().alias("lsn"),
        F.lit("u").alias("op"),
        F.lit(None).cast(
            "struct<repo:string,path:string,commit:string,lang:string,content:string>"
        ).alias("before"),
        F.struct("repo", "path", "commit", "lang", "content").alias("after"),
        F.lit(None).cast("timestamp").alias("ts_ms"),
        F.lit(None).cast("map<string,string>").alias("headers"),
        F.lit("repos").alias("source_topic"),
    )
    assert b_eng.apply_batch(env, 0, writer_id="direct")["status"] == "committed"
    apply_epoch(1)
    cascade_catchup(spark, a, b_eng)    # B v3 (s=2) — AFTER the foreign v2
    tr = translate_version(b, a.root, 2)
    # without the clamp this would be v3; the foreign v2 must not be skipped
    assert tr["replica_version"] == 1 and tr["foreign_versions"] == [2]
