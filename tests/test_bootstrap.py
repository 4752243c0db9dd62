"""Snapshot-bootstrap handoff (Debezium ``snapshot.mode=initial`` / MM2
existing-records-first bring-up, docs/index.md:17-23).

The contract under test: seeding an EMPTY target from a consistent mid-log
snapshot and then replaying the FULL changelog produces byte-identical state
to one full replay — the pre-snapshot prefix is deduped by the lineage
watermarks the bootstrap installed (including partitions with no live
snapshot rows), so the tail costs O(tail). The algebraic twin is the
``cdc_snapshot_handoff`` oracle query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog
from kp_data_replication_spark.functions.envelope import unpack_envelope
from kp_data_replication_spark.operators.compact import last_write_wins
from kp_data_replication_spark.schema import DEFAULT_GROUP
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig

from tests.test_replay_end_to_end import assert_state_matches

SPEC = ChangelogSpec(n_keys=150, versions_per_key=4, n_partitions=4, files=4)
FAST = EngineConfig(metrics=False)


@pytest.fixture(scope="module")
def changelog_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bootstrap_log"))
    write_changelog(spark, d, SPEC)
    return d


@pytest.fixture(scope="module")
def snapshot_and_watermarks(spark, changelog_dir):
    """Consistent snapshot at per-partition mid-log watermarks: the LWW
    state of the prefix (raw after images — the ENGINE normalizes once on
    apply, exactly as the full-replay path does), plus the watermark map."""
    env = spark.read.parquet(changelog_dir)
    maxes = {
        r["partition"]: r["w"]
        for r in env.groupBy("partition").agg(F.max("lsn").alias("w")).collect()
    }
    wms = {int(p): int(w // 2) for p, w in maxes.items()}
    wm_map = F.create_map(
        *[F.lit(x) for p, w in sorted(wms.items()) for x in (p, w)]
    )
    prefix = env.filter(F.col("lsn") <= wm_map[F.col("partition")])
    winners = last_write_wins(
        unpack_envelope(prefix, normalize=False),
        key_cols=["repo", "path"],
        order_col="lsn",
    )
    snap = winners.filter(F.col("op") != "d").select(
        "partition", "repo", "path", "commit", "lang", "content"
    )
    return snap.toPandas(), wms


def test_bootstrap_then_tail_matches_full_replay(
    spark, changelog_dir, snapshot_and_watermarks, tmp_path
):
    snap_pd, wms = snapshot_and_watermarks
    store = TableStore(str(tmp_path / "target"), n_buckets=8)
    engine = CdcApplyEngine(store, FAST)
    out = engine.bootstrap_from_snapshot(
        spark.createDataFrame(snap_pd), wms
    )
    assert out["status"] == "committed"
    # every declared partition sits exactly at its snapshot watermark
    lineage = {
        r["partition"]: r["applied_lsn"]
        for r in store.read_lineage_rows()
        if (r.get("consumer_group") or DEFAULT_GROUP) == DEFAULT_GROUP
    }
    assert lineage == wms
    # point the tail at the FULL changelog: the prefix dedups, the tail
    # applies, and the end state is byte-identical to a full replay
    summary = engine.replay_batch(spark, changelog_dir)
    assert summary["status"] == "committed"
    assert_state_matches(spark, store, changelog_dir)


def test_bootstrap_refuses_nonempty_target(
    spark, changelog_dir, snapshot_and_watermarks, tmp_path
):
    snap_pd, wms = snapshot_and_watermarks
    store = TableStore(str(tmp_path / "target"), n_buckets=8)
    engine = CdcApplyEngine(store, FAST)
    engine.replay_batch(spark, changelog_dir)
    with pytest.raises(ValueError, match="EMPTY target"):
        engine.bootstrap_from_snapshot(spark.createDataFrame(snap_pd), wms)


def test_bootstrap_idempotent_resume_and_empty_partition_watermark(
    spark, snapshot_and_watermarks, tmp_path
):
    """Re-running the bootstrap (the crash-resume path: both commits fence)
    is a no-op, and a partition with NO live snapshot rows still gets its
    watermark installed — the handoff holds for fully-deleted partitions by
    mechanism, not luck."""
    snap_pd, wms = snapshot_and_watermarks
    wms = dict(wms)
    wms[99] = 5  # declared partition with no snapshot rows
    store = TableStore(str(tmp_path / "target"), n_buckets=8)
    engine = CdcApplyEngine(store, FAST)
    out1 = engine.bootstrap_from_snapshot(spark.createDataFrame(snap_pd), wms)
    v1 = store.current_version()
    lineage = {
        r["partition"]: r["applied_lsn"] for r in store.read_lineage_rows()
    }
    assert lineage[99] == 5
    assert out1["watermarks"][99] == 5
    out2 = engine.bootstrap_from_snapshot(spark.createDataFrame(snap_pd), wms)
    assert store.current_version() == v1  # both commits fenced
    assert out2["bootstrap_version"] == v1


def test_lww_bootstrap_requires_origin_stamps(
    spark, snapshot_and_watermarks, tmp_path
):
    snap_pd, wms = snapshot_and_watermarks
    store = TableStore(str(tmp_path / "target"), n_buckets=8)
    engine = CdcApplyEngine(
        store, EngineConfig(metrics=False, conflict_policy="lww")
    )
    with pytest.raises(ValueError, match="ts_ms"):
        engine.bootstrap_from_snapshot(spark.createDataFrame(snap_pd), wms)


def test_bootstrap_requires_watermarks(spark, snapshot_and_watermarks, tmp_path):
    snap_pd, _ = snapshot_and_watermarks
    store = TableStore(str(tmp_path / "target"), n_buckets=8)
    engine = CdcApplyEngine(store, FAST)
    with pytest.raises(ValueError, match="watermarks"):
        engine.bootstrap_from_snapshot(spark.createDataFrame(snap_pd), {})
