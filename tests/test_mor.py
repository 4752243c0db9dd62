"""Merge-on-read delta layers (EngineConfig.table_mode="mor").

The copy-on-write commit path rewrites every dirty bucket whole — write
amplification bucket_size/batch_size per epoch. MoR (Iceberg v2
equality-delete / Delta deletion-vector analogue) appends the batch's
compacted rows as a per-bucket DELTA layer instead: O(batch) write, no base
read, no merge join; reads resolve last-layer-wins per key until compaction
folds the layers back into plain base files.

Invariants exercised here:
  * state equality vs the copy-on-write engine after EVERY epoch (inserts,
    updates, deletes, duplicate redelivery, additive schema evolution);
  * the write-amplification win is real (per-epoch bytes written);
  * folding (rewrite_buckets / auto-fold) is a logical no-op — state equal,
    changefeed across the fold empty, manifest mor map cleared;
  * time travel and point lookup resolve layers correctly;
  * delete -> re-insert across epochs resolves to the re-insert;
  * lww + mor refuse to compose.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog
from kp_data_replication_spark.operators.changefeed import table_changes
from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import (
    CdcApplyEngine,
    EngineConfig,
    final_state,
)

SPEC = ChangelogSpec(n_keys=150, versions_per_key=3, n_partitions=4, files=3)


def _batch_files(changelog_dir: str) -> list[str]:
    return sorted(
        os.path.join(changelog_dir, f)
        for f in os.listdir(changelog_dir)
        if f.startswith("batch-") and f.endswith(".parquet")
    )


def _state_rows(spark, store: TableStore, version: int | None = None):
    df = store.read_state(spark, version=version)
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.fixture(scope="module")
def changelog_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mor_changelog"))
    write_changelog(spark, d, SPEC)
    return d


@pytest.fixture(scope="module")
def twin_runs(spark, changelog_dir, tmp_path_factory):
    """Apply the same changelog per-file-batch through BOTH modes."""
    cow = TableStore(str(tmp_path_factory.mktemp("cow")), n_buckets=8)
    mor = TableStore(str(tmp_path_factory.mktemp("mor")), n_buckets=8)
    eng_cow = CdcApplyEngine(cow, EngineConfig(metrics=False))
    eng_mor = CdcApplyEngine(
        mor, EngineConfig(metrics=False, table_mode="mor", mor_fold_max_layers=0)
    )
    per_epoch: list[tuple] = []
    for epoch, f in enumerate(_batch_files(changelog_dir), start=1):
        batch = spark.read.option("mergeSchema", "true").parquet(f)
        s_cow = eng_cow.apply_batch(batch, epoch)
        s_mor = eng_mor.apply_batch(batch, epoch)
        per_epoch.append((epoch, s_cow, s_mor))
    return cow, mor, per_epoch


def test_mor_state_matches_cow_after_every_epoch(spark, twin_runs):
    cow, mor, per_epoch = twin_runs
    # compare AS OF each committed version (same commit cadence both sides)
    for epoch, s_cow, s_mor in per_epoch:
        assert s_cow["status"] == s_mor["status"] == "committed"
        assert _state_rows(spark, cow, version=s_cow["version"]) == _state_rows(
            spark, mor, version=s_mor["version"]
        ), f"state diverged at epoch {epoch}"
    # schema evolution (after.stars) flowed through the delta path
    assert "stars" in mor.schema().names


def test_mor_deltas_skip_base_rewrite(spark, twin_runs):
    """Past the first epoch, a MoR commit writes only the batch — the CoW
    twin rewrites every dirty bucket. Bytes under data/v{n} prove it."""
    cow, mor, per_epoch = twin_runs

    def _epoch_bytes(store, version):
        d = os.path.join(store.root, f"data/v{version}")
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    # epoch 1 is a base write in both modes; later epochs diverge
    later = per_epoch[1:]
    cow_bytes = sum(_epoch_bytes(cow, s["version"]) for _, s, _ in later)
    mor_bytes = sum(_epoch_bytes(mor, s["version"]) for _, _, s in later)
    assert mor_bytes < cow_bytes * 0.8, (cow_bytes, mor_bytes)
    # and the manifest records the layers
    assert (mor.current_manifest().get("mor") or {}), "no delta layers recorded"
    for _, _, s in later:
        # the duplicate-tail file batch dedups to nothing — no commit, no
        # delta; every batch that actually changed keys went the delta path
        if s["dirty_buckets"]:
            assert s["mor_delta"] is True


def test_mor_fold_is_a_logical_noop(spark, twin_runs):
    cow, mor, _ = twin_runs
    before = _state_rows(spark, mor)
    v_pre = mor.current_version()
    out = mor.rewrite_buckets(spark, min_files=0)
    assert out["rewritten_buckets"], "fold selected no buckets"
    assert not (mor.current_manifest().get("mor") or {}), "layers survived fold"
    assert _state_rows(spark, mor) == before
    # changefeed across the fold boundary is empty (rows compare equal)
    feed = table_changes(spark, mor, v_pre)
    assert feed.count() == 0
    # reads after the fold are plain scans again: no Window in the plan
    plan = mor.read_state(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_mor_auto_fold_bounds_layers(spark, changelog_dir, tmp_path_factory):
    store = TableStore(str(tmp_path_factory.mktemp("mor_auto")), n_buckets=4)
    engine = CdcApplyEngine(
        store, EngineConfig(metrics=False, table_mode="mor", mor_fold_max_layers=2)
    )
    folded = []
    for epoch, f in enumerate(_batch_files(changelog_dir), start=1):
        s = engine.apply_batch(spark.read.option("mergeSchema", "true").parquet(f), epoch)
        folded.extend(s.get("mor_folded", []))
    assert folded, "auto-fold never fired"
    mor_map = store.current_manifest().get("mor") or {}
    assert all(n < 2 for n in mor_map.values()), mor_map


def test_mor_time_travel_and_lookup(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(
        store, EngineConfig(metrics=False, table_mode="mor", mor_fold_max_layers=0)
    )

    def img(path, content):
        return Row(repo="r", path=path, commit="c", lang="py", content=content)

    def ev(lsn, op, image):
        return Row(partition=0, lsn=lsn, op=op,
                   before=image if op == "d" else None,
                   after=None if op == "d" else image,
                   ts_ms=None, headers=None, source_topic="repos")

    engine.apply_batch(spark.createDataFrame(
        [ev(1, "c", img("a.py", "v1")), ev(2, "c", img("b.py", "v1"))],
        CHANGELOG_SCHEMA), 1)
    v1 = store.current_version()
    engine.apply_batch(spark.createDataFrame(
        [ev(3, "u", img("a.py", "v2")), ev(4, "d", img("b.py", None))],
        CHANGELOG_SCHEMA), 2)
    engine.apply_batch(spark.createDataFrame(
        [ev(5, "c", img("b.py", "reborn"))], CHANGELOG_SCHEMA), 3)

    # current state: a.py=v2 (delta layer wins over base), b.py reborn
    # (re-insert after tombstone — newest layer wins over BOTH)
    cur = {r["path"]: r["content"] for r in final_state(spark, store).collect()}
    assert cur == {"a.py": "v2", "b.py": "reborn"}
    # time travel under layers: AS OF v1 is the pre-update state
    old = {r["path"]: r["content"]
           for r in store.read_state(spark, version=v1).collect()}
    assert old == {"a.py": "v1", "b.py": "v1"}
    # AS OF the delete epoch: b.py gone
    v2 = v1 + 1
    mid = {r["path"]: r["content"]
           for r in store.read_state(spark, version=v2).collect()}
    assert mid == {"a.py": "v2"}
    # point lookup resolves layers (and the key prefilter under the window
    # is exact): one live key, one re-inserted key, one absent key
    got = {
        r["path"]: r["content"]
        for r in store.lookup(
            spark, [("r", "a.py"), ("r", "b.py"), ("r", "nope.py")]
        ).collect()
    }
    assert got == {"a.py": "v2", "b.py": "reborn"}
    # lookup AS OF the delete version hides the tombstoned key
    got_mid = {
        r["path"]: r["content"]
        for r in store.lookup(spark, [("r", "b.py")], version=v2).collect()
    }
    assert got_mid == {}


def test_mor_rejects_lww(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=2)
    engine = CdcApplyEngine(
        store,
        EngineConfig(metrics=False, table_mode="mor", conflict_policy="lww",
                     cluster_id="a"),
    )
    batch = spark.createDataFrame(
        [Row(partition=0, lsn=1, op="c",
             before=None,
             after=Row(repo="r", path="p", commit="c", lang="py", content="x"),
             ts_ms=None, headers=None, source_topic="repos")],
        CHANGELOG_SCHEMA,
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        engine.apply_batch(batch, 1)


def test_mor_cascade_replicates_layered_source(spark, tmp_path):
    """A downstream CoW replica fed by cascade_catchup from a LAYERED MoR
    source converges — the exact-diff changefeed resolves layers per
    version like any other read."""
    from kp_data_replication_spark.operators.changefeed import cascade_catchup

    src = TableStore(str(tmp_path / "src"), n_buckets=4)
    dst = TableStore(str(tmp_path / "dst"), n_buckets=4)
    eng_src = CdcApplyEngine(
        src, EngineConfig(metrics=False, table_mode="mor", mor_fold_max_layers=0)
    )
    eng_dst = CdcApplyEngine(dst, EngineConfig(metrics=False))

    def img(path, content):
        return Row(repo="r", path=path, commit="c", lang="py", content=content)

    def ev(lsn, op, image):
        return Row(partition=0, lsn=lsn, op=op,
                   before=image if op == "d" else None,
                   after=None if op == "d" else image,
                   ts_ms=None, headers=None, source_topic="repos")

    eng_src.apply_batch(spark.createDataFrame(
        [ev(1, "c", img("a.py", "v1")), ev(2, "c", img("b.py", "v1"))],
        CHANGELOG_SCHEMA), 1)
    eng_src.apply_batch(spark.createDataFrame(
        [ev(3, "u", img("a.py", "v2")), ev(4, "d", img("b.py", None))],
        CHANGELOG_SCHEMA), 2)
    assert src.current_manifest().get("mor"), "source is not layered"
    cascade_catchup(spark, src, eng_dst)
    assert _state_rows(spark, dst) == _state_rows(spark, src)
