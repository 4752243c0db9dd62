"""TableStore.vacuum: expire old versions + remove crash orphans while the
live version stays readable (Iceberg expire_snapshots analogue).

Both crash windows are exercised with batches that contain genuinely fresh
events, so the orphan data directories really exist on disk:
  * crash BEFORE the manifest write  -> orphan data dir, no manifest
  * crash AFTER the manifest write, before the pointer swap -> orphan
    manifest + orphan data dir (treated as crash garbage by vacuum; a
    re-delivered epoch rewrites both from scratch)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def _crashing_replace(monkeypatch, needle: str):
    """Patch os.replace (as seen by table_store) to crash on paths
    containing ``needle``."""
    real_replace = os.replace

    def crashing(src, dst):
        if needle in dst:
            raise OSError(f"injected crash at {needle}")
        return real_replace(src, dst)

    monkeypatch.setattr(
        "kp_data_replication_spark.sources.table_store.os.replace", crashing
    )


def test_vacuum_keeps_live_state_and_removes_both_crash_orphans(
    spark, tmp_path, monkeypatch
):
    d = str(tmp_path / "cl")
    write_changelog(
        spark, d,
        ChangelogSpec(n_keys=80, versions_per_key=2, n_partitions=2, files=2, dup_every=0),
    )
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    half = len(files) // 2
    first = spark.read.parquet(*[f"{d}/{f}" for f in files[:half]])
    second = spark.read.option("mergeSchema", "true").parquet(
        *[f"{d}/{f}" for f in files[half:]]
    )
    engine.apply_batch(first, 0)
    assert store.current_version() == 1

    # ---- crash window 1: BEFORE the manifest write (fresh events aboard) --
    _crashing_replace(monkeypatch, "manifests/")
    with pytest.raises(OSError):
        engine.apply_batch(second, 1)
    monkeypatch.undo()
    orphan_v2 = os.path.join(store.root, "data", "v2")
    assert os.path.isdir(orphan_v2)  # data written, never pointed to
    assert store.current_version() == 1  # crash invisible to readers

    report = store.vacuum(keep_versions=1)
    assert report["removed_files"] > 0
    assert not os.path.exists(orphan_v2)

    # ---- crash window 2: AFTER the manifest write, before pointer swap ----
    _crashing_replace(monkeypatch, "_current")
    with pytest.raises(OSError):
        engine.apply_batch(second, 1)
    monkeypatch.undo()
    assert os.path.isdir(orphan_v2)
    assert os.path.exists(os.path.join(store.root, "manifests", "v2.json"))
    assert store.current_version() == 1

    rows_before = store.read_state(spark).count()
    report = store.vacuum(keep_versions=1)
    assert report["removed_files"] > 0
    assert report["removed_manifests"] >= 1  # the orphan v2 manifest
    assert not os.path.exists(orphan_v2)
    assert not os.path.exists(os.path.join(store.root, "manifests", "v2.json"))

    # live version unaffected
    assert store.current_version() == 1
    assert store.read_state(spark).count() == rows_before
    assert len(store.read_lineage_rows()) > 0

    # re-delivery of the crashed epoch commits cleanly after vacuum
    s = engine.apply_batch(second, 1)
    assert s["status"] == "committed"
    assert store.current_version() == 2

    # old expired version's files are GC'd on the next vacuum, live rows stay
    n_live = store.read_state(spark).count()
    store.vacuum(keep_versions=1)
    assert store.read_state(spark).count() == n_live


def test_vacuum_expires_old_versions(spark, tmp_path):
    d = str(tmp_path / "cl")
    write_changelog(
        spark, d,
        ChangelogSpec(n_keys=40, versions_per_key=2, n_partitions=2, files=2, dup_every=0),
    )
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    for i, f in enumerate(files):
        engine.apply_batch(
            spark.read.option("mergeSchema", "true").parquet(f"{d}/{f}"), i
        )
    assert store.current_version() == len(files)
    before = store.read_state(spark).agg(F.count(F.lit(1))).collect()[0][0]
    report = store.vacuum(keep_versions=1)
    assert report["removed_manifests"] == len(files) - 1
    assert store.read_state(spark).agg(F.count(F.lit(1))).collect()[0][0] == before


def test_consumer_registry_per_group_files_and_legacy_merge(tmp_path):
    """Registrations are one atomic file per group (no shared
    read-modify-write): two independent consumer processes registering
    concurrently can never drop each other's entry — the silent
    full-resync hazard vacuum's keep-floor exists to prevent. Legacy
    single-file registries merge in and migrate out on removal."""
    import json
    import os

    from kp_data_replication_spark.sources.table_store import TableStore

    root = str(tmp_path / "t")
    os.makedirs(root)
    s1 = TableStore(root)
    s2 = TableStore(root)  # an independent process's handle

    # interleaved read-modify-write pattern that used to lose an entry:
    # both handles read (empty), then write different groups
    s1.record_consumer("cascade:/dst1", 5)
    s2.record_consumer("dedup-index", 3)
    assert s1.consumers() == {"cascade:/dst1": 5, "dedup-index": 3}

    # monotone per group: a stale re-registration cannot regress the pin
    s1.record_consumer("cascade:/dst1", 2)
    assert s1.consumers()["cascade:/dst1"] == 5

    # legacy single-file registry (pre-round-4 store) merges in...
    with open(os.path.join(root, "_consumers"), "w") as f:
        json.dump({"old-flow": 4, "dedup-index": 1}, f)
    cons = s1.consumers()
    assert cons["old-flow"] == 4
    assert cons["dedup-index"] == 3  # per-file entry wins (it is newer)

    # ...and removal covers both layouts
    s1.remove_consumer("old-flow")
    s1.remove_consumer("dedup-index")
    assert s1.consumers() == {"cascade:/dst1": 5}


def test_vacuum_age_window_keeps_asof_reads_answerable(spark, tmp_path):
    """older_than_ms retention (Iceberg expire_snapshots(older_than=...)):
    versions younger than the window survive even past the count floor, so
    AS-OF-TIMESTAMP reads stay answerable across the whole window; ancient
    history expires."""
    d = str(tmp_path / "cl")
    write_changelog(
        spark, d,
        ChangelogSpec(n_keys=40, versions_per_key=2, n_partitions=2, files=4, dup_every=0),
    )
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    for i, f in enumerate(files):
        engine.apply_batch(
            spark.read.option("mergeSchema", "true").parquet(f"{d}/{f}"), i
        )
    n = store.current_version()
    assert n >= 4
    stamps = {v: store.manifest(v)["committed_at_ms"] for v in range(1, n + 1)}
    rows_v3 = store.read_state(spark, version=3).count()

    rows_v2 = store.read_state(spark, version=2).count()

    # window cutoff strictly BETWEEN v2's and v3's stamps: v3..vn are
    # "recent"; v2 is the boundary snapshot (newest version OLDER than the
    # cutoff) and must ALSO survive — a timestamp inside the window but
    # before v3's stamp is governed by v2 (Delta/Iceberg boundary
    # semantics); only v1 is truly unreachable from any in-window read
    now = stamps[n]
    cutoff_ts = stamps[3] - 1
    assert cutoff_ts > stamps[2]  # stamps are strictly monotone
    report = store.vacuum(
        keep_versions=1, older_than_ms=now - cutoff_ts, now_ms=now
    )
    assert report["removed_manifests"] == 1
    remaining = sorted(
        int(f[1:-5]) for f in os.listdir(os.path.join(store.root, "manifests"))
        if f.startswith("v")
    )
    assert remaining == list(range(2, n + 1))

    # AS-OF at any stamp inside the window still resolves and reads —
    # including the window START, which resolves to the boundary snapshot
    assert store.version_as_of(stamps[3]) == 3
    assert store.read_state(spark, timestamp_ms=stamps[3]).count() == rows_v3
    assert store.version_as_of(cutoff_ts) == 2
    assert store.read_state(spark, timestamp_ms=cutoff_ts).count() == rows_v2
    # ...while a timestamp before the whole retained history is an error
    with pytest.raises(Exception):
        store.version_as_of(stamps[1] - 1)

    # without the age window the count floor alone would have kept only vn
    report2 = store.vacuum(keep_versions=1)
    assert report2["removed_manifests"] == n - 2
