"""TableStore.vacuum: expire old versions + remove crash orphans while the
live version stays readable (Iceberg expire_snapshots analogue)."""

from __future__ import annotations

import os

import pytest

from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def test_vacuum_keeps_live_state_and_removes_garbage(spark, tmp_path, monkeypatch):
    d = str(tmp_path / "cl")
    write_changelog(
        spark, d,
        ChangelogSpec(n_keys=80, versions_per_key=2, n_partitions=2, files=2, dup_every=0),
    )
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    half = len(files) // 2
    engine.apply_batch(spark.read.parquet(*[f"{d}/{f}" for f in files[:half]]), 0)
    engine.apply_batch(
        spark.read.option("mergeSchema", "true").parquet(*[f"{d}/{f}" for f in files[half:]]), 1
    )

    # crash-orphan: epoch 2 writes data + manifest but dies before the swap
    import os as _os
    real_replace = _os.replace

    def crashing(src, dst):
        if dst.endswith("_current"):
            raise OSError("injected")
        return real_replace(src, dst)

    monkeypatch.setattr(
        "kp_data_replication_spark.sources.table_store.os.replace", crashing
    )
    with pytest.raises(OSError):
        engine.apply_batch(
            spark.read.option("mergeSchema", "true").parquet(d).limit(0).unionByName(
                spark.read.option("mergeSchema", "true").parquet(d)
            ),
            2,
        )
    monkeypatch.undo()

    rows_before = store.read_state(spark).count()
    assert store.current_version() == 2  # crash invisible

    report = store.vacuum(keep_versions=1)
    assert report["removed_files"] > 0
    assert report["removed_manifests"] >= 1  # v1 expired

    # live version unaffected
    assert store.current_version() == 2
    assert store.read_state(spark).count() == rows_before
    assert len(store.read_lineage_rows()) > 0

    # orphan epoch-2 data gone
    assert not os.path.exists(os.path.join(store.root, "data", "e2"))

    # engine continues committing after vacuum
    s = engine.apply_batch(spark.read.option("mergeSchema", "true").parquet(d), 2)
    assert s["status"] == "committed"
    assert store.read_state(spark).count() == rows_before
