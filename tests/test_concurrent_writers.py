"""Concurrent-writer safety by mechanism, not convention.

Before round 4 the store's single-writer-at-a-time rule was documentation:
two concurrent committers would both compute ``version = current + 1``,
overwrite each other's ``data/v{n}`` directory, and the last pointer swap
would silently win — the lost-update anti-pattern the reference avoids by
delegating commits to Kafka's coordinator. Now: an exclusive per-table
write lock serializes version-advancing ops, and `commit(expected_version=)`
raises ConcurrentWriteError when the table advanced under a writer's merge,
which `apply_batch` answers by recomputing the merge against fresh state.
"""
from __future__ import annotations

import threading
from datetime import datetime, timezone

import pytest
from pyspark.sql import Row

from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import (
    ConcurrentWriteError,
    TableStore,
)
from kp_data_replication_spark.streaming.apply import (
    CdcApplyEngine,
    EngineConfig,
)

FAST = EngineConfig(metrics=False)


def _img(repo, path, content):
    return Row(repo=repo, path=path, commit="c0", lang="py", content=content)


def _ev(partition, lsn, op, img):
    return Row(
        partition=partition, lsn=lsn, op=op,
        before=img if op == "d" else None,
        after=None if op == "d" else img,
        ts_ms=datetime(2026, 1, 1, tzinfo=timezone.utc),
        headers=None, source_topic="repos",
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


def _state(spark, store):
    return {
        (r["repo"], r["path"]): r["content"]
        for r in store.read_state(spark).collect()
    }


def test_commit_with_stale_expected_version_raises(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=1)
    eng = CdcApplyEngine(store, FAST)
    eng.apply_batch(_batch(spark, [_ev(0, 1, "c", _img("r", "a", "v1"))]), 0)
    assert store.current_version() == 1

    schema = store.schema()
    with pytest.raises(ConcurrentWriteError, match="advanced to v1"):
        store.commit(None, [], [], epoch=50, row_schema=schema,
                     writer_id="late", expected_version=0)
    # matching expectation commits fine
    v = store.commit(None, [], [], epoch=50, row_schema=schema,
                     writer_id="late", expected_version=1)
    assert v == 2


def test_apply_batch_retries_and_preserves_interleaved_writer(
    spark, tmp_path, monkeypatch
):
    """The lost-update scenario: writer A merges against v1; writer B
    commits a NEW key into the same bucket before A's commit. A stale
    commit would rewrite the bucket without B's row (n_buckets=1 forces
    the shared bucket). Mechanism: A's commit raises, apply_batch
    recomputes, final state holds BOTH writers' rows."""
    store = TableStore(str(tmp_path / "t"), n_buckets=1)
    eng_a = CdcApplyEngine(store, FAST)
    eng_b = CdcApplyEngine(store, FAST)
    eng_a.apply_batch(_batch(spark, [_ev(0, 1, "c", _img("r", "a", "v1"))]), 0)

    real_commit = store.commit
    fired = {"n": 0}

    def racing_commit(*a, **k):
        if k.get("writer_id") == "writer-a" and fired["n"] == 0:
            fired["n"] = 1
            # B lands a commit inside A's merge->commit window
            out = eng_b.apply_batch(
                _batch(spark, [_ev(1, 1, "c", _img("r", "b-key", "from-b"))]),
                100, writer_id="writer-b",
            )
            assert out["status"] == "committed"
        return real_commit(*a, **k)

    monkeypatch.setattr(store, "commit", racing_commit)
    out = eng_a.apply_batch(
        _batch(spark, [_ev(0, 2, "u", _img("r", "a", "v2-from-a"))]),
        1, writer_id="writer-a",
    )
    assert out["status"] == "committed"
    assert fired["n"] == 1
    got = _state(spark, store)
    assert got[("r", "a")] == "v2-from-a"      # A's update applied
    assert got[("r", "b-key")] == "from-b"     # B's row NOT clobbered
    # three committed versions: A's bootstrap, B's insert, A's retried merge
    assert store.current_version() == 3


def test_two_threads_apply_concurrently_both_land(spark, tmp_path):
    """End-to-end race: two engines in two threads target the same
    single-bucket table. The write lock serializes their commits and the
    loser's optimistic retry recomputes — both rows land, nothing lost."""
    store = TableStore(str(tmp_path / "t"), n_buckets=1)
    eng0 = CdcApplyEngine(store, FAST)
    eng0.apply_batch(_batch(spark, [_ev(0, 1, "c", _img("r", "seed", "s"))]), 0)

    errs: list[BaseException] = []

    def run(tag: str, partition: int):
        try:
            eng = CdcApplyEngine(store, FAST)
            out = eng.apply_batch(
                _batch(
                    spark,
                    [_ev(partition, 1, "c", _img("r", f"key-{tag}", f"val-{tag}"))],
                ),
                1, writer_id=f"writer-{tag}",
            )
            assert out["status"] == "committed"
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    ts = [
        threading.Thread(target=run, args=("x", 1)),
        threading.Thread(target=run, args=("y", 2)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    got = _state(spark, store)
    assert got[("r", "key-x")] == "val-x"
    assert got[("r", "key-y")] == "val-y"
    assert got[("r", "seed")] == "s"


def test_two_processes_apply_concurrently_both_land(spark, tmp_path):
    """The deployment reality the flock lock exists for: two REAL OS
    processes (each its own SparkSession, its own lock fd) hammer commits
    and a mid-run rewrite_buckets against ONE table. Every batch from
    both processes lands, the version history is linear (contiguous
    manifests, one writer per version advance), and fsck passes."""
    import os
    import subprocess
    import sys

    root = str(tmp_path / "t")
    # seed the table so both workers race against existing state
    store = TableStore(root, n_buckets=2)
    eng = CdcApplyEngine(store, FAST)
    eng.apply_batch(_batch(spark, [_ev(0, 1, "c", _img("r", "seed", "s"))]), 0)

    worker = os.path.join(os.path.dirname(__file__), "concurrent_worker.py")
    n_batches = 4
    procs = [
        subprocess.Popen(
            [sys.executable, worker, root, tag, str(p), str(n_batches)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for tag, p in (("x", 1), ("y", 2))
    ]
    for pr in procs:
        out, err = pr.communicate(timeout=420)
        assert pr.returncode == 0, (out, err[-2000:])
        assert "OK" in out

    got = _state(spark, store)
    for tag in ("x", "y"):
        for i in range(n_batches):
            assert got[("r", f"{tag}-{i}")] == f"{tag}-v{i}", (tag, i)
    assert got[("r", "seed")] == "s"

    # linear history: every version v in 1..head has exactly one manifest
    # and manifests chain monotonically (no gaps, no duplicates)
    head = store.current_version()
    mdir = os.path.join(root, "manifests")
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    )
    assert versions == list(range(1, head + 1))
    stamps = [store.manifest(v)["committed_at_ms"] for v in versions]
    assert stamps == sorted(stamps)  # commit stamps strictly ordered
    assert len(set(stamps)) == len(stamps)

    from kp_data_replication_spark.sources.fsck import fsck

    assert fsck(store, spark=spark, deep=True)["ok"]
