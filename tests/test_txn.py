"""read_committed transactional apply (operators/txn.py — the Kafka
isolation.level surface with LSO semantics): commit/abort markers, the
per-partition delivery prefix that preserves order across a late commit,
cross-epoch staging with watermark fencing, and crash-replay idempotence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from kp_data_replication_spark.operators.txn import TxnGate
from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def _img(path, content):
    return Row(repo="org/r", path=path, commit="c0", lang="py", content=content)


def _ev(partition, lsn, op, image, txn=None, marker=None):
    headers = {}
    if txn is not None:
        headers["_txn_id"] = txn
    if marker is not None:
        headers["_txn_marker"] = marker
    return Row(partition=partition, lsn=lsn, op=op,
               before=image if op == "d" else None,
               after=None if op == "d" else image,
               ts_ms=None, headers=headers or None, source_topic="repos")


def _marker(partition, lsn, txn, marker):
    return _ev(partition, lsn, "c", None, txn=txn, marker=marker)


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


def _mk(tmp_path, **cfg):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(
        store,
        EngineConfig(metrics=False, txn_isolation="read_committed", **cfg),
    )
    return store, engine


def _paths(spark, store):
    return {r["path"]: r["content"] for r in store.read_state(spark).collect()}


def _marks(store):
    return {r["partition"]: r["applied_lsn"] for r in store.read_lineage_rows()}


# --------------------------------------------------------------------- #
def test_same_batch_commit_abort_and_passthrough(spark, tmp_path):
    store, eng = _mk(tmp_path)
    s = eng.apply_batch(_batch(spark, [
        _ev(0, 0, "c", _img("plain.py", "P")),                    # non-txn
        _ev(0, 1, "c", _img("t1a.py", "A"), txn="T1"),
        _ev(0, 2, "c", _img("t1b.py", "B"), txn="T1"),
        _marker(0, 3, "T1", "commit"),
        _ev(1, 0, "c", _img("t2.py", "X"), txn="T2"),
        _marker(1, 1, "T2", "abort"),
    ]), 0)
    assert s["status"] == "committed"
    assert s["txn"]["n_aborted_resolved"] == 1
    assert _paths(spark, store) == {"plain.py": "P", "t1a.py": "A",
                                    "t1b.py": "B"}
    # markers + events all watermarked; resolved ids GC'd from state
    assert _marks(store) == {0: 3, 1: 1}
    gate = TxnGate(store.root, "cdc-engine")
    assert gate.state() == {"committed": {}, "aborted": {}, "open": {}}


def test_lso_blocks_suffix_until_commit_preserving_order(spark, tmp_path):
    """The ordering case the naive per-transaction release gets wrong: a
    NEWER direct write behind an open transaction must not merge before
    the transaction's OLDER write — read_committed holds the whole suffix
    at the LSO, then delivers the prefix in lsn order."""
    store, eng = _mk(tmp_path)
    s0 = eng.apply_batch(_batch(spark, [
        _ev(0, 0, "c", _img("k.py", "v1-from-txn"), txn="T1"),
        _ev(0, 1, "u", _img("k.py", "v2-direct")),        # newer, blocked
        _ev(1, 0, "c", _img("free.py", "F")),             # other partition
    ]), 0)
    # partition 1 unaffected; partition 0 fully withheld behind LSO=0
    assert _paths(spark, store) == {"free.py": "F"}
    assert s0["txn"]["n_withheld"] == 2
    assert s0["txn"]["lso"] == {0: 0}
    # watermark advanced past WITHHELD lsns too: a redelivery can't re-stage
    assert _marks(store) == {0: 1, 1: 0}

    s1 = eng.apply_batch(_batch(spark, [_marker(0, 2, "T1", "commit")]), 1)
    # both released in lsn order inside ONE compacted batch -> v2 wins
    assert _paths(spark, store)["k.py"] == "v2-direct"
    assert s1["txn"]["n_withheld"] == 0
    # pool GC'd down to the drain marker; state empty
    gate = TxnGate(store.root, "cdc-engine")
    assert gate.state() == {"committed": {}, "aborted": {}, "open": {}}


def test_abort_releases_blocked_suffix_and_drops_txn_rows(spark, tmp_path):
    store, eng = _mk(tmp_path)
    eng.apply_batch(_batch(spark, [
        _ev(0, 0, "c", _img("x.py", "from-aborted-txn"), txn="T1"),
        _ev(0, 1, "c", _img("y.py", "Y")),                # blocked behind T1
    ]), 0)
    assert _paths(spark, store) == {}
    eng.apply_batch(_batch(spark, [_marker(0, 2, "T1", "abort")]), 1)
    # the aborted transaction's write never lands; the suffix does
    assert _paths(spark, store) == {"y.py": "Y"}


def test_source_redelivery_is_fenced_by_watermark(spark, tmp_path):
    store, eng = _mk(tmp_path)
    rows = [
        _ev(0, 0, "c", _img("k.py", "txn-write"), txn="T1"),
        _ev(0, 1, "c", _img("other.py", "O")),
    ]
    eng.apply_batch(_batch(spark, rows), 0)
    gate = TxnGate(store.root, "cdc-engine")
    snaps_before = gate._snap_versions()
    # the SAME lsns redelivered in a later epoch: dropped by the lineage
    # watermark before the gate — no double-staging, no state change
    s = eng.apply_batch(_batch(spark, rows), 1)
    assert s["keys_changed"] == 0
    assert gate._snap_versions() == snaps_before
    eng.apply_batch(_batch(spark, [_marker(0, 2, "T1", "commit")]), 2)
    assert _paths(spark, store) == {"k.py": "txn-write", "other.py": "O"}


def test_crashed_attempt_replay_is_deterministic(spark, tmp_path):
    """Simulate a crash AFTER the gate staged the pool but BEFORE the
    table commit: the replayed epoch reads the pre-attempt snapshot and
    rewrites the same one; the final state is a single clean apply."""
    store, eng = _mk(tmp_path)
    rows = [
        _ev(0, 0, "c", _img("k.py", "in-txn"), txn="T1"),
        _ev(0, 1, "c", _img("z.py", "Z")),
    ]
    gate = TxnGate(store.root, "cdc-engine")
    # crashed attempt: gate ran (staged + state written), commit never did
    out, marks, counters, cleanup = gate.gate(
        spark, _batch(spark, rows), 0, store.current_version()
    )
    out.collect()  # materialize like the engine would
    assert counters["n_withheld"] == 2
    # replay of the SAME epoch through the engine
    eng.apply_batch(_batch(spark, rows), 0)
    eng.apply_batch(_batch(spark, [_marker(0, 2, "T1", "commit")]), 1)
    assert _paths(spark, store) == {"k.py": "in-txn", "z.py": "Z"}


def test_open_txn_blocks_only_its_partition(spark, tmp_path):
    store, eng = _mk(tmp_path)
    for e in range(3):
        eng.apply_batch(_batch(spark, [
            _ev(1, e, "c", _img(f"p1-{e}.py", str(e))),
        ] + ([_ev(0, 0, "c", _img("held.py", "H"), txn="TLONG")]
             if e == 0 else [])), e)
    # three epochs of partition-1 traffic flowed while T-LONG stays open
    got = _paths(spark, store)
    assert {f"p1-{e}.py" for e in range(3)} <= set(got)
    assert "held.py" not in got


def test_read_uncommitted_default_ignores_txn_headers(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    eng = CdcApplyEngine(store, EngineConfig(metrics=False))
    eng.apply_batch(_batch(spark, [
        _ev(0, 0, "c", _img("a.py", "A"), txn="T1"),   # no marker ever
    ]), 0)
    # Kafka read_uncommitted: data records deliver immediately
    assert _paths(spark, store) == {"a.py": "A"}
    assert not os.path.isdir(os.path.join(store.root, "_txn"))


def test_bad_marker_values_fail_loudly(spark, tmp_path):
    store, eng = _mk(tmp_path)
    with pytest.raises(ValueError, match="unknown"):
        eng.apply_batch(
            _batch(spark, [_marker(0, 0, "T1", "prepare")]), 0
        )
    with pytest.raises(ValueError, match="without"):
        eng.apply_batch(
            _batch(spark, [_marker(0, 0, None, "commit")]), 0
        )


# --------------------------------------------------------------------- #
# streaming kill/resume: the withheld pool outlives the stream
# --------------------------------------------------------------------- #
def _write_file(spark, rows, out_dir, name):
    import shutil

    df = _batch(spark, rows)
    tmp = os.path.join(out_dir, "_tmp_" + name)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(f for f in os.listdir(tmp)
               if f.endswith(".parquet") and not f.startswith("_"))
    os.replace(os.path.join(tmp, src), os.path.join(out_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_kill_resume_carries_open_transactions(spark, tmp_path):
    """Kill the stream at an arbitrary point while a transaction is open;
    the resumed stream (same checkpoint, fresh engine object) must land
    the same final state: the pool snapshot is keyed by TABLE version, so
    in-flight transactions survive the restart."""
    import time

    log = str(tmp_path / "log")
    os.makedirs(log)
    _write_file(spark, [
        _ev(0, 0, "c", _img("k.py", "txn-v1"), txn="T1"),
        _ev(0, 1, "u", _img("k.py", "direct-v2")),       # blocked, newer
        _ev(1, 0, "c", _img("free.py", "F")),
    ], log, "b0.parquet")
    _write_file(spark, [
        _ev(0, 2, "c", _img("other.py", "O")),           # blocked suffix
        _ev(1, 1, "c", _img("more.py", "M")),
    ], log, "b1.parquet")
    _write_file(spark, [_marker(0, 3, "T1", "commit")], log, "b2.parquet")

    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    cfg = EngineConfig(metrics=False, txn_isolation="read_committed")
    cp = str(tmp_path / "cp")

    q = CdcApplyEngine(store, cfg).start_stream(
        spark, log, cp, CHANGELOG_SCHEMA, max_files_per_trigger=1
    )
    time.sleep(10)
    q.stop()
    q.awaitTermination()
    # fresh engine object, same checkpoint + table: resume
    q2 = CdcApplyEngine(store, cfg).start_stream(
        spark, log, cp, CHANGELOG_SCHEMA, max_files_per_trigger=1
    )
    q2.awaitTermination()

    got = _paths(spark, store)
    assert got == {
        "k.py": "direct-v2",   # late commit did not reorder the merge
        "free.py": "F",
        "more.py": "M",
        "other.py": "O",
    }
    gate = TxnGate(store.root, "cdc-engine")
    assert gate.state() == {"committed": {}, "aborted": {}, "open": {}}


def test_txn_cli_status(spark, tmp_path):
    import json as _json
    import subprocess
    import sys

    store, eng = _mk(tmp_path)
    eng.apply_batch(_batch(spark, [
        _ev(0, 0, "c", _img("held.py", "H"), txn="TOPEN"),
    ]), 0)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "kp_data_replication_spark.cli",
         "txn", store.root],
        capture_output=True, text=True, cwd=repo, check=True, timeout=120,
    ).stdout.strip()
    st = _json.loads(out)["cdc-engine"]
    assert st["open_txns"] == ["TOPEN"]
    assert st["pool_snapshots"] == [0]
    # empty-store target reports an empty map, not an error
    empty = subprocess.run(
        [sys.executable, "-m", "kp_data_replication_spark.cli",
         "txn", str(tmp_path / "nope")],
        capture_output=True, text=True, cwd=repo, check=True, timeout=120,
    ).stdout.strip()
    assert _json.loads(empty) == {}


# --------------------------------------------------------------------- #
def test_txn_timeout_aborts_hung_transaction_on_idle_epochs(spark, tmp_path):
    """transaction.max.timeout.ms by mechanism: a transaction that never
    resolves is aborted by the gate itself after txn_timeout_epochs, even
    on an IDLE epoch (no new traffic) — exactly the stall scenario. The
    blocked suffix releases; the hung transaction's rows never land."""
    store, eng = _mk(tmp_path, txn_timeout_epochs=2)
    s0 = eng.apply_batch(_batch(spark, [
        _ev(0, 0, "c", _img("hung.py", "H"), txn="T1"),
        _ev(0, 1, "c", _img("after.py", "A")),        # blocked behind T1
    ]), 0)
    assert s0["txn"]["n_withheld"] == 2 and _paths(spark, store) == {}
    # first-seen clock persisted: survives a new engine object (restart)
    assert TxnGate(store.root, "cdc-engine").state()["open"] == {"T1": 0}

    # epoch 1: still inside the timeout window — pool carries forward
    eng2 = CdcApplyEngine(
        store, EngineConfig(metrics=False, txn_isolation="read_committed",
                            txn_timeout_epochs=2))
    eng2.apply_batch(_batch(spark, []), 1)
    assert _paths(spark, store) == {}

    # epoch 2: epoch - first_seen >= 2 -> coordinator abort fires with NO
    # input at all; the withheld suffix is delivered in lsn order
    s2 = eng2.apply_batch(_batch(spark, []), 2)
    assert s2["txn"]["n_timeout_aborted"] == 1
    assert _paths(spark, store) == {"after.py": "A"}
    # resolved id and its clock GC'd
    assert TxnGate(store.root, "cdc-engine").state() == {
        "committed": {}, "aborted": {}, "open": {}}


def test_txn_timeout_fences_late_commit_from_zombie_producer(spark, tmp_path):
    """A commit marker racing the coordinator's timeout abort loses: the
    producer is a zombie and its commit is ignored, not honored."""
    store, eng = _mk(tmp_path, txn_timeout_epochs=2)
    eng.apply_batch(_batch(spark, [
        _ev(0, 0, "c", _img("z.py", "ZOMBIE"), txn="TZ"),
    ]), 0)
    assert _paths(spark, store) == {}
    eng.apply_batch(_batch(spark, []), 1)             # still in the window
    # epoch 2: timeout (2 epochs elapsed) AND the zombie's commit marker
    # arrive together — abort is decided first, the commit is fenced
    s2 = eng.apply_batch(_batch(spark, [_marker(0, 1, "TZ", "commit")]), 2)
    assert s2["txn"]["n_timeout_aborted"] == 1
    assert s2["txn"]["n_fenced_commits"] == 1
    assert _paths(spark, store) == {}
    # a retry attempt under the same id is a NEW transaction: it stages,
    # and an IN-TIME commit (one epoch later, inside the 2-epoch window)
    # releases it normally — no permanent blacklist
    eng.apply_batch(_batch(spark, [
        _ev(0, 2, "c", _img("z.py", "RETRY"), txn="TZ"),
    ]), 3)
    assert _paths(spark, store) == {}
    eng.apply_batch(_batch(spark, [_marker(0, 3, "TZ", "commit")]), 4)
    assert _paths(spark, store) == {"z.py": "RETRY"}


def test_txn_no_timeout_by_default_and_crash_replay_idempotent(spark, tmp_path):
    """Default txn_timeout_epochs=None keeps the wait-forever contract;
    with a timeout, replaying the aborting epoch (crash before commit)
    re-times-out into the same state — idempotent set union."""
    store, eng = _mk(tmp_path)                       # no timeout
    eng.apply_batch(_batch(spark, [
        _ev(0, 0, "c", _img("w.py", "W"), txn="T1"),
    ]), 0)
    for e in (1, 2, 3):
        eng.apply_batch(_batch(spark, []), e)
    assert _paths(spark, store) == {}                 # still waiting

    # same pool, now with a timeout: gate replay determinism
    gate = TxnGate(store.root, "cdc-engine")
    v = store.current_version()
    d1, m1, c1, _ = gate.gate(spark, _batch(spark, []), 4, v, timeout_epochs=1)
    assert c1.get("n_timeout_aborted") == 1
    st_after_first = gate.state()
    # crash before the table commit (cleanup never ran): the replay finds
    # the id already aborted with its rows still pooled, re-releases the
    # same delivery, and leaves state byte-identical
    d2, m2, c2, _ = gate.gate(spark, _batch(spark, []), 4, v, timeout_epochs=1)
    assert gate.state() == st_after_first
    assert c2.get("n_aborted_resolved") == 1
    assert d2.count() == d1.count()
