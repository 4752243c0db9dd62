"""LWW conflict stamps for bidirectional same-key writes (the round-2
documented limitation): concurrent conflicting writes to the SAME key on
two active/active replicas converge to one winner on BOTH sides instead of
flip-flopping per cascade round (reference active/active topology,
docs/consideration.md:29-35; the normal topology keeps each side
authoritative for its own keys — LWW is the extension for when it doesn't).

Total order: (_lww_ts, _lww_src) — origin event time, then origin cluster
id. Both replicas compare the same two stamps, pick the same winner, and
the losing application leaves the state byte-identical, so the next
cascade's state diff is empty and the topology drains."""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

from pyspark.sql import Row

from kp_data_replication_spark.operators.changefeed import cascade_catchup
from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import (
    CdcApplyEngine,
    EngineConfig,
    final_state,
)


def _img(repo, path, content):
    return Row(repo=repo, path=path, commit="c0", lang="py", content=content)


def _ev(partition, lsn, op, after, ts):
    return Row(partition=partition, lsn=lsn, op=op,
               before=None if op != "d" else after,
               after=after if op != "d" else None,
               ts_ms=ts, headers=None, source_topic="repos")


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S").replace(tzinfo=timezone.utc)


def _sha_state(spark, store):
    return sorted(
        hashlib.sha256(f"{r['repo']}|{r['path']}|{r['content']}".encode()).hexdigest()
        for r in store.read_state(spark).collect()
    )


def _mk(tmp_path, name, cluster_id):
    store = TableStore(str(tmp_path / name), n_buckets=4)
    engine = CdcApplyEngine(
        store,
        EngineConfig(metrics=False, conflict_policy="lww", cluster_id=cluster_id),
    )
    return store, engine


def _drain(spark, a, eng_a, b, eng_b, rounds=6):
    history = []
    for _ in range(rounds):
        r1 = cascade_catchup(spark, a, eng_b, n_partitions=2)
        r2 = cascade_catchup(spark, b, eng_a, n_partitions=2)
        history.append((r1["applied_versions"], r2["applied_versions"]))
        if not r1["applied_versions"] and not r2["applied_versions"]:
            break
    return history


def test_bidirectional_concurrent_same_key_converges(spark, tmp_path):
    a, eng_a = _mk(tmp_path, "a", "a")
    b, eng_b = _mk(tmp_path, "b", "b")

    # CONCURRENT conflicting writes to the same key, plus a local-only key
    # each; A's write is EARLIER than B's -> B's image must win everywhere
    eng_a.apply_batch(spark.createDataFrame([
        _ev(0, 0, "c", _img("org/shared", "k.py", "K-from-A"), _ts("2026-01-01 00:00:00")),
        _ev(1, 0, "c", _img("org/a", "a.py", "A-local"), _ts("2026-01-01 00:00:01")),
    ], CHANGELOG_SCHEMA), 0)
    eng_b.apply_batch(spark.createDataFrame([
        _ev(0, 0, "c", _img("org/shared", "k.py", "K-from-B"), _ts("2026-01-01 00:00:05")),
        _ev(1, 0, "c", _img("org/b", "b.py", "B-local"), _ts("2026-01-01 00:00:02")),
    ], CHANGELOG_SCHEMA), 0)

    history = _drain(spark, a, eng_a, b, eng_b)
    # the topology DRAINED (the final round applied nothing) — without LWW
    # stamps the conflicting key flip-flops and rounds never go empty
    assert history[-1] == ([], [])

    assert _sha_state(spark, a) == _sha_state(spark, b)
    for store in (a, b):
        state = {r["path"]: r["content"] for r in store.read_state(spark).collect()}
        assert state == {
            "k.py": "K-from-B",   # later origin timestamp wins on BOTH sides
            "a.py": "A-local",
            "b.py": "B-local",
        }
        # the winner kept its ORIGIN stamp through the cascade
        stamps = {
            r["path"]: (r["_lww_ts"], r["_lww_src"])
            for r in store.read_state(spark).collect()
        }
        assert stamps["k.py"] == (
            int(_ts("2026-01-01 00:00:05").timestamp() * 1000), "b",
        )


def test_equal_timestamp_tie_breaks_by_cluster_id(spark, tmp_path):
    a, eng_a = _mk(tmp_path, "a", "a")
    b, eng_b = _mk(tmp_path, "b", "b")
    ts = _ts("2026-01-01 12:00:00")
    eng_a.apply_batch(spark.createDataFrame(
        [_ev(0, 0, "c", _img("org/shared", "k.py", "tie-A"), ts)], CHANGELOG_SCHEMA), 0)
    eng_b.apply_batch(spark.createDataFrame(
        [_ev(0, 0, "c", _img("org/shared", "k.py", "tie-B"), ts)], CHANGELOG_SCHEMA), 0)

    history = _drain(spark, a, eng_a, b, eng_b)
    assert history[-1] == ([], [])
    assert _sha_state(spark, a) == _sha_state(spark, b)
    for store in (a, b):
        state = {r["path"]: r["content"] for r in store.read_state(spark).collect()}
        # deterministic total order: higher cluster id wins the tie
        assert state == {"k.py": "tie-B"}


def test_lww_losing_direct_write_leaves_newer_row(spark, tmp_path):
    """Single-replica sanity: under lww, a DIRECT ingest whose stamp is
    older than the stored row's loses at merge time (out-of-order backfill
    cannot clobber a newer image)."""
    store, engine = _mk(tmp_path, "t", "a")
    engine.apply_batch(spark.createDataFrame(
        [_ev(0, 0, "c", _img("org/r", "f.py", "new"), _ts("2026-06-01 00:00:00"))],
        CHANGELOG_SCHEMA), 0)
    # later lsn (passes the watermark dedup) but OLDER origin timestamp
    engine.apply_batch(spark.createDataFrame(
        [_ev(0, 1, "u", _img("org/r", "f.py", "stale-backfill"), _ts("2025-01-01 00:00:00"))],
        CHANGELOG_SCHEMA), 1)
    state = {r["path"]: r["content"] for r in store.read_state(spark).collect()}
    assert state == {"f.py": "new"}

    # source-wins default keeps CDC semantics: same sequence overwrites
    store2 = TableStore(str(tmp_path / "t2"), n_buckets=4)
    engine2 = CdcApplyEngine(store2, EngineConfig(metrics=False))
    engine2.apply_batch(spark.createDataFrame(
        [_ev(0, 0, "c", _img("org/r", "f.py", "new"), _ts("2026-06-01 00:00:00"))],
        CHANGELOG_SCHEMA), 0)
    engine2.apply_batch(spark.createDataFrame(
        [_ev(0, 1, "u", _img("org/r", "f.py", "stale-backfill"), _ts("2025-01-01 00:00:00"))],
        CHANGELOG_SCHEMA), 1)
    state2 = {r["path"]: r["content"] for r in store2.read_state(spark).collect()}
    assert state2 == {"f.py": "stale-backfill"}
