"""Three-cluster ring replication under LWW (A -> B -> C -> A).

The reference's active/active scenario is two clusters
(mirror-maker-2/bi-directional/accounts-mirroring-mm2.yml); MM2
deployments chain further hops (docs/es-prem-to-es.md — on-prem ES ->
cloud ES with more clusters in the topology). The engine's claim is that
convergence is a MECHANISM — (_lww_ts, _lww_src) total order + echo
damping (a losing apply leaves state byte-identical, so the next hop's
diff is empty) — not a property of the 2-node special case. A ring is the
sharpest multi-hop probe: every write must cross TWO hops to reach the
farthest replica, and a flip-flop anywhere cycles forever.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

from pyspark.sql import Row

from kp_data_replication_spark.operators.changefeed import cascade_catchup
from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def _img(repo, path, content):
    return Row(repo=repo, path=path, commit="c0", lang="py", content=content)


def _ev(partition, lsn, op, image, ts):
    return Row(partition=partition, lsn=lsn, op=op,
               before=image if op == "d" else None,
               after=None if op == "d" else image,
               ts_ms=ts, headers=None, source_topic="repos")


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S").replace(tzinfo=timezone.utc)


def _sha_state(spark, store):
    return sorted(
        hashlib.sha256(f"{r['repo']}|{r['path']}|{r['content']}".encode()).hexdigest()
        for r in store.read_state(spark).collect()
    )


def _mk(tmp_path, name):
    store = TableStore(str(tmp_path / name), n_buckets=4)
    engine = CdcApplyEngine(
        store, EngineConfig(metrics=False, conflict_policy="lww", cluster_id=name)
    )
    return store, engine


def test_three_cluster_ring_converges_with_conflicts_and_delete(spark, tmp_path):
    a, eng_a = _mk(tmp_path, "a")
    b, eng_b = _mk(tmp_path, "b")
    c, eng_c = _mk(tmp_path, "c")

    # concurrent conflicting writes to the SAME key on all three clusters
    # (C's stamp is newest -> must win everywhere, two hops from A's view),
    # a delete concurrent with an older remote update (delete must win),
    # and one local-only key per cluster
    eng_a.apply_batch(spark.createDataFrame([
        _ev(0, 0, "c", _img("org/shared", "k.py", "K-from-A"), _ts("2026-01-01 00:00:03")),
        _ev(0, 1, "c", _img("org/shared", "d.py", "D-from-A"), _ts("2026-01-01 00:00:01")),
        _ev(1, 0, "c", _img("org/a", "a.py", "A-local"), _ts("2026-01-01 00:00:01")),
    ], CHANGELOG_SCHEMA), 0)
    eng_b.apply_batch(spark.createDataFrame([
        _ev(0, 0, "c", _img("org/shared", "k.py", "K-from-B"), _ts("2026-01-01 00:00:01")),
        _ev(1, 0, "c", _img("org/b", "b.py", "B-local"), _ts("2026-01-01 00:00:01")),
    ], CHANGELOG_SCHEMA), 0)
    eng_c.apply_batch(spark.createDataFrame([
        _ev(0, 0, "c", _img("org/shared", "k.py", "K-from-C"), _ts("2026-01-01 00:00:05")),
        # delete of d.py stamped NEWER than A's concurrent create
        _ev(0, 1, "d", _img("org/shared", "d.py", None), _ts("2026-01-01 00:00:04")),
        _ev(1, 0, "c", _img("org/c", "c.py", "C-local"), _ts("2026-01-01 00:00:01")),
    ], CHANGELOG_SCHEMA), 0)

    # ring drain: A -> B -> C -> A until a full round applies nothing
    history = []
    for _ in range(12):
        r_ab = cascade_catchup(spark, a, eng_b, n_partitions=2)
        r_bc = cascade_catchup(spark, b, eng_c, n_partitions=2)
        r_ca = cascade_catchup(spark, c, eng_a, n_partitions=2)
        applied = (r_ab["applied_versions"], r_bc["applied_versions"],
                   r_ca["applied_versions"])
        history.append(applied)
        if applied == ([], [], []):
            break
    # the ring DRAINED — a flip-flop anywhere would cycle versions forever
    assert history[-1] == ([], [], [])
    # two hops end-to-end plus damping settles in a handful of rounds, not
    # at the iteration cap
    assert len(history) < 12

    # all three replicas byte-converged
    assert _sha_state(spark, a) == _sha_state(spark, b) == _sha_state(spark, c)
    for store in (a, b, c):
        state = {r["path"]: r["content"] for r in store.read_state(spark).collect()}
        assert state == {
            "k.py": "K-from-C",   # newest origin stamp, two hops away from B
            "a.py": "A-local",
            "b.py": "B-local",
            "c.py": "C-local",
            # d.py absent: the newer delete beat A's concurrent create
        }
        # winners carry their ORIGIN stamp through multi-hop cascades
        stamps = {
            r["path"]: (r["_lww_ts"], r["_lww_src"])
            for r in store.read_state(spark).collect()
        }
        assert stamps["k.py"] == (
            int(_ts("2026-01-01 00:00:05").timestamp() * 1000), "c",
        )


def test_ring_late_joiner_backfills_from_one_upstream(spark, tmp_path):
    """A cluster added to the ring AFTER traffic started backfills the full
    converged state from its single upstream hop — the MM2 'add a target
    cluster to a running topology' operation, no source rewind needed."""
    a, eng_a = _mk(tmp_path, "a")
    b, eng_b = _mk(tmp_path, "b")

    eng_a.apply_batch(spark.createDataFrame([
        _ev(0, 0, "c", _img("org/x", "x.py", "X1"), _ts("2026-01-01 00:00:01")),
        _ev(0, 1, "u", _img("org/x", "x.py", "X2"), _ts("2026-01-01 00:00:02")),
        _ev(1, 0, "c", _img("org/y", "y.py", "Y1"), _ts("2026-01-01 00:00:01")),
    ], CHANGELOG_SCHEMA), 0)
    for _ in range(3):
        if not cascade_catchup(spark, a, eng_b, n_partitions=2)["applied_versions"]:
            break

    # C joins late, downstream of B only
    c, eng_c = _mk(tmp_path, "c")
    r = cascade_catchup(spark, b, eng_c, n_partitions=2)
    assert r["applied_versions"]
    assert _sha_state(spark, c) == _sha_state(spark, a)
