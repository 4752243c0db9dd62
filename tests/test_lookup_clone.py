"""Point lookup (bucket-pruned key reads) and zero-copy shallow clone.

Lookup rebuilds the reference's keyed point-read pattern (a consumer fetches
one key's partition, not the whole topic — SendProductToKafka.py:48 keys every
record); clone is the O(1)-metadata stand-in for MM2's "duplicate cluster for
migration/DR/test" use (docs/index.md:9) at sizes where a physical copy is
days of IO.
"""
from __future__ import annotations

import os
from urllib.parse import urlparse

from datetime import datetime, timezone

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog
from kp_data_replication_spark.plans.audit import plan_string
from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore, bucket_expr
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig

FAST = EngineConfig(metrics=False)
SPEC = ChangelogSpec(n_keys=120, versions_per_key=2, n_partitions=4, files=4, dup_every=0)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """Store built in 2 epochs (versions v1, v2) + the changelog dir."""
    d = str(tmp_path_factory.mktemp("cl"))
    write_changelog(spark, d, SPEC)
    store = TableStore(str(tmp_path_factory.mktemp("t")) + "/t", n_buckets=8)
    engine = CdcApplyEngine(store, FAST)
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    for epoch, group in enumerate([files[:2], files[2:]]):
        batch = spark.read.option("mergeSchema", "true").parquet(
            *[f"{d}/{f}" for f in group]
        )
        assert engine.apply_batch(batch, epoch)["status"] == "committed"
    return d, store


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


# --------------------------------------------------------------------------
# lookup
# --------------------------------------------------------------------------

def test_lookup_matches_full_scan_filter(spark, built):
    _, store = built
    state = store.read_state(spark)
    keys = [
        (r["repo"], r["path"])
        for r in state.select("repo", "path").orderBy("repo", "path").limit(3).collect()
    ]
    got = store.lookup(spark, keys)
    cond = F.lit(False)
    for repo, path in keys:
        cond = cond | ((F.col("repo") == repo) & (F.col("path") == path))
    want = state.filter(cond)
    assert _rows(got) == _rows(want)
    assert got.count() == 3  # (repo, path) is the primary key


def test_lookup_reads_only_the_keys_buckets(spark, built):
    _, store = built
    state = store.read_state(spark)
    keys = [
        (r["repo"], r["path"])
        for r in state.select("repo", "path").orderBy("repo", "path").limit(2).collect()
    ]
    nb = store.n_buckets
    kdf = spark.createDataFrame(keys, "repo string, path string")
    buckets = sorted({r[0] for r in kdf.select(bucket_expr(nb)).distinct().collect()})
    allowed = {os.path.abspath(f) for f in store._bucket_files(buckets)}
    every = {os.path.abspath(f) for f in store._bucket_files()}
    got = store.lookup(spark, keys)
    read = {urlparse(f).path for f in got.inputFiles()}
    assert read, "lookup read no files"
    assert read <= allowed
    assert len(read) < len(every), "lookup scanned the whole table"
    # the per-column IN superset prefilter reaches the parquet scan
    # (Catalyst collapses a single-value IN to EqualTo — accept either)
    plan = plan_string(got)
    assert "PushedFilters" in plan, plan
    assert ("In(repo" in plan or "EqualTo(repo" in plan), plan
    assert ("In(path" in plan or "EqualTo(path" in plan), plan


def test_lookup_misses_exact_tuples_and_empty(spark, built):
    _, store = built
    assert store.lookup(spark, []).count() == 0
    assert store.lookup(spark, [("no-such-repo", "no/such/path")]).count() == 0
    # cross-matched tuple (repo of key A, path of key B) must NOT match:
    # the per-column prefilter alone would pass it; the semi-join is exact
    rows = (
        store.read_state(spark)
        .select("repo", "path")
        .orderBy("repo", "path")
        .limit(2)
        .collect()
    )
    a, b = rows[0], rows[1]
    if (a["repo"], b["path"]) not in {(a["repo"], a["path"]), (b["repo"], b["path"])}:
        crossed = store.lookup(spark, [(a["repo"], b["path"])])
        assert (
            crossed.filter(
                (F.col("repo") == a["repo"]) & (F.col("path") == b["path"])
            ).count()
            == 0
        )


def test_lookup_large_keyset_skips_literal_prefilter(spark, built):
    _, store = built
    state = store.read_state(spark)
    real = [
        (r["repo"], r["path"])
        for r in state.select("repo", "path").limit(5).collect()
    ]
    fake = [("ghost-repo", f"ghost/path/{i}") for i in range(1100)]
    got = store.lookup(spark, real + fake)
    assert got.count() == len(real)
    plan = plan_string(got)
    # thousands-literal predicate not emitted (no IN prefilter at all)
    assert "In(repo" not in plan and "In(path" not in plan, plan


def test_lookup_time_travel(spark, built):
    _, store = built
    assert store.versions() == [1, 2]
    state_v1 = store.read_state(spark, version=1)
    keys = [
        (r["repo"], r["path"])
        for r in state_v1.select("repo", "path").orderBy("repo", "path").limit(2).collect()
    ]
    got = store.lookup(spark, keys, version=1)
    cond = F.lit(False)
    for repo, path in keys:
        cond = cond | ((F.col("repo") == repo) & (F.col("path") == path))
    assert _rows(got) == _rows(state_v1.filter(cond))


# --------------------------------------------------------------------------
# clone
# --------------------------------------------------------------------------

def _sha_state(spark, store, version=None):
    df = store.read_state(spark, version=version)
    return sorted(
        (r["repo"], r["path"], r["sha"])
        for r in df.select(
            "repo", "path", F.sha2(F.coalesce("content", F.lit("")), 256).alias("sha")
        ).collect()
    )


def test_clone_is_zero_copy_and_reads_equal(spark, built, tmp_path):
    _, store = built
    troot = str(tmp_path / "branch")
    clone = store.clone(troot)
    assert _sha_state(spark, clone) == _sha_state(spark, store)
    # zero copy: the clone wrote no data files of its own
    assert not os.path.isdir(os.path.join(troot, "data"))
    # the pin is registered on the source under the clone's group
    assert store.consumers()[f"clone:{os.path.abspath(troot)}"] == 2


def _img(repo, path, content):
    return Row(repo=repo, path=path, commit="cX", lang="py", content=content)


def _ev(lsn, op, img):
    return Row(
        partition=0, lsn=lsn, op=op,
        before=img if op == "d" else None,
        after=None if op == "d" else img,
        ts_ms=datetime(2026, 1, 1, tzinfo=timezone.utc),
        headers=None, source_topic="repos",
    )


def test_clone_divergence_is_two_way_independent(spark, built, tmp_path):
    _, store = built
    src_sha = _sha_state(spark, store)
    clone = store.clone(str(tmp_path / "div"))
    keys = [
        (r["repo"], r["path"])
        for r in store.read_state(spark)
        .select("repo", "path").orderBy("repo", "path").limit(2).collect()
    ]

    # write to the CLONE: delete one key (lsn far above any applied watermark)
    eng = CdcApplyEngine(clone, FAST)
    one = spark.createDataFrame(
        [_ev(10**9, "d", _img(keys[0][0], keys[0][1], None))], CHANGELOG_SCHEMA
    )
    assert eng.apply_batch(one, 100)["status"] == "committed"
    assert clone.current_version() == 2
    assert _sha_state(spark, store) == src_sha  # source untouched
    assert len(_sha_state(spark, clone)) == len(src_sha) - 1

    # write to the SOURCE: clone's state must not move
    clone_sha = _sha_state(spark, clone)
    eng_src = CdcApplyEngine(store, FAST)
    upd = spark.createDataFrame(
        [_ev(10**9 + 1, "u", _img(keys[1][0], keys[1][1], "diverged-src"))],
        CHANGELOG_SCHEMA,
    )
    assert eng_src.apply_batch(upd, 101)["status"] == "committed"
    assert _sha_state(spark, clone) == clone_sha


def test_clone_survives_source_vacuum_then_localizes(spark, built, tmp_path):
    _, store = built
    troot = str(tmp_path / "pinned")
    clone = store.clone(troot)
    pinned_sha = _sha_state(spark, clone)

    # advance the source twice, then vacuum hard: the pin must keep the
    # cloned version's files alive
    keys = [
        (r["repo"], r["path"])
        for r in store.read_state(spark)
        .select("repo", "path").orderBy(F.desc("repo"), F.desc("path")).limit(2).collect()
    ]
    eng_src = CdcApplyEngine(store, FAST)
    for i, e in enumerate((200, 201)):
        upd = spark.createDataFrame(
            [_ev(2 * 10**9 + e, "u", _img(keys[i][0], keys[i][1], f"rewrite-{e}"))],
            CHANGELOG_SCHEMA,
        )
        assert eng_src.apply_batch(upd, e)["status"] == "committed"
    store.vacuum(keep_versions=1)
    assert _sha_state(spark, clone) == pinned_sha

    # localize: rewrite every bucket into clone-owned files, drop the pin,
    # vacuum the source aggressively — the clone keeps reading
    clone.rewrite_buckets(spark, min_files=0)
    m = clone.current_manifest()
    src_root = os.path.abspath(store.root)
    for fs in m["buckets"].values():
        for f in fs:
            assert not os.path.abspath(
                os.path.join(clone.root, f)
            ).startswith(src_root)
    store.remove_consumer(f"clone:{os.path.abspath(troot)}")
    store.vacuum(keep_versions=1)
    assert _sha_state(spark, clone) == pinned_sha
    # and the clone's own vacuum never walks outside its root
    clone.vacuum(keep_versions=1)
    assert _sha_state(spark, clone) == pinned_sha


def test_clone_guards(spark, built, tmp_path):
    _, store = built
    empty = TableStore(str(tmp_path / "empty"), n_buckets=4)
    with pytest.raises(ValueError, match="empty table"):
        empty.clone(str(tmp_path / "x"))
    troot = str(tmp_path / "dup")
    store.clone(troot, pin=False)
    with pytest.raises(ValueError, match="already exists"):
        store.clone(troot, pin=False)


def test_sorted_rewrite_orders_keys_within_buckets(spark, built, tmp_path):
    """Iceberg sort-order-at-compaction analogue: rewrite_buckets(sort_keys)
    leaves every bucket file key-sorted (tight row-group min/max for
    lookup's pushed prefilter) and logical state unchanged."""
    import pyarrow.parquet as pq

    _, store = built
    branch = store.clone(str(tmp_path / "sorted"), pin=False)
    before = _sha_state(spark, branch)
    out = branch.rewrite_buckets(spark, min_files=0, sort_keys=True)
    assert out["rewritten_buckets"], "nothing rewritten"
    assert _sha_state(spark, branch) == before
    checked = 0
    for f in branch._bucket_files():
        rows = pq.read_table(f, columns=["repo", "path"]).to_pylist()
        keys = [(r["repo"], r["path"]) for r in rows]
        assert keys == sorted(keys), f
        checked += 1
    assert checked > 0
