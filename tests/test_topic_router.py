"""Multi-topic routing + mid-stream new-topic discovery (reference
`refresh.topics.interval.seconds`, docs/mm2-provisioning.md:199)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kp_data_replication_spark.datagen import (
    ChangelogSpec,
    compute_expected_state_pandas,
    write_changelog,
)
from kp_data_replication_spark.streaming.apply import EngineConfig, final_state
from kp_data_replication_spark.streaming.router import TopicRouter


def _shas(pdf):
    return sorted(hashlib.sha256(c.encode()).hexdigest() for c in pdf["content"])


def test_router_creates_target_per_topic_and_discovers_new_ones(spark, tmp_path):
    d = str(tmp_path / "cl")
    write_changelog(
        spark, d,
        ChangelogSpec(n_keys=60, versions_per_key=2, n_partitions=2, files=2, dup_every=0),
    )
    base = spark.read.option("mergeSchema", "true").parquet(d)
    exp = compute_expected_state_pandas(d)

    router = TopicRouter(
        str(tmp_path / "targets"),
        EngineConfig(metrics=False, whitelist="^repos"),
        n_buckets=4,
    )

    # batch 0 carries only the 'repos' topic
    out0 = router.apply_batch(base, 0)
    assert set(out0) == {"repos"}
    assert router.topics_seen() == ["repos"]

    # batch 1 introduces a NEW whitelisted topic mid-stream: a second table
    # materializes automatically; the existing one keeps its own sequence
    new_topic = base.withColumn(
        "source_topic",
        F.when(F.col("source_topic") == "repos", "repos-forks").otherwise(
            F.col("source_topic")
        ),
    )
    out1 = router.apply_batch(new_topic, 1)
    assert set(out1) == {"repos-forks"}
    assert router.topics_seen() == ["repos", "repos-forks"]

    # both targets hold the full correct state for their topic
    for topic in ("repos", "repos-forks"):
        got = final_state(spark, router.store_for(topic)).select(
            "content_sha"
        ).toPandas()
        assert sorted(got["content_sha"]) == _shas(exp), topic

    # re-delivery of batch 1 to the router is fenced per (topic, writer)
    out2 = router.apply_batch(new_topic, 1)
    assert out2["repos-forks"]["status"] == "fenced"

    # a blacklisted/internal topic never materializes a target
    assert "mm2-configs.source.internal" not in router.topics_seen()


def test_catalog_gives_torn_read_free_cross_topic_snapshots(spark, tmp_path):
    """use_catalog=True: readers resolving through the catalog never see a
    cross-topic snapshot that mixes epochs, even when a crash lands between
    one topic's table commit and the next (the window Kafka consumers of
    multiple replicated topics are exposed to)."""
    import re
    from dataclasses import replace as dc_replace

    from kp_data_replication_spark.streaming.apply import CdcApplyEngine

    d = str(tmp_path / "cl")
    write_changelog(
        spark, d,
        ChangelogSpec(n_keys=40, versions_per_key=2, n_partitions=2, files=2,
                      dup_every=0),
    )
    base = spark.read.option("mergeSchema", "true").parquet(d)
    repos_only = base.filter(F.col("source_topic") == "repos")
    two = repos_only.unionByName(
        repos_only.withColumn("source_topic", F.lit("repos-forks"))
    )
    router = TopicRouter(
        str(tmp_path / "targets"),
        EngineConfig(metrics=False, whitelist="^repos"),
        n_buckets=4,
        use_catalog=True,
    )

    # epoch 0: both topics commit, catalog publishes one snapshot
    # (split by lsn RANGE — ordered delivery within every partition)
    med = two.approxQuantile("lsn", [0.5], 0.0)[0]
    half = two.filter(F.col("lsn") <= F.lit(med))
    out0 = router.apply_batch(half, 0)
    cat_v0 = out0["_catalog_version"]
    snap0 = router.catalog.snapshot()
    assert set(snap0) == {"repos", "repos-forks"}
    rows0 = {
        t: sorted(r["path"] for r in router.read_consistent(spark, t).collect())
        for t in snap0
    }
    assert rows0["repos"] == rows0["repos-forks"]

    # crash window: epoch 1 commits topic 'repos' TABLE only (simulating a
    # crash before 'repos-forks' and before the catalog publish)
    rest = two.filter(F.col("lsn") > F.lit(med))
    engine = CdcApplyEngine(
        router.store_for("repos"),
        dc_replace(router.config, whitelist=f"^{re.escape('repos')}$"),
    )
    engine.apply_batch(rest, 1, writer_id="default:repos")
    # the table head moved, but the CATALOG still serves the old snapshot
    assert router.catalog.current_version() == cat_v0
    torn_free = sorted(
        r["path"] for r in router.read_consistent(spark, "repos").collect()
    )
    assert torn_free == rows0["repos"]  # stale but CONSISTENT with forks
    head = sorted(
        r["path"]
        for r in router.store_for("repos").read_state(spark).collect()
    )
    assert len(head) >= len(torn_free)  # the head really is ahead

    # resume: the full epoch replays — repos fences to a noop, forks
    # commits, the catalog advances exactly once to a consistent snapshot
    out1 = router.apply_batch(rest, 1)
    assert out1["repos"]["status"] == "fenced"
    assert out1["repos-forks"]["status"] == "committed"
    assert router.catalog.current_version() == cat_v0 + 1
    rows1 = {
        t: sorted(r["path"] for r in router.read_consistent(spark, t).collect())
        for t in ("repos", "repos-forks")
    }
    assert rows1["repos"] == rows1["repos-forks"]
    exp = compute_expected_state_pandas(d)
    assert len(rows1["repos"]) == len(exp)

    # replayed epoch: every table fences, the catalog does NOT re-advance
    out2 = router.apply_batch(rest, 1)
    assert out2["_catalog_version"] == cat_v0 + 1
    assert router.catalog.current_version() == cat_v0 + 1

    # time travel: the old catalog version still reads the old snapshot
    old = sorted(
        r["path"]
        for r in router.read_consistent(spark, "repos", version=cat_v0).collect()
    )
    assert old == rows0["repos"]


def test_catalog_concurrent_commits_compose_not_clobber(tmp_path):
    """Two publishers committing DIFFERENT tables concurrently must both
    land (the unlocked read-modify-write would drop one): 2 threads x 50
    commits each -> 100 catalog versions, final snapshot carries both
    tables' last versions. Pure file ops — no Spark."""
    import threading

    from kp_data_replication_spark.sources.catalog import Catalog

    cat = Catalog(str(tmp_path / "_catalog"))

    def publisher(name):
        for v in range(1, 51):
            cat.commit({name: v}, writer_id=name, epoch=v)

    ts = [threading.Thread(target=publisher, args=(n,)) for n in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert cat.current_version() == 100
    snap = cat.snapshot()
    assert snap == {"a": 50, "b": 50}
    # every intermediate version file is still readable (no overwrites)
    assert cat.snapshot(1) in ({"a": 1}, {"b": 1})


def test_catalog_pin_survives_aggressive_vacuum(spark, tmp_path):
    """The catalog registers as a consumer of the table versions its live
    snapshot serves, so vacuum(keep_versions=1) during the crash window
    (table head ahead of the catalog) cannot expire the snapshot's version
    — read_consistent keeps working instead of failing a full resync."""
    import re
    from dataclasses import replace as dc_replace

    from kp_data_replication_spark.streaming.apply import CdcApplyEngine

    d = str(tmp_path / "cl")
    write_changelog(
        spark, d,
        ChangelogSpec(n_keys=30, versions_per_key=2, n_partitions=2, files=2,
                      dup_every=0),
    )
    base = spark.read.option("mergeSchema", "true").parquet(d)
    repos_only = base.filter(F.col("source_topic") == "repos")
    router = TopicRouter(
        str(tmp_path / "targets"),
        EngineConfig(metrics=False, whitelist="^repos"),
        n_buckets=4,
        use_catalog=True,
    )
    med = repos_only.approxQuantile("lsn", [0.5], 0.0)[0]
    router.apply_batch(repos_only.filter(F.col("lsn") <= F.lit(med)), 0)
    before = sorted(
        r["path"] for r in router.read_consistent(spark, "repos").collect()
    )

    # crash window: table advances WITHOUT a catalog publish
    engine = CdcApplyEngine(
        router.store_for("repos"),
        dc_replace(router.config, whitelist=f"^{re.escape('repos')}$"),
    )
    engine.apply_batch(
        repos_only.filter(F.col("lsn") > F.lit(med)), 1,
        writer_id="default:repos",
    )
    store = router.store_for("repos")
    cat_v = router.catalog.table_version("repos")
    assert store.current_version() > cat_v

    # aggressive vacuum would expire cat_v without the pin
    store.vacuum(keep_versions=1)
    got = sorted(
        r["path"] for r in router.read_consistent(spark, "repos").collect()
    )
    assert got == before  # the pinned snapshot version survived


def test_per_flow_pause_resume_under_live_stream(spark, tmp_path):
    """Rolling-migration surface (docs/mm2-provisioning.md:132): pause ONE
    topic's flow while the router stream keeps applying the other, then
    resume with a catch-up replay — the paused flow converges sha-equal
    with the never-paused one, exactly once, watermarks preserved."""
    import glob
    import json
    import os
    import shutil

    from kp_data_replication_spark.schema import CHANGELOG_SCHEMA_EVOLVED

    # two-topic changelog: every 'repos' event mirrored as 'repos-forks'
    raw = str(tmp_path / "raw")
    write_changelog(
        spark, raw,
        ChangelogSpec(n_keys=50, versions_per_key=2, n_partitions=2,
                      files=4, dup_every=0),
    )
    cl = tmp_path / "cl"
    cl.mkdir()
    files = sorted(f for f in os.listdir(raw) if f.endswith(".parquet"))
    n_half = len(files) // 2
    for i, f in enumerate(files):
        one = spark.read.option("mergeSchema", "true").parquet(f"{raw}/{f}")
        two = one.unionByName(
            one.withColumn(
                "source_topic",
                F.when(F.col("source_topic") == "repos",
                       "repos-forks").otherwise(F.col("source_topic")),
            )
        )
        tmp = str(tmp_path / f"_w{i}")
        two.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0],
                    str(cl / f"f{i}.parquet"))

    router = TopicRouter(
        str(tmp_path / "targets"),
        EngineConfig(metrics=False, whitelist="^repos"),
        n_buckets=4,
    )
    cp = str(tmp_path / "cp")

    # leg 1: stream the first two files — both flows materialize
    def stage(i):
        # the changelog contract is ordered delivery per partition; the
        # file source orders by mtime, and copies landing inside one
        # mtime tick would scramble it — stamp strictly increasing times
        dst = str(live / f"f{i}.parquet")
        shutil.copy(str(cl / f"f{i}.parquet"), dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))

    live = tmp_path / "live"
    live.mkdir()
    for i in range(n_half):
        stage(i)
    q = router.start_stream(spark, str(live), cp, CHANGELOG_SCHEMA_EVOLVED,
                            max_files_per_trigger=1)
    q.awaitTermination()
    assert router.topics_seen() == ["repos", "repos-forks"]

    # pause forks MID-STREAM; its watermark snapshot is recorded
    info = router.pause("repos-forks")
    assert info["watermarks"]
    assert router.paused_topics() == ["repos-forks"]
    frozen = sorted(
        r["content_sha"]
        for r in final_state(spark, router.store_for("repos-forks"))
        .select("content_sha").collect()
    )
    frozen_v = router.store_for("repos-forks").current_version()

    # leg 2: the rest of the changelog streams — repos keeps applying,
    # the paused flow's table and lineage do not move
    for i in range(n_half, len(files)):
        stage(i)
    q = router.start_stream(spark, str(live), cp, CHANGELOG_SCHEMA_EVOLVED,
                            max_files_per_trigger=1)
    q.awaitTermination()
    exp = _shas(compute_expected_state_pandas(raw))
    repos_shas = sorted(
        r["content_sha"]
        for r in final_state(spark, router.store_for("repos"))
        .select("content_sha").collect()
    )
    assert repos_shas == exp
    forks_store = router.store_for("repos-forks")
    assert forks_store.current_version() == frozen_v
    still = sorted(
        r["content_sha"]
        for r in final_state(spark, forks_store)
        .select("content_sha").collect()
    )
    assert still == frozen

    # resume with catch-up: the gap closes exactly once, sha-equal
    out = router.resume(spark, "repos-forks", changelog_path=str(live),
                        read_schema=CHANGELOG_SCHEMA_EVOLVED)
    assert out["was_paused"] and out["catchup"]["status"] == "committed"
    assert router.paused_topics() == []
    resumed = sorted(
        r["content_sha"]
        for r in final_state(spark, forks_store)
        .select("content_sha").collect()
    )
    assert resumed == exp

    # the resumed flow rejoins the live loop: a fresh batch applies to BOTH
    nxt = spark.read.option("mergeSchema", "true").parquet(
        str(cl / f"f{len(files) - 1}.parquet")
    )
    out2 = router.apply_batch(nxt, 99)
    assert set(out2) == {"repos", "repos-forks"}
    assert out2["repos-forks"]["status"] != "paused"

    # a replay of the catch-up is masked by lineage (exactly once)
    again = router.resume(spark, "repos-forks", changelog_path=str(live),
                          read_schema=CHANGELOG_SCHEMA_EVOLVED)
    assert not again["was_paused"]
    assert sorted(
        r["content_sha"]
        for r in final_state(spark, forks_store)
        .select("content_sha").collect()
    ) == exp
    del json


def test_resume_keeps_gate_down_until_catchup_commits(spark, tmp_path):
    """The pause marker must survive INTO the catch-up replay and come off
    only after it commits: removing it first opens the documented
    data-loss window (a live trigger between marker removal and replay
    completion advances the partition watermark past the paused gap, and
    the replay's lineage anti-filter then masks the gap events forever).
    A failed replay must leave the flow gated."""
    from kp_data_replication_spark.schema import CHANGELOG_SCHEMA_EVOLVED
    from kp_data_replication_spark.streaming import apply as apply_mod

    cl = str(tmp_path / "cl")
    write_changelog(
        spark, cl,
        ChangelogSpec(n_keys=20, versions_per_key=2, n_partitions=2, files=2),
    )
    router = TopicRouter(
        str(tmp_path / "targets"),
        EngineConfig(metrics=False, whitelist="^repos$"),
        n_buckets=4,
    )
    batch = spark.read.option("mergeSchema", "true").parquet(cl)
    router.apply_batch(batch, 0)
    router.pause("repos")
    assert router.is_paused("repos")

    # 1) during the replay the gate must still be down
    seen_during_replay = {}
    orig = apply_mod.CdcApplyEngine.replay_batch

    def probing(self, *a, **kw):
        seen_during_replay["paused"] = router.is_paused("repos")
        return orig(self, *a, **kw)

    apply_mod.CdcApplyEngine.replay_batch = probing
    try:
        out = router.resume(spark, "repos", changelog_path=cl,
                            read_schema=CHANGELOG_SCHEMA_EVOLVED)
    finally:
        apply_mod.CdcApplyEngine.replay_batch = orig
    assert out["was_paused"]
    assert seen_during_replay["paused"] is True
    assert not router.is_paused("repos")

    # 2) a FAILED catch-up leaves the marker (flow stays gated, gap
    # replayable); the error propagates
    router.pause("repos")

    def exploding(self, *a, **kw):
        raise RuntimeError("replay infrastructure failure")

    apply_mod.CdcApplyEngine.replay_batch = exploding
    try:
        try:
            router.resume(spark, "repos", changelog_path=cl,
                          read_schema=CHANGELOG_SCHEMA_EVOLVED)
            raise AssertionError("resume must propagate the replay failure")
        except RuntimeError:
            pass
    finally:
        apply_mod.CdcApplyEngine.replay_batch = orig
    assert router.is_paused("repos")
    # cleanup: successful resume clears the gate
    out = router.resume(spark, "repos", changelog_path=cl,
                        read_schema=CHANGELOG_SCHEMA_EVOLVED)
    assert not router.is_paused("repos")


def test_resume_catchup_publishes_catalog(spark, tmp_path):
    """Under use_catalog=True a successful catch-up must publish the
    caught-up table version: read_consistent() otherwise keeps serving the
    frozen pre-pause snapshot until the next live epoch touches the
    topic."""
    from kp_data_replication_spark.schema import CHANGELOG_SCHEMA_EVOLVED

    cl = str(tmp_path / "cl")
    write_changelog(
        spark, cl,
        ChangelogSpec(n_keys=20, versions_per_key=2, n_partitions=2, files=4),
    )
    router = TopicRouter(
        str(tmp_path / "targets"),
        EngineConfig(metrics=False, whitelist="^repos$"),
        n_buckets=4,
        use_catalog=True,
    )
    import os

    files = sorted(os.listdir(cl))
    half = [f for f in files if f.endswith(".parquet")]
    first, rest = half[: len(half) // 2], half[len(half) // 2:]
    b1 = spark.read.option("mergeSchema", "true").parquet(
        *[f"{cl}/{f}" for f in first]
    )
    router.apply_batch(b1, 0)
    router.pause("repos")
    b2 = spark.read.option("mergeSchema", "true").parquet(
        *[f"{cl}/{f}" for f in rest]
    )
    router.apply_batch(b2, 1)  # gated: table+catalog stay frozen
    frozen_snapshot = router.catalog.snapshot()

    out = router.resume(spark, "repos", changelog_path=cl,
                        read_schema=CHANGELOG_SCHEMA_EVOLVED)
    assert out["catchup"]["status"] == "committed"
    assert "_catalog_version" in out
    snap = router.catalog.snapshot()
    store = router.store_for("repos")
    assert snap["repos"] == store.current_version()
    assert snap["repos"] > frozen_snapshot.get("repos", -1)
    # the consistency-guaranteeing read path serves the caught-up state
    n_consistent = router.read_consistent(spark, "repos").count()
    assert n_consistent == final_state(spark, store).count()
