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
