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
