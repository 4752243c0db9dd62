"""End-to-end batch replay vs independent pandas oracle.

Rebuild of the reference's primary correctness experiment: produce a known
record set, replicate, and compare payloads exactly on the target
(docs/local-to-es.md:29-47,97-106 — 5 products in, the same 5 out). The
oracle here is the pandas replay in datagen.compute_expected_state_pandas;
the invariant is per-row sha256(content) equality (BASELINE input_hint).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from kp_data_replication_spark.datagen import (
    ChangelogSpec,
    compute_expected_state_pandas,
    write_changelog,
)
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import (
    CdcApplyEngine,
    EngineConfig,
    final_state,
)

SPEC = ChangelogSpec(n_keys=200, versions_per_key=3, n_partitions=4, files=3)
FAST = EngineConfig(metrics=False)


@pytest.fixture(scope="module")
def changelog_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("changelog"))
    write_changelog(spark, d, SPEC)
    return d


@pytest.fixture(scope="module")
def replayed(spark, changelog_dir, tmp_path_factory):
    store = TableStore(str(tmp_path_factory.mktemp("target")), n_buckets=8)
    engine = CdcApplyEngine(store, FAST)
    summary = engine.replay_batch(spark, changelog_dir)
    assert summary["status"] == "committed"
    return store, engine


def expected_with_sha(changelog_dir: str) -> pd.DataFrame:
    exp = compute_expected_state_pandas(changelog_dir)
    exp["content_sha"] = exp["content"].map(
        lambda c: hashlib.sha256(c.encode()).hexdigest()
    )
    return exp


def assert_state_matches(spark, store: TableStore, changelog_dir: str) -> None:
    exp = expected_with_sha(changelog_dir)
    got = (
        final_state(spark, store)
        .select("repo", "path", "commit", "lang", "content_sha", "stars")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    exp_cmp = exp[["repo", "path", "commit", "lang", "content_sha", "stars"]].reset_index(
        drop=True
    )
    assert len(got) == len(exp_cmp), f"row count {len(got)} != {len(exp_cmp)}"
    pd.testing.assert_frame_equal(got, exp_cmp, check_dtype=False)


def test_full_replay_state_equality(spark, changelog_dir, replayed):
    store, _ = replayed
    assert_state_matches(spark, store, changelog_dir)


def test_epoch_fencing_noop(spark, changelog_dir, replayed):
    """A batch re-delivered with an already-committed epoch is a no-op
    (exactly-once fencing, docs/consideration.md:62)."""
    store, engine = replayed
    df = spark.read.option("mergeSchema", "true").parquet(changelog_dir)
    assert engine.apply_batch(df, 0)["status"] == "fenced"
    assert_state_matches(spark, store, changelog_dir)


def test_replay_is_idempotent(spark, changelog_dir, replayed):
    """Re-applying the full changelog under a NEW epoch (duplicate redelivery
    of everything, docs/consideration.md:52-58) must not change the state."""
    store, engine = replayed
    v1 = store.current_version()
    summary = engine.replay_batch(spark, changelog_dir)
    assert summary["status"] == "committed"
    assert summary["keys_changed"] == 0  # all events below the watermark
    assert_state_matches(spark, store, changelog_dir)
    assert store.current_version() >= v1


def test_arrow_unpack_parity(spark, changelog_dir, tmp_path):
    """The all-Arrow unpack path produces the identical end state."""
    store = TableStore(str(tmp_path / "target"), n_buckets=8)
    engine = CdcApplyEngine(store, EngineConfig(arrow_unpack=True, metrics=False))
    engine.replay_batch(spark, changelog_dir)
    assert_state_matches(spark, store, changelog_dir)
