"""Skew in the hot apply path (reference docs/mm2-provisioning.md:116-124):

* a HOT KEY (one key = 20% of the batch) needs no salting — the compaction
  collapses it map-side (hash aggregate partial) and the phase-2 join keys
  include lsn, which spreads its events; the fixture proves the state is
  exact and the winner is the newest image;
* a HOT BUCKET on the non-clustered write path (one reduce task per dirty
  bucket) IS a straggler — the engine probes per-bucket changed-key counts
  (free, from the stats it already collects) and salts the write into
  key-hash slices: same rows, multiple files/tasks per bucket.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def _hot_key_batch(spark, n_events=5000, hot_share=0.2):
    """One key takes ``hot_share`` of all events (interleaved, growing
    lsns); the rest spread over distinct keys."""
    rows, lsn = [], 0
    n_hot = int(n_events * hot_share)
    for i in range(n_events):
        hot = i % int(1 / hot_share) == 0 and n_hot > 0
        if hot:
            n_hot -= 1
            repo, path, content = "org/hot", "HOT.py", f"hot-v{lsn}"
        else:
            repo, path, content = f"org/r{i % 5}", f"f_{i}.py", f"c-{i}"
        rows.append(Row(
            partition=0, lsn=lsn, op="c" if lsn == 0 else "u",
            before=None,
            after=Row(repo=repo, path=path, commit="c", lang="py", content=content),
            ts_ms=None, headers=None, source_topic="repos",
        ))
        lsn += 1
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


def _sha(spark, store):
    return sorted(
        hashlib.sha256(f"{r['repo']}|{r['path']}|{r['content']}".encode()).hexdigest()
        for r in store.read_state(spark).collect()
    )


def test_hot_key_batch_applies_exactly(spark, tmp_path):
    batch = _hot_key_batch(spark)
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    out = CdcApplyEngine(store, EngineConfig(metrics=False)).apply_batch(batch, 0)
    assert out["status"] == "committed"

    state = {(r["repo"], r["path"]): r["content"]
             for r in store.read_state(spark).collect()}
    # the hot key compacted to exactly its NEWEST image
    hot_lsns = [r["lsn"] for r in batch.collect()
                if r["after"] and r["after"]["path"] == "HOT.py"]
    assert state[("org/hot", "HOT.py")] == f"hot-v{max(hot_lsns)}"
    # every non-hot key applied too (4000 distinct cold keys + the hot one)
    assert len(state) == 5000 - len(hot_lsns) + 1


def test_hot_bucket_write_salted_without_config(spark, tmp_path):
    """Non-clustered write path + one bucket over the key budget: the probe
    salts that write into multiple tasks/files; rows identical."""
    batch = _hot_key_batch(spark, n_events=4000, hot_share=0.01)

    # force the NON-clustered path: shuffle partitions not a multiple of
    # n_buckets
    spark.conf.set("spark.sql.shuffle.partitions", "6")
    try:
        salted = TableStore(str(tmp_path / "salted"), n_buckets=4)
        out = CdcApplyEngine(
            salted,
            EngineConfig(metrics=False, write_salt_target_keys=300),
        ).apply_batch(batch, 0)
        assert out["status"] == "committed"
        assert out["write_salt"] > 1

        plain = TableStore(str(tmp_path / "plain"), n_buckets=4)
        out2 = CdcApplyEngine(plain, EngineConfig(metrics=False)).apply_batch(
            batch, 0
        )
        assert out2["write_salt"] == 1
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")

    # the hot buckets were split across multiple files (= multiple write
    # tasks); the unsalted run wrote one file per bucket
    m_salted = salted.current_manifest()
    m_plain = plain.current_manifest()
    assert max(len(f) for f in m_salted["buckets"].values()) > 1
    assert max(len(f) for f in m_plain["buckets"].values()) == 1

    # layout-only change: state identical
    assert _sha(spark, salted) == _sha(spark, plain)
