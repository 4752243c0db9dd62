"""Incremental IVF (ANN) index maintained from the changefeed
(operators/ann_incremental.py — the embedding twin of the incremental dedup
index). Parity bar: after EVERY epoch, probing the persisted assignment
must return byte-identical top-k to a full batch `cosine_topk_ivf`
recompute over the source's current state with the same frozen centroids.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kp_data_replication_spark.operators.ann_incremental import IncrementalAnnIndex
from kp_data_replication_spark.operators.similarity import cosine_topk_ivf
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig

DIM = 4
N = 30

ROW_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
])
CL_SCHEMA = T.StructType([
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("lsn", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("before", ROW_SCHEMA, True),
    T.StructField("after", ROW_SCHEMA, True),
    T.StructField("ts_ms", T.TimestampType(), True),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("source_topic", T.StringType(), True),
])


def _vec(i: int, bump: float = 0.0) -> list[float]:
    # deterministic, well-spread directions; bump perturbs for updates
    return [((i * 7 + d * 13) % 11) / 10.0 + (0.31 if d == i % DIM else 0.0) + bump
            for d in range(DIM)]


def _env(i: int, op: str, vec: list[float] | None, lsn: int) -> Row:
    img = Row(repo="corpus", path=str(i), embedding=vec)
    return Row(partition=i % 4, lsn=lsn, op=op,
               before=img if op == "d" else None,
               after=None if op == "d" else img,
               ts_ms=None, headers=None, source_topic="repos")


@pytest.fixture()
def setup(spark, tmp_path):
    src = TableStore(str(tmp_path / "src"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    index = IncrementalAnnIndex(str(tmp_path / "idx"), n_buckets=4)
    cents = spark.createDataFrame(
        [(i, _vec(i)) for i in range(4)], "cell int, _centroid array<double>"
    )
    index.set_centroids(cents)
    return src, engine, index, cents


def _assert_parity(spark, src, index, cents, k=3, n_probe=2):
    corpus = src.read_state(spark).select(
        F.col("path").cast("long").alias("vec_id"), "embedding"
    )
    queries = corpus.filter(F.col("vec_id") % 5 == 0)
    want = sorted(
        cosine_topk_ivf(corpus, queries, k=k, n_cells=4, n_probe=n_probe,
                        centroids=cents).collect()
    )
    got = sorted(index.topk(spark, queries, k=k, n_probe=n_probe).collect())
    assert got == want


def test_multi_epoch_parity_with_batch_recompute(spark, setup):
    src, engine, index, cents = setup

    # epoch 0: initial inserts (two thirds of the corpus)
    engine.apply_batch(spark.createDataFrame(
        [_env(i, "c", _vec(i), i) for i in range(N) if i % 3 != 2],
        CL_SCHEMA), 0)
    out = index.update(spark, src)
    assert out["status"] == "committed" and out["from"] == 0
    _assert_parity(spark, src, index, cents)

    # epoch 1: late inserts + updates that MOVE vectors across cells
    engine.apply_batch(spark.createDataFrame(
        [_env(i, "c", _vec(i), 1_000 + i) for i in range(N) if i % 3 == 2]
        + [_env(i, "u", _vec(i, bump=0.9), 2_000 + i)
           for i in range(N) if i % 3 != 2 and i % 7 == 0],
        CL_SCHEMA), 1)
    out = index.update(spark, src)
    assert out["status"] == "committed" and out["n_changed"] > 0
    _assert_parity(spark, src, index, cents)
    # one row per vector even after reassignment (key-based MERGE replaced
    # the old cell row, it didn't append a second one)
    n_idx = index.store.read_state(spark).count()
    assert n_idx == N

    # epoch 2: deletes retract index rows
    engine.apply_batch(spark.createDataFrame(
        [_env(i, "d", None, 3_000 + i) for i in range(N) if i % 11 == 0],
        CL_SCHEMA), 2)
    index.update(spark, src)
    _assert_parity(spark, src, index, cents)
    remaining = {r["path"] for r in index.store.read_state(spark).collect()}
    assert remaining == {str(i) for i in range(N) if i % 11 != 0}


def test_update_is_idempotent_and_fenced(spark, setup):
    src, engine, index, cents = setup
    engine.apply_batch(spark.createDataFrame(
        [_env(i, "c", _vec(i), i) for i in range(8)], CL_SCHEMA), 0)
    assert index.update(spark, src)["status"] == "committed"
    # no new source version -> noop (writer watermark fences the replay)
    assert index.update(spark, src)["status"] == "noop"
    _assert_parity(spark, src, index, cents)


def test_centroids_frozen_once(spark, setup):
    src, engine, index, cents = setup
    with pytest.raises(ValueError, match="already frozen"):
        index.set_centroids(cents)


def test_update_requires_centroids(spark, tmp_path):
    src = TableStore(str(tmp_path / "src2"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    engine.apply_batch(spark.createDataFrame(
        [_env(0, "c", _vec(0), 0)], CL_SCHEMA), 0)
    bare = IncrementalAnnIndex(str(tmp_path / "idx2"), n_buckets=4)
    with pytest.raises(ValueError, match="no frozen centroids"):
        bare.update(spark, src)


def test_index_registers_as_retention_consumer(spark, setup):
    """After the first advance the index registers on the source, so vacuum
    cannot reap the changefeed versions it still needs."""
    import os

    src, engine, index, cents = setup
    engine.apply_batch(spark.createDataFrame(
        [_env(i, "c", _vec(i), i) for i in range(6)], CL_SCHEMA), 0)
    index.update(spark, src)
    engine.apply_batch(spark.createDataFrame(
        [_env(6, "c", _vec(6), 100)], CL_SCHEMA), 1)
    index.update(spark, src)
    consumer = f"ann-index:{os.path.abspath(index.store.root)}"
    assert consumer in src.consumers()
