"""Schema-change policy at the target (`EngineConfig.schema_policy` — the
Kafka Connect sink auto.evolve analogue; the reference's default contract
is docs/consideration.md:13-18, i.e. "evolve"):

  evolve  — additive union + widening (default; covered by the evolution
            suites)
  project — auto.evolve=false: unknown batch columns dropped, the target
            schema never changes; type changes still refused
  freeze  — any schema difference fails the batch before any state write
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from kp_data_replication_spark.schema import changelog_schema
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import (
    CdcApplyEngine,
    EngineConfig,
    SchemaPolicyError,
)

V1 = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("content", T.StringType(), True),
])
V2 = T.StructType(  # producer added a column
    V1.fields + [T.StructField("stars", T.IntegerType(), True)]
)
V_TYPECHANGE = T.StructType([  # producer widened content's type... to int
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("content", T.IntegerType(), True),
])


def _ev(lsn, img):
    return Row(partition=0, lsn=lsn, op="c", before=None, after=img,
               ts_ms=None, headers=None, source_topic="repos")


def _seed(spark, store):
    eng = CdcApplyEngine(store, EngineConfig(metrics=False))
    eng.apply_batch(spark.createDataFrame(
        [_ev(0, Row(repo="org/r", path="a.py", content="A"))],
        changelog_schema(V1)), 0)


def test_freeze_refuses_new_column_before_any_state(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, store)
    v_before = store.current_version()
    eng = CdcApplyEngine(
        store, EngineConfig(metrics=False, schema_policy="freeze")
    )
    grown = spark.createDataFrame(
        [_ev(1, Row(repo="org/r", path="b.py", content="B", stars=5))],
        changelog_schema(V2))
    with pytest.raises(SchemaPolicyError, match="stars"):
        eng.apply_batch(grown, 1)
    assert store.current_version() == v_before  # nothing written

    # a same-schema batch still applies under freeze
    out = eng.apply_batch(spark.createDataFrame(
        [_ev(1, Row(repo="org/r", path="b.py", content="B"))],
        changelog_schema(V1)), 1)
    assert out["status"] == "committed"


def test_project_drops_unknown_columns_schema_never_changes(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, store)
    eng = CdcApplyEngine(
        store, EngineConfig(metrics=False, schema_policy="project")
    )
    grown = spark.createDataFrame(
        [_ev(1, Row(repo="org/r", path="b.py", content="B", stars=5)),
         _ev(2, Row(repo="org/r", path="a.py", content="A2", stars=1))],
        changelog_schema(V2))
    out = eng.apply_batch(grown, 1)
    assert out["status"] == "committed"
    # known fields applied; the unknown column never reached the table
    assert [f.name for f in store.schema().fields] == [
        "repo", "path", "content"
    ]
    state = {
        r["path"]: r["content"] for r in store.read_state(spark).collect()
    }
    assert state == {"a.py": "A2", "b.py": "B"}


@pytest.mark.parametrize("policy", ["freeze", "project"])
def test_type_change_refused_under_both_strict_policies(
    spark, tmp_path, policy
):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    _seed(spark, store)
    eng = CdcApplyEngine(
        store, EngineConfig(metrics=False, schema_policy=policy)
    )
    changed = spark.createDataFrame(
        [_ev(1, Row(repo="org/r", path="b.py", content=7))],
        changelog_schema(V_TYPECHANGE))
    with pytest.raises(SchemaPolicyError, match="content"):
        eng.apply_batch(changed, 1)


def test_first_commit_defines_the_table_under_freeze(spark, tmp_path):
    """An empty table has no schema to freeze — batch 0 defines it (same
    as CREATE TABLE), and batch 1 is then held to it."""
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    eng = CdcApplyEngine(
        store, EngineConfig(metrics=False, schema_policy="freeze")
    )
    out = eng.apply_batch(spark.createDataFrame(
        [_ev(0, Row(repo="org/r", path="a.py", content="A", stars=3))],
        changelog_schema(V2)), 0)
    assert out["status"] == "committed"
    assert [f.name for f in store.schema().fields] == [
        "repo", "path", "content", "stars"
    ]
    with pytest.raises(SchemaPolicyError, match="lang"):
        eng.apply_batch(spark.createDataFrame(
            [_ev(1, Row(repo="org/r", path="b.py", content="B", stars=1,
                        lang="py"))],
            changelog_schema(T.StructType(
                V2.fields + [T.StructField("lang", T.StringType(), True)]
            ))), 1)
