"""Type-widening schema evolution (S6 extension): a source column whose
type grows (int -> long, float -> double) promotes the target column as
metadata; old parquet files are read through the widened schema without a
rewrite (Spark's parquet reader upcasts int32 pages into a bigint read
schema natively). Non-widening type changes are breaking and must raise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kp_data_replication_spark.operators.merge import (
    merge_upsert,
    widen_fields,
    widen_type,
)
from kp_data_replication_spark.schema import ROW_FIELDS, changelog_schema
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig

FAST = EngineConfig(metrics=False)


def test_widen_type_lattice():
    i, l, f, d = T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType()
    s, b = T.ShortType(), T.ByteType()
    assert widen_type(i, l) == l and widen_type(l, i) == l
    assert widen_type(b, s) == s and widen_type(s, i) == i
    assert widen_type(f, d) == d and widen_type(d, f) == d
    assert widen_type(i, d) == d and widen_type(s, f) == d
    assert widen_type(i, i) == i
    # lossy or incompatible -> None
    assert widen_type(l, d) is None and widen_type(l, f) is None
    assert widen_type(T.StringType(), i) is None
    assert widen_type(T.BooleanType(), i) is None


def test_widen_fields_union_and_breaking_change():
    stored = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("n", T.IntegerType())]
    )
    widened = widen_fields(
        stored,
        [T.StructField("n", T.LongType()), T.StructField("extra", T.StringType())],
    )
    assert [(f.name, f.dataType) for f in widened.fields] == [
        ("k", T.StringType()), ("n", T.LongType()), ("extra", T.StringType()),
    ]
    with pytest.raises(ValueError, match="not a widening"):
        widen_fields(stored, [T.StructField("n", T.StringType())])


def test_merge_upsert_widens_target_column(spark):
    target = spark.createDataFrame(
        [("r", "a", 1), ("r", "b", 2)], "repo string, path string, n int"
    )
    batch = spark.createDataFrame(
        [("r", "b", "u", 5_000_000_000), ("r", "c", "c", 7)],
        "repo string, path string, op string, n long",
    )
    out = merge_upsert(target, batch)
    assert dict(out.dtypes)["n"] == "bigint"
    got = {(r["repo"], r["path"]): r["n"] for r in out.collect()}
    assert got == {("r", "a"): 1, ("r", "b"): 5_000_000_000, ("r", "c"): 7}


def _mk_batch(spark, rows, stars_type):
    row_schema = T.StructType(
        ROW_FIELDS + [T.StructField("stars", stars_type, True)]
    )
    return spark.createDataFrame(rows, changelog_schema(row_schema))


def test_engine_widens_stars_without_rewriting_old_files(spark, tmp_path):
    """Epoch 0 writes stars as INT; epoch 1's source evolved stars to LONG.
    The manifest schema widens, epoch-0 files stay byte-identical on disk,
    and both epochs' rows read back with exact values."""
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, FAST)

    def img(path, content, stars):
        return Row(repo="org/r", path=path, commit="c0", lang="py",
                   content=content, stars=stars)

    b0 = _mk_batch(
        spark,
        [Row(partition=0, lsn=0, op="c", before=None,
             after=img("a.py", "A", 10), ts_ms=None, headers=None,
             source_topic="repos"),
         Row(partition=0, lsn=1, op="c", before=None,
             after=img("b.py", "B", 20), ts_ms=None, headers=None,
             source_topic="repos")],
        T.IntegerType(),
    )
    assert engine.apply_batch(b0, 0)["status"] == "committed"
    assert dict(store.read_state(spark).dtypes)["stars"] == "int"
    import os

    old_files = {
        p: os.path.getmtime(os.path.join(store.root, p))
        for fl in store.current_manifest()["buckets"].values() for p in fl
    }

    big = 5_000_000_000  # does not fit int32
    b1 = _mk_batch(
        spark,
        [Row(partition=0, lsn=2, op="u", before=None,
             after=img("b.py", "B2", big), ts_ms=None, headers=None,
             source_topic="repos"),
         Row(partition=1, lsn=0, op="c", before=None,
             after=img("c.py", "C", 30), ts_ms=None, headers=None,
             source_topic="repos")],
        T.LongType(),
    )
    assert engine.apply_batch(b1, 1)["status"] == "committed"

    state = store.read_state(spark)
    assert dict(state.dtypes)["stars"] == "bigint"
    got = {r["path"]: (r["content"], r["stars"]) for r in state.collect()}
    assert got == {"a.py": ("A", 10), "b.py": ("B2", big), "c.py": ("C", 30)}

    # files of untouched epoch-0 buckets were not rewritten (widening is
    # metadata-only; dirty-bucket CoW still rewrites the buckets b1 touched)
    dirty_b1 = {  # buckets the second batch touched
        r["_b"] for r in b1.select(
            F.pmod(F.hash("after.repo", "after.path"), F.lit(4)).alias("_b")
        ).collect()
    }
    m2 = store.current_manifest()
    for b, fl in m2["buckets"].items():
        if int(b) not in dirty_b1:
            for p in fl:
                assert old_files.get(p) is not None, "untouched bucket re-pointed"

    # a narrow-typed straggler batch (old producer) still applies cleanly
    b2 = _mk_batch(
        spark,
        [Row(partition=2, lsn=0, op="c", before=None,
             after=img("d.py", "D", 40), ts_ms=None, headers=None,
             source_topic="repos")],
        T.IntegerType(),
    )
    assert engine.apply_batch(b2, 2)["status"] == "committed"
    state = store.read_state(spark)
    assert dict(state.dtypes)["stars"] == "bigint"
    assert state.count() == 4


def test_engine_rejects_breaking_type_change(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=2)
    engine = CdcApplyEngine(store, FAST)

    def batch(stars_type, val):
        return _mk_batch(
            spark,
            [Row(partition=0, lsn=0, op="c", before=None,
                 after=Row(repo="r", path="p", commit="c", lang="py",
                           content="x", stars=val),
                 ts_ms=None, headers=None, source_topic="repos")],
            stars_type,
        )

    assert engine.apply_batch(batch(T.LongType(), 1), 0)["status"] == "committed"
    with pytest.raises(Exception, match="not a widening|incompatible"):
        engine.apply_batch(batch(T.StringType(), "oops"), 1)
