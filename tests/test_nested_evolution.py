"""Nested-struct additive schema evolution, end to end (S6 extended: the
reference's own payloads are NESTED — mirror-maker-2/data/
FreshProductOrder.json:1-9 carries address objects — and Debezium envelopes
evolve nested `after` schemas additively, docs/consideration.md:15-18).

A producer adding `address.geohash` mid-stream must EVOLVE the target's
struct column (old rows null-padded inside the struct), not break the apply
loop; a straggling pre-evolution producer upserting the narrow struct
afterwards must null-pad, never truncate."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kp_data_replication_spark.schema import changelog_schema
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig

ADDR_V1 = T.StructType([
    T.StructField("city", T.StringType(), True),
    T.StructField("zip", T.IntegerType(), True),
])
ADDR_V2 = T.StructType([
    T.StructField("city", T.StringType(), True),
    T.StructField("zip", T.LongType(), True),        # nested leaf widened
    T.StructField("geohash", T.StringType(), True),  # nested field added
])


def _row_schema(addr):
    return T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("address", addr, True),
    ])


def _ev(lsn, op, img):
    return Row(partition=0, lsn=lsn, op=op,
               before=img if op == "d" else None,
               after=None if op == "d" else img,
               ts_ms=None, headers=None, source_topic="repos")


def test_nested_struct_field_appears_mid_stream(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))

    s1 = changelog_schema(_row_schema(ADDR_V1))
    engine.apply_batch(spark.createDataFrame([
        _ev(0, "c", Row(repo="org/r", path="a.py", content="A",
                        address=Row(city="lyon", zip=69001))),
        _ev(1, "c", Row(repo="org/r", path="b.py", content="B",
                        address=None)),
    ], s1), 0)

    # batch 1: the producer's nested schema GREW (geohash added, zip widened)
    s2 = changelog_schema(_row_schema(ADDR_V2))
    engine.apply_batch(spark.createDataFrame([
        _ev(2, "c", Row(repo="org/r", path="c.py", content="C",
                        address=Row(city="paris", zip=75001, geohash="u09t"))),
        _ev(3, "u", Row(repo="org/r", path="a.py", content="A2",
                        address=Row(city="lyon", zip=69002, geohash="u05k"))),
    ], s2), 1)

    # the target's struct column evolved: manifest schema carries the union
    addr_t = next(f for f in store.schema().fields if f.name == "address")
    assert {f.name for f in addr_t.dataType.fields} == {"city", "zip", "geohash"}
    assert addr_t.dataType["zip"].dataType == T.LongType()

    got = {r["path"]: r for r in store.read_state(spark).collect()}
    assert got["a.py"]["content"] == "A2"
    assert got["a.py"]["address"]["geohash"] == "u05k"
    assert got["c.py"]["address"] == Row(city="paris", zip=75001, geohash="u09t")
    # untouched old row: null-padded INSIDE the struct, null struct stays null
    assert got["b.py"]["address"] is None

    # batch 2: a straggling PRE-evolution producer upserts with the narrow
    # struct — null-padded, nothing truncated, apply loop unbroken
    engine.apply_batch(spark.createDataFrame([
        _ev(4, "u", Row(repo="org/r", path="b.py", content="B2",
                        address=Row(city="nice", zip=6000))),
    ], s1), 2)
    got = {r["path"]: r for r in store.read_state(spark).collect()}
    assert got["b.py"]["address"] == Row(city="nice", zip=6000, geohash=None)
    # evolved rows untouched by the narrow-producer batch
    assert got["c.py"]["address"]["geohash"] == "u09t"

    # sha invariant over content unaffected by the evolution
    n = store.read_state(spark).filter(F.col("content").isNull()).count()
    assert n == 0


def test_incompatible_nested_change_still_fails(spark, tmp_path):
    """Evolution is ADDITIVE only: a nested leaf changing kind
    (string -> int) is a breaking change and must raise, not corrupt."""
    import pytest

    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    s1 = changelog_schema(_row_schema(ADDR_V1))
    engine.apply_batch(spark.createDataFrame([
        _ev(0, "c", Row(repo="org/r", path="a.py", content="A",
                        address=Row(city="lyon", zip=69001))),
    ], s1), 0)

    bad_addr = T.StructType([T.StructField("city", T.IntegerType(), True)])
    s_bad = changelog_schema(_row_schema(bad_addr))
    with pytest.raises(ValueError, match="incompatible type change"):
        engine.apply_batch(spark.createDataFrame([
            _ev(1, "u", Row(repo="org/r", path="a.py", content="A2",
                            address=Row(city=1))),
        ], s_bad), 1)


def test_changefeed_across_nested_widening_boundary(spark, tmp_path):
    """table_changes spanning the version where a struct widened must align
    both sides to the union type (old side upcast) and emit only the rows
    that actually changed."""
    from kp_data_replication_spark.operators.changefeed import table_changes

    store = TableStore(str(tmp_path / "t"), n_buckets=2)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    s1 = changelog_schema(_row_schema(ADDR_V1))
    engine.apply_batch(spark.createDataFrame([
        _ev(0, "c", Row(repo="org/r", path="a.py", content="A",
                        address=Row(city="lyon", zip=69001))),
        _ev(1, "c", Row(repo="org/r", path="b.py", content="B",
                        address=Row(city="nice", zip=6000))),
    ], s1), 0)
    v1 = store.current_version()
    s2 = changelog_schema(_row_schema(ADDR_V2))
    engine.apply_batch(spark.createDataFrame([
        _ev(2, "u", Row(repo="org/r", path="a.py", content="A2",
                        address=Row(city="lyon", zip=69002, geohash="u05k"))),
    ], s2), 1)

    ch = table_changes(spark, store, v1).collect()
    by_path = {r["path"]: r for r in ch}
    assert by_path["a.py"]["_change_type"] == "update"
    assert by_path["a.py"]["address"]["geohash"] == "u05k"
    # b.py's bucket may have been rewritten, but its row (upcast to the
    # union type on the old side) compares equal -> no spurious change
    assert "b.py" not in by_path
