"""Single Message Transform chain (operators/smt.py — the Kafka Connect
`transforms=` surface): compile-time validation (fail at PUT), Connect
per-record semantics through the apply engine (a Filter that drops the
newest record makes the previous one the survivor), tombstone passthrough,
LWW stamp protection, and the one-projection Catalyst plan claim."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kp_data_replication_spark.operators.smt import (
    SmtError,
    apply_smt_chain,
    compile_smt_chain,
)
from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def _img(path, content, lang="py"):
    return Row(repo="org/r", path=path, commit="c0", lang=lang, content=content)


def _ev(partition, lsn, op, before, after):
    return Row(partition=partition, lsn=lsn, op=op, before=before, after=after,
               ts_ms=None, headers=None, source_topic="repos")


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


# --------------------------------------------------------------------- #
# compile-time validation (Connect validates config at PUT)
# --------------------------------------------------------------------- #
def test_compile_rejects_unknown_type_and_protected_columns():
    with pytest.raises(SmtError, match="unknown type"):
        compile_smt_chain([{"type": "NoSuchTransform"}])
    with pytest.raises(SmtError, match="protected"):
        compile_smt_chain([{"type": "MaskField", "fields": ["lsn"]}])
    with pytest.raises(SmtError, match="protected"):
        compile_smt_chain(
            [{"type": "ReplaceField", "renames": {"repo": "repository"}}]
        )
    with pytest.raises(SmtError, match="protected"):
        compile_smt_chain([{"type": "Cast", "spec": {"partition": "long"}}])
    with pytest.raises(SmtError, match="requires param"):
        compile_smt_chain([{"type": "Filter"}])
    # a structurally valid chain compiles without a frame
    assert len(compile_smt_chain(
        [{"type": "Filter", "predicate": "x > 0"},
         {"type": "Cast", "spec": {"x": "long"}}]
    )) == 2


def test_apply_rejects_rename_collision_and_missing_column(spark):
    df = spark.createDataFrame([(1, "a", "b")], "lsn int, x string, y string")
    with pytest.raises(SmtError, match="collides"):
        apply_smt_chain(df, [{"type": "ReplaceField", "renames": {"x": "y"}}])
    with pytest.raises(SmtError, match="no such column"):
        apply_smt_chain(df, [{"type": "MaskField", "fields": ["zz"]}])
    with pytest.raises(SmtError, match="unsupported type"):
        apply_smt_chain(df, [{"type": "Cast", "spec": {"x": "decimal"}}])


# --------------------------------------------------------------------- #
# transform semantics over a plain frame
# --------------------------------------------------------------------- #
def test_field_transforms_roundtrip(spark):
    df = spark.createDataFrame(
        [Row(lsn=7, partition=2, op="u", name="ada", secret="s3cr3t",
             score=3.9)]
    )
    out = apply_smt_chain(df, [
        {"type": "ReplaceField", "renames": {"name": "user_name"},
         "exclude": []},
        {"type": "MaskField", "fields": ["secret"]},          # typed null
        {"type": "InsertField", "static_field": "dc", "static_value": "us-e",
         "offset_field": "kafka_offset", "partition_field": "kafka_part"},
        {"type": "Cast", "spec": {"score": "int"}},
    ])
    r = out.collect()[0]
    assert r["user_name"] == "ada" and "name" not in out.columns
    assert r["secret"] is None and dict(out.dtypes)["secret"] == "string"
    assert (r["dc"], r["kafka_offset"], r["kafka_part"]) == ("us-e", 7, 2)
    assert r["score"] == 3 and dict(out.dtypes)["score"] == "int"


def test_flatten_hoist_extract_and_router(spark):
    df = spark.createDataFrame(
        [Row(lsn=1, partition=0, op="u", source_topic="dc1.orders",
             addr=Row(city="nyc", zip="10001"))]
    )
    flat = apply_smt_chain(df, [{"type": "Flatten", "delimiter": "_"}])
    assert {"addr_city", "addr_zip"} <= set(flat.columns)
    ext = apply_smt_chain(df, [{"type": "ExtractField", "field": "addr.city"}])
    assert ext.collect()[0]["city"] == "nyc"
    routed = apply_smt_chain(
        df, [{"type": "RegexRouter", "regex": r"^dc1\.", "replacement": ""}]
    )
    assert routed.collect()[0]["source_topic"] == "orders"
    hoisted = apply_smt_chain(df, [{"type": "HoistField", "field": "payload"}])
    assert hoisted.collect()[0]["payload"]["addr"]["zip"] == "10001"
    # identity/bookkeeping columns stay top-level, never hoisted
    assert {"lsn", "partition", "op"} <= set(hoisted.columns)


def test_filter_null_predicate_passes_record(spark):
    # Connect Filter drops MATCHING records; a NULL predicate (tombstone
    # with null data columns) does not match, so the record passes
    df = spark.createDataFrame(
        [("d", None), ("u", "drop-me"), ("u", "keep")],
        "op string, content string",
    )
    out = apply_smt_chain(
        df, [{"type": "Filter", "predicate": "content = 'drop-me'"}]
    )
    assert sorted((r["op"], r["content"]) for r in out.collect()) == [
        ("d", None), ("u", "keep"),
    ]


def test_pure_projection_chain_fuses_into_one_project(spark):
    """The scale claim: an N-step value-transform chain collapses to ONE
    Project in the optimized plan — per-record cost is a single fused
    whole-stage-codegen expression, independent of chain length."""
    df = spark.range(10).select(
        F.col("id").alias("lsn"), F.lit("u").alias("op"),
        F.lit(0).alias("partition"), F.lit("x").alias("payload"),
        F.lit(1.5).alias("score"),
    )
    out = apply_smt_chain(df, [
        {"type": "ReplaceField", "renames": {"payload": "body"}},
        {"type": "MaskField", "fields": ["body"], "replacement": "*"},
        {"type": "InsertField", "static_field": "dc", "static_value": "a"},
        {"type": "Cast", "spec": {"score": "long"}},
    ])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") == 1


# --------------------------------------------------------------------- #
# through the engine: per-record pre-compaction (Connect semantics)
# --------------------------------------------------------------------- #
def test_engine_chain_transforms_target_table(spark, tmp_path):
    chain = [
        {"type": "Filter", "predicate": "lang = 'java'"},
        {"type": "ReplaceField", "renames": {"lang": "language"}},
        {"type": "InsertField", "static_field": "origin", "static_value": "dc1"},
    ]
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False, smt_chain=chain))
    rows = [
        _ev(0, 0, "c", None, _img("a.py", "A", "py")),
        _ev(0, 1, "c", None, _img("b.java", "B", "java")),  # dropped
        _ev(1, 0, "c", None, _img("c.md", "C", "md")),
    ]
    engine.apply_batch(_batch(spark, rows), 0)
    state = {r["path"]: r for r in store.read_state(spark).collect()}
    assert set(state) == {"a.py", "c.md"}
    assert state["a.py"]["language"] == "py"
    assert state["a.py"]["origin"] == "dc1"
    assert "lang" not in store.schema().fieldNames()


def test_filtered_newest_record_yields_previous_survivor(spark, tmp_path):
    """Connect runs SMTs per record BEFORE log compaction: if the newest
    image for a key matches the Filter, the prior image is the survivor —
    the chain must run pre-compaction, not on last-write winners."""
    chain = [{"type": "Filter", "predicate": "content = 'POISON'"}]
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False, smt_chain=chain))
    rows = [
        _ev(0, 0, "c", None, _img("k.py", "v1")),
        _ev(0, 1, "u", _img("k.py", "v1"), _img("k.py", "POISON")),
    ]
    engine.apply_batch(_batch(spark, rows), 0)
    state = store.read_state(spark).collect()
    assert len(state) == 1 and state[0]["content"] == "v1"
    # the watermark advances to the max APPLIED lsn (0); the filtered
    # record above it is simply re-dropped by the chain on redelivery —
    # idempotent either way, state converges to v1
    marks = {r["partition"]: r["applied_lsn"]
             for r in store.read_lineage_rows()}
    assert marks[0] == 0


def test_tombstone_passes_data_column_filter_and_deletes(spark, tmp_path):
    chain = [{"type": "Filter", "predicate": "content = 'POISON'"}]
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False, smt_chain=chain))
    engine.apply_batch(
        _batch(spark, [_ev(0, 0, "c", None, _img("k.py", "v1"))]), 0
    )
    # delete envelope: null after image -> null predicate -> passes -> applies
    engine.apply_batch(
        _batch(spark, [_ev(0, 1, "d", _img("k.py", "v1"), None)]), 1
    )
    assert store.read_state(spark).count() == 0


def test_lww_stamp_columns_are_fenced(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(
        store,
        EngineConfig(
            metrics=False, conflict_policy="lww", cluster_id="dc1",
            smt_chain=[{"type": "ReplaceField", "exclude": ["_lww_ts"]}],
        ),
    )
    rows = [_ev(0, 0, "c", None, _img("a.py", "A"))]
    with pytest.raises(SmtError, match="conflict-stamp"):
        engine.apply_batch(_batch(spark, rows), 0)
    # nothing committed
    assert store.current_version() == 0


def test_stream_start_validates_chain(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(
        store,
        EngineConfig(metrics=False,
                     smt_chain=[{"type": "MaskField", "fields": ["op"]}]),
    )
    with pytest.raises(SmtError, match="protected"):
        engine.start_stream(
            spark, str(tmp_path / "log"), str(tmp_path / "cp"),
            CHANGELOG_SCHEMA,
        )


# --------------------------------------------------------------------- #
# per-record `when` guards (Connect KIP-585 predicates)
# --------------------------------------------------------------------- #
def test_when_guard_applies_value_transforms_per_record(spark):
    df = spark.createDataFrame(
        [Row(lsn=0, partition=0, op="u", kind="pii", email="a@x.io"),
         Row(lsn=1, partition=0, op="u", kind="public", email="b@x.io"),
         Row(lsn=2, partition=0, op="u", kind=None, email="c@x.io")]
    )
    out = apply_smt_chain(df, [
        {"type": "MaskField", "fields": ["email"], "replacement": "***",
         "when": "kind = 'pii'"},
        {"type": "InsertField", "static_field": "flagged",
         "static_value": True, "when": "kind = 'pii'"},
        {"type": "RegexRouter", "field": "email", "regex": "@x.io",
         "replacement": "@y.io", "when": "kind = 'public'"},
    ])
    got = {r["lsn"]: (r["email"], r["flagged"]) for r in out.collect()}
    assert got[0] == ("***", True)          # matched: masked + flagged
    assert got[1] == ("b@y.io", None)       # unmatched mask, matched router
    assert got[2] == ("c@x.io", None)       # NULL predicate -> untouched


def test_when_guard_negation_and_structural_refusal(spark):
    df = spark.createDataFrame([Row(lsn=0, partition=0, op="u", v="x")])
    out = apply_smt_chain(df, [
        {"type": "MaskField", "fields": ["v"], "replacement": "-",
         "when": "op = 'd'", "negate_when": True},
    ])
    assert out.collect()[0]["v"] == "-"     # negated non-match applies
    # structural transforms cannot vary per record
    with pytest.raises(SmtError, match="cannot take a 'when' guard"):
        compile_smt_chain([{"type": "ReplaceField",
                            "renames": {"a": "b"}, "when": "op = 'u'"}])
    with pytest.raises(SmtError, match="cannot take a 'when' guard"):
        compile_smt_chain([{"type": "Cast", "spec": {"v": "int"},
                            "when": "op = 'u'"}])
