"""CHECK-constraint enforcement (operators/constraints.py — the Delta
ADD CONSTRAINT / semantic errors.tolerance analogue): table-persisted and
flow-level rules gate UPSERT images at apply time; violations quarantine
to the DLQ with rule names in headers, or fail the batch strictly with no
DLQ configured. ANSI semantics: FALSE violates, NULL passes, deletes are
exempt."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kp_data_replication_spark.operators.constraints import (
    VIOLATED_HEADER,
    ConstraintViolationError,
    check_constraints,
    violation_counts,
)
from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def _img(path, content, lang="py"):
    return Row(repo="org/r", path=path, commit="c0", lang=lang, content=content)


def _ev(partition, lsn, op, before, after, headers=None):
    return Row(partition=partition, lsn=lsn, op=op, before=before, after=after,
               ts_ms=None, headers=headers, source_topic="repos")


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


RULES = {
    "content_nonempty": "content IS NOT NULL AND length(content) > 0",
    "known_lang": "lang IN ('py', 'md', 'rs')",
}


# --------------------------------------------------------------------- #
# expression semantics (ANSI CHECK: FALSE violates, NULL passes)
# --------------------------------------------------------------------- #
def test_violation_semantics_null_passes_false_violates(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", -1), (None, None)], "name string, stars int"
    )
    rules = {"nonneg": "stars >= 0", "named": "length(name) > 0"}
    got = {
        r["name"]: sorted(r["_violations"])
        for r in check_constraints(df, rules).collect()
    }
    assert got["a"] == []
    assert got["b"] == ["nonneg"]
    # NULL evaluates to unknown -> passes (ANSI CHECK), on BOTH rules
    assert got[None] == []

    counts = {
        r["rule"]: r["n_violations"]
        for r in violation_counts(df, rules).collect()
    }
    assert counts == {"nonneg": 1}


# --------------------------------------------------------------------- #
# strict mode: no DLQ -> the batch fails before any state is written
# --------------------------------------------------------------------- #
def test_strict_mode_fails_batch_before_state(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(
        store, EngineConfig(metrics=False, check_constraints=RULES)
    )
    rows = [
        _ev(0, 0, "c", None, _img("a.py", "A")),
        _ev(0, 1, "c", None, _img("bad.py", "")),        # empty content
        _ev(0, 2, "c", None, _img("b.cpp", "B", "cpp")),  # unknown lang
    ]
    with pytest.raises(ConstraintViolationError) as ei:
        engine.apply_batch(_batch(spark, rows), 0)
    assert ei.value.counts == {"content_nonempty": 1, "known_lang": 1}
    # nothing committed: no version, no writer epoch, no state
    assert store.current_version() == 0
    assert store.writer_epoch("default") == -1

    # the clean prefix applies once the offending rows are gone
    out = engine.apply_batch(_batch(spark, rows[:1]), 0)
    assert out["status"] == "committed"
    state = {r["path"] for r in store.read_state(spark).collect()}
    assert state == {"a.py"}


# --------------------------------------------------------------------- #
# DLQ mode: violations quarantine with rule names in headers
# --------------------------------------------------------------------- #
def test_violations_quarantine_to_dlq_with_rule_names(spark, tmp_path):
    dlq = str(tmp_path / "dlq")
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(
        store,
        EngineConfig(metrics=False, dlq_dir=dlq, check_constraints=RULES),
    )
    rows = [
        _ev(0, 0, "c", None, _img("a.py", "A")),
        _ev(0, 1, "c", None, _img("bad.py", ""), headers={"k": "v"}),
        _ev(1, 0, "c", None, _img("b.cpp", "", "cpp")),  # violates BOTH
        _ev(1, 1, "c", None, None),                      # structurally malformed
    ]
    out = engine.apply_batch(_batch(spark, rows), 0)
    assert out["status"] == "committed"
    assert out["n_dlq"] == 3
    state = {r["path"] for r in store.read_state(spark).collect()}
    assert state == {"a.py"}

    q = spark.read.parquet(os.path.join(dlq, "epoch=0"))
    by_key = {(r["partition"], r["lsn"]): r["headers"] for r in q.collect()}
    assert set(by_key) == {(0, 1), (1, 0), (1, 1)}
    # failing rule names recorded; pre-existing headers preserved
    assert by_key[(0, 1)][VIOLATED_HEADER] == "content_nonempty"
    assert by_key[(0, 1)]["k"] == "v"
    assert by_key[(1, 0)][VIOLATED_HEADER] == "content_nonempty,known_lang"
    # the structural reject carries no constraint stamp
    assert not (by_key[(1, 1)] or {}).get(VIOLATED_HEADER)

    # watermark advanced past the quarantined lsns: redelivery is a no-op
    out2 = engine.apply_batch(_batch(spark, rows), 1)
    assert out2["keys_changed"] == 0 and out2["n_dlq"] == 0


def test_tombstones_exempt_from_constraints(spark, tmp_path):
    """A delete's after image is null by construction — `content IS NOT
    NULL` must not quarantine the tombstone (constraints gate incoming
    values, not removals — Delta semantics)."""
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(
        store, EngineConfig(metrics=False, check_constraints=RULES)
    )
    engine.apply_batch(
        _batch(spark, [_ev(0, 0, "c", None, _img("a.py", "A"))]), 0
    )
    out = engine.apply_batch(
        _batch(spark, [_ev(0, 1, "d", _img("a.py", None), None)]), 1
    )
    assert out["status"] == "committed"
    assert store.read_state(spark).count() == 0


# --------------------------------------------------------------------- #
# table-persisted constraints bind every writer (mechanism, not config)
# --------------------------------------------------------------------- #
def test_table_constraints_bind_writers_without_flow_config(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    store.add_constraint("content_nonempty", RULES["content_nonempty"])
    # an engine configured with NO constraints still enforces the table's
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    with pytest.raises(ConstraintViolationError):
        engine.apply_batch(
            _batch(spark, [_ev(0, 0, "c", None, _img("bad.py", ""))]), 0
        )
    # flow config WINS a name collision (here: relaxes the table rule)
    relaxed = CdcApplyEngine(
        store,
        EngineConfig(
            metrics=False,
            check_constraints={"content_nonempty": "content IS NOT NULL"},
        ),
    )
    out = relaxed.apply_batch(
        _batch(spark, [_ev(0, 0, "c", None, _img("bad.py", ""))]), 0
    )
    assert out["status"] == "committed"


def test_constraint_registry_add_list_drop(tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    assert store.constraints() == {}
    store.add_constraint("a", "x > 0")
    store.add_constraint("b/slash name", "y > 0")  # filesystem-hostile name
    assert store.constraints() == {"a": "x > 0", "b/slash name": "y > 0"}
    store.add_constraint("a", "x >= 0")  # idempotent overwrite on the name
    assert store.constraints()["a"] == "x >= 0"
    assert store.drop_constraint("a") is True
    assert store.drop_constraint("a") is False
    assert store.constraints() == {"b/slash name": "y > 0"}


# --------------------------------------------------------------------- #
# the repair loop: replayed rows re-face the same constraints
# --------------------------------------------------------------------- #
def test_replay_requarantines_still_violating_rows(spark, tmp_path):
    dlq = str(tmp_path / "dlq")
    dlq2 = str(tmp_path / "dlq2")
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(
        store,
        EngineConfig(metrics=False, dlq_dir=dlq, check_constraints=RULES),
    )
    rows = [
        _ev(0, 0, "c", None, _img("a.py", "A")),
        _ev(0, 1, "c", None, _img("bad.py", "")),
    ]
    engine.apply_batch(_batch(spark, rows), 0)

    # "repair" that fixes nothing: the replayed row violates again and
    # must land in the NEW dlq, not in table state
    out = engine.replay_dlq(spark, dlq, new_dlq_dir=dlq2)
    assert out["n_dlq"] == 1
    state = {r["path"] for r in store.read_state(spark).collect()}
    assert state == {"a.py"}
    q = spark.read.parquet(dlq2)
    assert [r["headers"][VIOLATED_HEADER] for r in q.collect()] == [
        "content_nonempty"
    ]

    # a real repair: rewrite the quarantined parquet with valid content,
    # then replay cleanly (terminal state: no dlq rows, row applied)
    fixed = (
        spark.read.parquet(dlq2)
        .withColumn(
            "after",
            F.col("after").withField("content", F.lit("FIXED")),
        )
    )
    dlq3 = str(tmp_path / "dlq3")
    fixed.write.mode("overwrite").parquet(dlq3)
    out2 = engine.replay_dlq(spark, dlq3, new_dlq_dir=str(tmp_path / "dlq4"))
    assert out2["n_dlq"] == 0
    state = {
        r["path"]: r["content"] for r in store.read_state(spark).collect()
    }
    assert state == {"a.py": "A", "bad.py": "FIXED"}
