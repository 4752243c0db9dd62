"""Dead-letter queue (Kafka Connect errors.tolerance=all + DLQ topic,
part of the reference's connector stack): malformed envelopes are
quarantined byte-faithfully instead of poisoning the merge; valid events
in the same batch apply normally."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import types as T

from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def _img(path, content):
    return Row(repo="org/r", path=path, commit="c0", lang="py", content=content)


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


def _ev(partition, lsn, op, before, after):
    return Row(partition=partition, lsn=lsn, op=op, before=before, after=after,
               ts_ms=None, headers=None, source_topic="repos")


def test_malformed_envelopes_quarantine_valid_rows_apply(spark, tmp_path):
    dlq = str(tmp_path / "dlq")
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False, dlq_dir=dlq))

    rows = [
        _ev(0, 0, "c", None, _img("a.py", "A")),           # valid
        _ev(0, 1, "c", None, None),                        # no key in either image
        _ev(0, 2, "x", None, _img("b.py", "B")),           # unknown op
        _ev(0, 3, "u", None, _img("a.py", "A2")),          # valid
        _ev(0, 4, "d", None, None),                        # tombstone without key
    ]
    out = engine.apply_batch(_batch(spark, rows), 0)
    assert out["status"] == "committed"
    assert out["n_dlq"] == 3

    state = {r["path"]: r["content"] for r in store.read_state(spark).collect()}
    assert state == {"a.py": "A2"}  # only valid events applied, in lsn order

    # quarantine preserves the malformed envelopes byte-faithfully
    q = spark.read.schema(CHANGELOG_SCHEMA).parquet(os.path.join(dlq, "epoch=0"))
    got = sorted((r["lsn"], r["op"]) for r in q.collect())
    assert got == [(1, "c"), (2, "x"), (4, "d")]

    # the watermark advanced past the quarantined lsns: re-delivering the
    # same batch is a full no-op (repair = re-submission as NEW events)
    out2 = engine.apply_batch(_batch(spark, rows), 1)
    assert out2["keys_changed"] == 0 and out2["n_dlq"] == 0


def test_null_lsn_envelopes_quarantine_not_silently_dropped(spark, tmp_path):
    """Null-lsn envelopes are unsequenceable: the watermark dedup's
    `lsn > watermark` predicate is NULL for them, so they must be split
    from the RAW batch (pre-dedup) or they vanish without reaching the DLQ
    — the errors.tolerance=all contract says capture, not drop."""
    dlq = str(tmp_path / "dlq")
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False, dlq_dir=dlq))

    # a broken producer violates the schema's nullability contract too
    nullable_lsn = T.StructType(
        [
            T.StructField(f.name, f.dataType, True if f.name == "lsn" else f.nullable)
            for f in CHANGELOG_SCHEMA.fields
        ]
    )
    rows = [
        _ev(0, 0, "c", None, _img("a.py", "A")),            # valid
        _ev(0, None, "c", None, _img("ghost.py", "G")),     # null lsn
        _ev(1, None, "u", None, _img("ghost2.py", "G2")),   # null lsn, own partition
        _ev(0, 1, "u", None, _img("a.py", "A2")),           # valid
    ]
    out = engine.apply_batch(spark.createDataFrame(rows, nullable_lsn), 0)
    assert out["status"] == "committed"
    assert out["n_dlq"] == 2

    state = {r["path"]: r["content"] for r in store.read_state(spark).collect()}
    assert state == {"a.py": "A2"}  # null-lsn rows never merged

    q = spark.read.schema(CHANGELOG_SCHEMA).parquet(os.path.join(dlq, "epoch=0"))
    got = sorted((r["partition"], r["path"]) for r in q.select(
        "partition", "after.path").collect())
    assert got == [(0, "ghost.py"), (1, "ghost2.py")]
    # partition 1 carried ONLY a null-lsn row: its watermark must not be
    # created/advanced (nothing sequenceable was applied there)
    lineage = {r["partition"]: r["applied_lsn"] for r in store.read_lineage_rows()}
    assert lineage.get(0) == 1 and 1 not in lineage


def test_clean_batch_writes_no_dlq_files(spark, tmp_path):
    dlq = str(tmp_path / "dlq")
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False, dlq_dir=dlq))
    out = engine.apply_batch(
        _batch(spark, [_ev(0, 0, "c", None, _img("a.py", "A"))]), 0
    )
    assert out["n_dlq"] == 0
    assert not os.path.exists(os.path.join(dlq, "epoch=0"))


def test_default_config_skips_validation(spark, tmp_path):
    """dlq_dir=None trusts the producer: no validation filter in the plan,
    malformed rows are the producer's problem (documented)."""
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    out = engine.apply_batch(
        _batch(spark, [_ev(0, 0, "c", None, _img("a.py", "A"))]), 0
    )
    assert "n_dlq" in out and out["n_dlq"] == 0
