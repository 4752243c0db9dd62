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


def test_dlq_repair_and_replay_closes_the_loop(spark, tmp_path):
    """errors.tolerance second half: quarantine -> operator repairs the
    parquet -> replay_dlq re-sequences past the watermarks and re-routes by
    the (repaired) key -> fixed rows apply, still-broken rows re-quarantine,
    and a second replay of the same repair is fenced."""
    import pyarrow.parquet as pq_mod

    dlq = str(tmp_path / "dlq")
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False, dlq_dir=dlq))

    rows = [
        _ev(0, 0, "c", None, _img("a.py", "A")),            # valid
        _ev(0, 1, "c", None, None),                         # no key -> DLQ
        _ev(1, 0, "x", None, _img("b.py", "B")),            # bad op -> DLQ
    ]
    out = engine.apply_batch(_batch(spark, rows), 0)
    assert out["n_dlq"] == 2

    # ---- operator repair: fix the bad op; leave the keyless row broken ----
    repaired = str(tmp_path / "repaired")
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(os.path.join(dlq, "epoch=0"))
    from pyspark.sql import functions as F

    df.withColumn(
        "op", F.when(F.col("op") == "x", F.lit("c")).otherwise(F.col("op"))
    ).coalesce(1).write.mode("overwrite").parquet(repaired)

    redlq = str(tmp_path / "dlq2")
    out2 = engine.replay_dlq(spark, repaired, new_dlq_dir=redlq)
    assert out2["status"] == "committed"
    assert out2["n_dlq"] == 1  # the still-keyless row re-quarantined

    state = {r["path"]: r["content"] for r in store.read_state(spark).collect()}
    assert state == {"a.py": "A", "b.py": "B"}  # repaired row applied

    # re-submission is at-least-once by design (fresh lsns each run, like
    # re-producing to Kafka); the invariant is VALUE idempotence: the same
    # repair replayed again leaves the state byte-identical
    before = sorted(
        (r["path"], r["content"]) for r in store.read_state(spark).collect()
    )
    out3 = engine.replay_dlq(spark, repaired, new_dlq_dir=redlq)
    assert out3["status"] == "committed"
    after = sorted(
        (r["path"], r["content"]) for r in store.read_state(spark).collect()
    )
    assert after == before and len(after) == 2


def test_default_config_skips_validation(spark, tmp_path):
    """dlq_dir=None trusts the producer: no validation filter in the plan,
    malformed rows are the producer's problem (documented)."""
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    out = engine.apply_batch(
        _batch(spark, [_ev(0, 0, "c", None, _img("a.py", "A"))]), 0
    )
    assert "n_dlq" in out and out["n_dlq"] == 0


def test_replay_without_new_dlq_raises_on_still_malformed(spark, tmp_path):
    """new_dlq_dir=None is the 'repair is done' contract — it must be
    ENFORCED: a still-keyless row would otherwise route to the single
    pmod(hash(null,null)) partition, pass the affinity check, and INSERT a
    (null,null)-keyed bogus row through the full-outer merge. The batch
    must fail before any state is touched."""
    import pytest

    dlq = str(tmp_path / "dlq")
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False, dlq_dir=dlq))
    out = engine.apply_batch(_batch(spark, [
        _ev(0, 0, "c", None, _img("a.py", "A")),
        _ev(0, 1, "c", None, None),          # keyless -> DLQ
    ]), 0)
    assert out["n_dlq"] == 1
    v_before = store.current_version()

    with pytest.raises(ValueError, match="still.*malformed"):
        engine.replay_dlq(spark, os.path.join(dlq, "epoch=0"))

    # no state was touched, and no (null,null) row exists
    assert store.current_version() == v_before
    state = store.read_state(spark)
    assert state.count() == 1
    assert state.filter("repo IS NULL OR path IS NULL").count() == 0


def test_replay_collapses_cross_epoch_duplicate_captures(spark, tmp_path):
    """Null-lsn capture is at-least-once: a producer-level redelivery
    re-quarantines the same unsequenceable rows under a new epoch
    directory. Replay must collapse payload-identical captures to ONE
    event — observable in the lineage's applied-event count."""
    dlq = str(tmp_path / "dlq")
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False, dlq_dir=dlq))

    nullable_lsn = T.StructType([
        T.StructField(f.name, f.dataType, True if f.name == "lsn" else f.nullable)
        for f in CHANGELOG_SCHEMA.fields
    ])
    ghost = _ev(0, None, "c", None, _img("ghost.py", "G"))
    # epoch 0: valid row + unsequenceable row; epoch 1: the producer
    # re-delivers the SAME unsequenceable row
    engine.apply_batch(spark.createDataFrame(
        [_ev(0, 0, "c", None, _img("a.py", "A")), ghost], nullable_lsn), 0)
    engine.apply_batch(spark.createDataFrame([ghost], nullable_lsn), 1)
    assert os.path.isdir(os.path.join(dlq, "epoch=0"))
    assert os.path.isdir(os.path.join(dlq, "epoch=1"))
    # both captures are in the DLQ (at-least-once, bounded by redeliveries)
    assert spark.read.option("mergeSchema", "true").parquet(dlq).count() == 2

    out = engine.replay_dlq(spark, dlq)
    assert out["status"] == "committed"
    state = {r["path"]: r["content"] for r in store.read_state(spark).collect()}
    assert state == {"a.py": "A", "ghost.py": "G"}

    # exactly ONE ghost event was applied: initial a.py (1) + ghost (1)
    n_applied = sum(
        r["n_applied"] or 0 for r in store.read_lineage_rows()
    )
    assert n_applied == 2
