"""Write-audit-publish (Iceberg WAP analogue): stage a version without
moving the pointer, audit the exact staged bytes, publish with one swap
or abort without a trace."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kp_data_replication_spark.schema import ROW_SCHEMA
from kp_data_replication_spark.sources.table_store import (
    BUCKET_COL,
    TableStore,
    bucket_expr,
)


def _corpus(spark, n, tag="c0"):
    return spark.range(n).select(
        F.lit("corpus").alias("repo"),
        F.col("id").cast("string").alias("path"),
        F.lit(tag).alias("commit"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("content"),
    )


def _commit(store, df, epoch, publish=True):
    return store.commit(
        df.withColumn(BUCKET_COL, bucket_expr(store.n_buckets)),
        list(range(store.n_buckets)),
        [],
        epoch=epoch,
        row_schema=ROW_SCHEMA,
        publish=publish,
    )


def test_wap_stage_audit_publish(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    _commit(store, _corpus(spark, 50), 1)
    v1 = store.current_version()

    sv = _commit(store, _corpus(spark, 80, tag="c1"), 2, publish=False)
    # readers are untouched: the pointer still serves v1
    assert store.current_version() == v1
    assert store.read_state(spark).count() == 50
    assert store.staged_version() == sv

    # the audit reads the exact staged bytes
    staged = store.read_staged(spark)
    assert staged.count() == 80
    assert staged.filter(F.col("commit") == "c1").count() == 80

    # audit passed -> one pointer swap exposes those bytes
    assert store.publish_staged() == sv
    assert store.current_version() == sv
    assert store.read_state(spark).count() == 80
    assert store.staged_version() is None


def test_wap_abort_leaves_no_trace_and_allows_recommit(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    _commit(store, _corpus(spark, 30), 1)
    v1 = store.current_version()

    _commit(store, _corpus(spark, 10, tag="bad"), 2, publish=False)
    store.abort_staged()
    assert store.staged_version() is None
    assert store.current_version() == v1
    with pytest.raises(FileNotFoundError):
        store.manifest(v1 + 1)  # staged manifest gone

    # the SAME epoch re-commits the corrected batch (the writer map never
    # activated for the aborted stage)
    _commit(store, _corpus(spark, 40, tag="fixed"), 2)
    assert store.read_state(spark).count() == 40
    assert store.read_state(spark).filter(F.col("commit") == "fixed").count() == 40


def test_wap_pending_blocks_commit_and_vacuum(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    _commit(store, _corpus(spark, 20), 1)
    _commit(store, _corpus(spark, 25, tag="c1"), 2, publish=False)

    with pytest.raises(ValueError, match="staged"):
        _commit(store, _corpus(spark, 30, tag="c2"), 3)
    with pytest.raises(ValueError, match="staged"):
        store.vacuum(keep_versions=1)

    # publish unblocks both
    store.publish_staged()
    _commit(store, _corpus(spark, 30, tag="c2"), 3)
    assert store.read_state(spark).count() == 30
    store.vacuum(keep_versions=1)


def test_wap_time_travel_and_changefeed_after_publish(spark, tmp_path):
    """A published staged version behaves like any committed version:
    time travel reaches the pre-publish state, the changefeed diffs
    across the publish."""
    from kp_data_replication_spark.operators.changefeed import table_changes

    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    _commit(store, _corpus(spark, 20), 1)
    v1 = store.current_version()
    _commit(store, _corpus(spark, 20, tag="c1"), 2, publish=False)
    v2 = store.publish_staged()

    assert store.read_state(spark, version=v1).filter(
        F.col("commit") == "c0").count() == 20
    ch = table_changes(spark, store, v1, v2)
    assert ch.count() == 20  # every row's commit column changed
