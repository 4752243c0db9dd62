"""Content normalization through the engine: unicode NFC + CRLF->LF run as
an Arrow-vectorized UDF on the compacted winners (after the cache point, so
the stats job never pays the Python round-trip), and nulls pass through."""

from __future__ import annotations

import unicodedata

from pyspark.sql import Row

from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def _batch(spark):
    def img(path, content):
        return Row(repo="org/r", path=path, commit="c0", lang="py", content=content)

    decomposed = "cafe\u0301 du monde"   # e + combining acute (NFD)
    rows = [
        Row(partition=0, lsn=0, op="c", before=None,
            after=img("ascii.py", "plain ascii\r\nwith crlf\r\n"),
            ts_ms=None, headers=None, source_topic="repos"),
        Row(partition=0, lsn=1, op="c", before=None,
            after=img("uni.py", decomposed + "\r\n"),
            ts_ms=None, headers=None, source_topic="repos"),
        Row(partition=0, lsn=2, op="c", before=None,
            after=img("none.py", None),
            ts_ms=None, headers=None, source_topic="repos"),
    ]
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


def test_engine_normalizes_nfc_and_crlf(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    assert engine.apply_batch(_batch(spark), 0)["status"] == "committed"
    state = {r["path"]: r["content"] for r in store.read_state(spark).collect()}
    assert state["ascii.py"] == "plain ascii\nwith crlf\n"
    assert state["uni.py"] == unicodedata.normalize("NFC", "cafe\u0301 du monde") + "\n"
    assert "́" not in state["uni.py"]     # composed, not combining
    assert state["none.py"] is None


def test_normalize_off_preserves_raw_bytes(spark, tmp_path):
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False, normalize=False))
    assert engine.apply_batch(_batch(spark), 0)["status"] == "committed"
    state = {r["path"]: r["content"] for r in store.read_state(spark).collect()}
    assert state["ascii.py"] == "plain ascii\r\nwith crlf\r\n"
    assert "́" in state["uni.py"]         # still decomposed
