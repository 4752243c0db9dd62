"""Config hot-reload (reference docs/index.md:112-114: `oc apply` rolls MM2
config without stopping replication): the engine re-reads a JSON config
file at the start of every epoch; reloadable overrides (whitelist, DLQ,
compaction, ...) take effect on the NEXT micro-batch of the same running
engine — no restart, no new checkpoint. Identity-bearing fields are
refused."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def _ev(topic, lsn, path, content):
    return Row(partition=0, lsn=lsn, op="c", before=None,
               after=Row(repo="org/r", path=path, commit="c0", lang="py",
                         content=content),
               ts_ms=None, headers=None, source_topic=topic)


def test_whitelist_widens_between_epochs_without_restart(spark, tmp_path):
    cfg_path = str(tmp_path / "engine.json")
    with open(cfg_path, "w") as f:
        json.dump({"whitelist": "^repos$"}, f)
    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(
        store, EngineConfig(metrics=False, config_file=cfg_path)
    )

    # epoch 0: the side topic is filtered out by the current whitelist
    batch0 = spark.createDataFrame(
        [_ev("repos", 0, "a.py", "A"), _ev("repos-side", 1, "s.py", "S")],
        CHANGELOG_SCHEMA,
    )
    engine.apply_batch(batch0, 0)
    state = {r["path"] for r in store.read_state(spark).collect()}
    assert state == {"a.py"}

    # operator rolls the config — SAME engine object, no restart
    with open(cfg_path, "w") as f:
        json.dump({"whitelist": "^repos(-side)?$"}, f)

    # epoch 1: re-delivering the side event now applies (its lsn was never
    # watermarked — lineage only advances on whitelisted events)
    engine.apply_batch(batch0, 1)
    state = {r["path"] for r in store.read_state(spark).collect()}
    assert state == {"a.py", "s.py"}


def test_non_reloadable_keys_warned_and_ignored(spark, tmp_path):
    cfg_path = str(tmp_path / "engine.json")
    with open(cfg_path, "w") as f:
        json.dump({"consumer_group": "evil", "metrics": False,
                   "bogus_key": 1}, f)
    engine = CdcApplyEngine(
        TableStore(str(tmp_path / "t"), n_buckets=4),
        EngineConfig(metrics=True, config_file=cfg_path),
    )
    with pytest.warns(UserWarning, match="non-reloadable"):
        eff = engine._effective_config()
    assert eff.consumer_group == engine.config.consumer_group  # refused
    assert eff.metrics is False  # reloadable override applied


def test_unreadable_config_file_falls_back_to_static(spark, tmp_path):
    cfg_path = str(tmp_path / "engine.json")
    with open(cfg_path, "w") as f:
        f.write("{half written")  # torn write mid-roll
    engine = CdcApplyEngine(
        TableStore(str(tmp_path / "t"), n_buckets=4),
        EngineConfig(metrics=False, config_file=cfg_path),
    )
    assert engine._effective_config() is engine.config
    # and a missing file too
    engine2 = CdcApplyEngine(
        TableStore(str(tmp_path / "t2"), n_buckets=4),
        EngineConfig(metrics=False, config_file=str(tmp_path / "nope.json")),
    )
    assert engine2._effective_config() is engine2.config
