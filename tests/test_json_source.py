"""JSON-lines changelog source (S-row extension): the reference's records
ARE JSON (SendProductToKafka.py:43-54 sends JSON values; Kafka Connect's
JsonConverter is the stock wire format), so the engine tails JSON-lines
envelope files with the same exactly-once apply as parquet — explicit
read schema (no inference scan), same trigger semantics, sha-equal state."""

from __future__ import annotations

import hashlib
import os
import shutil

from kp_data_replication_spark.datagen import (
    ChangelogSpec,
    compute_expected_state_pandas,
    write_changelog,
)
from kp_data_replication_spark.schema import CHANGELOG_SCHEMA_EVOLVED
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import (
    CdcApplyEngine,
    EngineConfig,
    final_state,
)


def _to_jsonlines(spark, parquet_dir: str, json_dir: str) -> int:
    """Re-serialize each parquet file-batch as one JSON-lines file, in
    order, preserving the micro-batch boundaries."""
    os.makedirs(json_dir, exist_ok=True)
    files = sorted(
        f for f in os.listdir(parquet_dir) if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        df = spark.read.option("mergeSchema", "true").parquet(
            os.path.join(parquet_dir, f)
        )
        tmp = os.path.join(json_dir, f"_tmp_{i}")
        df.coalesce(1).write.mode("overwrite").json(tmp)
        src = next(x for x in os.listdir(tmp)
                   if x.endswith(".json") and not x.startswith("_"))
        os.replace(os.path.join(tmp, src),
                   os.path.join(json_dir, f"batch_{i:04d}.json"))
        shutil.rmtree(tmp, ignore_errors=True)
    return len(files)


def test_json_changelog_stream_matches_pandas_oracle(spark, tmp_path):
    pq = str(tmp_path / "pq")
    js = str(tmp_path / "js")
    write_changelog(spark, pq, ChangelogSpec(
        n_keys=120, versions_per_key=3, n_partitions=4, files=3
    ))
    n_files = _to_jsonlines(spark, pq, js)
    assert n_files >= 3

    store = TableStore(str(tmp_path / "t"), n_buckets=8)
    q = CdcApplyEngine(store, EngineConfig(metrics=False)).start_stream(
        spark, js, str(tmp_path / "cp"), CHANGELOG_SCHEMA_EVOLVED,
        max_files_per_trigger=2, source_format="json",
    )
    q.awaitTermination()

    exp = compute_expected_state_pandas(pq)
    exp_sha = sorted(
        hashlib.sha256(c.encode()).hexdigest() for c in exp["content"]
    )
    got = final_state(spark, store).select("content_sha").toPandas()
    assert sorted(got["content_sha"]) == exp_sha


def test_unknown_source_format_rejected(spark, tmp_path):
    import pytest

    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(ValueError, match="source_format"):
        CdcApplyEngine(store, EngineConfig(metrics=False)).start_stream(
            spark, str(tmp_path / "log"), str(tmp_path / "cp"),
            CHANGELOG_SCHEMA_EVOLVED, source_format="avro",
        )
