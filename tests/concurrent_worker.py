"""Subprocess worker for the cross-process concurrent-writer test.

Spawned as ``python concurrent_worker.py <table_root> <tag> <partition>
<n_batches>`` — a REAL second OS process with its own SparkSession and
its own flock fd, which is the deployment reality the per-table write
lock exists for (two drivers on one host writing one table); the
in-process thread race in test_concurrent_writers.py shares one fd table
and so never exercises inter-process flock blocking.

Each batch inserts one distinct key, so the parent can verify that not a
single batch from either process was lost. Midway the worker also runs a
maintenance op (rewrite_buckets) to race version-advancing maintenance
against the other process's commits.
"""

from __future__ import annotations

import sys
from datetime import datetime, timezone

from pyspark.sql import Row


def main() -> None:
    table_root, tag, partition, n_batches = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    )
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
    from kp_data_replication_spark.session import get_spark
    from kp_data_replication_spark.sources.table_store import (
        ConcurrentWriteError,
        TableStore,
    )
    from kp_data_replication_spark.streaming.apply import (
        CdcApplyEngine,
        EngineConfig,
    )

    spark = get_spark(
        app_name=f"concurrent-writer-{tag}", cpus=2, shuffle_partitions=2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    store = TableStore(table_root, n_buckets=2)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    img = Row(repo="r", path="", commit="c0", lang="py", content="")
    for i in range(n_batches):
        ev = Row(
            partition=partition, lsn=i + 1, op="c",
            before=None,
            after=Row(repo="r", path=f"{tag}-{i}", commit="c0", lang="py",
                      content=f"{tag}-v{i}"),
            ts_ms=datetime(2026, 1, 1, tzinfo=timezone.utc),
            headers=None, source_topic="repos",
        )
        batch = spark.createDataFrame([ev], CHANGELOG_SCHEMA)
        # apply_batch retries ConcurrentWriteError 3x internally; under a
        # hot two-process race that can still exhaust — the operator loop
        # (and Delta/Iceberg clients) retry the whole attempt, so do we
        for attempt in range(10):
            try:
                out = engine.apply_batch(batch, i, writer_id=f"writer-{tag}")
                break
            except ConcurrentWriteError:
                continue
        else:
            print(f"FAIL {tag}: batch {i} never committed", flush=True)
            sys.exit(2)
        assert out["status"] in ("committed", "noop"), out
        if i == n_batches // 2:
            # version-advancing maintenance racing the other writer
            store.rewrite_buckets(spark)
    del img
    print(f"OK {tag}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
