"""spark-submit entry point (SURVEY.md §3.1 lifecycle; north_rule deployment).

Usage on a cluster:
    python tools/package_pyfiles.py                      # -> dist/kp_data_replication_spark.zip
    spark-submit --master <cluster-url> \\
        --py-files dist/kp_data_replication_spark.zip \\
        jobs/replay_job.py <changelog_dir> <target_dir> [checkpoint_dir]

With a checkpoint dir the job runs the continuous-tail mode (drains available
input, resumable); without it, a one-epoch batch replay. The session is built
WITHOUT a master so spark-submit's --master/--conf control deployment —
the same engine code runs on local[N] or a 1000-executor cluster.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from kp_data_replication_spark.schema import CHANGELOG_SCHEMA_EVOLVED
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig


def main() -> None:
    changelog, target = sys.argv[1], sys.argv[2]
    checkpoint = sys.argv[3] if len(sys.argv) > 3 else None

    spark = (
        SparkSession.builder.appName("kp-cdc-replay")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    engine = CdcApplyEngine(TableStore(target, n_buckets=64), EngineConfig())
    if checkpoint:
        q = engine.start_stream(
            spark, changelog, checkpoint, CHANGELOG_SCHEMA_EVOLVED,
            max_files_per_trigger=16,
        )
        q.awaitTermination()
        out = {"mode": "stream", "epoch": engine.store.current_epoch()}
    else:
        out = {"mode": "batch", **{k: v for k, v in engine.replay_batch(spark, changelog).items()
                                   if k != "phases"}}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
