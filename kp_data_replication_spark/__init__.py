"""kp_data_replication_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch Structured-Streaming rebuild of the replication semantics of
jbcodeforce/kp-data-replication (MirrorMaker 2 change-log replication): an
ordered, partitioned, keyed change-event log is continuously tailed and applied
to a target table with exactly-once commits, per-partition offset (LSN) dedup,
additive schema evolution, and per-partition throughput/lag metrics.

Reference semantics (see /root/reference, cited per-module):
  * partitioned ordered keyed log        -> docs/index.md:17-52
  * per-partition ordering contract      -> docs/consideration.md:20
  * offset checkpointing / translation   -> docs/consideration.md:37-48
  * at-least-once duplicates masked      -> docs/consideration.md:52-62
  * exactly-once via atomic commit       -> docs/consideration.md:62
  * additive topic-config/schema sync    -> docs/consideration.md:13-24

Everything is pyspark.sql DataFrame + vectorized pandas/Arrow UDFs; no RDDs,
no per-row Python UDFs.
"""

__version__ = "0.1.0"
