"""Canonical schemas for the CDC engine.

The data model re-expresses the reference's partitioned/ordered/keyed record
log (reference: docs/index.md:17-52, record shape mirror-maker-2/
SendProductToKafka.py:43-54 — key, JSON value, timestamp, headers;
docs/es-to-local.md:11 — headers replicate too) as typed Spark rows:

  * ROW_FIELDS            — the replicated table of source-code repositories
                            (BASELINE input_hint): (repo, path, commit, lang,
                            content); primary key (repo, path).
  * changelog             — Debezium-style envelope: op c|u|d, before/after
                            images, per-partition monotone lsn (the Kafka
                            offset analogue, docs/consideration.md:46),
                            event-time ts_ms, headers, source_topic.
  * lineage               — per-partition applied-offset watermark + epoch
                            (the mm2-offsets / checkpoints.internal analogue,
                            docs/index.md:17-23, docs/consideration.md:37-48).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Key columns — message affinity contract (reference README.md:68,
# SendProductToKafka.py:48 keys records by product_id; here the key is
# (repo, path)).
KEY_COLS = ["repo", "path"]

# LWW conflict-stamp columns (active/active topologies,
# docs/consideration.md:29-35): origin event time + origin cluster id form
# the total order; LWW_DELETED_COL marks a PERSISTED tombstone — a deleted
# key keeps a row carrying the delete's own stamp, so a concurrent or
# re-delivered older write loses deterministically on every replica (the
# round-3 "losing tombstones not persisted" boundary, closed). Normal reads
# exclude tombstone rows; merge/changefeed reads include them.
LWW_TS_COL = "_lww_ts"
LWW_SRC_COL = "_lww_src"
LWW_DELETED_COL = "_lww_deleted"

# Merge-on-read delta-layer columns (Iceberg v2 equality-delete / Delta
# deletion-vector analogue, re-expressed for the bucketed table store): a
# MoR commit appends the batch's rows as a DELTA layer on the bucket —
# MOR_V_COL stamps the layer with its commit version (base rows read as
# null -> 0), MOR_DELETED_COL marks a delta tombstone. Readers resolve
# last-layer-wins per key; compaction folds layers back into plain base
# files. These columns live only in data FILES, never in the manifest's
# logical schema.
MOR_V_COL = "_mor_v"
MOR_DELETED_COL = "_mor_deleted"

ROW_FIELDS = [
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
]

ROW_SCHEMA = T.StructType(ROW_FIELDS)

# Additive schema evolution (reference docs/consideration.md:13-18: topic
# config changes propagate dynamically source -> target): events after the
# evolution point carry an extra `stars` field in the after image.
ROW_FIELDS_EVOLVED = ROW_FIELDS + [T.StructField("stars", T.IntegerType(), True)]
ROW_SCHEMA_EVOLVED = T.StructType(ROW_FIELDS_EVOLVED)


def changelog_schema(row_schema: T.StructType = ROW_SCHEMA) -> T.StructType:
    """Debezium-style change-event envelope over `row_schema`."""
    return T.StructType(
        [
            T.StructField("partition", T.IntegerType(), False),
            T.StructField("lsn", T.LongType(), False),
            T.StructField("op", T.StringType(), False),  # c | u | d
            T.StructField("before", row_schema, True),  # null for c
            T.StructField("after", row_schema, True),  # null for d
            T.StructField("ts_ms", T.TimestampType(), True),
            T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
            T.StructField("source_topic", T.StringType(), True),
        ]
    )


CHANGELOG_SCHEMA = changelog_schema()
CHANGELOG_SCHEMA_EVOLVED = changelog_schema(ROW_SCHEMA_EVOLVED)

# The reference's checkpoint topic is keyed on (consumer group, topic,
# partition) (docs/consideration.md:37-48): each replication flow tracks its
# own committed offsets. DEFAULT_GROUP is the single-flow default.
DEFAULT_GROUP = "cdc-engine"

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("consumer_group", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("applied_lsn", T.LongType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("n_applied", T.LongType(), True),
        T.StructField("updated_ts", T.TimestampType(), True),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("n_applied", T.LongType(), True),
        T.StructField("n_duplicates", T.LongType(), True),
        T.StructField("bytes_in", T.LongType(), True),
        T.StructField("max_lsn", T.LongType(), True),
        T.StructField("applied_lsn_before", T.LongType(), True),
        T.StructField("min_ts", T.TimestampType(), True),
        T.StructField("max_ts", T.TimestampType(), True),
        # ts3 of the reference's four-timestamp model
        # (docs/perf-tests.md:173-187): wall clock at target apply; with the
        # producer-set max_ts (ts2) this yields replication-latency-ms
        # (mm2-jmx-exporter.yaml:28-43)
        T.StructField("apply_ts", T.TimestampType(), True),
    ]
)
