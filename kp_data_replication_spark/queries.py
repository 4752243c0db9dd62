"""Driver-checkable query suite: every operator from SURVEY.md §2 expressed
over the driver's testdata tables, with a DuckDB-equivalent oracle.

The CDC queries treat the ``events`` table as a change-event log:
  * key       = user_id            (message affinity, README.md:68)
  * lsn       = event_id           (per-partition offset, docs/consideration.md:46)
  * partition = user_id % 8        (key-hash routing, SendProductToKafka.py:48)
  * op        = signup->'c', error->'d' (tombstone), else 'u'

Each entry returns (spark_fn, oracle_sql). Column names/aliases match
exactly between the Spark plan and the SQL so the driver's sorted-column
value-hash comparison holds. Floating aggregates are rounded to 4 decimals
on both sides; decimal-exact sums are used where magnitudes are large.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .operators.asof import translate_offsets_auto
from .operators.compact import last_write_wins
from .operators.dedup_cdc import filter_applied
from .operators.filters import fan_in_union, topic_whitelist
from .operators.merge import merge_upsert

P = 8  # log partitions derived from user_id


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _with_envelope(ev: DataFrame) -> DataFrame:
    """events -> changelog envelope columns (partition, lsn, op)."""
    return ev.select(
        (F.col("user_id") % P).alias("partition"),
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "signup", F.lit("c"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
        "user_id",
        "event_id",
        "event_type",
        "value",
        "ts",
        "props",
    )


_ENVELOPE_SQL = f"""
    SELECT user_id % {P} AS partition,
           event_id AS lsn,
           CASE WHEN event_type = 'signup' THEN 'c'
                WHEN event_type = 'error' THEN 'd'
                ELSE 'u' END AS op,
           user_id, event_id, event_type, value, ts, props
    FROM events
"""


# --------------------------------------------------------------------- #
# CDC operators (SURVEY.md §2.2-2.5, §2.7)
# --------------------------------------------------------------------- #
def q_cdc_state_lastwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/W2 + F7: replicated-topic end state — newest event per key,
    tombstones drop the key (docs/local-to-es.md:97-106 end-state oracle)."""
    # project to the surviving columns BEFORE the LWW aggregate: Catalyst
    # cannot prune struct fields through max_by(struct(payload)), so the
    # unused props map / ts otherwise ride the whole shuffle (guide §2.3).
    # Exact: lsn = event_id is unique, so the winner is tie-free.
    ev = _with_envelope(_events(spark, sf_dir)).select(
        "user_id", "lsn", "op", "event_id", "event_type", "value"
    )
    state = last_write_wins(ev, key_cols=["user_id"], order_col="lsn")
    return state.filter(F.col("op") != "d").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.round("value", 4).alias("last_value"),
    )


SQL_CDC_STATE_LASTWRITE = """
    WITH ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           round(value, 4) AS last_value
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""


def q_cdc_snapshot_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-bootstrap handoff algebra — the oracle twin of
    CdcApplyEngine.bootstrap_from_snapshot (Debezium snapshot.mode=initial /
    MM2 existing-records-first bring-up): compact the log prefix at a
    mid-log watermark W into a snapshot (tombstones gone, winners keep
    their ORIGINAL lsn — the position stamp Debezium puts on snapshot
    reads), union the tail (lsn > W), compact again. Must equal one full
    LWW replay — the oracle is exactly the full-replay SQL, independently
    computed. The 1-row cutoff aggregate joins in via broadcast (no
    shuffle of the event side)."""
    # early projection: same rationale as q_cdc_state_lastwrite (the LWW
    # struct blocks column pruning; lsn is unique so winners are tie-free)
    ev = _with_envelope(_events(spark, sf_dir)).select(
        "user_id", "lsn", "op", "event_id", "event_type", "value"
    )
    cut = ev.agg(F.floor(F.max("lsn") / 2).cast("long").alias("_w"))
    ev = ev.join(F.broadcast(cut))
    snapshot = last_write_wins(
        ev.filter(F.col("lsn") <= F.col("_w")),
        key_cols=["user_id"],
        order_col="lsn",
    ).filter(F.col("op") != "d")
    tail = ev.filter(F.col("lsn") > F.col("_w"))
    final = last_write_wins(
        snapshot.unionByName(tail.select(*snapshot.columns)),
        key_cols=["user_id"],
        order_col="lsn",
    )
    return final.filter(F.col("op") != "d").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.round("value", 4).alias("last_value"),
    )


SQL_CDC_SNAPSHOT_HANDOFF = SQL_CDC_STATE_LASTWRITE


def q_cdc_applied_watermarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-partition applied-offset high-water marks
    (checkpoint content, docs/consideration.md:39-42)."""
    ev = _with_envelope(_events(spark, sf_dir))
    return ev.groupBy("partition").agg(
        F.max("lsn").alias("applied_lsn"), F.count(F.lit(1)).alias("n_events")
    )


SQL_CDC_APPLIED_WATERMARKS = f"""
    SELECT user_id % {P} AS partition, max(event_id) AS applied_lsn,
           count(*) AS n_events
    FROM events GROUP BY 1
"""


def q_cdc_replication_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: per-partition replication-latency-ms stats over the four-
    timestamp model (docs/perf-tests.md:173-187; replication-latency-ms,
    mm2-jmx-exporter.yaml:28-43). ts2 = producer-set event time; ts3 =
    apply time, derived deterministically here (ts + value ms) so the
    DuckDB twin is exact — the live engine stamps the real wall-clock
    apply_ts into its metrics table (streaming/apply.py _write_metrics)."""
    from .operators.metrics import replication_latency

    ev = _with_envelope(_events(spark, sf_dir))
    # the parquet ts is TIMESTAMP_NTZ — cast to session-UTC timestamp so
    # the operator's epoch-seconds math resolves (values identical)
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    # exact integer-microsecond apply time so the DuckDB twin is
    # bit-identical: apply_ts = ts + floor(value ms -> us)
    ev = ev.withColumn(
        "apply_ts",
        F.timestamp_add(
            "MICROSECOND", F.floor(F.col("value") * 1000).cast("long"), F.col("ts")
        ).cast("timestamp"),
    )
    lat = replication_latency(ev, produce_ts="ts", apply_ts="apply_ts")
    return lat.select(
        "partition",
        F.round("avg_ms", 4).alias("avg_ms"),
        F.round("max_ms", 4).alias("max_ms"),
        F.round("p95_ms", 4).alias("p95_ms"),
    )


# latency per row = ((ts_us + floor(value*1000)) / 1e6 - ts_us / 1e6) * 1000
# with the SAME double ops Spark's cast(timestamp as double) performs
SQL_CDC_REPLICATION_LATENCY = f"""
    WITH lat AS (
      SELECT user_id % {P} AS partition,
             ((epoch_us(ts) + floor(value * 1000)::BIGINT) / 1000000.0
              - epoch_us(ts) / 1000000.0) * 1000.0 AS latency_ms
      FROM events)
    SELECT partition,
           round(avg(latency_ms), 4) AS avg_ms,
           round(max(latency_ms), 4) AS max_ms,
           round(quantile_cont(latency_ms, 0.95), 4) AS p95_ms
    FROM lat GROUP BY 1
"""


def q_cdc_group_checkpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/A1 per consumer group: the reference's checkpoint topic is keyed
    on (consumer group, topic, partition) (docs/consideration.md:37-48) —
    each replication flow commits its own offsets. Two flows with disjoint
    topic subscriptions checkpoint independently over the same log."""
    ev = _with_envelope(_events(spark, sf_dir))
    flow = (
        F.when(F.col("event_type").isin("signup", "login"), F.lit("flow-auth"))
        .otherwise(F.lit("flow-activity"))
    )
    return (
        ev.withColumn("consumer_group", flow)
        .groupBy("consumer_group", "partition")
        .agg(
            F.max("lsn").alias("applied_lsn"),
            F.count(F.lit(1)).alias("n_applied"),
        )
    )


SQL_CDC_GROUP_CHECKPOINTS = f"""
    SELECT CASE WHEN event_type IN ('signup', 'login') THEN 'flow-auth'
                ELSE 'flow-activity' END AS consumer_group,
           user_id % {P} AS partition,
           max(event_id) AS applied_lsn,
           count(*) AS n_applied
    FROM events GROUP BY 1, 2
"""


def q_cdc_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: offset-sequence continuity audit per partition
    (docs/consideration.md:46 divergence detection)."""
    ev = _with_envelope(_events(spark, sf_dir))
    w = W.partitionBy("partition").orderBy("lsn")
    gaps = ev.select("partition", "lsn").withColumn(
        "gap", F.col("lsn") - F.lag("lsn").over(w)
    )
    return (
        gaps.filter(F.col("gap").isNotNull())
        .groupBy("partition")
        .agg(
            F.count(F.lit(1)).alias("n_steps"),
            F.max("gap").alias("max_gap"),
            F.round(F.avg("gap"), 4).alias("avg_gap"),
        )
    )


SQL_CDC_GAP_STATS = f"""
    WITH steps AS (
      SELECT user_id % {P} AS partition,
             event_id - lag(event_id) OVER (PARTITION BY user_id % {P} ORDER BY event_id) AS gap
      FROM events)
    SELECT partition, count(*) AS n_steps, max(gap) AS max_gap,
           round(avg(gap), 4) AS avg_gap
    FROM steps WHERE gap IS NOT NULL GROUP BY 1
"""


def q_cdc_dedup_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: lineage anti-filter — events beyond the applied watermark, where
    the watermark is the max offset of the first 6000 events
    (duplicate-window masking, docs/consideration.md:52-62)."""
    ev = _with_envelope(_events(spark, sf_dir))
    lineage = (
        ev.filter(F.col("lsn") < 6000)
        .groupBy("partition")
        .agg(F.max("lsn").alias("applied_lsn"))
    )
    fresh = filter_applied(ev, lineage)
    return fresh.groupBy("partition").agg(F.count(F.lit(1)).alias("n_fresh"))


SQL_CDC_DEDUP_ANTI = f"""
    WITH ev AS ({_ENVELOPE_SQL}),
    lineage AS (
      SELECT partition, max(lsn) AS applied_lsn FROM ev WHERE lsn < 6000 GROUP BY 1)
    SELECT ev.partition, count(*) AS n_fresh
    FROM ev LEFT JOIN lineage USING (partition)
    WHERE ev.lsn > coalesce(lineage.applied_lsn, -1)
    GROUP BY ev.partition
"""


def q_cdc_offset_translation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/W3: consumer-group offset translation via sparse sync points
    (docs/consideration.md:39-48: committed source offset -> target offset)."""
    ev = _with_envelope(_events(spark, sf_dir))
    syncs = ev.filter(F.col("lsn") % 500 == 0).select(
        "partition",
        F.col("lsn").alias("sync_src_offset"),
        (F.col("lsn") - F.col("partition") * 3).alias("sync_tgt_offset"),
    )
    commits = ev.groupBy(
        F.col("event_type").alias("group"), "partition"
    ).agg(F.max("lsn").alias("src_offset"))
    out = translate_offsets_auto(commits, syncs)
    return out.select(
        F.col("group").alias("consumer_group"), "partition", "src_offset", "tgt_offset"
    )


SQL_CDC_OFFSET_TRANSLATION = f"""
    WITH ev AS ({_ENVELOPE_SQL}),
    syncs AS (
      SELECT partition, lsn AS sync_src_offset, lsn - partition * 3 AS sync_tgt_offset
      FROM ev WHERE lsn % 500 = 0),
    commits AS (
      SELECT event_type AS consumer_group, partition, max(lsn) AS src_offset
      FROM ev GROUP BY 1, 2)
    SELECT c.consumer_group, c.partition, c.src_offset,
           arg_max(s.sync_tgt_offset, s.sync_src_offset)
             + (c.src_offset - max(s.sync_src_offset)) AS tgt_offset
    FROM commits c LEFT JOIN syncs s
      ON s.partition = c.partition AND s.sync_src_offset <= c.src_offset
    GROUP BY c.consumer_group, c.partition, c.src_offset
"""


def q_cdc_compaction_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/F7 summary: live vs tombstoned keys after compaction."""
    # early projection past the pruning-opaque LWW struct (guide §2.3);
    # lsn unique => tie-free winners
    ev = _with_envelope(_events(spark, sf_dir)).select("user_id", "lsn", "op")
    state = last_write_wins(ev, key_cols=["user_id"], order_col="lsn")
    return (
        state.select(
            F.when(F.col("op") == "d", F.lit("deleted")).otherwise(F.lit("live")).alias("status")
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


SQL_CDC_COMPACTION_COUNTS = """
    WITH ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events)
    SELECT CASE WHEN event_type = 'error' THEN 'deleted' ELSE 'live' END AS status,
           count(*) AS n_keys
    FROM ranked WHERE rn = 1 GROUP BY 1
"""


def q_cdc_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK-constraint audit (operators/constraints.py — the Delta ADD
    CONSTRAINT / semantic errors.tolerance analogue the apply engine
    enforces per epoch): per-rule violation counts over the changelog's
    UPSERT images. Deletes are exempt by mechanism (constraints gate
    incoming values, not removals); ANSI semantics — a row violates only
    when the expression is FALSE, NULL passes. Same conditional-aggregate
    shape at 100 TB: one scan, rules fused into one projection, a hash
    aggregate over at most n_rules keys."""
    from .operators.constraints import violation_counts

    rules = {
        "value_le_200": "value <= 200",
        "purchase_value_ge_1": "event_type <> 'purchase' OR value >= 1.0",
    }
    up = _with_envelope(_events(spark, sf_dir)).filter(F.col("op") != "d")
    return violation_counts(up, rules)


SQL_CDC_CONSTRAINT_AUDIT = """
    WITH up AS (SELECT * FROM events WHERE event_type <> 'error'),
    v AS (
      SELECT 'value_le_200' AS rule, count(*) AS n_violations
      FROM up WHERE NOT coalesce(value <= 200, TRUE)
      UNION ALL
      SELECT 'purchase_value_ge_1', count(*)
      FROM up WHERE NOT coalesce(event_type <> 'purchase' OR value >= 1.0, TRUE)
    )
    SELECT rule, n_violations FROM v WHERE n_violations > 0
"""


def q_cdc_smt_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single Message Transform chain (operators/smt.py — the Kafka Connect
    `transforms=` surface MM2 flows configure; reference flows are Connect
    connector configs, docs/es-to-local.md:14-23): Filter, rename, mask,
    static insert, timestamp conversion and cast, all compiled to pure
    Column expressions. Catalyst collapses the six steps into ONE map-side
    projection over the scan — at 100 TB the chain costs a single
    whole-stage-codegen pass, no UDFs, no extra jobs. The aggregate on top
    keeps the oracle result compact and proves the masked/inserted/converted
    values survive end-to-end."""
    from .operators.smt import apply_smt_chain

    chain = [
        {"type": "Filter", "predicate": "event_type = 'error'"},
        {"type": "ReplaceField", "renames": {"props": "properties"}},
        {"type": "MaskField", "fields": ["properties"], "replacement": "***"},
        {"type": "InsertField", "static_field": "origin_cluster",
         "static_value": "source"},
        {"type": "TimestampConverter", "field": "ts",
         "target_type": "string", "format": "yyyy-MM-dd"},
        {"type": "Cast", "spec": {"user_id": "int"}},
    ]
    smt = apply_smt_chain(_with_envelope(_events(spark, sf_dir)), chain)
    return (
        smt.groupBy(
            F.col("ts").alias("day"), "event_type", "origin_cluster"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("properties").alias("masked_prop"),
        )
    )


SQL_CDC_SMT_CHAIN = f"""
    WITH env AS ({_ENVELOPE_SQL}),
    smt AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
             '***' AS properties, 'source' AS origin_cluster, value
      FROM env
      WHERE NOT coalesce(event_type = 'error', FALSE)
    )
    SELECT day, event_type, origin_cluster, count(*) AS n,
           round(sum(value), 2) AS total_value,
           max(properties) AS masked_prop
    FROM smt GROUP BY day, event_type, origin_cluster
"""


def q_cdc_topic_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F5: whitelist regex + cluster-prefix rename
    (docs/index.md:42-43, docs/consideration.md:29-35)."""
    ev = _events(spark, sf_dir).withColumnRenamed("event_type", "source_topic")
    kept = topic_whitelist(ev, "^(click|view|purchase)$")
    return (
        kept.select(
            F.concat(F.lit("kp-remote."), F.col("source_topic")).alias("target_topic")
        )
        .groupBy("target_topic")
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


SQL_CDC_TOPIC_ROUTING = """
    SELECT 'kp-remote.' || event_type AS target_topic, count(*) AS n_records
    FROM events WHERE regexp_matches(event_type, '^(click|view|purchase)$')
    GROUP BY 1
"""


def q_cdc_acl_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 ACL sync (`sync.topic.acls.enabled=true`,
    docs/security.md:171-188; MM2 KIP-382 rules): synthesize a
    deterministic topic-ACL table from `events` (topics = event types,
    principals/operations/permissions/pattern types cycled from user_id),
    then compute the bindings the target cluster receives — literal topic
    bindings on whitelisted topics only, ALLOW WRITE dropped, ALLOW ALL
    downgraded to READ, resource renamed kp-remote.topic. The DuckDB
    oracle applies the same rules in SQL."""
    from .operators.acl_sync import sync_topic_acls

    ev = _events(spark, sf_dir)
    ops = F.array(
        F.lit("read"), F.lit("write"), F.lit("describe"),
        F.lit("all"), F.lit("create"),
    )
    acls = ev.select(
        F.lit("topic").alias("resource_type"),
        F.col("event_type").alias("resource_name"),
        F.when(F.col("user_id") % 13 == 0, F.lit("prefixed"))
        .otherwise(F.lit("literal")).alias("pattern_type"),
        F.concat(
            F.lit("User:CN=kp-consumer-"),
            (F.col("user_id") % 3).cast("string"),
        ).alias("principal"),
        F.element_at(ops, (F.col("user_id") % 5 + 1).cast("int"))
        .alias("operation"),
        F.when(F.col("user_id") % 7 == 0, F.lit("deny"))
        .otherwise(F.lit("allow")).alias("permission"),
        F.lit("*").alias("host"),
    ).distinct()
    return sync_topic_acls(
        acls, "kp-remote", whitelist="^(click|view|purchase)$"
    )


SQL_CDC_ACL_SYNC = """
    WITH acls AS (
      SELECT DISTINCT
        'topic' AS resource_type,
        event_type AS resource_name,
        CASE WHEN user_id % 13 = 0 THEN 'prefixed' ELSE 'literal' END
          AS pattern_type,
        'User:CN=kp-consumer-' || CAST(user_id % 3 AS VARCHAR) AS principal,
        (['read','write','describe','all','create'])
          [CAST(user_id % 5 AS INT) + 1] AS operation,
        CASE WHEN user_id % 7 = 0 THEN 'deny' ELSE 'allow' END AS permission,
        '*' AS host
      FROM events)
    SELECT DISTINCT
      'topic' AS resource_type,
      'kp-remote.' || resource_name AS resource_name,
      'literal' AS pattern_type,
      principal,
      CASE WHEN permission = 'allow' AND operation = 'all'
           THEN 'read' ELSE operation END AS operation,
      permission,
      host
    FROM acls
    WHERE pattern_type = 'literal'
      AND regexp_matches(resource_name, '^(click|view|purchase)$')
      AND NOT (permission = 'allow' AND operation = 'write')
"""


def q_cdc_fanin_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/F6: regex-subscription fan-in over per-cluster replicas
    (docs/consideration.md:29-35)."""
    ev = _events(spark, sf_dir)
    dc1 = ev.filter(F.col("user_id") % 2 == 0).withColumn("cluster", F.lit("dc1"))
    dc2 = ev.filter(F.col("user_id") % 2 == 1).withColumn("cluster", F.lit("dc2"))
    return fan_in_union([dc1, dc2]).groupBy("cluster", "event_type").agg(
        F.count(F.lit(1)).alias("n_records")
    )


SQL_CDC_FANIN_UNION = """
    SELECT cluster, event_type, count(*) AS n_records FROM (
      SELECT 'dc1' AS cluster, event_type FROM events WHERE user_id % 2 = 0
      UNION ALL
      SELECT 'dc2' AS cluster, event_type FROM events WHERE user_id % 2 = 1)
    GROUP BY 1, 2
"""


def q_cdc_throughput_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/T6: tumbling-hour throughput — records + bytes per interval
    (docs/perf-tests.md:222-228 per-interval report)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(F.length("props")).alias("n_bytes"),
        )
    )


SQL_CDC_THROUGHPUT_1H = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           count(*) AS n_records, sum(length(props))::BIGINT AS n_bytes
    FROM events GROUP BY 1
"""


def q_cdc_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: run-level latency stats incl. exact percentiles
    (docs/perf-tests.md:228 report line)."""
    ev = _events(spark, sf_dir)
    c = F.col("value")
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(c), 4).alias("avg_ms"),
        F.round(F.min(c), 4).alias("min_ms"),
        F.round(F.max(c), 4).alias("max_ms"),
        F.round(F.percentile(c, F.lit(0.5)), 4).alias("p50_ms"),
        F.round(F.percentile(c, F.lit(0.95)), 4).alias("p95_ms"),
        F.round(F.percentile(c, F.lit(0.99)), 4).alias("p99_ms"),
        F.round(F.percentile(c, F.lit(0.999)), 4).alias("p999_ms"),
    )


SQL_CDC_LATENCY_PERCENTILES = """
    SELECT count(*) AS n,
           round(avg(value), 4) AS avg_ms,
           round(min(value), 4) AS min_ms,
           round(max(value), 4) AS max_ms,
           round(quantile_cont(value, 0.5), 4) AS p50_ms,
           round(quantile_cont(value, 0.95), 4) AS p95_ms,
           round(quantile_cont(value, 0.99), 4) AS p99_ms,
           round(quantile_cont(value, 0.999), 4) AS p999_ms
    FROM events
"""


def q_cdc_sha_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/U2: payload-fidelity invariant — sha256 over the payload column
    (BASELINE per-row sha256 equality; docs/perf-tests.md:92-131 count
    equality)."""
    ev = _events(spark, sf_dir).select(F.sha2("props", 256).alias("sha"))
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("sha").alias("n_distinct_sha"),
        F.min("sha").alias("min_sha"),
        F.max("sha").alias("max_sha"),
    )


SQL_CDC_SHA_INVARIANT = """
    SELECT count(*) AS n, count(DISTINCT sha256(props)) AS n_distinct_sha,
           min(sha256(props)) AS min_sha, max(sha256(props)) AS max_sha
    FROM events
"""


def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/F7: MERGE semantics — state from events < 7000, then apply the
    compacted tail as one batch: update/insert/delete per key."""
    ev = _with_envelope(_events(spark, sf_dir)).select(
        "user_id", "lsn", "op", "event_id", "event_type", "value"
    )
    mk = lambda df: last_write_wins(df, key_cols=["user_id"], order_col="lsn").select(
        "user_id",
        "op",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.round("value", 4).alias("last_value"),
    )
    state = mk(ev.filter(F.col("lsn") < 7000)).filter(F.col("op") != "d").drop("op")
    batch = mk(ev.filter(F.col("lsn") >= 7000))
    return merge_upsert(state, batch, key_cols=["user_id"])


SQL_CDC_MERGE_UPSERT = """
    WITH state AS (
      SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
             round(value, 4) AS last_value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events WHERE event_id < 7000) t
      WHERE rn = 1 AND event_type <> 'error'),
    batch AS (
      SELECT user_id, event_type AS op_type, event_id AS last_event_id,
             event_type AS last_event_type, round(value, 4) AS last_value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events WHERE event_id >= 7000) t
      WHERE rn = 1)
    SELECT coalesce(b.user_id, s.user_id) AS user_id,
           CASE WHEN b.user_id IS NOT NULL THEN b.last_event_id ELSE s.last_event_id END AS last_event_id,
           CASE WHEN b.user_id IS NOT NULL THEN b.last_event_type ELSE s.last_event_type END AS last_event_type,
           CASE WHEN b.user_id IS NOT NULL THEN b.last_value ELSE s.last_value END AS last_value
    FROM state s FULL OUTER JOIN batch b ON s.user_id = b.user_id
    WHERE NOT (b.user_id IS NOT NULL AND b.op_type = 'error')
"""


def q_cdc_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changefeed (incremental read): row-level diff between the table
    state as of lsn<7000 and the final state — insert/update/delete per
    key, unchanged rows dropped (operators/changefeed.diff_states; Delta
    CDF / Iceberg incremental-read semantics re-expressed; enables the
    chained-replication topology of docs/index.md:32-52)."""
    from .operators.changefeed import diff_states

    ev = _with_envelope(_events(spark, sf_dir)).select(
        "user_id", "lsn", "op", "event_id", "event_type", "value"
    )

    def state(e: DataFrame) -> DataFrame:
        s = last_write_wins(e, key_cols=["user_id"], order_col="lsn")
        return s.filter(F.col("op") != "d").select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )

    diff = diff_states(
        state(ev.filter(F.col("lsn") < 7000)), state(ev), key_cols=["user_id"]
    )
    return diff.select(
        "user_id",
        "last_event_id",
        "last_event_type",
        F.round("last_value", 4).alias("last_value"),
        F.col("_change_type").alias("change_type"),
    )


SQL_CDC_TABLE_CHANGES = """
    WITH old_state AS (
      SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
             value AS last_value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events WHERE event_id < 7000) t
      WHERE rn = 1 AND event_type <> 'error'),
    new_state AS (
      SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
             value AS last_value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events) t
      WHERE rn = 1 AND event_type <> 'error')
    SELECT coalesce(n.user_id, o.user_id) AS user_id,
           coalesce(n.last_event_id, o.last_event_id) AS last_event_id,
           coalesce(n.last_event_type, o.last_event_type) AS last_event_type,
           round(coalesce(n.last_value, o.last_value), 4) AS last_value,
           CASE WHEN o.user_id IS NULL THEN 'insert'
                WHEN n.user_id IS NULL THEN 'delete'
                ELSE 'update' END AS change_type
    FROM old_state o FULL OUTER JOIN new_state n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.last_event_id <> n.last_event_id
       OR o.last_event_type <> n.last_event_type
       OR o.last_value <> n.last_value
"""


# --------------------------------------------------------------------- #
# Relational coverage (scan/filter/join/agg/window/set — SURVEY.md §2.3-2.7)
# --------------------------------------------------------------------- #
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_AGG_PRICING_SUMMARY = """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


def q_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension join (customer is small at every SF)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
    )


SQL_JOIN_SEGMENT_REVENUE = """
    SELECT c.c_mktsegment AS mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
"""


def q_window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (ranking window, deterministic tiebreak)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rank_in_cust")
    )


SQL_WINDOW_TOPK_ORDERS = """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rank_in_cust
    FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_cust
          FROM orders) t
    WHERE rank_in_cust <= 3
"""


def q_antijoin_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 validation twin: source-vs-target difference via anti join
    (docs/perf-tests.md:92-131 count equality)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orphans = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))


SQL_ANTIJOIN_ORPHANS = """
    SELECT count(*) AS n_orphans FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
"""


# --------------------------------------------------------------------- #
# Training-data pipeline operators (dedup / similarity / text / multimodal)
# --------------------------------------------------------------------- #
from .functions.text import analyze_documents, rolling_hash  # noqa: E402
from .operators.dedup_docs import (  # noqa: E402
    MINHASH_PARAMS,
    MINHASH_PRIME,
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    substring_spans,
)
from .operators.clustering import (  # noqa: E402
    SAMPLE_MOD,
    dedup_clusters,
    pack_chunks,
    pack_greedy,
    sample_summary,
)
from .operators.multimodal import media_metadata, to_media_table  # noqa: E402
from .operators.similarity import (  # noqa: E402
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_neardup_pairs,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_dedup_exact_docs(spark, sf_dir):
    return dedup_exact(_docs(spark, sf_dir))


SQL_DEDUP_EXACT_DOCS = r"""
    SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS content_key,
           min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
"""

# shared shingle CTE (word 3-grams, distinct per doc)
_SHINGLES_SQL = r"""
    words AS (
      SELECT doc_id AS doc, string_split_regex(trim(text), '\s+') AS w
      FROM documents),
    sh AS (
      SELECT DISTINCT doc, unnest(list_transform(range(greatest(len(w) - 2, 0)),
                                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
      FROM words)
"""


def q_dedup_jaccard_pairs(spark, sf_dir):
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.2)


SQL_DEDUP_JACCARD_PAIRS = f"""
    WITH {_SHINGLES_SQL},
    rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 256),
    shf AS (SELECT sh.doc, sh.shingle FROM sh JOIN rare USING (shingle)),
    sizes AS (SELECT doc, count(*) AS sz FROM shf GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc1, b.doc AS doc2, count(*) AS inter
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2)
    SELECT doc1, doc2,
           round(inter::DOUBLE / (s1.sz + s2.sz - inter), 4) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc = doc1
    JOIN sizes s2 ON s2.doc = doc2
    WHERE inter::DOUBLE / (s1.sz + s2.sz - inter) >= 0.2
"""


def q_dedup_substring_spans(spark, sf_dir):
    """Span-level exact-substring dedup (Lee et al. 2021 re-expressed as a
    word-anchored k-gram digest equi-join + gaps-and-islands merge;
    operators/dedup_docs.substring_spans)."""
    return substring_spans(_docs(spark, sf_dir), k=64)


SQL_DEDUP_SUBSTRING_SPANS = """
    WITH d AS (
      SELECT doc_id AS doc, text AS t FROM documents WHERE length(text) >= 64),
    p AS (
      SELECT doc, unnest(generate_series(1, length(t) - 63, 1)) AS pos, t
      FROM d),
    a AS (
      SELECT doc, pos, t FROM p
      WHERE pos = 1 OR substr(t, pos - 1, 1) = ' '),
    g AS (SELECT doc, pos::BIGINT AS pos, md5(substr(t, pos, 64)) AS h FROM a),
    rare AS (SELECT h FROM g GROUP BY h HAVING count(*) <= 256),
    gg AS (SELECT g.doc, g.pos, g.h FROM g JOIN rare USING (h)),
    hits AS (
      SELECT DISTINCT ga.doc AS doc_a, gb.doc AS doc_b, ga.pos AS pos_a
      FROM gg ga JOIN gg gb ON ga.h = gb.h AND ga.doc < gb.doc),
    flagged AS (
      SELECT doc_a, doc_b, pos_a,
             CASE WHEN pos_a - lag(pos_a) OVER
                    (PARTITION BY doc_a, doc_b ORDER BY pos_a) > 64
                  THEN 1 ELSE 0 END AS newg
      FROM hits),
    islands AS (
      SELECT doc_a, doc_b, pos_a,
             sum(newg) OVER (PARTITION BY doc_a, doc_b ORDER BY pos_a
                             ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged)
    SELECT doc_a, doc_b, min(pos_a) AS span_start,
           max(pos_a) + 63 AS span_end, count(*) AS n_grams
    FROM islands GROUP BY doc_a, doc_b, island
"""


def q_code_stats(spark, sf_dir):
    """StarCoder-style source-code quality statistics + keep verdict
    (functions/code.py) — pure JVM expressions over one hoisted line
    split, scan-speed filters with SQL-auditable thresholds."""
    from .functions.code import analyze_code, code_quality_flag

    return analyze_code(
        _docs(spark, sf_dir).select("doc_id", "text")
    ).select(
        "doc_id",
        "n_lines",
        "max_line_len",
        "avg_line_len",
        "blank_frac",
        "comment_frac",
        "indent_frac",
        "alnum_frac",
        "is_autogen",
        code_quality_flag(),
    )


SQL_CODE_STATS = r"""
    WITH d AS (
      SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM documents),
    s AS (
      SELECT doc_id, text, ls,
             len(ls) AS n_lines,
             list_transform(ls, x -> length(x)) AS lens,
             list_transform(ls, x -> trim(x)) AS tls
      FROM d),
    t AS (
      SELECT doc_id,
             CAST(n_lines AS BIGINT) AS n_lines,
             CAST(coalesce(list_max(lens), 0) AS BIGINT) AS max_line_len,
             round(CAST(list_sum(lens) AS DOUBLE) / n_lines, 4)
               AS avg_line_len,
             round(CAST(len(list_filter(tls, x -> length(x) = 0)) AS DOUBLE)
                   / n_lines, 4) AS blank_frac,
             CASE WHEN n_lines - len(list_filter(tls, x -> length(x) = 0)) > 0
                  THEN round(
                    CAST(len(list_filter(tls,
                         x -> regexp_matches(x, '^(#|//|--|\*|/\*)')))
                         AS DOUBLE)
                    / (n_lines - len(list_filter(tls, x -> length(x) = 0))),
                    4)
                  ELSE 0.0 END AS comment_frac,
             round(CAST(len(list_filter(ls,
                        x -> regexp_matches(x, '^[ \t]'))) AS DOUBLE)
                   / n_lines, 4) AS indent_frac,
             CASE WHEN length(text) > 0
                  THEN round(CAST(length(regexp_replace(
                         text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
                       / length(text), 4)
                  ELSE 0.0 END AS alnum_frac,
             (contains(lower(text), 'auto-generated')
              OR contains(lower(text), 'do not edit')) AS is_autogen
      FROM s)
    SELECT *,
           (max_line_len <= 1000 AND avg_line_len <= 100.0
            AND alnum_frac >= 0.25 AND NOT is_autogen) AS keep
    FROM t
"""


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprint selection (Schleimer et al. 2003) via the
    two-sliding-extrema closed form (operators/winnow.py)."""
    from .operators.winnow import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir), k=16, w=8)


# the selection CTE is shared by the fingerprint and match-pair oracles;
# frames mirror the Spark windows exactly (rows-based, min fwd / max back)
_WINNOW_SEL_SQL = """
    d AS (SELECT doc_id AS doc, text AS t,
                 CAST(length(text) - 15 AS BIGINT) AS n
          FROM documents WHERE length(text) >= 23),
    p AS (SELECT doc, n, unnest(generate_series(1, n, 1)) AS pos, t FROM d),
    g AS (SELECT doc, n, CAST(pos AS BIGINT) AS pos,
                 md5(substr(t, CAST(pos AS INTEGER), 16)) AS h
          FROM p),
    m AS (SELECT doc, n, pos, h,
                 CASE WHEN pos <= n - 7 THEN
                   min(h) OVER (PARTITION BY doc ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
                 END AS wm
          FROM g),
    s AS (SELECT doc, pos, h,
                 max(wm) OVER (PARTITION BY doc ORDER BY pos
                               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
                   AS mx
          FROM m)
"""

SQL_WINNOW_FINGERPRINTS = f"""
    WITH {_WINNOW_SEL_SQL}
    SELECT doc, pos, h AS fp FROM s WHERE h = mx
"""


def q_winnow_match_pairs(spark, sf_dir):
    """MOSS-style partial-clone candidates: docs sharing >= 2 winnowing
    fingerprints, document-frequency cap before the self-join."""
    from .operators.winnow import winnow_match_pairs

    return winnow_match_pairs(
        _docs(spark, sf_dir), k=16, w=8, min_shared=2, max_df=256
    )


SQL_WINNOW_MATCH_PAIRS = f"""
    WITH {_WINNOW_SEL_SQL},
    sel AS (SELECT DISTINCT doc, h AS fp FROM s WHERE h = mx),
    rare AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) <= 256),
    sf AS (SELECT sel.doc, sel.fp FROM sel JOIN rare USING (fp))
    SELECT a.doc AS doc1, b.doc AS doc2, count(*) AS n_shared
    FROM sf a JOIN sf b ON a.fp = b.fp AND a.doc < b.doc
    GROUP BY 1, 2 HAVING count(*) >= 2
"""


def q_repo_fork_pairs(spark, sf_dir):
    """Repo-level fork detection (operators/forks.py): two replication
    sites assign each document to a repo; site s moves every 7th doc one
    repo over (the fork drift), so r_i/s_i pairs are near-identical file
    sets and everything else shares almost nothing."""
    from .operators.forks import fork_pairs

    docs = _docs(spark, sf_dir)
    sha = F.md5("text")
    r = docs.select(
        F.concat(F.lit("r"), (F.col("doc_id") % 10).cast("string")).alias(
            "repo"
        ),
        sha.alias("sha"),
    )
    s = docs.select(
        F.concat(
            F.lit("s"),
            (
                (
                    F.col("doc_id")
                    + F.when(F.col("doc_id") % 7 == 0, 1).otherwise(0)
                )
                % 10
            ).cast("string"),
        ).alias("repo"),
        sha.alias("sha"),
    )
    return fork_pairs(r.unionAll(s), min_jaccard=0.3, max_df=64)


SQL_REPO_FORK_PAIRS = """
    WITH f AS (
      SELECT 'r' || CAST(doc_id % 10 AS VARCHAR) AS repo, md5(text) AS sha
      FROM documents
      UNION ALL
      SELECT 's' || CAST((doc_id + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0
                                    END) % 10 AS VARCHAR),
             md5(text)
      FROM documents),
    sets AS (SELECT DISTINCT repo, sha FROM f),
    rare AS (SELECT sha FROM sets GROUP BY sha HAVING count(*) <= 64),
    capped AS (SELECT sets.repo, sets.sha FROM sets JOIN rare USING (sha)),
    sizes AS (SELECT repo, count(*) AS sz FROM capped GROUP BY repo),
    inter AS (
      SELECT a.repo AS repo1, b.repo AS repo2, count(*) AS n_common
      FROM capped a JOIN capped b ON a.sha = b.sha AND a.repo < b.repo
      GROUP BY 1, 2)
    SELECT repo1, repo2, n_common, s1.sz AS n1, s2.sz AS n2,
           round(n_common::DOUBLE / (s1.sz + s2.sz - n_common), 4) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.repo = repo1
    JOIN sizes s2 ON s2.repo = repo2
    WHERE n_common::DOUBLE / (s1.sz + s2.sz - n_common) >= 0.3
"""


def q_dedup_minhash_sig(spark, sf_dir):
    return minhash_signatures(_docs(spark, sf_dir))


_PARAMS_SQL = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_PARAMS))

SQL_DEDUP_MINHASH_SIG = f"""
    WITH {_SHINGLES_SQL},
    hs AS (SELECT doc, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
    params(i, a, b) AS (VALUES {_PARAMS_SQL})
    SELECT doc, i, min((a * h + b) % {MINHASH_PRIME}) AS minhash
    FROM hs CROSS JOIN params GROUP BY 1, 2
"""


def q_dedup_minhash_lsh_pairs(spark, sf_dir):
    return minhash_lsh_pairs(_docs(spark, sf_dir))


SQL_DEDUP_MINHASH_LSH_PAIRS = f"""
    WITH {_SHINGLES_SQL},
    hs AS (SELECT doc, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
    params(i, a, b) AS (VALUES {_PARAMS_SQL}),
    sig AS (
      SELECT doc, i, min((a * h + b) % {MINHASH_PRIME}) AS minhash
      FROM hs CROSS JOIN params GROUP BY 1, 2),
    banded AS (
      SELECT doc, i // 4 AS band,
             md5(string_agg(i || ':' || minhash, '-' ORDER BY i || ':' || minhash)) AS bucket
      FROM sig GROUP BY doc, i // 4)
    SELECT x.doc AS doc1, y.doc AS doc2, count(*) AS n_shared_bands
    FROM banded x JOIN banded y
      ON x.band = y.band AND x.bucket = y.bucket AND x.doc < y.doc
    GROUP BY 1, 2
"""


def _incremental_fixture_batches(spark, sf_dir, with_doc_len=False):
    """The shared 3-epoch insert/update/delete changelog fixture the
    incremental-index family replays (deterministic in both engines):
      epoch 0  insert docs with doc_id % 3 != 2
      epoch 1  insert the rest; every doc with doc_id % 7 == 0 gets
               text || ' v2' (new docs arrive with it, old docs update)
      epoch 2  delete docs with doc_id % 11 == 0
    ``with_doc_len`` adds a numeric ``doc_len`` image field (length of the
    image's own content) — a second, independent filter dimension for the
    multi-column clustering queries.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def env(sel, op_col, text_expr, lsn_base, is_delete=False):
        fields = [
            F.lit("corpus").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang").alias("lang"),
            text_expr.alias("content"),
        ]
        if with_doc_len:
            fields.append(F.length(text_expr).cast("long").alias("doc_len"))
        img = F.struct(*fields)
        is_del = F.lit(is_delete)
        return sel.select(
            F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("doc_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            op_col.alias("op"),
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    v2 = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    b0 = env(docs.filter(F.col("doc_id") % 3 != 2), F.lit("c"), F.col("text"), 0)
    b1 = env(
        docs.filter((F.col("doc_id") % 3 == 2) | (F.col("doc_id") % 7 == 0)),
        F.when(F.col("doc_id") % 3 == 2, F.lit("c")).otherwise(F.lit("u")),
        v2, 1_000_000,
    )
    b2 = env(docs.filter(F.col("doc_id") % 11 == 0), F.lit("d"), F.col("text"),
             2_000_000, is_delete=True)
    return b0, b1, b2


def q_dedup_incremental_lsh_pairs(spark, sf_dir):
    """Incremental changefeed-maintained LSH index == full recompute
    (operators/dedup_incremental.py — the flagship composition: CDC engine
    feeds the dedup index). Replays the documents table through the CDC
    engine as the 3-epoch insert/update/delete fixture
    (:func:`_incremental_fixture_batches`), advancing the persisted band
    index after EVERY epoch (O(changed docs) each), then reads candidate
    pairs from the INDEX alone. The DuckDB oracle computes LSH pairs over
    the FINAL corpus state directly — hash equality proves incremental
    maintenance converges to full recompute.
    """
    import tempfile

    from .operators.dedup_incremental import IncrementalDedupIndex
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    src = TableStore(tempfile.mkdtemp(prefix="dedup_inc_src_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    index = IncrementalDedupIndex(
        tempfile.mkdtemp(prefix="dedup_inc_idx_"), n_buckets=4
    )
    for epoch, batch in enumerate(_incremental_fixture_batches(spark, sf_dir)):
        engine.apply_batch(batch, epoch)
        index.update(spark, src)

    p1 = F.col("path1").cast("long")
    p2 = F.col("path2").cast("long")
    return index.all_pairs(spark).select(
        # the index orders pairs by STRING key; re-canonicalize numerically
        F.least(p1, p2).alias("doc1"),
        F.greatest(p1, p2).alias("doc2"),
        "n_shared_bands",
    )


SQL_DEDUP_INCREMENTAL_LSH_PAIRS = f"""
    WITH final AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 11 != 0),
    words AS (
      SELECT doc_id AS doc, string_split_regex(trim(text), '\\s+') AS w
      FROM final),
    sh AS (
      SELECT DISTINCT doc, unnest(list_transform(range(greatest(len(w) - 2, 0)),
                                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
      FROM words),
    hs AS (SELECT doc, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
    params(i, a, b) AS (VALUES {_PARAMS_SQL}),
    sig AS (
      SELECT doc, i, min((a * h + b) % {MINHASH_PRIME}) AS minhash
      FROM hs CROSS JOIN params GROUP BY 1, 2),
    banded AS (
      SELECT doc, i // 4 AS band,
             md5(string_agg(i || ':' || minhash, '-' ORDER BY i || ':' || minhash)) AS bucket
      FROM sig GROUP BY doc, i // 4)
    SELECT x.doc AS doc1, y.doc AS doc2, count(*) AS n_shared_bands
    FROM banded x JOIN banded y
      ON x.band = y.band AND x.bucket = y.bucket AND x.doc < y.doc
    GROUP BY 1, 2
"""


def q_clone_index_pairs(spark, sf_dir):
    """Incremental changefeed-maintained winnowing CLONE index == full
    recompute (operators/clone_index.py). Replays the shared 3-epoch
    insert/update/delete fixture through the CDC engine, advancing the
    persisted fingerprint index after EVERY epoch (O(changed files)
    each), then mines pairs from the INDEX alone. The DuckDB oracle runs
    the winnowing selection + distinct-shared-fingerprint self-join over
    the FINAL corpus state — hash equality proves incremental maintenance
    converges to full recompute."""
    import tempfile

    from .operators.clone_index import IncrementalCloneIndex
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    src = TableStore(tempfile.mkdtemp(prefix="clone_idx_src_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    index = IncrementalCloneIndex(
        tempfile.mkdtemp(prefix="clone_idx_"), n_buckets=4, k=16, w=8
    )
    for epoch, batch in enumerate(_incremental_fixture_batches(spark, sf_dir)):
        engine.apply_batch(batch, epoch)
        index.update(spark, src)

    p1 = F.col("path1").cast("long")
    p2 = F.col("path2").cast("long")
    return (
        index.all_pairs(spark)
        .filter(F.col("n_shared_bands") >= 2)
        .select(
            # the index orders pairs by STRING key; re-canonicalize
            F.least(p1, p2).alias("doc1"),
            F.greatest(p1, p2).alias("doc2"),
            F.col("n_shared_bands").alias("n_shared"),
        )
    )


SQL_CLONE_INDEX_PAIRS = """
    WITH final AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 11 != 0),
    d AS (SELECT doc_id AS doc, text AS t,
                 CAST(length(text) - 15 AS BIGINT) AS n
          FROM final WHERE length(text) >= 23),
    p AS (SELECT doc, n, unnest(generate_series(1, n, 1)) AS pos, t FROM d),
    g AS (SELECT doc, n, CAST(pos AS BIGINT) AS pos,
                 md5(substr(t, CAST(pos AS INTEGER), 16)) AS h
          FROM p),
    m AS (SELECT doc, n, pos, h,
                 CASE WHEN pos <= n - 7 THEN
                   min(h) OVER (PARTITION BY doc ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
                 END AS wm
          FROM g),
    s AS (SELECT doc, pos, h,
                 max(wm) OVER (PARTITION BY doc ORDER BY pos
                               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
                   AS mx
          FROM m),
    sel AS (SELECT DISTINCT doc, h AS fp FROM s WHERE h = mx)
    SELECT a.doc AS doc1, b.doc AS doc2, count(*) AS n_shared
    FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc < b.doc
    GROUP BY 1, 2 HAVING count(*) >= 2
"""


def q_repo_fork_pairs_incremental(spark, sf_dir):
    """Incremental changefeed-maintained fork index == full recompute
    (operators/forks.py IncrementalForkIndex). A MULTI-REPO 3-epoch
    fixture: epoch 0 inserts the r-site (repo r<doc_id%10>), epoch 1
    inserts the s-site fork copies (same text -> same sha), epoch 2
    deletes every 11th s-file and rewrites every 7th r-file (sha drifts
    apart). The fork sweep runs over the INDEX alone; the DuckDB oracle
    derives the same final (repo, sha) universe directly."""
    import tempfile

    from .operators.forks import IncrementalForkIndex
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    docs = _docs(spark, sf_dir)

    def env(sel, repo_expr, op, lsn_base, text_expr):
        img = F.struct(
            repo_expr.alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang").alias("lang"),
            text_expr.alias("content"),
        )
        is_del = F.lit(op == "d")
        return sel.select(
            F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("doc_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            F.lit(op).alias("op"),
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    r_repo = F.concat(F.lit("r"), (F.col("doc_id") % 10).cast("string"))
    s_repo = F.concat(F.lit("s"), (F.col("doc_id") % 10).cast("string"))
    src = TableStore(tempfile.mkdtemp(prefix="fork_idx_src_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    index = IncrementalForkIndex(
        tempfile.mkdtemp(prefix="fork_idx_"), n_buckets=4
    )
    b0 = env(docs, r_repo, "c", 0, F.col("text"))
    b1 = env(docs, s_repo, "c", 10_000_000, F.col("text"))
    b2 = env(
        docs.filter(F.col("doc_id") % 11 == 0), s_repo, "d", 20_000_000,
        F.col("text"),
    ).unionByName(
        env(
            docs.filter(F.col("doc_id") % 7 == 0), r_repo, "u", 30_000_000,
            F.concat(F.col("text"), F.lit(" v2")),
        )
    )
    for epoch, batch in enumerate([b0, b1, b2]):
        engine.apply_batch(batch, epoch)
        index.update(spark, src)
    return index.fork_pairs_view(spark, min_jaccard=0.2, max_df=64)


SQL_REPO_FORK_PAIRS_INCREMENTAL = """
    WITH f AS (
      SELECT 'r' || CAST(doc_id % 10 AS VARCHAR) AS repo,
             CASE WHEN doc_id % 7 = 0 THEN sha256(text || ' v2')
                  ELSE sha256(text) END AS sha
      FROM documents
      UNION ALL
      SELECT 's' || CAST(doc_id % 10 AS VARCHAR), sha256(text)
      FROM documents WHERE doc_id % 11 != 0),
    sets AS (SELECT DISTINCT repo, sha FROM f),
    rare AS (SELECT sha FROM sets GROUP BY sha HAVING count(*) <= 64),
    capped AS (SELECT sets.repo, sets.sha FROM sets JOIN rare USING (sha)),
    sizes AS (SELECT repo, count(*) AS sz FROM capped GROUP BY repo),
    inter AS (
      SELECT a.repo AS repo1, b.repo AS repo2, count(*) AS n_common
      FROM capped a JOIN capped b ON a.sha = b.sha AND a.repo < b.repo
      GROUP BY 1, 2)
    SELECT repo1, repo2, n_common, s1.sz AS n1, s2.sz AS n2,
           round(n_common::DOUBLE / (s1.sz + s2.sz - n_common), 4) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.repo = repo1
    JOIN sizes s2 ON s2.repo = repo2
    WHERE n_common::DOUBLE / (s1.sz + s2.sz - n_common) >= 0.2
"""


def q_dedup_clusters_incremental(spark, sf_dir):
    """Incremental duplicate-CLUSTER maintenance == full recompute
    (operators/clusters_incremental.py — the last derived artifact made
    incremental: per epoch only the AFFECTED components are re-labeled,
    never the corpus). Replays the shared 3-epoch insert/update/delete
    fixture, advancing band index + cluster labels after EVERY epoch, then
    emits the per-document cluster view of the FINAL state. The DuckDB
    oracle resolves a recursive-CTE connected components over LSH pairs of
    the final corpus — hash equality proves the affected-component closure
    (bridge deletes SPLIT, bridge inserts MERGE) converges to recompute.
    """
    import tempfile

    from .operators.clusters_incremental import IncrementalClusterIndex
    from .operators.dedup_incremental import IncrementalDedupIndex
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    src = TableStore(tempfile.mkdtemp(prefix="cc_inc_src_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    index = IncrementalDedupIndex(
        tempfile.mkdtemp(prefix="cc_inc_idx_"), n_buckets=4
    )
    clusters = IncrementalClusterIndex(
        tempfile.mkdtemp(prefix="cc_inc_lab_"), index, n_buckets=4
    )
    for epoch, batch in enumerate(_incremental_fixture_batches(spark, sf_dir)):
        engine.apply_batch(batch, epoch)
        clusters.update(spark, src)

    # labels carry min-STRING composite ids; re-canonicalize numerically to
    # the oracle's min-doc_id representative (bijective per component)
    view = clusters.cluster_view(spark, src)
    lab = view.select(F.col("path").cast("long").alias("doc_id"), "cluster")
    rep = lab.groupBy("cluster").agg(F.min("doc_id").alias("cluster_id"))
    return lab.join(rep, "cluster").select(
        "doc_id",
        "cluster_id",
        (F.col("cluster_id") == F.col("doc_id")).alias("keep"),
    )


SQL_DEDUP_CLUSTERS_INCREMENTAL = f"""
    WITH RECURSIVE pairs AS ({SQL_DEDUP_INCREMENTAL_LSH_PAIRS}),
    fdocs AS (SELECT doc_id FROM documents WHERE doc_id % 11 != 0),
    e AS (SELECT doc1 AS a, doc2 AS b FROM pairs
          UNION SELECT doc2, doc1 FROM pairs),
    reach(node, root) AS (
      SELECT a, a FROM e
      UNION
      SELECT e.b, r.root FROM reach r JOIN e ON e.a = r.node),
    comp AS (SELECT node, min(root) AS cluster_id FROM reach GROUP BY node)
    SELECT d.doc_id,
           coalesce(c.cluster_id, d.doc_id) AS cluster_id,
           coalesce(c.cluster_id, d.doc_id) = d.doc_id AS keep
    FROM fdocs d LEFT JOIN comp c ON c.node = d.doc_id
"""


def q_cdc_state_time_travel(spark, sf_dir):
    """S4/W2 + versioned-store time travel: replay the 3-epoch
    insert/update/delete fixture through the CDC engine, then read the
    table AS OF version 2 — BEFORE the epoch-2 deletions landed. The
    DuckDB oracle reconstructs that logical state directly from the
    fixture definition (all docs, with the %7 'v2' updates applied, no
    %11 deletions), so hash equality proves the manifest-addressed
    versioned reads are exact, not just the head state. (Each manifest
    pins its own file set; reading v2 after v3 committed touches only
    v<=2 files — the Iceberg/Delta snapshot-isolation contract the
    reference gets from Kafka offset replay, docs/consideration.md:37-48.)
    """
    import tempfile

    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def env(sel, op_col, text_expr, lsn_base, is_delete=False):
        img = F.struct(
            F.lit("corpus").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang").alias("lang"),
            text_expr.alias("content"),
        )
        is_del = F.lit(is_delete)
        return sel.select(
            F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("doc_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            op_col.alias("op"),
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    v2 = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    b0 = env(docs.filter(F.col("doc_id") % 3 != 2), F.lit("c"), F.col("text"), 0)
    b1 = env(
        docs.filter((F.col("doc_id") % 3 == 2) | (F.col("doc_id") % 7 == 0)),
        F.when(F.col("doc_id") % 3 == 2, F.lit("c")).otherwise(F.lit("u")),
        v2, 1_000_000,
    )
    b2 = env(docs.filter(F.col("doc_id") % 11 == 0), F.lit("d"), F.col("text"),
             2_000_000, is_delete=True)

    src = TableStore(tempfile.mkdtemp(prefix="time_travel_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    for epoch, batch in enumerate((b0, b1, b2)):
        engine.apply_batch(batch, epoch)

    return src.read_state(spark, version=2).select(
        F.col("path").cast("long").alias("doc_id"),
        "lang",
        F.col("content").alias("text"),
    )


SQL_CDC_STATE_TIME_TRAVEL = """
    SELECT doc_id, lang,
           CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
    FROM documents
"""


def q_cdc_state_mor(spark, sf_dir):
    """Merge-on-read apply path (EngineConfig.table_mode='mor'): replay the
    shared 3-epoch insert/update/delete fixture with every post-base epoch
    committed as a DELTA LAYER (no base read, no merge join — the Iceberg
    v2 equality-delete / deletion-vector analogue; fold disabled so the
    read-side last-layer-wins resolution is what this query proves), then
    read the resolved final state. The DuckDB oracle computes the final
    corpus directly from the fixture definition — hash equality proves the
    layered write path + window resolution converge to the same state the
    copy-on-write MERGE produces.
    """
    import tempfile

    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    src = TableStore(tempfile.mkdtemp(prefix="mor_state_"), n_buckets=4)
    engine = CdcApplyEngine(
        src,
        EngineConfig(metrics=False, table_mode="mor", mor_fold_max_layers=0),
    )
    for epoch, batch in enumerate(_incremental_fixture_batches(spark, sf_dir)):
        engine.apply_batch(batch, epoch)
    if not (src.current_manifest().get("mor") or {}):
        raise RuntimeError("mor fixture produced no delta layers")
    return src.read_state(spark).select(
        F.col("path").cast("long").alias("doc_id"),
        "lang",
        F.sha2("content", 256).alias("content_sha"),
    )


SQL_CDC_STATE_MOR = """
    SELECT doc_id, lang,
           sha256(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)
             AS content_sha
    FROM documents WHERE doc_id % 11 != 0
"""


def q_cdc_scan_pruned(spark, sf_dir):
    """Predicate-pruned scan over manifest zonemaps (the Iceberg
    lower_bounds/upper_bounds + SORT ORDER split-planning analogue,
    sources/table_store.py collect_file_stats / read_state(where=)):
    replay the shared 3-epoch fixture through the CDC engine, compact with
    ``rewrite_buckets(cluster_by=["lang"], split_files=4)`` so each file
    covers a tight lang range, then scan WHERE lang='en' through the
    pruning path. The query self-audits that file skipping actually fired
    (prune_report) before returning — hash equality against the plain SQL
    filter proves pruning is row-exact, never a lossy shortcut. At 10^10
    rows this is the layer that keeps a selective scan from planning over
    every data file of the table."""
    import tempfile

    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    store = TableStore(tempfile.mkdtemp(prefix="zonemap_scan_"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    for epoch, batch in enumerate(_incremental_fixture_batches(spark, sf_dir)):
        engine.apply_batch(batch, epoch)
    store.rewrite_buckets(
        spark, min_files=0, cluster_by=["lang"], split_files=4
    )
    rep = store.prune_report([("lang", "=", "en")])
    if rep["files_selected"] == 0 or (
        rep["files_total"] >= 8
        and rep["files_selected"] >= rep["files_total"]
    ):
        raise RuntimeError(f"zonemap pruning did not fire: {rep}")
    return store.read_state(spark, where=[("lang", "=", "en")]).select(
        F.col("path").cast("long").alias("doc_id"),
        "lang",
        F.sha2("content", 256).alias("content_sha"),
    )


SQL_CDC_SCAN_PRUNED = """
    SELECT doc_id, lang,
           sha256(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)
             AS content_sha
    FROM documents WHERE doc_id % 11 != 0 AND lang = 'en'
"""


def q_cdc_lookup_bloom(spark, sf_dir):
    """Bloom-pruned point probes (the Parquet bloom_filter pages / Delta
    BLOOMFILTER index analogue, sources/table_store.py:_bloom_build /
    _file_may_match): the table is range-clustered on LANG, so file
    zonemaps on PATH span ~the whole key domain and cannot prune a path
    point probe — the per-file bloom on path can, and the query
    self-audits that it skips files the zonemaps alone would keep before
    returning. Hash equality against the plain SQL filter proves the skip
    is exact (bloom false positives cost a scan, never a row)."""
    import tempfile

    from .sources.table_store import TableStore, _file_may_match

    store = TableStore(tempfile.mkdtemp(prefix="bloom_lookup_"), n_buckets=4,
                       bloom_cols=["path"])
    from .streaming.apply import CdcApplyEngine, EngineConfig

    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    for epoch, batch in enumerate(_incremental_fixture_batches(spark, sf_dir)):
        engine.apply_batch(batch, epoch)
    store.rewrite_buckets(
        spark, min_files=0, cluster_by=["lang"], split_files=4
    )
    keys = ["5", "38", "49", "100"]
    m = store.current_manifest()
    stats = m.get("stats") or {}
    nobloom = {
        p: {"rows": s.get("rows"), "cols": s.get("cols")}
        for p, s in stats.items()
    }
    for key in keys:
        where = [("path", "=", key)]
        with_bloom = sum(
            1 for fs in m["buckets"].values() for p in fs
            if _file_may_match(stats.get(p), where)
        )
        zonemap_only = sum(
            1 for fs in m["buckets"].values() for p in fs
            if _file_may_match(nobloom.get(p), where)
        )
        if with_bloom >= zonemap_only:
            raise RuntimeError(
                f"bloom pruning did not fire for path={key}: "
                f"{with_bloom} vs zonemap-only {zonemap_only}"
            )
    out = None
    for key in keys:
        part = store.read_state(spark, where=[("path", "=", key)])
        out = part if out is None else out.unionByName(part)
    return out.select(
        F.col("path").cast("long").alias("doc_id"),
        "lang",
        F.sha2("content", 256).alias("content_sha"),
    )


SQL_CDC_LOOKUP_BLOOM = """
    SELECT doc_id, lang,
           sha256(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)
             AS content_sha
    FROM documents
    WHERE doc_id % 11 != 0 AND doc_id IN (5, 38, 49, 100)
"""


def q_cdc_scan_pruned_zorder(spark, sf_dir):
    """Z-order clustered scan (the Delta OPTIMIZE ZORDER BY analogue,
    sources/table_store.py _zvalue / rewrite_buckets(cluster_strategy=
    "zorder")): replay the 3-epoch fixture carrying a numeric ``doc_len``
    image field, z-order-cluster on (lang, doc_len), then scan on the
    SECOND cluster dimension alone — the predicate linear lexicographic
    clustering cannot prune (within each lang slice doc_len spans its
    whole domain). The self-audit requires file skipping to have fired on
    the doc_len-only predicate; hash equality against the plain SQL filter
    proves the z layout is row-exact. At 10^10 rows this is what makes a
    second (and third) filter dimension cheap without duplicating the
    table per sort order."""
    import tempfile

    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    store = TableStore(tempfile.mkdtemp(prefix="zorder_scan_"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    batches = _incremental_fixture_batches(spark, sf_dir, with_doc_len=True)
    for epoch, batch in enumerate(batches):
        engine.apply_batch(batch, epoch)
    store.rewrite_buckets(
        spark,
        min_files=0,
        cluster_by=["lang", "doc_len"],
        split_files=4,
        cluster_strategy="zorder",
    )
    where = [("doc_len", ">=", 400)]
    rep = store.prune_report(where)
    if not (0 < rep["files_selected"] < rep["files_total"]):
        raise RuntimeError(f"zorder pruning did not fire: {rep}")
    return store.read_state(spark, where=where).select(
        F.col("path").cast("long").alias("doc_id"),
        "lang",
        "doc_len",
        F.sha2("content", 256).alias("content_sha"),
    )


SQL_CDC_SCAN_PRUNED_ZORDER = """
    SELECT doc_id, lang, doc_len, sha256(t) AS content_sha FROM (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS t,
               CAST(length(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                                ELSE text END) AS BIGINT) AS doc_len
        FROM documents WHERE doc_id % 11 != 0
    ) WHERE doc_len >= 400
"""


def q_cdc_offset_failover(spark, sf_dir):
    """J1/S8 at the VERSION level — consumer-group failover translation
    (MM2 RemoteClusterUtils.translateOffsets, docs/consideration.md:37-48).
    Build primary A with 5 versions: 3 data epochs interleaved with 2
    content-identical rewrite-maintenance commits (the sparse-sync-point
    regime — maintenance versions replicate nothing, exactly like MM2's
    sync topic only recording points where numbering diverges). Cascade
    A -> B, then as-of translate every consumer position k=1..5 against
    the checkpoint table DERIVED AT RUNTIME from B's manifest writer-map
    history (operators/failover.py). The DuckDB oracle recomputes the
    as-of join from the fixture-defined sync table ((1,1),(3,2),(5,3)),
    so hash equality proves both the derived sync table and the rounding-
    down translation semantics.
    """
    import tempfile

    from .operators.changefeed import cascade_catchup
    from .operators.failover import translate_version
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 100
    )

    # envelope builder shares its shape with q_cdc_state_time_travel; the
    # content is irrelevant to the translation — only the commit structure
    # matters — so the batches are simple insert/update slices
    def envelope(sel, op, text_expr, lsn_base):
        img = F.struct(
            F.lit("corpus").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang").alias("lang"),
            text_expr.alias("content"),
        )
        return sel.select(
            F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("doc_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            F.lit(op).alias("op"),
            F.lit(None).cast(
                "struct<repo:string,path:string,commit:string,"
                "lang:string,content:string>"
            ).alias("before"),
            img.alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    a = TableStore(tempfile.mkdtemp(prefix="failover_a_"), n_buckets=4)
    eng = CdcApplyEngine(a, EngineConfig(metrics=False))
    eng.apply_batch(envelope(docs.filter(F.col("doc_id") % 3 == 0), "c",
                             F.col("text"), 0), 0)                     # v1
    a.rewrite_buckets(spark, min_files=0)                              # v2
    eng.apply_batch(envelope(docs.filter(F.col("doc_id") % 3 == 1), "c",
                             F.col("text"), 1_000_000), 1)             # v3
    a.rewrite_buckets(spark, min_files=0)                              # v4
    eng.apply_batch(envelope(docs.filter(F.col("doc_id") % 3 == 0), "u",
                             F.concat(F.col("text"), F.lit(" v2")),
                             2_000_000), 2)                            # v5

    b = TableStore(tempfile.mkdtemp(prefix="failover_b_"), n_buckets=4)
    cascade_catchup(spark, a, CdcApplyEngine(b, EngineConfig(metrics=False)))

    rows = []
    for k in range(1, 6):
        tr = translate_version(b, a.root, k)
        rows.append((k, tr["replica_version"], tr["source_high"]))
    return spark.createDataFrame(
        rows, "src_version long, resume_version long, source_high long"
    )


SQL_CDC_OFFSET_FAILOVER = """
    WITH commits(src_version) AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5))),
         syncs(source_version, replica_version) AS (
             SELECT * FROM (VALUES (1, 1), (3, 2), (5, 3)))
    SELECT c.src_version,
           max(s.replica_version) AS resume_version,
           max(s.source_version)  AS source_high
    FROM commits c JOIN syncs s ON s.source_version <= c.src_version
    GROUP BY c.src_version
"""


def q_agg_view_incremental(spark, sf_dir):
    """Incremental aggregate view maintenance == full recompute
    (operators/agg_view.py — exact IVM with retractions: the replicated
    table's changefeed feeds a persisted GROUP BY view, the lakehouse
    analogue of the consumer-side derived state the reference keeps near
    its mirrored topics, docs/index.md:32-52). Replays the documents
    table through the CDC engine as a 3-epoch insert/update/delete
    fixture, advancing the view after EVERY epoch (O(changed rows) each
    — pre-images retract, post-images add, min/max survive retraction
    via the value-multiset sidecar), then reads the VIEW alone. The
    DuckDB oracle aggregates the FINAL corpus state directly — hash
    equality proves the maintained view converges to full recompute.

    Fixture (deterministic in both engines, same shape as
    q_dedup_incremental_lsh_pairs):
      epoch 0  insert docs with doc_id % 3 != 2
      epoch 1  insert the rest; every doc with doc_id % 7 == 0 gets
               text || ' v2' (updates retract the old length)
      epoch 2  delete docs with doc_id % 11 == 0
    """
    import tempfile

    from .operators.agg_view import IncrementalAggView, Measure
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def env(sel, op_col, text_expr, lsn_base, is_delete=False):
        img = F.struct(
            F.lit("corpus").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang").alias("lang"),
            text_expr.alias("content"),
        )
        is_del = F.lit(is_delete)
        return sel.select(
            F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("doc_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            op_col.alias("op"),
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    v2 = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    b0 = env(docs.filter(F.col("doc_id") % 3 != 2), F.lit("c"), F.col("text"), 0)
    b1 = env(
        docs.filter((F.col("doc_id") % 3 == 2) | (F.col("doc_id") % 7 == 0)),
        F.when(F.col("doc_id") % 3 == 2, F.lit("c")).otherwise(F.lit("u")),
        v2, 1_000_000,
    )
    b2 = env(docs.filter(F.col("doc_id") % 11 == 0), F.lit("d"), F.col("text"),
             2_000_000, is_delete=True)

    src = TableStore(tempfile.mkdtemp(prefix="agg_view_src_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    view = IncrementalAggView(
        tempfile.mkdtemp(prefix="agg_view_"),
        ["lang"],
        [
            Measure("count", None, "n_docs"),
            Measure("sum", "length(content)", "sum_len", dtype="long"),
            Measure("avg", "length(content)", "avg_len", dtype="long"),
            Measure("min", "length(content)", "min_len", dtype="long"),
            Measure("max", "length(content)", "max_len", dtype="long"),
            Measure("count_distinct", "length(content)", "n_len", dtype="long"),
            # exact discrete percentiles under retraction (multiset-backed;
            # DuckDB's quantile_disc shares the ceil(q*n) rank convention)
            Measure("quantile", "length(content)", "p50_len", dtype="long",
                    q=0.5),
            Measure("quantile", "length(content)", "p95_len", dtype="long",
                    q=0.95),
        ],
        n_buckets=4,
    )
    for epoch, batch in enumerate((b0, b1, b2)):
        engine.apply_batch(batch, epoch)
        view.update(spark, src)

    out = view.read(spark)
    return out.select(
        "lang", "n_docs", "sum_len",
        F.round("avg_len", 4).alias("avg_len"),
        "min_len", "max_len", "n_len", "p50_len", "p95_len",
    )


SQL_AGG_VIEW_INCREMENTAL = """
    WITH final AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 11 != 0)
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           round(avg(length(text)), 4) AS avg_len,
           CAST(min(length(text)) AS BIGINT) AS min_len,
           CAST(max(length(text)) AS BIGINT) AS max_len,
           CAST(count(DISTINCT length(text)) AS BIGINT) AS n_len,
           CAST(quantile_disc(length(text), 0.5) AS BIGINT) AS p50_len,
           CAST(quantile_disc(length(text), 0.95) AS BIGINT) AS p95_len
    FROM final GROUP BY lang
"""


def _text_index_fixture(spark, sf_dir):
    """The standard 3-epoch insert/update/delete fixture replayed through
    the CDC engine with an IncrementalTextIndex advancing after EVERY
    epoch — shared by the postings-parity and BM25-search driver queries.
    Returns the advanced index."""
    import tempfile

    from .operators.text_index import IncrementalTextIndex
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def env(sel, op_col, text_expr, lsn_base, is_delete=False):
        img = F.struct(
            F.lit("corpus").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang").alias("lang"),
            text_expr.alias("content"),
        )
        is_del = F.lit(is_delete)
        return sel.select(
            F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("doc_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            op_col.alias("op"),
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    v2 = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    b0 = env(docs.filter(F.col("doc_id") % 3 != 2), F.lit("c"), F.col("text"), 0)
    b1 = env(
        docs.filter((F.col("doc_id") % 3 == 2) | (F.col("doc_id") % 7 == 0)),
        F.when(F.col("doc_id") % 3 == 2, F.lit("c")).otherwise(F.lit("u")),
        v2, 1_000_000,
    )
    b2 = env(docs.filter(F.col("doc_id") % 11 == 0), F.lit("d"), F.col("text"),
             2_000_000, is_delete=True)

    src = TableStore(tempfile.mkdtemp(prefix="tidx_src_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    idx = IncrementalTextIndex(tempfile.mkdtemp(prefix="tidx_"), n_buckets=8)
    for epoch, batch in enumerate((b0, b1, b2)):
        engine.apply_batch(batch, epoch)
        idx.update(spark, src)
    return idx


# the shared DuckDB tokenization of the fixture's FINAL corpus state —
# identical token rule to operators/text_index._tokens (lowercase maximal
# [a-z0-9] runs)
_SQL_TIDX_BASE = """
    WITH final AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 11 != 0),
    toks AS (
      SELECT doc_id,
             list_filter(
               regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'),
               x -> x <> '') AS ts
      FROM final),
    post AS (
      SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl,
                   unnest(ts) AS term
            FROM toks)
      GROUP BY term, doc_id, dl)
"""


def q_text_index_postings(spark, sf_dir):
    """Changefeed-maintained inverted index == full recompute
    (operators/text_index.py — the retrieval half of the training-data
    suite: term-bucketed BM25 postings kept fresh as the replicated corpus
    tails in, merge-on-read delta layers per epoch instead of the CoW
    index rewrite a term-keyed layout can't afford). Replays the standard
    3-epoch insert/update/delete fixture, advancing the index after EVERY
    epoch — epoch 1 updates retract dropped terms via the CDF pre-image,
    epoch 2 deletes retract whole documents — then reads the POSTINGS
    alone. The DuckDB oracle re-tokenizes the FINAL corpus state directly;
    hash equality proves retraction-exact convergence."""
    idx = _text_index_fixture(spark, sf_dir)
    return idx.read_postings(spark).select(
        "term", "repo", "path", "tf", "dl"
    )


SQL_TEXT_INDEX_POSTINGS = _SQL_TIDX_BASE + """
    SELECT term, 'corpus' AS repo, CAST(doc_id AS VARCHAR) AS path, tf, dl
    FROM post
"""


def q_text_search_bm25(spark, sf_dir):
    """BM25 ranked retrieval answered from the persisted postings index
    (operators/text_index.py search_bm25 — q term buckets scanned, one
    shuffle on the doc key, global top-k; the corpus text is never read at
    query time). Same 3-epoch fixture as q_text_index_postings; the DuckDB
    oracle computes the identical Robertson idf / tf-norm formula over the
    final corpus state. Scores rounded to 4 in BOTH engines so values and
    the (score desc, key) tie-break agree."""
    idx = _text_index_fixture(spark, sf_dir)
    return idx.search_bm25(spark, ["merge", "vector", "stream"], k=25)


SQL_TEXT_SEARCH_BM25 = _SQL_TIDX_BASE + """
    , stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             avg(CAST(len(ts) AS DOUBLE)) AS avgdl
      FROM toks),
    q(qterm) AS (SELECT * FROM (VALUES ('merge'), ('vector'), ('stream'))),
    dfq AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df
      FROM post JOIN q ON term = qterm GROUP BY term),
    scored AS (
      SELECT p.doc_id,
             ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * CAST(p.tf AS DOUBLE) * (1.2 + 1)
             / (CAST(p.tf AS DOUBLE)
                + 1.2 * (1 - 0.75 + 0.75 * CAST(p.dl AS DOUBLE) / s.avgdl))
             AS sc
      FROM post p JOIN dfq d USING (term) CROSS JOIN stats s)
    SELECT 'corpus' AS repo, CAST(doc_id AS VARCHAR) AS path,
           round(sum(sc), 4) AS score, CAST(count(*) AS BIGINT) AS n_terms
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, repo, path LIMIT 25
"""


def q_text_search_phrase(spark, sf_dir):
    """Exact phrase matching from the positional postings
    (operators/text_index.py search_phrase — per-posting 1-based ordinal
    lists intersected after per-term shifts, pure JVM array expressions;
    the corpus text is never read at query time). Two phrases per run:
    'fast merge' (the common case) and 'table table' (the repeated-term
    edge where naive two-set intersection over the SAME posting must
    shift-align correctly). The DuckDB oracle re-derives ordinals with
    generate_series indexing and self-joins on ord+1 — hash equality
    proves position maintenance through the 3-epoch fixture's updates and
    deletes."""
    idx = _text_index_fixture(spark, sf_dir)
    parts = [
        idx.search_phrase(spark, phrase).withColumn(
            "phrase", F.lit(phrase)
        )
        for phrase in ("fast merge", "table table")
    ]
    return parts[0].unionByName(parts[1]).select(
        "phrase", "repo", "path", "n_hits"
    )


SQL_TEXT_SEARCH_PHRASE = _SQL_TIDX_BASE + """
    , expl AS (
      SELECT doc_id, ts[g.ord] AS term, CAST(g.ord AS BIGINT) AS ord
      FROM toks, UNNEST(generate_series(1, len(ts))) AS g(ord)),
    q(phrase, w1, w2) AS (
      SELECT * FROM (VALUES ('fast merge', 'fast', 'merge'),
                            ('table table', 'table', 'table'))),
    hits AS (
      SELECT q.phrase, e1.doc_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM q
      JOIN expl e1 ON e1.term = q.w1
      JOIN expl e2 ON e2.doc_id = e1.doc_id AND e2.ord = e1.ord + 1
                   AND e2.term = q.w2
      GROUP BY q.phrase, e1.doc_id)
    SELECT phrase, 'corpus' AS repo, CAST(doc_id AS VARCHAR) AS path, n_hits
    FROM hits
"""


def q_corpus_shard_assignment(spark, sf_dir):
    """Deterministic corpus shuffle + exact distributed ranking + shard
    assignment (operators/shards.py — the curated-corpus -> trainer step:
    a seed-keyed md5 permutation cut into fixed-size shards; rank computed
    by the two-pass slice-offset method, never a single-partition global
    window). The DuckDB oracle recomputes the identical md5 mix and a
    plain row_number over it — hash equality proves the distributed rank
    IS the global rank and the shard cut points land exactly."""
    from .operators.shards import assign_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "lang"
    )
    out = assign_shards(docs, ["doc_id"], rows_per_shard=64, seed="epoch7")
    return out.select(
        "doc_id", "lang",
        F.col("_h").alias("mix"),
        F.col("_rank").alias("rank"),
        F.col("_shard").alias("shard"),
    )


SQL_CORPUS_SHARD_ASSIGNMENT = """
    WITH mixed AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang,
             md5('epoch7' || chr(1) || CAST(doc_id AS VARCHAR)) AS mix
      FROM documents),
    ranked AS (
      SELECT doc_id, lang, mix,
             CAST(row_number() OVER (ORDER BY mix, doc_id) AS BIGINT) AS rank
      FROM mixed)
    SELECT doc_id, lang, mix, rank,
           CAST(floor((rank - 1) / 64) AS BIGINT) AS shard
    FROM ranked
"""


def q_cdc_key_history(spark, sf_dir):
    """Per-key audit trail across committed versions
    (operators/changefeed.py key_history — Debezium's "all changes for
    key X" / an Iceberg changelog scan filtered to a key; the reference's
    keyed-topic consumers read exactly one key's partition,
    mirror-maker-2/SendProductToKafka.py:48). Replays the documents table
    through the CDC engine as the standard 3-epoch
    insert/update/delete fixture, then audits the doc_id % 83 == 0 keys:
    one row per (key, version) transition, deletes carrying the
    pre-image. The version loop skips untouched-bucket versions on
    manifest metadata alone; the DuckDB oracle reconstructs the expected
    trail from the fixture rules directly."""
    import tempfile

    from .operators.changefeed import key_history
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def env(sel, op_col, text_expr, lsn_base, is_delete=False):
        img = F.struct(
            F.lit("corpus").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang").alias("lang"),
            text_expr.alias("content"),
        )
        is_del = F.lit(is_delete)
        return sel.select(
            F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("doc_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            op_col.alias("op"),
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    v2 = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    b0 = env(docs.filter(F.col("doc_id") % 3 != 2), F.lit("c"), F.col("text"), 0)
    b1 = env(
        docs.filter((F.col("doc_id") % 3 == 2) | (F.col("doc_id") % 7 == 0)),
        F.when(F.col("doc_id") % 3 == 2, F.lit("c")).otherwise(F.lit("u")),
        v2, 1_000_000,
    )
    b2 = env(docs.filter(F.col("doc_id") % 11 == 0), F.lit("d"), F.col("text"),
             2_000_000, is_delete=True)

    store = TableStore(tempfile.mkdtemp(prefix="key_history_"), n_buckets=8)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    for epoch, batch in enumerate((b0, b1, b2)):
        engine.apply_batch(batch, epoch)

    keys = [
        ("corpus", str(r["doc_id"]))
        for r in docs.filter(F.col("doc_id") % 83 == 0)
        .select("doc_id").collect()
    ]
    hist = key_history(spark, store, sorted(keys))
    return hist.select(
        F.col("path").alias("doc_id"),
        F.col("_change_type").alias("change_type"),
        "content",
        F.col("_commit_version").alias("version"),
    )


SQL_CDC_KEY_HISTORY = """
    WITH k AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 83 = 0),
    v2txt AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS t2,
             text
      FROM k)
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'insert' AS change_type,
           text AS content, 1::BIGINT AS version
    FROM v2txt WHERE doc_id % 3 != 2
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR), 'insert', t2, 2::BIGINT
    FROM v2txt WHERE doc_id % 3 = 2
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR), 'update', t2, 2::BIGINT
    FROM v2txt WHERE doc_id % 3 != 2 AND doc_id % 7 = 0
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR), 'delete', t2, 3::BIGINT
    FROM v2txt WHERE doc_id % 11 = 0
"""


def _scd2_fixture_view(spark, sf_dir):
    """Build the standard 3-epoch documents fixture through the CDC
    engine and advance an Scd2View per epoch; shared by the timeline
    oracle query and the temporal-join oracle query. Fixture rules
    (deterministic in both engines):

      epoch 0 (v1)  insert docs with doc_id % 3 != 2 (original text)
      epoch 1 (v2)  insert the rest; docs with doc_id % 7 == 0 carry
                    text || ' v2' (op=u where already live)
      epoch 2 (v3)  delete docs with doc_id % 11 == 0
    """
    import tempfile

    from .operators.scd import Scd2View
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def env(sel, op_col, text_expr, lsn_base, is_delete=False):
        img = F.struct(
            F.lit("corpus").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang").alias("lang"),
            text_expr.alias("content"),
        )
        is_del = F.lit(is_delete)
        return sel.select(
            F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("doc_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            op_col.alias("op"),
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    v2 = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    b0 = env(docs.filter(F.col("doc_id") % 3 != 2), F.lit("c"), F.col("text"), 0)
    b1 = env(
        docs.filter((F.col("doc_id") % 3 == 2) | (F.col("doc_id") % 7 == 0)),
        F.when(F.col("doc_id") % 3 == 2, F.lit("c")).otherwise(F.lit("u")),
        v2, 1_000_000,
    )
    b2 = env(docs.filter(F.col("doc_id") % 11 == 0), F.lit("d"), F.col("text"),
             2_000_000, is_delete=True)

    src = TableStore(tempfile.mkdtemp(prefix="scd2_src_"), n_buckets=8)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    view = Scd2View(tempfile.mkdtemp(prefix="scd2_"), n_buckets=8)
    for epoch, batch in enumerate((b0, b1, b2)):
        engine.apply_batch(batch, epoch)
        view.update(spark, src)
    return view


def q_scd2_history(spark, sf_dir):
    """SCD Type-2 timeline maintained from the exact per-version
    changefeed (operators/scd.py — the canonical Debezium-downstream
    history sink over a replicated topic: one row per (key, image) with
    [valid_from, valid_to) commit-version stamps, current image open).
    Replays the documents table through the CDC engine as the standard
    3-epoch insert/update/delete fixture (_scd2_fixture_view), advancing
    the timeline after every epoch, then reads the FULL timeline. The
    DuckDB oracle reconstructs every interval from the fixture rules
    directly — hash equality proves the maintained timeline captures
    every transition with exact interval bounds, deletes closing without
    opening."""
    view = _scd2_fixture_view(spark, sf_dir)
    return view.history(spark).select(
        F.col("path").alias("doc_id"),
        "content",
        F.col("_valid_from").alias("valid_from"),
        F.col("_valid_to").alias("valid_to"),
    )


SQL_SCD2_HISTORY = """
    WITH d AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS t2
      FROM documents)
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS content,
           1::BIGINT AS valid_from,
           CAST(CASE WHEN doc_id % 7 = 0 THEN 2
                     WHEN doc_id % 11 = 0 THEN 3 END AS BIGINT) AS valid_to
    FROM d WHERE doc_id % 3 != 2
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR), t2, 2::BIGINT,
           CAST(CASE WHEN doc_id % 11 = 0 THEN 3 END AS BIGINT)
    FROM d WHERE doc_id % 3 = 2 OR (doc_id % 3 != 2 AND doc_id % 7 = 0)
"""


def q_scd2_enrich_asof(spark, sf_dir):
    """Temporal table join (operators/scd.py enrich_asof — Flink's FOR
    SYSTEM_TIME AS OF over the SCD2 timeline): every (doc, version) probe
    fact gets the image valid at that version, NULL where the key wasn't
    live (before first insert / after delete). NOT an interval join — the
    one-shuffle LOCF construction: interval starts and facts union, hash-
    partition once on the key, one last(ignorenulls) window carries the
    latest image onto each fact, the carried valid_to decides coverage.
    The plan audit asserts one exchange and no nested-loop join; the
    DuckDB oracle derives each probe's expected image from the fixture
    rules directly. Probes: every document at versions 1, 2, 3 (after
    each fixture epoch)."""
    from .operators.scd import enrich_asof

    view = _scd2_fixture_view(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    facts = docs.select(
        F.lit("corpus").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("v"),
    )
    out = enrich_asof(
        facts, view.history(spark), ["repo", "path"], "v",
        dim_cols=["content"],
    )
    return out.select(
        F.col("path").alias("doc_id"),
        F.col("v").alias("as_of_version"),
        "content",
    )


SQL_SCD2_ENRICH_ASOF = """
    WITH d AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS t2
      FROM documents),
    f AS (SELECT doc_id, text, t2, v::BIGINT AS v
          FROM d CROSS JOIN range(1, 4) t(v))
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, v AS as_of_version,
           CASE WHEN v = 1 THEN (CASE WHEN doc_id % 3 != 2 THEN text END)
                WHEN v = 2 THEN t2
                ELSE (CASE WHEN doc_id % 11 != 0 THEN t2 END)
           END AS content
    FROM f
"""


def q_decontam_incremental(spark, sf_dir):
    """Incremental decontamination index == batch corpus re-scan
    (operators/decontam_index.py): the corpus replays through the CDC
    engine as the standard 3-epoch insert/update/delete fixture with the
    fingerprint index advancing after every epoch (O(changed docs) each —
    deletes retract, updates re-fingerprint), then a benchmark (docs 0-4's
    ORIGINAL text) probes the persisted index without touching corpus
    text. The DuckDB oracle runs the exact-n-gram overlap over the FINAL
    corpus state — hash equality proves index-probed contamination equals
    full re-tokenization."""
    import tempfile

    from .operators.decontam_index import IncrementalDecontamIndex
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def env(sel, op_col, text_expr, lsn_base, is_delete=False):
        img = F.struct(
            F.lit("corpus").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("lang").alias("lang"),
            text_expr.alias("content"),
        )
        is_del = F.lit(is_delete)
        return sel.select(
            F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("doc_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            op_col.alias("op"),
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    v2 = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    b0 = env(docs.filter(F.col("doc_id") % 3 != 2), F.lit("c"), F.col("text"), 0)
    b1 = env(
        docs.filter((F.col("doc_id") % 3 == 2) | (F.col("doc_id") % 7 == 0)),
        F.when(F.col("doc_id") % 3 == 2, F.lit("c")).otherwise(F.lit("u")),
        v2, 1_000_000,
    )
    b2 = env(docs.filter(F.col("doc_id") % 11 == 0), F.lit("d"), F.col("text"),
             2_000_000, is_delete=True)

    src = TableStore(tempfile.mkdtemp(prefix="decontam_src_"), n_buckets=8)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    index = IncrementalDecontamIndex(
        tempfile.mkdtemp(prefix="decontam_idx_"), n_buckets=8)
    for epoch, batch in enumerate((b0, b1, b2)):
        engine.apply_batch(batch, epoch)
        index.update(spark, src)

    probes = docs.filter(F.col("doc_id") < 5)
    return (
        index.contaminated(spark, probes)
        .filter(F.col("path").cast("long") >= 5)
        .select(
            F.col("path").cast("long").alias("doc_id"),
            "n_hit_ngrams",
            "n_probes",
        )
    )


SQL_DECONTAM_INCREMENTAL = r"""
    WITH final AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 11 != 0),
    cw AS (SELECT doc_id AS doc, string_split_regex(trim(text), '\s+') AS w
           FROM final),
    csh AS (
      SELECT DISTINCT doc, unnest(list_transform(range(greatest(len(w) - 2, 0)),
                                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
      FROM cw),
    pw AS (SELECT doc_id AS probe, string_split_regex(trim(text), '\s+') AS w
           FROM documents WHERE doc_id < 5),
    psh AS (
      SELECT DISTINCT probe, unnest(list_transform(range(greatest(len(w) - 2, 0)),
                                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingle
      FROM pw)
    SELECT c.doc AS doc_id,
           count(DISTINCT c.shingle) AS n_hit_ngrams,
           count(DISTINCT p.probe) AS n_probes
    FROM csh c JOIN psh p USING (shingle)
    WHERE c.doc >= 5
    GROUP BY 1
"""


def q_cdc_retention_expiry(spark, sf_dir):
    """retention.ms by mechanism (operators/retention.py; the reference
    provisions its mirrored topics with retention.ms: 7200000,
    provisioning.md:188): rows whose retention timestamp fell behind the
    cutoff leave the table in ONE maintenance commit whose version diff
    is their deletes. Replays the events table through the CDC engine in
    two epochs (evolved ``updated_at`` epoch-ms column), time-clusters
    the layout so manifest zonemaps are tight, runs the expiry pass, and
    self-audits that file pruning actually fired (a pass over a
    time-clustered table is O(expired), not O(table)). Oracle: the same
    cutoff as a plain filter over the source — hash equality proves the
    expiry removed exactly the behind-window rows and nothing else."""
    import tempfile

    from .operators.retention import expire_rows
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    def env(sel, lsn_base):
        img = F.struct(
            F.lit("ev").alias("repo"),
            F.col("event_id").cast("string").alias("path"),
            F.lit("c0").alias("commit"),
            F.col("event_type").alias("lang"),
            F.col("props").alias("content"),
            # session tz is UTC, so the NTZ->TZ cast is exact
            F.unix_millis(F.col("ts").cast("timestamp")).alias("updated_at"),
        )
        return sel.select(
            F.pmod(F.col("event_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("event_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            F.lit("c").alias("op"),
            F.when(F.lit(False), img).alias("before"),  # typed null struct
            img.alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    store = TableStore(tempfile.mkdtemp(prefix="retention_"), n_buckets=8)
    engine = CdcApplyEngine(store, EngineConfig(metrics=False))
    engine.apply_batch(env(events.filter(F.col("event_id") % 2 == 0), 0), 0)
    engine.apply_batch(
        env(events.filter(F.col("event_id") % 2 == 1), 1_000_000), 1
    )
    store.rewrite_buckets(
        spark, min_files=0, cluster_by=["updated_at"], split_files=4
    )
    cutoff = 1_705_276_800_000  # 2024-01-15T00:00:00Z, epoch ms
    out = expire_rows(spark, store, [("updated_at", "<", cutoff)])
    if out["status"] == "committed" and out["files_skipped"] <= 0:
        raise AssertionError(
            "retention self-audit: time-clustered expiry must skip files "
            f"({out})"
        )
    return store.read_state(spark).select(
        F.col("path").alias("event_id"),
        F.col("lang").alias("event_type"),
        "updated_at",
    )


SQL_CDC_RETENTION_EXPIRY = """
    SELECT CAST(event_id AS VARCHAR) AS event_id,
           event_type,
           epoch_ms(ts) AS updated_at
    FROM events
    WHERE epoch_ms(ts) >= 1705276800000
"""


def q_join_view_incremental(spark, sf_dir):
    """Incremental equi-join view maintenance == full LEFT JOIN recompute
    (operators/join_view.py — the delta-join twin of agg_view: a fact
    stream enriched against a replicated dimension, the Kafka Streams
    KTable-KTable join a consumer of two mirrored topics materializes,
    docs/index.md:32-52). Replays orders (fact, fk = custkey riding the
    envelope's lang column) and customer (dim) through TWO CDC engines as
    a 3-epoch insert/update/delete fixture, advancing the view after
    EVERY epoch — fact-driven additions broadcast-join a key-pruned dim
    slice, dim-driven patches rewrite only the view's fk-hash buckets —
    then reads the VIEW alone. The DuckDB oracle LEFT JOINs the FINAL
    states directly; hash equality proves the maintained view converges
    to full recompute through late-arriving dims (resurrection), dim
    updates (patch propagation), dim deletes (un-matching), fk repoints,
    and fact deletes.

    Fixture (deterministic in both engines):
      epoch 0  dims c_custkey % 4 != 3; facts o_orderkey % 3 == 0
      epoch 1  late dims (% 4 == 3); dim update: % 5 == 0 gets
               mktsegment || ' v2'; facts % 3 == 1; fk repoint: facts
               with % 3 == 0 and % 7 == 0 move to (o_custkey % 100) + 1
      epoch 2  dim deletes % 9 == 0; fact deletes % 3 == 0 and % 11 == 0
    """
    import tempfile

    from .operators.join_view import IncrementalJoinView
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def env(sel, key_col, op_col, lang_expr, content_expr, lsn_base,
            is_delete=False):
        img = F.struct(
            F.lit("orders" if key_col == "o_orderkey" else "cust").alias("repo"),
            F.col(key_col).cast("string").alias("path"),
            F.lit("c0").alias("commit"),
            lang_expr.cast("string").alias("lang"),
            content_expr.alias("content"),
        )
        is_del = F.lit(is_delete)
        return sel.select(
            F.pmod(F.col(key_col), F.lit(4)).cast("int").alias("partition"),
            (F.col(key_col) + F.lit(lsn_base)).cast("long").alias("lsn"),
            op_col.alias("op"),
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    k = F.col("o_orderkey")
    ck = F.col("c_custkey")
    seg_v2 = F.concat(F.col("c_mktsegment"), F.lit(" v2"))
    new_fk = (F.col("o_custkey") % 100) + 1

    d0 = env(cust.filter(ck % 4 != 3), "c_custkey", F.lit("c"), F.lit(None),
             F.col("c_mktsegment"), 0)
    f0 = env(orders.filter(k % 3 == 0), "o_orderkey", F.lit("c"),
             F.col("o_custkey"), F.col("o_orderpriority"), 0)
    d1 = env(cust.filter(ck % 4 == 3), "c_custkey", F.lit("c"), F.lit(None),
             F.col("c_mktsegment"), 1_000_000).unionByName(
        env(cust.filter(ck % 5 == 0), "c_custkey", F.lit("u"), F.lit(None),
            seg_v2, 1_100_000)
    )
    f1 = env(orders.filter(k % 3 == 1), "o_orderkey", F.lit("c"),
             F.col("o_custkey"), F.col("o_orderpriority"), 1_000_000).unionByName(
        env(orders.filter((k % 3 == 0) & (k % 7 == 0)), "o_orderkey",
            F.lit("u"), new_fk, F.col("o_orderpriority"), 1_100_000)
    )
    d2 = env(cust.filter(ck % 9 == 0), "c_custkey", F.lit("d"), F.lit(None),
             F.col("c_mktsegment"), 2_000_000, is_delete=True)
    f2 = env(orders.filter((k % 3 == 0) & (k % 11 == 0)), "o_orderkey",
             F.lit("d"), F.lit(None), F.lit(None).cast("string"), 2_000_000,
             is_delete=True)

    fact = TableStore(tempfile.mkdtemp(prefix="join_view_fact_"), n_buckets=8)
    dim = TableStore(tempfile.mkdtemp(prefix="join_view_dim_"), n_buckets=8)
    fe = CdcApplyEngine(fact, EngineConfig(metrics=False))
    de = CdcApplyEngine(dim, EngineConfig(metrics=False))
    view = IncrementalJoinView(
        tempfile.mkdtemp(prefix="join_view_"),
        fk_exprs={"repo": "'cust'", "path": "lang"},
        fact_cols={"o_priority": "content"},
        dim_cols={"c_mktsegment": "content"},
        n_buckets=8,
    )
    for epoch, (db, fb) in enumerate(((d0, f0), (d1, f1), (d2, f2))):
        de.apply_batch(db, epoch)
        fe.apply_batch(fb, epoch)
        view.update(spark, fact, dim)

    out = view.read(spark)
    return out.select(
        F.col("path").alias("o_orderkey"),
        F.col("_fk_path").alias("o_custkey"),
        "o_priority",
        "c_mktsegment",
        F.col("_matched").cast("int").alias("matched"),
    )


SQL_JOIN_VIEW_INCREMENTAL = """
    WITH of AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 AND o_orderkey % 7 = 0
                  THEN (o_custkey % 100) + 1 ELSE o_custkey END AS ck,
             o_orderpriority
      FROM orders
      WHERE o_orderkey % 3 IN (0, 1)
        AND NOT (o_orderkey % 3 = 0 AND o_orderkey % 11 = 0)),
    cf AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN c_mktsegment || ' v2'
                  ELSE c_mktsegment END AS seg
      FROM customer WHERE c_custkey % 9 != 0)
    SELECT CAST(of.o_orderkey AS VARCHAR) AS o_orderkey,
           CAST(of.ck AS VARCHAR) AS o_custkey,
           of.o_orderpriority AS o_priority,
           cf.seg AS c_mktsegment,
           CASE WHEN cf.c_custkey IS NULL THEN 0 ELSE 1 END AS matched
    FROM of LEFT JOIN cf ON of.ck = cf.c_custkey
"""


def q_dedup_simhash(spark, sf_dir):
    return simhash(_docs(spark, sf_dir))


SQL_DEDUP_SIMHASH = r"""
    WITH tokens AS (
      SELECT DISTINCT doc_id AS doc, unnest(string_split_regex(trim(text), '\s+')) AS word
      FROM documents),
    h AS (SELECT doc, ('0x' || substr(md5(word), 1, 8))::BIGINT AS h FROM tokens),
    bits AS (
      SELECT doc, pos, CASE WHEN ((h >> pos) & 1) = 1 THEN 1 ELSE -1 END AS vote
      FROM h CROSS JOIN (SELECT unnest(range(32)) AS pos) p),
    votes AS (SELECT doc, pos, sum(vote) AS v FROM bits GROUP BY 1, 2)
    SELECT doc, sum(CASE WHEN v > 0 THEN (1::BIGINT << pos) ELSE 0 END)::BIGINT AS simhash
    FROM votes GROUP BY doc
"""

# explicit left-fold double cosine (bit-identical in both engines)
_COS_SQL = (
    "list_sum(list_transform(range(len({a})), j -> {a}[j+1]::DOUBLE * {b}[j+1]::DOUBLE)) / "
    "(sqrt(list_sum(list_transform(range(len({a})), j -> {a}[j+1]::DOUBLE * {a}[j+1]::DOUBLE))) * "
    "sqrt(list_sum(list_transform(range(len({b})), j -> {b}[j+1]::DOUBLE * {b}[j+1]::DOUBLE))))"
)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs sharing any word 3-gram with the
    probe set (docs 0-4 standing in for an eval benchmark). The corpus has
    planted near-dupes, so contamination hits are guaranteed."""
    from .operators.dedup_docs import decontaminate

    docs = _docs(spark, sf_dir)
    return decontaminate(
        docs.filter(F.col("doc_id") >= 5), docs.filter(F.col("doc_id") < 5)
    )


SQL_DECONTAMINATE = f"""
    WITH {{shingles}},
    probe AS (SELECT doc AS probe, shingle FROM sh WHERE doc < 5),
    corpus AS (SELECT doc, shingle FROM sh WHERE doc >= 5)
    SELECT c.doc AS doc_id,
           count(DISTINCT c.shingle) AS n_hit_ngrams,
           count(DISTINCT p.probe) AS n_probes
    FROM corpus c JOIN probe p USING (shingle)
    GROUP BY 1
""".format(shingles=_SHINGLES_SQL)


def q_ann_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 10), k=5)


SQL_ANN_COSINE_TOPK = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, {_COS_SQL.format(a="qv", b="cv")} AS cos
      FROM q, c WHERE neighbor_id <> query_id),
    ranked AS (
      SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
"""


def q_ann_cosine_topk_lsh(spark, sf_dir):
    """Approximate variant. The hyperplanes are deterministic (plane p
    component j = centered md5("p:j"), similarity.py:_plane_component), so
    the whole bucket assignment + bucket-join + top-k IS SQL-expressible —
    the oracle recomputes the identical signatures in DuckDB. Recall vs
    brute force is additionally asserted in tests."""
    emb = _emb(spark, sf_dir)
    return cosine_topk_lsh(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _lsh_plane_sql(p: int) -> str:
    # identical to similarity._plane_component: conv(md5("p:j")[0:8],16,10)
    # centered at 2^31; j is the 1-based vector index
    return (
        f"(('0x'||substring(md5('{p}:'||(j+1)::VARCHAR),1,8))::BIGINT::DOUBLE"
        " - 2147483648.0)"
    )


def _lsh_dot_sql(p: int, v: str) -> str:
    return (
        f"list_sum(list_transform(range(len({v})), "
        f"j -> {v}[j+1]::DOUBLE * {_lsh_plane_sql(p)}))"
    )


def _lsh_sig_sql(v: str, n_planes: int = 8) -> str:
    terms = [
        f"(CASE WHEN {_lsh_dot_sql(p, v)} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    ]
    return "(" + " + ".join(terms) + ")"


SQL_ANN_COSINE_TOPK_LSH = f"""
    WITH c AS (SELECT vec_id AS neighbor_id, embedding AS cvec,
                      {_lsh_sig_sql('embedding')} AS bucket FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qvec,
                 {_lsh_sig_sql('embedding')} AS bucket FROM embeddings
          WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_COS_SQL.format(a="q.qvec", b="c.cvec")} AS cos
      FROM c JOIN q USING (bucket)
      WHERE c.neighbor_id != q.query_id)
    SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored) WHERE rank <= 5
"""


def q_ann_cosine_topk_ivf(spark, sf_dir):
    """IVF coarse-quantizer + multi-probe variant — the 10^9-vector scale
    path (cells adapt to data; candidates/query ~ n_probe/n_cells of the
    corpus). Fully deterministic (sample centroids, explicit tiebreaks),
    so it carries an exact SQL oracle; recall@k >= 0.9 vs brute force is
    additionally asserted in tests/test_training_data_ops.py."""
    from .operators.similarity import cosine_topk_ivf

    emb = _emb(spark, sf_dir)
    return cosine_topk_ivf(emb, emb.filter(F.col("vec_id") < 10), k=5,
                           n_cells=16, n_probe=6)


def q_ann_cosine_topk_ivf_trained(spark, sf_dir):
    """IVF with k-means-TRAINED centroids (spherical Lloyd, distributed —
    operators/similarity.py:train_ivf_centroids): the data-adaptive
    quantizer for clustered corpora where a deterministic sample collapses
    (recall uplift asserted in tests/test_training_data_ops.py). No SQL
    oracle — iterative float means are not exactly reproducible in DuckDB;
    the driver records the rows-only check, and the exact-oracle IVF twin
    (`ann_cosine_topk_ivf`) pins the probe plan's correctness."""
    from .operators.similarity import cosine_topk_ivf, train_ivf_centroids

    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(emb, n_cells=16, n_iters=2)
    return cosine_topk_ivf(emb, emb.filter(F.col("vec_id") < 10), k=5,
                           n_cells=16, n_probe=6, centroids=cents)


SQL_ANN_COSINE_TOPK_IVF = f"""
    WITH cents AS (
      SELECT vec_id AS cell, embedding AS cv FROM embeddings
      ORDER BY vec_id LIMIT 16),
    c_sim AS (
      SELECT e.vec_id, e.embedding, c.cell,
             {_COS_SQL.format(a="e.embedding", b="c.cv")} AS sim
      FROM embeddings e CROSS JOIN cents c),
    c_assign AS (
      SELECT vec_id AS neighbor_id, embedding AS cvec, cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cell DESC) AS rn
        FROM c_sim) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 10),
    q_sim AS (
      SELECT q.query_id, q.qv, c.cell,
             {_COS_SQL.format(a="q.qv", b="c.cv")} AS sim
      FROM q CROSS JOIN cents c),
    q_probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY sim DESC, cell) AS pr
        FROM q_sim) WHERE pr <= 6),
    scored AS (
      SELECT p.query_id, a.neighbor_id,
             {_COS_SQL.format(a="p.qv", b="a.cvec")} AS cos
      FROM c_assign a JOIN q_probes p USING (cell)
      WHERE a.neighbor_id != p.query_id)
    SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored) WHERE rank <= 5
"""


def q_ann_cosine_topk_ivf_incremental(spark, sf_dir):
    """Changefeed-maintained IVF index == full batch recompute
    (operators/ann_incremental.py — the embedding twin of the incremental
    dedup index: per-vector cell assignments are PERSISTED and advanced
    per epoch from table_changes, never re-quantizing the corpus). Replays
    the embeddings table through the CDC engine as a 3-epoch
    insert/update/delete fixture, advancing the index after every epoch
    (O(changed vectors) each), then answers top-k from the index alone.
    The DuckDB oracle computes the IVF probe over the FINAL corpus state
    with the same frozen centroids — hash equality proves incremental
    assignment maintenance converges to full recompute.

    Fixture (deterministic in both engines):
      epoch 0  insert vecs with vec_id % 3 != 2
      epoch 1  insert the rest; every vec with vec_id % 7 == 0 gets each
               component +0.25 (new vecs arrive perturbed, old ones update
               — updates REASSIGN cells)
      epoch 2  delete vecs with vec_id % 11 == 0 (index rows retracted)
    Centroids: the lowest-16 original vectors, frozen at index creation
    (model state — immutable for the index's lifetime)."""
    import tempfile

    from .operators.ann_incremental import IncrementalAnnIndex
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v2 = F.when(
        F.col("vec_id") % 7 == 0,
        F.transform(F.col("embedding"), lambda x: x.cast("double") + F.lit(0.25)),
    ).otherwise(as_double)

    def env(sel, op_col, emb_expr, lsn_base, is_delete=False):
        img = F.struct(
            F.lit("corpus").alias("repo"),
            F.col("vec_id").cast("string").alias("path"),
            emb_expr.alias("embedding"),
        )
        is_del = F.lit(is_delete)
        return sel.select(
            F.pmod(F.col("vec_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("vec_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            op_col.alias("op"),
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    b0 = env(emb.filter(F.col("vec_id") % 3 != 2), F.lit("c"), as_double, 0)
    b1 = env(
        emb.filter((F.col("vec_id") % 3 == 2) | (F.col("vec_id") % 7 == 0)),
        F.when(F.col("vec_id") % 3 == 2, F.lit("c")).otherwise(F.lit("u")),
        v2, 1_000_000,
    )
    b2 = env(emb.filter(F.col("vec_id") % 11 == 0), F.lit("d"), as_double,
             2_000_000, is_delete=True)

    src = TableStore(tempfile.mkdtemp(prefix="ann_inc_src_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    index = IncrementalAnnIndex(
        tempfile.mkdtemp(prefix="ann_inc_idx_"), n_buckets=4
    )
    index.set_centroids(
        emb.orderBy("vec_id").limit(16).select(
            F.col("vec_id").cast("int").alias("cell"),
            as_double.alias("_centroid"),
        )
    )
    for epoch, batch in enumerate((b0, b1, b2)):
        engine.apply_batch(batch, epoch)
        index.update(spark, src)

    queries = src.read_state(spark).select(
        F.col("path").cast("long").alias("vec_id"), "embedding"
    ).filter(F.col("vec_id") < 10)
    return index.topk(spark, queries, k=5, n_probe=6)


SQL_ANN_COSINE_TOPK_IVF_INCREMENTAL = f"""
    WITH final AS (
      SELECT vec_id,
             CASE WHEN vec_id % 7 = 0
                  THEN list_transform(embedding, x -> x::DOUBLE + 0.25)
                  ELSE list_transform(embedding, x -> x::DOUBLE) END AS embedding
      FROM embeddings WHERE vec_id % 11 != 0),
    cents AS (
      SELECT vec_id AS cell, list_transform(embedding, x -> x::DOUBLE) AS cv
      FROM embeddings ORDER BY vec_id LIMIT 16),
    c_sim AS (
      SELECT e.vec_id, e.embedding, c.cell,
             {_COS_SQL.format(a="e.embedding", b="c.cv")} AS sim
      FROM final e CROSS JOIN cents c),
    c_assign AS (
      SELECT vec_id AS neighbor_id, embedding AS cvec, cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cell DESC) AS rn
        FROM c_sim) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM final WHERE vec_id < 10),
    q_sim AS (
      SELECT q.query_id, q.qv, c.cell,
             {_COS_SQL.format(a="q.qv", b="c.cv")} AS sim
      FROM q CROSS JOIN cents c),
    q_probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY sim DESC, cell) AS pr
        FROM q_sim) WHERE pr <= 6),
    scored AS (
      SELECT p.query_id, a.neighbor_id,
             {_COS_SQL.format(a="p.qv", b="a.cvec")} AS cos
      FROM c_assign a JOIN q_probes p USING (cell)
      WHERE a.neighbor_id != p.query_id)
    SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored) WHERE rank <= 5
"""


def q_dedup_embedding_cosine(spark, sf_dir):
    return embedding_neardup_pairs(_emb(spark, sf_dir), threshold=0.3)


SQL_DEDUP_EMBEDDING_COSINE = f"""
    WITH a AS (SELECT label AS _b, vec_id AS id1, embedding AS v1 FROM embeddings),
    b AS (SELECT label AS _b, vec_id AS id2, embedding AS v2 FROM embeddings),
    pairs AS (
      SELECT id1, id2, {_COS_SQL.format(a="v1", b="v2")} AS cos
      FROM a JOIN b USING (_b) WHERE id1 < id2)
    SELECT id1, id2, round(cos, 4) AS cos_sim FROM pairs WHERE cos >= 0.3
"""


def q_semdedup_keep(spark, sf_dir):
    """SemDeDup semantic deduplication (operators/similarity.py:semdedup —
    Abbas et al. 2023): coarse-cluster into 16 cells, drop every vector with
    a lower-id same-cell neighbor above the cosine threshold. The cell
    equi-join bounds the pairwise cosine to ~1/n_cells of the corpus per
    side — the paper's shape for browser-scale corpora. Deterministic
    sampled centroids + greedy keep-lowest-id make it exactly
    SQL-reproducible (the trained-centroid variant rides
    train_ivf_centroids, same as IVF)."""
    from .operators.similarity import semdedup

    return semdedup(_emb(spark, sf_dir), threshold=0.3, n_cells=16)


SQL_SEMDEDUP_KEEP = f"""
    WITH cents AS (
      SELECT vec_id AS cell, embedding AS cv FROM embeddings
      ORDER BY vec_id LIMIT 16),
    c_sim AS (
      SELECT e.vec_id, e.embedding, c.cell,
             {_COS_SQL.format(a="e.embedding", b="c.cv")} AS sim
      FROM embeddings e CROSS JOIN cents c),
    c_assign AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cell DESC) AS rn
        FROM c_sim) WHERE rn = 1),
    dups AS (
      SELECT b.vec_id AS vid, min(a.vec_id) AS dup_of
      FROM c_assign a JOIN c_assign b ON a.cell = b.cell
        AND a.vec_id < b.vec_id
        AND {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.3
      GROUP BY b.vec_id)
    SELECT c.vec_id, c.cell,
           coalesce(d.dup_of, -1) AS dup_of,
           d.dup_of IS NULL AS is_kept
    FROM c_assign c LEFT JOIN dups d ON c.vec_id = d.vid
"""


def q_dsir_select(spark, sf_dir):
    """DSIR data selection (operators/clustering.py:dsir_select — Xie et
    al. 2023): hashed unigram+bigram importance weights
    log10(p_target/p_source) with Laplace smoothing, deterministic top-100
    instead of Gumbel sampling so the whole pipeline is SQL-reproducible.
    Target probe = docs 0-4 (the decontaminate convention), corpus = the
    rest. Per-bucket log-ratios are pre-rounded so both engines sum
    identical doubles."""
    from .operators.clustering import dsir_select

    docs = _docs(spark, sf_dir)
    return dsir_select(
        docs.filter(F.col("doc_id") >= 5),
        docs.filter(F.col("doc_id") < 5),
        n_keep=100,
        n_buckets=64,
    )


SQL_DSIR_SELECT = r"""
    WITH src AS (
      SELECT doc_id AS doc, string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents WHERE doc_id >= 5),
    tgt AS (
      SELECT doc_id AS doc, string_split_regex(trim(lower(text)), '\s+') AS w
      FROM documents WHERE doc_id < 5),
    sf AS (
      SELECT doc, ('0x'||substr(md5(f),1,8))::BIGINT % 64 AS b FROM (
        SELECT doc, unnest(w) AS f FROM src
        UNION ALL
        SELECT doc, w[i+1] || ' ' || w[i+2] AS f
        FROM (SELECT doc, w, unnest(range(len(w)-1)) AS i FROM src))),
    tf AS (
      SELECT ('0x'||substr(md5(f),1,8))::BIGINT % 64 AS b FROM (
        SELECT unnest(w) AS f FROM tgt
        UNION ALL
        SELECT w[i+1] || ' ' || w[i+2] AS f
        FROM (SELECT w, unnest(range(len(w)-1)) AS i FROM tgt))),
    sd AS (
      SELECT b, (c+1)::DOUBLE / (sum(c) OVER () + 64)::DOUBLE AS p_s
      FROM (SELECT b, count(*) AS c FROM sf GROUP BY b)),
    td AS (
      SELECT b, (c+1)::DOUBLE / (sum(c) OVER () + 64)::DOUBLE AS p_t
      FROM (SELECT b, count(*) AS c FROM tf GROUP BY b)),
    nt AS (SELECT count(*) AS n FROM tf),
    lr AS (
      SELECT sd.b,
             round(log10(coalesce(td.p_t, 1.0/(nt.n + 64)) / sd.p_s), 6) AS lr
      FROM sd LEFT JOIN td USING (b) CROSS JOIN nt),
    dc AS (SELECT doc, b, count(*) AS n FROM sf GROUP BY doc, b),
    wt AS (
      SELECT doc, round(sum(n * lr), 4) AS logw
      FROM dc JOIN lr USING (b) GROUP BY doc)
    SELECT doc AS doc_id, logw, rank FROM (
      SELECT *, row_number() OVER (ORDER BY logw DESC, doc) AS rank FROM wt)
    WHERE rank <= 100
"""


def q_lm_doc_scores(spark, sf_dir):
    """CCNet-style LM quality scoring (operators/lm.py — Wenzek et al.
    2020 / Brants et al. 2007): a bigram stupid-backoff model trained on
    the trusted slice (lang = 'en') scores EVERY document by mean bigram
    log10-prob. The model is a count table (no float weights), so DuckDB
    reproduces train + score exactly; per-leg log-probs are pre-rounded
    to 6 decimals (the dsir_select idiom) so a last-ulp log10 divergence
    can't reach the hash. Scale: counts are vocabulary-bounded (Heaps),
    the corpus side is touched once, the token total rides a broadcast
    1-row crossJoin."""
    from .operators.lm import lm_counts, lm_score

    # hash-repartition by doc id: the tokenize+explode fan-out otherwise
    # runs in the scan's 1-2 splits, and the per-doc score aggregate is
    # satisfied in place when the model joins broadcast. The count-table
    # model is checkpointed once — its subtree is referenced ~5x in the
    # score plan (uni/bi/totals legs), which otherwise re-tokenizes the
    # training slice per reference.
    docs = _docs(spark, sf_dir).repartition(
        2 * spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    counts = lm_counts(docs.filter(F.col("lang") == "en")).localCheckpoint()
    return lm_score(docs, counts)


SQL_LM_DOC_SCORES = r"""
    WITH tr AS (
      SELECT string_split_regex(trim(lower(text)), '\s+') AS ws
      FROM documents WHERE lang = 'en'),
    uni AS (
      SELECT w AS w1, count(*)::BIGINT AS c1
      FROM (SELECT unnest(ws) AS w FROM tr) WHERE w <> '' GROUP BY w),
    tot AS (SELECT sum(c1)::BIGINT AS t FROM uni),
    bic AS (
      SELECT w1, w2, count(*)::BIGINT AS c2 FROM (
        SELECT unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
        FROM tr)
      WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2),
    bip AS (
      SELECT b.w1, b.w2, round(log10(b.c2 / u.c1), 6) AS lp_bi
      FROM bic b JOIN uni u USING (w1)),
    unip AS (
      SELECT w1 AS w2, round(log10((0.4)::DOUBLE * c1 / t.t), 6) AS lp_uni
      FROM uni CROSS JOIN tot t),
    db AS (
      SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1,
             unnest(ws[2:len(ws)]) AS w2
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
            FROM documents)),
    scored AS (
      SELECT d.doc_id,
             coalesce(bp.lp_bi, up.lp_uni,
                      round(log10((0.4)::DOUBLE / t.t), 6)) AS lp
      FROM db d
      LEFT JOIN bip bp ON bp.w1 = d.w1 AND bp.w2 = d.w2
      LEFT JOIN unip up ON up.w2 = d.w2
      CROSS JOIN tot t
      WHERE d.w1 <> '' AND d.w2 <> '')
    SELECT doc_id, count(*)::BIGINT AS n_bigrams, round(avg(lp), 4) AS avg_logp
    FROM scored GROUP BY doc_id
"""


def q_lm_counts_incremental(spark, sf_dir):
    """Changefeed-maintained LM count table == batch recompute over the
    source's FINAL LIVE STATE (operators/lm.py IncrementalLmCounts): gram
    counts are LINEAR, so the full-CDF feed's deletes subtract and
    updates retract the pre-image text — after the shared 3-epoch
    insert/update/delete fixture the model hash-matches DuckDB's
    recompute over the surviving documents only. O(changed docs) per
    epoch, MERGE into dirty gram buckets only, writer-fenced idempotent
    replay — the continuously-fresh quality model a continuously-
    ingesting corpus needs."""
    import tempfile

    from .operators.lm import IncrementalLmCounts
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    src = TableStore(tempfile.mkdtemp(prefix="lm_inc_src_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    view = IncrementalLmCounts(
        tempfile.mkdtemp(prefix="lm_inc_view_"), text_col="content",
        n_buckets=4,
    )
    for epoch, batch in enumerate(_incremental_fixture_batches(spark, sf_dir)):
        engine.apply_batch(batch, epoch)
        view.update(spark, src)
    return view.read(spark)


SQL_LM_COUNTS_INCREMENTAL = r"""
    WITH final AS (
      SELECT CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 11 <> 0),
    wsrc AS (
      SELECT string_split_regex(trim(lower(text)), '\s+') AS ws FROM final),
    uni AS (
      SELECT 1 AS g, w AS w1, '' AS w2, count(*)::BIGINT AS c
      FROM (SELECT unnest(ws) AS w FROM wsrc) WHERE w <> '' GROUP BY w),
    bi AS (
      SELECT 2 AS g, w1, w2, count(*)::BIGINT AS c FROM (
        SELECT unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
        FROM wsrc)
      WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2)
    SELECT g, w1, w2, c FROM uni UNION ALL SELECT g, w1, w2, c FROM bi
"""


def q_bpe_pair_counts(spark, sf_dir):
    """Tokenizer-training statistic (functions/text.py:bpe_pair_counts —
    Sennrich et al. 2016): top-50 adjacent character pairs weighted by word
    frequency, the first BPE merge decision. The plan aggregates to the
    vocabulary FIRST (Heaps'-law bounded) and explodes bigrams over distinct
    words only; the final top-n window runs on an alphabet^2-bounded
    aggregate."""
    from .functions.text import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf_dir), top_n=50)


SQL_BPE_PAIR_COUNTS = r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      FROM documents),
    wc AS (SELECT w, count(*) AS c FROM toks WHERE len(w) >= 2 GROUP BY w),
    prs AS (
      SELECT substring(w, i + 1, 2) AS pair, c FROM (
        SELECT w, c, unnest(range(len(w) - 1)) AS i FROM wc)),
    agg AS (SELECT pair, sum(c)::BIGINT AS pair_count FROM prs GROUP BY pair)
    SELECT pair, pair_count, rank FROM (
      SELECT *, row_number() OVER (ORDER BY pair_count DESC, pair) AS rank
      FROM agg) WHERE rank <= 50
"""


def q_bpe_encode_tokens(spark, sf_dir):
    """Exact BPE train + encode (functions/bpe.py — Sennrich et al. 2016):
    learn 10 merges over the word-frequency vocabulary (one vocab-bounded
    aggregate per round, argmax pair by (count desc, pattern asc)), then
    encode every document with a pure-JVM replace chain and report the
    REAL tokenizer token budget per doc. The whole train-then-encode
    pipeline is integer-count + bytewise-tiebreak deterministic, so the
    DuckDB oracle (a generated 10-stage CTE chain with scalar-subquery
    argmaxes) reproduces it hash-exactly."""
    from .functions.bpe import bpe_encode_tokens, bpe_train_merges

    docs = _docs(spark, sf_dir)
    merges = bpe_train_merges(docs, n_merges=10)
    return bpe_encode_tokens(docs, merges)


def _sql_bpe_encode(n_merges: int) -> str:
    """Generate the DuckDB twin of bpe_train_merges + bpe_encode_tokens:
    per merge stage a pair-count CTE + a LIMIT 1 argmax CTE + a folded
    vocab CTE; encoding inlines the learned merges as scalar subqueries
    (coalesced to a no-op sentinel when a tiny corpus runs dry, matching
    functions/bpe.py BPE_NOOP)."""
    sym = r"regexp_extract_all(seq, '\(([^)]*)\)', 1)"
    stages = [r"""
    v0 AS MATERIALIZED (
      SELECT w, count(*)::BIGINT AS wc,
             regexp_replace(w, '(.)', '(\1)', 'g') AS seq
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
            FROM documents)
      GROUP BY w)"""]
    for k in range(n_merges):
        stages.append(f"""
    p{k} AS MATERIALIZED (
      SELECT pat, sum(wc)::BIGINT AS c FROM (
        SELECT wc, unnest(list_transform(range(greatest(len(s) - 1, 0)),
                 i -> '(' || s[i+1] || ')(' || s[i+2] || ')')) AS pat
        FROM (SELECT wc, {sym} AS s FROM v{k})
      ) GROUP BY pat),
    m{k} AS MATERIALIZED (SELECT pat, replace(pat, ')(', '') AS rep
             FROM p{k} ORDER BY c DESC, pat LIMIT 1),
    v{k + 1} AS MATERIALIZED (
      SELECT w, wc, replace(seq,
               coalesce((SELECT pat FROM m{k}), chr(1)),
               coalesce((SELECT rep FROM m{k}), chr(1))) AS seq
      FROM v{k})""")
    enc = r"regexp_replace(w, '(.)', '(\1)', 'g')"
    for k in range(n_merges):
        enc = (f"replace({enc}, coalesce((SELECT pat FROM m{k}), chr(1)), "
               f"coalesce((SELECT rep FROM m{k}), chr(1)))")
    return f"""
    WITH {",".join(stages)},
    dw AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
      FROM documents),
    enc AS (SELECT doc_id, {enc} AS seq FROM dw)
    SELECT doc_id, count(*)::BIGINT AS n_words,
           sum(len({sym}))::BIGINT AS n_bpe_tokens
    FROM enc GROUP BY doc_id
"""


SQL_BPE_ENCODE_TOKENS = _sql_bpe_encode(10)


def q_text_repetition(spark, sf_dir):
    """Intra-document repetition metrics (Gopher/C4 repetition filters:
    duplicate-line ratio + top word-bigram share) — boilerplate/spam
    detection the length/stopword/punct quality trio doesn't cover."""
    from .functions.text import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


SQL_TEXT_REPETITION = r"""
    WITH base AS (
      SELECT doc_id,
             string_split(text, chr(10)) AS lines,
             string_split_regex(trim(text), '\s+') AS w
      FROM documents),
    line_stats AS (
      SELECT doc_id,
             len(lines) AS n_lines,
             round(1.0 - len(list_distinct(lines))::DOUBLE
                   / greatest(len(lines), 1), 4) AS dup_line_ratio,
             w
      FROM base),
    bigrams AS (
      SELECT doc_id,
             unnest(list_transform(range(greatest(len(w) - 1, 0)),
                                   i -> w[i+1] || ' ' || w[i+2])) AS bg
      FROM line_stats),
    counts AS (
      SELECT doc_id, bg, count(*) AS n FROM bigrams GROUP BY 1, 2),
    shares AS (
      SELECT doc_id, round(max(n)::DOUBLE / sum(n), 4) AS top_bigram_share
      FROM counts GROUP BY doc_id)
    SELECT l.doc_id, l.n_lines, l.dup_line_ratio,
           coalesce(s.top_bigram_share, 0.0) AS top_bigram_share
    FROM line_stats l LEFT JOIN shares s USING (doc_id)
"""


def q_text_stats(spark, sf_dir):
    return analyze_documents(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens_ws", "n_tokens_re", "stopword_ratio",
        "mean_word_len", "punct_ratio", "lang_pred", "quality", "fingerprint_sha",
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in ["the", "a", "and", "of", "to", "in", "is", "it"])

SQL_TEXT_STATS = rf"""
    WITH base AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM documents),
    stats AS (
      SELECT doc_id,
             len(w) AS n_tokens_ws,
             len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) AS n_tokens_re,
             len(list_filter(w, x -> x IN ({_STOP_SQL})))::DOUBLE / greatest(len(w), 1) AS stop_r,
             list_sum(list_transform(w, x -> len(x)))::DOUBLE / greatest(len(w), 1) AS mwl,
             (length(text) - length(regexp_replace(text, '[^\p{{L}}\p{{N}}\s]', '', 'g')))::DOUBLE
               / greatest(length(text), 1) AS punct_r,
             sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint_sha
      FROM base)
    SELECT doc_id, n_tokens_ws, n_tokens_re,
           round(stop_r, 4) AS stopword_ratio,
           round(mwl, 4) AS mean_word_len,
           round(punct_r, 4) AS punct_ratio,
           CASE WHEN stop_r >= 0.08 THEN 'en' ELSE 'unk' END AS lang_pred,
           round((CASE WHEN n_tokens_ws BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
                 + (CASE WHEN stop_r >= 0.05 THEN 0.3 ELSE 0.0 END)
                 + (CASE WHEN punct_r <= 0.2 THEN 0.3 ELSE 0.0 END), 4) AS quality,
           fingerprint_sha
    FROM stats
"""


def q_multimodal_meta(spark, sf_dir):
    return media_metadata(to_media_table(_docs(spark, sf_dir)))


SQL_MULTIMODAL_META = """
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
           sha256(text) AS content_sha
    FROM documents
"""


def q_ann_cosine_topk_sq8(spark, sf_dir):
    """Scalar-int8-quantized ANN: candidates scored against DEQUANTIZED
    codes (at scale the scan reads array<tinyint> — 4x less IO than
    float32), exact float re-rank of the top 4k per query
    (operators/similarity.py:cosine_topk_sq8). Every step is deterministic
    double arithmetic with explicit op order, so the oracle reproduces the
    quantizer, the approx ranking, and the re-rank exactly. Recall vs
    brute force is additionally asserted in tests."""
    from .operators.similarity import cosine_topk_sq8

    emb = _emb(spark, sf_dir)
    return cosine_topk_sq8(emb, emb.filter(F.col("vec_id") < 10), k=5)


# the quantizer mirrored exactly: code = floor(((x-mn)/span)*256) clamped to
# [0,255]; dequant = mn + ((code+0.5)*span)/256 — same op order as
# similarity.sq8_encode/sq8_decode, double precision end to end
_SQ8_STATS_SQL = """
    dims AS (
      SELECT pos, min(x) AS mn, max(x) - min(x) AS span FROM (
        SELECT unnest(range(len(embedding))) AS pos,
               unnest(embedding)::DOUBLE AS x
        FROM embeddings)
      GROUP BY pos),
    st AS (SELECT list(mn ORDER BY pos) AS mn,
                  list(span ORDER BY pos) AS span FROM dims)
"""

_SQ8_DQ_SQL = (
    "list_transform(range(len({v})), j -> CASE WHEN span[j+1] = 0 THEN"
    " mn[j+1] + ((0 + 0.5) * span[j+1]) / 256.0 ELSE"
    " mn[j+1] + ((LEAST(255, GREATEST(0,"
    " FLOOR((({v}[j+1]::DOUBLE - mn[j+1]) / span[j+1]) * 256.0)::INT))"
    " + 0.5) * span[j+1]) / 256.0 END)"
)

_DOT_SQL = "list_sum(list_transform(range(len({a})), j -> {a}[j+1]::DOUBLE * {b}[j+1]::DOUBLE))"
_NORM_SQL = "sqrt(list_sum(list_transform(range(len({a})), j -> {a}[j+1]::DOUBLE * {a}[j+1]::DOUBLE)))"

SQL_ANN_COSINE_TOPK_SQ8 = f"""
    WITH {_SQ8_STATS_SQL},
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                 {_NORM_SQL.format(a="embedding")} AS cn,
                 {_SQ8_DQ_SQL.format(v="embedding")} AS dq
          FROM embeddings, st),
    c2 AS (SELECT *, {_NORM_SQL.format(a="dq")} AS dqn FROM c),
    q AS (SELECT vec_id AS query_id, embedding AS qv,
                 {_NORM_SQL.format(a="embedding")} AS qn
          FROM embeddings WHERE vec_id < 10),
    approx AS (
      SELECT query_id, neighbor_id, cv, qv, qn, cn,
             {_DOT_SQL.format(a="qv", b="dq")} / (qn * dqn) AS ascore
      FROM c2, q WHERE neighbor_id <> query_id),
    cand AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY ascore DESC, neighbor_id) AS arank
        FROM approx) WHERE arank <= 20),
    rer AS (
      SELECT query_id, neighbor_id,
             {_DOT_SQL.format(a="qv", b="cv")} / (qn * cn) AS cos
      FROM cand)
    SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM rer) WHERE rank <= 5
"""


def q_text_compression_ratio(spark, sf_dir):
    """zlib compression-ratio quality signal per document
    (functions/text.py:compression_ratio — Arrow-vectorized, C-speed zlib
    per batch). ROWS-ONLY by declared design: DuckDB exposes no zlib, so
    the exact values are pinned by the python-twin test
    (tests/test_training_data_ops.py) instead of the SQL oracle — the same
    honest boundary as ann_cosine_topk_ivf_trained."""
    from .functions.text import compression_ratio

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.round(compression_ratio(F.col("text")), 6).alias("zlib_ratio"),
    )


def q_corpus_mixture_weights(spark, sf_dir):
    """Temperature-based mixture weights over the documents table
    (operators/clustering.py:mixture_weights — the alpha-sampling rule
    multilingual pretraining uses to upweight small sources): per-source
    counts, corpus share, and the normalized keep-rate to feed the
    deterministic hash-mod sampler. The normalization windows run over the
    per-source aggregate (source-cardinality rows), never the corpus."""
    from .operators.clustering import mixture_weights

    return mixture_weights(_docs(spark, sf_dir), alpha=0.3)


SQL_CORPUS_MIXTURE_WEIGHTS = """
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    s AS (SELECT source, n,
                 n::DOUBLE / sum(n) OVER () AS p,
                 power(n::DOUBLE / sum(n) OVER (), 0.3) AS w
          FROM c)
    SELECT source, n, round(p, 6) AS pct,
           round(w / max(w) OVER (), 4) AS sample_rate
    FROM s
"""


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization of the events table (operators/sessions.py
    — 30-minute gap, microsecond-exact boundaries, (ts, event_id)
    tiebreak, session_window-exact >= gap rule): per-session bounds,
    counts, value total, duration. One
    shuffle on the user key; the lag/cumsum window and the session
    aggregate share it."""
    from .operators.sessions import session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_stats(ev, gap_minutes=30)


SQL_EVENTS_SESSIONIZE = """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o)
    SELECT user_id, session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_event_types,
           round(sum(value), 4) AS total_value,
           max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
    FROM s GROUP BY 1, 2
"""


_FUNNEL_STEPS = ["signup", "view", "purchase"]


def q_events_funnel(spark, sf_dir):
    """Ordered conversion funnel over the events table
    (operators/sessions.py:funnel — each step strictly after the previous,
    first qualifying occurrence): per-step reached-user counts. One user-key
    exchange + a tiny rollup; the per-user step walk is pure array
    expressions over sorted per-step time lists."""
    from .operators.sessions import funnel

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel(ev, _FUNNEL_STEPS)


def _funnel_sql(steps: list[str]) -> str:
    in_list = ", ".join(f"'{s}'" for s in steps)
    per_cols = ", ".join(
        f"list_sort(list(us) FILTER (WHERE step = '{s}')) AS ts_{i}"
        for i, s in enumerate(steps)
    )
    walks = ["w0 AS (SELECT *, ts_0[1] AS t0 FROM per)"]
    for i in range(1, len(steps)):
        walks.append(
            f"w{i} AS (SELECT *, list_filter(ts_{i}, x -> x > t{i - 1})[1] "
            f"AS t{i} FROM w{i - 1})"
        )
    last = f"w{len(steps) - 1}"
    depth = " + ".join(
        f"(CASE WHEN t{i} IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(len(steps))
    )
    unions = "\n      UNION ALL ".join(
        f"SELECT {i + 1} AS step, '{s}' AS step_name, "
        f"count(*) AS n_users FROM d WHERE depth >= {i + 1}"
        for i, s in enumerate(steps)
    )
    return f"""
    WITH typed AS (
      SELECT user_id, event_type AS step, epoch_us(ts) AS us
      FROM events WHERE event_type IN ({in_list})),
    per AS (SELECT user_id, {per_cols} FROM typed GROUP BY 1),
    {", ".join(walks)},
    d AS (SELECT user_id, {depth} AS depth FROM {last})
    {unions}
"""


SQL_EVENTS_FUNNEL = _funnel_sql(_FUNNEL_STEPS)


def q_events_retention(spark, sf_dir):
    """Weekly cohort retention triangle over the events table
    (operators/sessions.py:retention_cohorts): users bucketed by first
    active epoch-week, counted in each later week they return. Integer
    microsecond//week arithmetic both engines."""
    from .operators.sessions import retention_cohorts

    return retention_cohorts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


SQL_EVENTS_RETENTION = """
    WITH a AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
      FROM events),
    c AS (SELECT *, min(wk) OVER (PARTITION BY user_id) AS cohort_week
          FROM a)
    SELECT cohort_week, wk - cohort_week AS week_offset,
           count(DISTINCT user_id) AS n_users
    FROM c GROUP BY 1, 2
"""


def q_events_sessionize_scalable(spark, sf_dir):
    """The TWO-PHASE sessionizer (operators/sessions.py:
    session_stats_scalable — local sessions per (user, time-slice) in
    parallel, then an O(sessions) per-user stitch): same result set as
    events_sessionize BY CONSTRUCTION, proven by sharing its SQL oracle —
    hash equality here is a plan-equivalence proof, the reason the hot-user
    scale path can be trusted as a drop-in."""
    from .operators.sessions import session_stats_scalable

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # slice = 6h on a 30-min gap: many boundary stitches at sf0.01
    return session_stats_scalable(ev, gap_minutes=30, slice_minutes=360)


def q_hll_user_registers(spark, sf_dir):
    """Mergeable HyperLogLog register table per event_type over the events
    table (operators/sketches.py): md5-derived register index (8 bits) and
    leading-zero rank (next 52 bits) — O(256) distinct-count state per
    group at any corpus size. Deterministic hash, so DuckDB recomputes the
    registers exactly; mergeability and estimate accuracy are asserted in
    tests/test_sketches.py."""
    from .operators.sketches import hll_registers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hll_registers(ev, ["event_type"], "user_id")


_HLL_V = "user_id::VARCHAR"
_HLL_REG_SQL = "(('0x'||substring(md5({v}),1,2))::BIGINT)::INT"
_HLL_RANK_SQL = (
    "(CASE WHEN ('0x'||substring(md5({v}),3,13))::BIGINT = 0 THEN 53"
    " ELSE 53 - length(bin(('0x'||substring(md5({v}),3,13))::BIGINT)) END)::INT"
)

SQL_HLL_USER_REGISTERS = f"""
    WITH h AS (
      SELECT event_type,
             {_HLL_REG_SQL.format(v=_HLL_V)} AS reg,
             {_HLL_RANK_SQL.format(v=_HLL_V)} AS rank
      FROM events WHERE user_id IS NOT NULL)
    SELECT event_type, reg, max(rank)::INT AS max_rank
    FROM h GROUP BY 1, 2
"""


def q_hll_distinct_estimate(spark, sf_dir):
    """Raw HLL distinct estimate per event_type next to the exact count.
    The estimate is ONE float division of exact integers (register sum of
    2^(53-rank) is an order-independent bigint), so it is deterministic and
    oracle-checkable; the ln-corrected estimate (the one to use at low
    cardinality) is tested for accuracy in tests/test_sketches.py."""
    from .operators.sketches import hll_estimate_raw, hll_registers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    regs = hll_registers(ev, ["event_type"], "user_id")
    est = hll_estimate_raw(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return est.join(exact, "event_type")


def _hll_estimate_sql() -> str:
    from .operators.sketches import HLL_EST_K

    return f"""
    WITH h AS (
      SELECT event_type,
             {_HLL_REG_SQL.format(v=_HLL_V)} AS reg,
             {_HLL_RANK_SQL.format(v=_HLL_V)} AS rank
      FROM events WHERE user_id IS NOT NULL),
    r AS (SELECT event_type, reg, max(rank) AS max_rank FROM h GROUP BY 1, 2),
    t AS (SELECT event_type,
                 sum(1::BIGINT << (53 - max_rank)) AS s_present,
                 count(*) AS n_registers
          FROM r GROUP BY 1)
    SELECT t.event_type, t.n_registers,
           round({HLL_EST_K!r} / (t.s_present
                 + (256 - t.n_registers) * (1::BIGINT << 53))::DOUBLE,
                 4) AS distinct_est_raw,
           x.n_exact
    FROM t JOIN (SELECT event_type, count(DISTINCT user_id) AS n_exact
                 FROM events GROUP BY 1) x USING (event_type)
"""


SQL_HLL_DISTINCT_ESTIMATE = _hll_estimate_sql()


def _events_3epoch_batches(ev):
    """Deterministic 3-epoch CDC fixture over the events table, shared by
    the incremental-sketch oracle queries (HLL and count-min) so both
    engines replay the identical insert/update/delete history:

      epoch 0  insert events with event_id % 3 != 2 (original user_id)
      epoch 1  insert the rest; events with event_id % 7 == 0 carry
               user_id + 1000000 (op=u where already live)
      epoch 2  delete events with event_id % 11 == 0

    Final LIVE state: event_id % 11 != 0 rows, user_id perturbed by
    +1000000 where event_id % 7 == 0. Values EVER OBSERVED additionally
    include the original user_id of every row not first seen perturbed
    (NOT (id%3=2 AND id%7=0)). The CMS oracle recomputes over the final
    state (linear sketch, deletes retract); the HLL oracle recomputes
    over the observed multiset (distinct-seen, deletes ignored)."""
    uid1 = F.when(
        F.col("event_id") % 7 == 0, F.col("user_id") + F.lit(1_000_000)
    ).otherwise(F.col("user_id"))

    def env(sel, op_col, uid_expr, lsn_base, is_delete=False):
        img = F.struct(
            F.lit("events").alias("repo"),
            F.col("event_id").cast("string").alias("path"),
            F.col("event_type").alias("event_type"),
            uid_expr.cast("long").alias("user_id"),
        )
        is_del = F.lit(is_delete)
        return sel.select(
            F.pmod(F.col("event_id"), F.lit(4)).cast("int").alias("partition"),
            (F.col("event_id") + F.lit(lsn_base)).cast("long").alias("lsn"),
            op_col.alias("op"),
            F.when(is_del, img).alias("before"),
            F.when(~is_del, img).alias("after"),
            F.lit(None).cast("timestamp").alias("ts_ms"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit("repos").alias("source_topic"),
        )

    b0 = env(ev.filter(F.col("event_id") % 3 != 2), F.lit("c"),
             F.col("user_id"), 0)
    b1 = env(
        ev.filter((F.col("event_id") % 3 == 2) | (F.col("event_id") % 7 == 0)),
        F.when(F.col("event_id") % 3 == 2, F.lit("c")).otherwise(F.lit("u")),
        uid1, 1_000_000,
    )
    b2 = env(ev.filter(F.col("event_id") % 11 == 0), F.lit("d"),
             F.col("user_id"), 2_000_000, is_delete=True)
    return b0, b1, b2


def q_hll_sketch_incremental(spark, sf_dir):
    """Changefeed-maintained HLL sketch == batch recompute over every value
    observed at an update() boundary (operators/sketches.py
    IncrementalHllSketch — O(touched groups x 256) per epoch, never a
    table rescan). Replays the events table through the CDC engine as a
    3-epoch insert/update/delete fixture, advancing the sketch after every
    epoch; deletes are IGNORED by design (distinct-seen semantics — HLL
    can union but never subtract; agg_view's multiset-backed
    count_distinct is the exact/retractable twin).

    Fixture (deterministic in both engines):
      epoch 0  insert events with event_id % 3 != 2 (original user_id)
      epoch 1  insert the rest; events with event_id % 7 == 0 get
               user_id + 1000000 (as update where already live)
      epoch 2  delete events with event_id % 11 == 0 (no effect)
    Observed = original user_id of every event EXCEPT those first seen
    already-perturbed (%3==2 AND %7==0), plus user_id+1000000 for %7==0."""
    import tempfile

    from .operators.sketches import IncrementalHllSketch
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    b0, b1, b2 = _events_3epoch_batches(ev)

    src = TableStore(tempfile.mkdtemp(prefix="hll_inc_src_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    sk = IncrementalHllSketch(
        tempfile.mkdtemp(prefix="hll_inc_sk_"), ["event_type"], "user_id",
        n_buckets=4,
    )
    for epoch, batch in enumerate((b0, b1, b2)):
        engine.apply_batch(batch, epoch)
        sk.update(spark, src)
    return sk.read(spark)


SQL_HLL_SKETCH_INCREMENTAL = f"""
    WITH obs AS (
      SELECT event_type, user_id AS v FROM events
      WHERE NOT (event_id % 3 = 2 AND event_id % 7 = 0)
      UNION ALL
      SELECT event_type, user_id + 1000000 FROM events WHERE event_id % 7 = 0),
    h AS (
      SELECT event_type,
             {_HLL_REG_SQL.format(v="v::VARCHAR")} AS reg,
             {_HLL_RANK_SQL.format(v="v::VARCHAR")} AS rank
      FROM obs WHERE v IS NOT NULL)
    SELECT event_type, reg, max(rank)::INT AS max_rank
    FROM h GROUP BY 1, 2
"""


def q_cms_key_registers(spark, sf_dir):
    """Mergeable count-min register table per event_type over the events
    table (operators/cms.py): D=4 row hashes are disjoint 8-bit slices of
    ONE md5 of the value — deterministic, so DuckDB recomputes every
    counter exactly, collisions and all. O(groups x 4 x 256) frequency
    state per group at any corpus size; the map-side projection is one
    md5 + a bounded x4 posexplode, and the shuffle carries registers,
    never events. Linearity (merge = counter add, retraction = signed
    add) is asserted in tests/test_cms.py."""
    from .operators.cms import cms_registers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return cms_registers(ev, ["event_type"], "user_id")


_CMS_REGS_SQL = """
    WITH h AS (
      SELECT event_type, md5(user_id::VARCHAR) AS hh
      FROM events WHERE user_id IS NOT NULL),
    x AS (
      SELECT event_type, d::INT AS d,
             (('0x'||substring(hh, 2*d::INT+1, 2))::BIGINT)::INT AS w
      FROM h CROSS JOIN range(4) t(d))
    SELECT event_type, d, w, count(*)::BIGINT AS cnt
    FROM x GROUP BY 1, 2, 3
"""

SQL_CMS_KEY_REGISTERS = _CMS_REGS_SQL


def q_cms_heavy_hitters(spark, sf_dir):
    """Heavy-hitter detection from the count-min sketch: every
    (event_type, user_id) whose estimated frequency reaches 20, next to
    the exact count (est >= n_exact ALWAYS — one-sided error; accuracy
    bound asserted in tests). The sketch side of the scoring join is
    broadcast (O(groups x 1024) rows), so scoring 10^9 candidate keys is
    map-side; this is the mechanism that feeds operators/skew.py's
    salted repartition with WHICH keys are hot, and the per-key rate
    panel of the reference's monitoring stack
    (monitoring/prometheus-rules.yaml)."""
    from .operators.cms import cms_heavy_hitters

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hh = cms_heavy_hitters(ev, ["event_type"], "user_id", 20)
    exact = ev.filter(F.col("user_id").isNotNull()).groupBy(
        "event_type", "user_id"
    ).agg(F.count(F.lit(1)).alias("n_exact"))
    return hh.join(exact, ["event_type", "user_id"])


SQL_CMS_HEAVY_HITTERS = f"""
    WITH reg AS ({_CMS_REGS_SQL}),
    cand AS (
      SELECT DISTINCT event_type, user_id, md5(user_id::VARCHAR) AS hh
      FROM events WHERE user_id IS NOT NULL),
    ce AS (
      SELECT c.event_type, c.user_id,
             min(coalesce(r.cnt, 0))::BIGINT AS est
      FROM (SELECT event_type, user_id, d::INT AS d,
                   (('0x'||substring(hh, 2*d::INT+1, 2))::BIGINT)::INT AS w
            FROM cand CROSS JOIN range(4) t(d)) c
      LEFT JOIN reg r USING (event_type, d, w)
      GROUP BY 1, 2)
    SELECT ce.event_type, ce.user_id, ce.est, e.n_exact
    FROM ce JOIN (SELECT event_type, user_id, count(*)::BIGINT AS n_exact
                  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2) e
      USING (event_type, user_id)
    WHERE ce.est >= 20
"""


def q_cms_sketch_incremental(spark, sf_dir):
    """Changefeed-maintained count-min sketch == batch recompute over the
    source's FINAL LIVE STATE (operators/cms.py IncrementalCmsSketch) —
    the linear-sketch property HLL cannot have: the full-CDF feed's
    deletes SUBTRACT and updates retract the pre-image, so after the
    shared 3-epoch insert/update/delete fixture (_events_3epoch_batches)
    the register table hash-matches DuckDB's recompute over the surviving
    rows only. O(changed rows) per epoch, MERGE into dirty sketch buckets
    only, writer-fenced idempotent replay."""
    import tempfile

    from .operators.cms import IncrementalCmsSketch
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    b0, b1, b2 = _events_3epoch_batches(ev)

    src = TableStore(tempfile.mkdtemp(prefix="cms_inc_src_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    sk = IncrementalCmsSketch(
        tempfile.mkdtemp(prefix="cms_inc_sk_"), ["event_type"], "user_id",
        n_buckets=4,
    )
    for epoch, batch in enumerate((b0, b1, b2)):
        engine.apply_batch(batch, epoch)
        sk.update(spark, src)
    return sk.read(spark)


SQL_CMS_SKETCH_INCREMENTAL = """
    WITH live AS (
      SELECT event_type,
             CASE WHEN event_id % 7 = 0 THEN user_id + 1000000
                  ELSE user_id END AS v
      FROM events WHERE event_id % 11 <> 0),
    h AS (
      SELECT event_type, md5(v::VARCHAR) AS hh
      FROM live WHERE v IS NOT NULL),
    x AS (
      SELECT event_type, d::INT AS d,
             (('0x'||substring(hh, 2*d::INT+1, 2))::BIGINT)::INT AS w
      FROM h CROSS JOIN range(4) t(d))
    SELECT event_type, d, w, count(*)::BIGINT AS cnt
    FROM x GROUP BY 1, 2, 3
"""


def q_hdr_latency_bins(spark, sf_dir):
    """Mergeable HDR-histogram bin table per event_type over a synthetic
    integer latency ((event_id * 7919) % 1000000 — deterministic in both
    engines): INTEGER-ONLY log binning (shift = bit_length - 5, bin =
    shift*16 + v>>shift, relative error <= 1/16) so DuckDB recomputes
    every counter exactly — no float log whose boundary rounding could
    diverge. O(bins) state per group at any corpus size; the map-side
    projection is one bit_length + shift per row and the shuffle carries
    bins, never events (operators/hdr.py)."""
    from .operators.hdr import hdr_bins

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = ev.select(
        "event_type",
        F.pmod(F.col("event_id") * F.lit(7919), F.lit(1_000_000)).alias("v"),
    )
    return hdr_bins(src, ["event_type"], "v")


_HDR_BINS_SQL = """
    WITH src AS (
      SELECT event_type, (event_id * 7919) % 1000000 AS v FROM events),
    b AS (
      SELECT event_type, greatest(0, length(bin(v)) - 5) AS shift, v
      FROM src WHERE v IS NOT NULL),
    h AS (
      SELECT event_type, (shift::BIGINT * 16 + (v >> shift))::BIGINT AS bin
      FROM b)
    SELECT event_type, bin, count(*)::BIGINT AS cnt
    FROM h GROUP BY 1, 2
"""

SQL_HDR_LATENCY_BINS = _HDR_BINS_SQL


def q_hdr_latency_quantiles(spark, sf_dir):
    """Percentile read from the HDR histogram: p50/p90/p99 per event_type
    as the EXACT value bounds of the rank-q bin (the true rank-q value
    provably lies in [est_lo, est_hi], relative width <= 1/16). Windows
    over O(bins) rows per group — never the data; this is the
    latency-panel query (Grafana p99 over consumer lag,
    monitoring/prometheus-rules.yaml) priced at sketch size instead of
    the O(n)-per-query exact form (`cdc_latency_percentiles`)."""
    from .operators.hdr import hdr_bins, hdr_quantiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = ev.select(
        "event_type",
        F.pmod(F.col("event_id") * F.lit(7919), F.lit(1_000_000)).alias("v"),
    )
    return hdr_quantiles(
        hdr_bins(src, ["event_type"], "v"), ["event_type"], [0.5, 0.9, 0.99]
    )


SQL_HDR_LATENCY_QUANTILES = f"""
    WITH bins AS ({_HDR_BINS_SQL}),
    c AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
      FROM bins),
    e AS (
      SELECT event_type, bin, cum, q, ceil(q * total) AS rnk
      FROM c CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS q) qs),
    hit AS (
      SELECT event_type, q, min(bin) AS b
      FROM e WHERE cum >= rnk GROUP BY 1, 2)
    SELECT event_type, q::DOUBLE AS q,
           (CASE WHEN b < 16 THEN b
                 ELSE (b - ((b // 16 - 1) * 16)) << (b // 16 - 1)
            END)::BIGINT AS est_lo,
           (CASE WHEN b < 16 THEN b
                 ELSE (((b - ((b // 16 - 1) * 16)) + 1) << (b // 16 - 1)) - 1
            END)::BIGINT AS est_hi
    FROM hit
"""


def q_hdr_sketch_incremental(spark, sf_dir):
    """Changefeed-maintained HDR histogram == batch recompute over the
    source's FINAL LIVE STATE (operators/hdr.py IncrementalHdrHistogram)
    — linear like count-min, so the full-CDF feed's deletes SUBTRACT bin
    counts and updates retract the pre-image bin: after the shared
    3-epoch fixture (_events_3epoch_batches) the bin table hash-matches
    DuckDB's recompute over surviving rows only. The percentile view that
    stays fresh at O(changed rows) per epoch."""
    import tempfile

    from .operators.hdr import IncrementalHdrHistogram
    from .sources.table_store import TableStore
    from .streaming.apply import CdcApplyEngine, EngineConfig

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    b0, b1, b2 = _events_3epoch_batches(ev)

    src = TableStore(tempfile.mkdtemp(prefix="hdr_inc_src_"), n_buckets=4)
    engine = CdcApplyEngine(src, EngineConfig(metrics=False))
    sk = IncrementalHdrHistogram(
        tempfile.mkdtemp(prefix="hdr_inc_sk_"), ["event_type"],
        "pmod(user_id * 7919, 1000000)", n_buckets=4,
    )
    for epoch, batch in enumerate((b0, b1, b2)):
        engine.apply_batch(batch, epoch)
        sk.update(spark, src)
    return sk.read(spark)


SQL_HDR_SKETCH_INCREMENTAL = """
    WITH live AS (
      SELECT event_type,
             ((CASE WHEN event_id % 7 = 0 THEN user_id + 1000000
                    ELSE user_id END) * 7919) % 1000000 AS v
      FROM events WHERE event_id % 11 <> 0),
    b AS (
      SELECT event_type, greatest(0, length(bin(v)) - 5) AS shift, v
      FROM live WHERE v IS NOT NULL),
    h AS (
      SELECT event_type, (shift::BIGINT * 16 + (v >> shift))::BIGINT AS bin
      FROM b)
    SELECT event_type, bin, count(*)::BIGINT AS cnt
    FROM h GROUP BY 1, 2
"""


def q_text_pii_scrub(spark, sf_dir):
    """PII redaction over the documents table (functions/text.py:PII_RULES
    — email/IPv4/SSN/phone), per-rule audit counts + scrubbed sha256. The
    corpus is synthetic, so deterministic PII is INJECTED first (same
    expression in both engines); the rule table is the single source of
    truth — the oracle SQL below is GENERATED from PII_RULES, so Spark and
    DuckDB scrub with literally identical patterns. Map-side only: at
    100 TB this pipelines with the scan, no shuffle."""
    from .functions.text import PII_RULES, scrub_pii

    docs = _docs(spark, sf_dir)
    injected = F.concat(
        F.col("text"),
        F.lit(" reach user"), F.col("doc_id").cast("string"),
        F.lit("@example.org at 10."),
        F.pmod(F.col("doc_id"), F.lit(200)).cast("string"),
        F.lit(".0.1 ssn 123-45-6789 tel 555-010-0042"),
    )
    return docs.select(
        "doc_id",
        *[
            F.regexp_count(injected, F.lit(pat)).cast("long").alias(f"n_{name}")
            for name, pat, _ in PII_RULES
        ],
        scrub_pii(injected).alias("scrubbed"),
        F.sha2(scrub_pii(injected), 256).alias("scrubbed_sha"),
    )


def _pii_scrub_sql() -> str:
    from .functions.text import PII_RULES

    inj = (
        "text || ' reach user' || doc_id::VARCHAR || '@example.org at 10.'"
        " || (doc_id % 200)::VARCHAR || '.0.1 ssn 123-45-6789 tel 555-010-0042'"
    )
    scrub = inj
    for _, pat, repl in PII_RULES:
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all({inj}, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_RULES
    )
    return (
        f"SELECT doc_id, {counts}, {scrub} AS scrubbed,"
        f" sha256({scrub}) AS scrubbed_sha FROM documents"
    )


SQL_TEXT_PII_SCRUB = _pii_scrub_sql()


def q_dedup_clusters(spark, sf_dir):
    """Near-dup PAIRS -> duplicate CLUSTERS (connected components, pointer
    jumping) -> canonical-keep flag; the op that turns pair detection into
    an actual deduplicated corpus."""
    docs = _docs(spark, sf_dir)
    return dedup_clusters(docs, minhash_lsh_pairs(docs))


SQL_DEDUP_CLUSTERS = f"""
    WITH RECURSIVE pairs AS ({SQL_DEDUP_MINHASH_LSH_PAIRS}),
    e AS (SELECT doc1 AS a, doc2 AS b FROM pairs
          UNION SELECT doc2, doc1 FROM pairs),
    reach(node, root) AS (
      SELECT a, a FROM e
      UNION
      SELECT e.b, r.root FROM reach r JOIN e ON e.a = r.node),
    comp AS (SELECT node, min(root) AS cluster_id FROM reach GROUP BY node)
    SELECT d.doc_id,
           coalesce(c.cluster_id, d.doc_id) AS cluster_id,
           coalesce(c.cluster_id, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""

SAMPLE_RATES = {"en": 0.5, "de": 1.0, "fr": 0.25, "zh": 0.0}
SAMPLE_DEFAULT_RATE = 0.75


def q_corpus_sample_stratified(spark, sf_dir):
    """Deterministic hash-mod stratified sampling audit: per-language
    keep-counts under a per-stratum rate table (no rand(), reproducible)."""
    return sample_summary(
        _docs(spark, sf_dir),
        SAMPLE_RATES,
        stratum_col="lang",
        id_col="doc_id",
        default_rate=SAMPLE_DEFAULT_RATE,
    )


_RATES_SQL = ", ".join(
    f"('{k}', {int(v * SAMPLE_MOD)})" for k, v in sorted(SAMPLE_RATES.items())
)

SQL_CORPUS_SAMPLE_STRATIFIED = f"""
    WITH rates(stratum, r) AS (VALUES {_RATES_SQL}),
    h AS (SELECT lang,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % {SAMPLE_MOD} AS hm
          FROM documents),
    tot AS (SELECT lang AS stratum, count(*) AS n_total FROM documents GROUP BY 1),
    kept AS (
      SELECT h.lang AS stratum, count(*) AS n_kept
      FROM h LEFT JOIN rates ON rates.stratum = h.lang
      WHERE hm < coalesce(r, {int(SAMPLE_DEFAULT_RATE * SAMPLE_MOD)})
      GROUP BY 1)
    SELECT t.stratum, t.n_total, coalesce(k.n_kept, 0) AS n_kept
    FROM tot t LEFT JOIN kept k ON k.stratum = t.stratum
"""

PACK_BUDGET = 256
PACK_SHARDS = 8


def q_pack_chunks(spark, sf_dir):
    """Concat-and-chunk sequence packing (GPT-pretraining style): one window
    cumsum per hash shard, chunk boundary every PACK_BUDGET tokens."""
    return pack_chunks(
        _docs(spark, sf_dir), budget=PACK_BUDGET, n_shards=PACK_SHARDS
    )


SQL_PACK_CHUNKS = rf"""
    WITH base AS (
      SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
               % {SAMPLE_MOD} % {PACK_SHARDS} AS shard,
             doc_id AS doc,
             len(string_split_regex(trim(text), '\s+')) AS n_tok
      FROM documents),
    cum AS (
      SELECT shard, doc, n_tok,
             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM base)
    SELECT shard, ((cum - n_tok) // {PACK_BUDGET})::BIGINT AS chunk_id,
           count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens
    FROM cum GROUP BY 1, 2
"""


def q_pack_greedy(spark, sf_dir):
    """Greedy no-split sequence packing (applyInPandas). The per-shard
    greedy reset-on-overflow fold IS SQL-expressible as a recursive CTE
    stepping row-by-row within each shard (depth = max docs per shard), so
    it carries an exact DuckDB oracle; additionally parity-tested against a
    pure Python reference in tests/test_training_data_ops.py."""
    return pack_greedy(
        _docs(spark, sf_dir), budget=PACK_BUDGET, n_shards=PACK_SHARDS
    ).drop("doc_ids")


SQL_PACK_GREEDY = rf"""
    WITH RECURSIVE seq AS (
      SELECT ((('0x'||substring(md5(doc_id::VARCHAR),1,8))::BIGINT % 1000000)
               % {PACK_SHARDS})::INT AS shard,
             doc_id::BIGINT AS doc,
             len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_tok,
             row_number() OVER (
               PARTITION BY ((('0x'||substring(md5(doc_id::VARCHAR),1,8))::BIGINT
                              % 1000000) % {PACK_SHARDS})
               ORDER BY doc_id::BIGINT) AS rn
      FROM documents),
    walk AS (
      SELECT shard, rn, n_tok, n_tok AS acc, 0::BIGINT AS chunk
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.shard, s.rn, s.n_tok,
             CASE WHEN w.acc + s.n_tok > {PACK_BUDGET}
                  THEN s.n_tok ELSE w.acc + s.n_tok END,
             CASE WHEN w.acc + s.n_tok > {PACK_BUDGET}
                  THEN w.chunk + 1 ELSE w.chunk END
      FROM walk w JOIN seq s ON s.shard = w.shard AND s.rn = w.rn + 1)
    SELECT shard, shard * 1000000 + chunk AS pack_id,
           count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens
    FROM walk GROUP BY shard, chunk
"""


def q_text_rolling_fingerprint(spark, sf_dir):
    """Karp-Rabin rolling hash (Arrow UDF). Exact DuckDB twin via a
    list_reduce polynomial fold over code points — the Spark side folds
    UTF-8 BYTES, which coincides on the all-ASCII documents corpus (the
    driver's testdata; non-ASCII would need a byte-level fold DuckDB
    doesn't expose)."""
    return _docs(spark, sf_dir).select(
        "doc_id", rolling_hash(F.col("text")).alias("rhash")
    )


SQL_TEXT_ROLLING_FINGERPRINT = """
    SELECT doc_id,
           CASE WHEN length(text) = 0 THEN 0
                ELSE list_reduce(
                       [ord(c)::HUGEINT for c in string_split(text, '')],
                       (a, b) -> (a * 1000003 + b) % 2305843009213693951
                     )::BIGINT
           END AS rhash
    FROM documents
"""


# --------------------------------------------------------------------- #
CDC_QUERIES: dict[str, tuple[Callable, str | None]] = {
    "cdc_state_lastwrite": (q_cdc_state_lastwrite, SQL_CDC_STATE_LASTWRITE),
    "cdc_snapshot_handoff": (q_cdc_snapshot_handoff, SQL_CDC_SNAPSHOT_HANDOFF),
    "cdc_applied_watermarks": (q_cdc_applied_watermarks, SQL_CDC_APPLIED_WATERMARKS),
    "cdc_group_checkpoints": (q_cdc_group_checkpoints, SQL_CDC_GROUP_CHECKPOINTS),
    "cdc_replication_latency": (q_cdc_replication_latency, SQL_CDC_REPLICATION_LATENCY),
    "cdc_gap_stats": (q_cdc_gap_stats, SQL_CDC_GAP_STATS),
    "cdc_dedup_anti": (q_cdc_dedup_anti, SQL_CDC_DEDUP_ANTI),
    "cdc_offset_translation": (q_cdc_offset_translation, SQL_CDC_OFFSET_TRANSLATION),
    "cdc_compaction_counts": (q_cdc_compaction_counts, SQL_CDC_COMPACTION_COUNTS),
    "cdc_topic_routing": (q_cdc_topic_routing, SQL_CDC_TOPIC_ROUTING),
    "cdc_constraint_audit": (q_cdc_constraint_audit, SQL_CDC_CONSTRAINT_AUDIT),
    "cdc_smt_chain": (q_cdc_smt_chain, SQL_CDC_SMT_CHAIN),
    "cdc_fanin_union": (q_cdc_fanin_union, SQL_CDC_FANIN_UNION),
    "cdc_throughput_1h": (q_cdc_throughput_1h, SQL_CDC_THROUGHPUT_1H),
    "cdc_latency_percentiles": (q_cdc_latency_percentiles, SQL_CDC_LATENCY_PERCENTILES),
    "cdc_sha_invariant": (q_cdc_sha_invariant, SQL_CDC_SHA_INVARIANT),
    "cdc_merge_upsert": (q_cdc_merge_upsert, SQL_CDC_MERGE_UPSERT),
    "cdc_table_changes": (q_cdc_table_changes, SQL_CDC_TABLE_CHANGES),
    "agg_pricing_summary": (q_agg_pricing_summary, SQL_AGG_PRICING_SUMMARY),
    "join_segment_revenue": (q_join_segment_revenue, SQL_JOIN_SEGMENT_REVENUE),
    "window_topk_orders": (q_window_topk_orders, SQL_WINDOW_TOPK_ORDERS),
    "antijoin_orphans": (q_antijoin_orphans, SQL_ANTIJOIN_ORPHANS),
    # training-data pipeline operators
    "dedup_exact_docs": (q_dedup_exact_docs, SQL_DEDUP_EXACT_DOCS),
    "dedup_jaccard_pairs": (q_dedup_jaccard_pairs, SQL_DEDUP_JACCARD_PAIRS),
    "dedup_substring_spans": (
        q_dedup_substring_spans, SQL_DEDUP_SUBSTRING_SPANS,
    ),
    "dedup_minhash_sig": (q_dedup_minhash_sig, SQL_DEDUP_MINHASH_SIG),
    "dedup_minhash_lsh_pairs": (q_dedup_minhash_lsh_pairs, SQL_DEDUP_MINHASH_LSH_PAIRS),
    "dedup_incremental_lsh_pairs": (
        q_dedup_incremental_lsh_pairs,
        SQL_DEDUP_INCREMENTAL_LSH_PAIRS,
    ),
    "cdc_state_time_travel": (q_cdc_state_time_travel, SQL_CDC_STATE_TIME_TRAVEL),
    "cdc_state_mor": (q_cdc_state_mor, SQL_CDC_STATE_MOR),
    "cdc_scan_pruned": (q_cdc_scan_pruned, SQL_CDC_SCAN_PRUNED),
    "cdc_lookup_bloom": (q_cdc_lookup_bloom, SQL_CDC_LOOKUP_BLOOM),
    "cdc_scan_pruned_zorder": (
        q_cdc_scan_pruned_zorder,
        SQL_CDC_SCAN_PRUNED_ZORDER,
    ),
    "cdc_acl_sync": (q_cdc_acl_sync, SQL_CDC_ACL_SYNC),
    "cdc_offset_failover": (q_cdc_offset_failover, SQL_CDC_OFFSET_FAILOVER),
    "agg_view_incremental": (q_agg_view_incremental, SQL_AGG_VIEW_INCREMENTAL),
    "text_index_postings": (q_text_index_postings, SQL_TEXT_INDEX_POSTINGS),
    "text_search_bm25": (q_text_search_bm25, SQL_TEXT_SEARCH_BM25),
    "text_search_phrase": (q_text_search_phrase, SQL_TEXT_SEARCH_PHRASE),
    "corpus_shard_assignment": (
        q_corpus_shard_assignment, SQL_CORPUS_SHARD_ASSIGNMENT
    ),
    "join_view_incremental": (q_join_view_incremental, SQL_JOIN_VIEW_INCREMENTAL),
    "cdc_retention_expiry": (q_cdc_retention_expiry, SQL_CDC_RETENTION_EXPIRY),
    "cdc_key_history": (q_cdc_key_history, SQL_CDC_KEY_HISTORY),
    "scd2_history": (q_scd2_history, SQL_SCD2_HISTORY),
    "scd2_enrich_asof": (q_scd2_enrich_asof, SQL_SCD2_ENRICH_ASOF),
    "decontam_incremental": (q_decontam_incremental, SQL_DECONTAM_INCREMENTAL),
    "dedup_simhash": (q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "dedup_embedding_cosine": (q_dedup_embedding_cosine, SQL_DEDUP_EMBEDDING_COSINE),
    "semdedup_keep": (q_semdedup_keep, SQL_SEMDEDUP_KEEP),
    "bpe_pair_counts": (q_bpe_pair_counts, SQL_BPE_PAIR_COUNTS),
    "bpe_encode_tokens": (q_bpe_encode_tokens, SQL_BPE_ENCODE_TOKENS),
    "dsir_select": (q_dsir_select, SQL_DSIR_SELECT),
    "lm_doc_scores": (q_lm_doc_scores, SQL_LM_DOC_SCORES),
    "lm_counts_incremental": (
        q_lm_counts_incremental,
        SQL_LM_COUNTS_INCREMENTAL,
    ),
    "ann_cosine_topk": (q_ann_cosine_topk, SQL_ANN_COSINE_TOPK),
    "ann_cosine_topk_lsh": (q_ann_cosine_topk_lsh, SQL_ANN_COSINE_TOPK_LSH),
    "ann_cosine_topk_ivf": (q_ann_cosine_topk_ivf, SQL_ANN_COSINE_TOPK_IVF),
    "ann_cosine_topk_ivf_trained": (q_ann_cosine_topk_ivf_trained, None),
    "ann_cosine_topk_ivf_incremental": (
        q_ann_cosine_topk_ivf_incremental,
        SQL_ANN_COSINE_TOPK_IVF_INCREMENTAL,
    ),
    "ann_cosine_topk_sq8": (q_ann_cosine_topk_sq8, SQL_ANN_COSINE_TOPK_SQ8),
    "text_pii_scrub": (q_text_pii_scrub, SQL_TEXT_PII_SCRUB),
    "text_compression_ratio": (q_text_compression_ratio, None),
    "corpus_mixture_weights": (
        q_corpus_mixture_weights, SQL_CORPUS_MIXTURE_WEIGHTS
    ),
    "events_sessionize": (q_events_sessionize, SQL_EVENTS_SESSIONIZE),
    "events_funnel": (q_events_funnel, SQL_EVENTS_FUNNEL),
    "events_retention": (q_events_retention, SQL_EVENTS_RETENTION),
    "events_sessionize_scalable": (
        q_events_sessionize_scalable, SQL_EVENTS_SESSIONIZE
    ),
    "hll_user_registers": (q_hll_user_registers, SQL_HLL_USER_REGISTERS),
    "hll_distinct_estimate": (q_hll_distinct_estimate, SQL_HLL_DISTINCT_ESTIMATE),
    "cms_key_registers": (q_cms_key_registers, SQL_CMS_KEY_REGISTERS),
    "cms_heavy_hitters": (q_cms_heavy_hitters, SQL_CMS_HEAVY_HITTERS),
    "cms_sketch_incremental": (
        q_cms_sketch_incremental,
        SQL_CMS_SKETCH_INCREMENTAL,
    ),
    "hdr_latency_bins": (q_hdr_latency_bins, SQL_HDR_LATENCY_BINS),
    "hdr_latency_quantiles": (
        q_hdr_latency_quantiles,
        SQL_HDR_LATENCY_QUANTILES,
    ),
    "hdr_sketch_incremental": (
        q_hdr_sketch_incremental,
        SQL_HDR_SKETCH_INCREMENTAL,
    ),
    "hll_sketch_incremental": (
        q_hll_sketch_incremental,
        SQL_HLL_SKETCH_INCREMENTAL,
    ),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "dedup_clusters_incremental": (
        q_dedup_clusters_incremental,
        SQL_DEDUP_CLUSTERS_INCREMENTAL,
    ),
    "corpus_sample_stratified": (
        q_corpus_sample_stratified,
        SQL_CORPUS_SAMPLE_STRATIFIED,
    ),
    "clone_index_pairs": (q_clone_index_pairs, SQL_CLONE_INDEX_PAIRS),
    "winnow_fingerprints": (q_winnow_fingerprints, SQL_WINNOW_FINGERPRINTS),
    "winnow_match_pairs": (q_winnow_match_pairs, SQL_WINNOW_MATCH_PAIRS),
    "code_stats": (q_code_stats, SQL_CODE_STATS),
    "repo_fork_pairs": (q_repo_fork_pairs, SQL_REPO_FORK_PAIRS),
    "repo_fork_pairs_incremental": (
        q_repo_fork_pairs_incremental,
        SQL_REPO_FORK_PAIRS_INCREMENTAL,
    ),
    "pack_chunks": (q_pack_chunks, SQL_PACK_CHUNKS),
    "pack_greedy": (q_pack_greedy, SQL_PACK_GREEDY),
    "text_stats": (q_text_stats, SQL_TEXT_STATS),
    "text_repetition": (q_text_repetition, SQL_TEXT_REPETITION),
    "text_rolling_fingerprint": (
        q_text_rolling_fingerprint, SQL_TEXT_ROLLING_FINGERPRINT
    ),
    "multimodal_meta": (q_multimodal_meta, SQL_MULTIMODAL_META),
}


def all_queries() -> dict[str, tuple[Callable, str | None]]:
    return dict(CDC_QUERIES)
