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

from .operators.asof import translate_offsets
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
    ev = _with_envelope(_events(spark, sf_dir))
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
    out = translate_offsets(commits, syncs)
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
    FROM commits c JOIN syncs s
      ON s.partition = c.partition AND s.sync_src_offset <= c.src_offset
    GROUP BY c.consumer_group, c.partition, c.src_offset
"""


def q_cdc_compaction_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/F7 summary: live vs tombstoned keys after compaction."""
    ev = _with_envelope(_events(spark, sf_dir))
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
           count(*) AS n_records, sum(length(props)) AS n_bytes
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
    ev = _with_envelope(_events(spark, sf_dir))
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
CDC_QUERIES: dict[str, tuple[Callable, str | None]] = {
    "cdc_state_lastwrite": (q_cdc_state_lastwrite, SQL_CDC_STATE_LASTWRITE),
    "cdc_applied_watermarks": (q_cdc_applied_watermarks, SQL_CDC_APPLIED_WATERMARKS),
    "cdc_gap_stats": (q_cdc_gap_stats, SQL_CDC_GAP_STATS),
    "cdc_dedup_anti": (q_cdc_dedup_anti, SQL_CDC_DEDUP_ANTI),
    "cdc_offset_translation": (q_cdc_offset_translation, SQL_CDC_OFFSET_TRANSLATION),
    "cdc_compaction_counts": (q_cdc_compaction_counts, SQL_CDC_COMPACTION_COUNTS),
    "cdc_topic_routing": (q_cdc_topic_routing, SQL_CDC_TOPIC_ROUTING),
    "cdc_fanin_union": (q_cdc_fanin_union, SQL_CDC_FANIN_UNION),
    "cdc_throughput_1h": (q_cdc_throughput_1h, SQL_CDC_THROUGHPUT_1H),
    "cdc_latency_percentiles": (q_cdc_latency_percentiles, SQL_CDC_LATENCY_PERCENTILES),
    "cdc_sha_invariant": (q_cdc_sha_invariant, SQL_CDC_SHA_INVARIANT),
    "cdc_merge_upsert": (q_cdc_merge_upsert, SQL_CDC_MERGE_UPSERT),
    "agg_pricing_summary": (q_agg_pricing_summary, SQL_AGG_PRICING_SUMMARY),
    "join_segment_revenue": (q_join_segment_revenue, SQL_JOIN_SEGMENT_REVENUE),
    "window_topk_orders": (q_window_topk_orders, SQL_WINDOW_TOPK_ORDERS),
    "antijoin_orphans": (q_antijoin_orphans, SQL_ANTIJOIN_ORPHANS),
}


def all_queries() -> dict[str, tuple[Callable, str | None]]:
    return dict(CDC_QUERIES)
