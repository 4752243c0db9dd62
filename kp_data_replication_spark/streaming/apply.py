"""The CDC apply engine: changelog tail -> exactly-once MERGE into the target
table (SURVEY.md §2.1 S5/S7/S8, §2.9 T1-T5,T7).

This is the Spark-native MirrorSourceConnector (docs/index.md:52): where MM2
runs one consume->produce task per topic-partition with offsets committed to
internal topics, this engine runs `readStream` over the changelog ->
`foreachBatch` -> compact + MERGE + lineage, committed atomically per epoch
through the TableStore pointer swap (the exactly-once blueprint of
docs/consideration.md:62).

Batch pipeline (fixed plan shape — no driver-side row loops, everything
distributed):

    changelog batch
      │ topic whitelist/blacklist (rlike, codegen)          F1-F3
      │ lineage anti-filter (broadcast join, no shuffle)    J3
      │ envelope unpack + content normalize (Arrow UDF)     F4/F7
      │ last-write-wins per (repo,path) (hash agg,          A2/W2
      │   map-side partial, output partitioned on key)
      │ dirty-bucket MERGE (full-outer join; only buckets   J2/S6
      │   touched by the batch are read & rewritten)
      └ atomic commit: data + lineage + epoch               S7/S8/T3/T4

Restart/resume (T1/T2): Structured Streaming's checkpoint replays the last
uncommitted batch with the SAME epoch id; the store fences on epoch, so
re-delivery is a no-op — at-least-once delivery (docs/consideration.md:52-58)
becomes exactly-once.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.envelope import (
    normalize_content,
    unpack_envelope,
    unpack_envelope_arrow,
)
from ..operators.compact import last_write_wins
from ..operators.dedup_cdc import filter_applied
from ..operators.filters import DEFAULT_BLACKLIST, select_topics
from ..operators.merge import merge_upsert
from ..sources.table_store import BUCKET_COL, TableStore, bucket_expr


@dataclass
class EngineConfig:
    whitelist: str | None = "^repos$"
    blacklist: str | None = DEFAULT_BLACKLIST
    n_buckets: int = 16
    arrow_unpack: bool = False  # all-Arrow unpack variant (see envelope.py)
    normalize: bool = True
    metrics: bool = True
    # explicit parallelism for the wide stages; None -> session default
    shuffle_partitions: int | None = None
    extra_meta_cols: tuple = ()


@dataclass
class CdcApplyEngine:
    store: TableStore
    config: EngineConfig = field(default_factory=EngineConfig)

    # ------------------------------------------------------------------ #
    def apply_batch(self, batch: DataFrame, epoch: int) -> dict:
        """Apply one micro-batch exactly once. Returns a summary dict."""
        import time as _time

        t0 = _time.time()
        phases: dict[str, float] = {}
        spark = batch.sparkSession
        if epoch <= self.store.current_epoch():
            # fenced: this epoch already committed (restart re-delivery)
            return {"epoch": epoch, "status": "fenced"}
        if self.config.shuffle_partitions:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(self.config.shuffle_partitions)
            )

        events = select_topics(batch, self.config.whitelist, self.config.blacklist)
        # lineage is one row per log partition: read/advance/write it
        # driver-side (pyarrow) — no Spark jobs on the epoch's serial path
        lineage_rows = self.store.read_lineage_rows()
        applied_before = {r["partition"]: r["applied_lsn"] for r in lineage_rows}
        lineage = spark.createDataFrame(
            [(r["partition"], r["applied_lsn"]) for r in lineage_rows],
            "partition int, applied_lsn long",
        )
        fresh = filter_applied(events, lineage)

        unpack = unpack_envelope_arrow if self.config.arrow_unpack else unpack_envelope
        # normalization runs AFTER compaction: only surviving rows pay the
        # Arrow round-trip (strictly fewer rows, identical result — the
        # winner per key is chosen by lsn, not content)
        rows = unpack(fresh, normalize=False)

        compacted = last_write_wins(rows, count_col="_n_fresh").withColumn(
            BUCKET_COL, bucket_expr(self.store.n_buckets)
        )
        if self.config.normalize and "content" in compacted.columns:
            compacted = compacted.withColumn(
                "content", normalize_content(F.col("content"))
            )
        compacted = compacted.cache()
        try:
            # ONE job materializes the cache and yields, per (bucket,
            # partition): dirty buckets, changed-key count, AND the applied
            # watermarks — no separate marks job, no second raw-batch scan
            # (the per-partition max lsn necessarily survives compaction)
            stats = (
                compacted.groupBy(BUCKET_COL, "partition")
                .agg(
                    F.count(F.lit(1)).alias("n_keys"),
                    F.max("lsn").alias("max_lsn"),
                    F.sum("_n_fresh").alias("n_fresh"),
                )
                .collect()
            )
            dirty = sorted({r[BUCKET_COL] for r in stats})
            n_changed = sum(r["n_keys"] for r in stats)
            marks: dict[int, dict] = {}
            for r in stats:
                m = marks.setdefault(
                    r["partition"], {"applied_lsn": -1, "n_applied": 0}
                )
                m["applied_lsn"] = max(m["applied_lsn"], r["max_lsn"])
                m["n_applied"] += r["n_fresh"]
            phases["compact"] = round(_time.time() - t0, 3)
            t0 = _time.time()

            row_schema = self._union_row_schema(compacted)
            if dirty:
                target_dirty = self.store.read_state(spark, buckets=dirty)
                merged = merge_upsert(
                    target_dirty, compacted.drop(BUCKET_COL, "_n_fresh")
                )
                merged = merged.select(*[f.name for f in row_schema.fields]).withColumn(
                    BUCKET_COL, bucket_expr(self.store.n_buckets)
                )
            else:
                merged = None

            new_lineage = self._advance_lineage_rows(lineage_rows, marks, epoch)

            version = self.store.commit(
                merged, dirty, new_lineage, epoch, row_schema
            )
            phases["merge_commit"] = round(_time.time() - t0, 3)
            t0 = _time.time()
            summary = {
                "epoch": epoch,
                "status": "committed",
                "version": version,
                "keys_changed": n_changed,
                "dirty_buckets": len(dirty),
            }
            if self.config.metrics:
                self._write_metrics(events, marks, epoch, applied_before)
                phases["metrics"] = round(_time.time() - t0, 3)
            summary["phases"] = phases
            return summary
        finally:
            compacted.unpersist()

    # ------------------------------------------------------------------ #
    @staticmethod
    def _advance_lineage_rows(
        lineage_rows: list[dict], marks: dict[int, dict], epoch: int
    ) -> list[dict]:
        """Monotone watermark merge, driver-side (the lineage table is one
        row per log partition). Watermarks never regress — a re-delivered
        older range cannot move applied_lsn backwards (exactly-once fencing,
        docs/consideration.md:62)."""
        from datetime import datetime, timezone

        now = datetime.now(tz=timezone.utc).replace(tzinfo=None)
        out = {
            r["partition"]: {
                "partition": r["partition"],
                "applied_lsn": r["applied_lsn"],
                "epoch": epoch,
                "n_applied": r.get("n_applied") or 0,
                "updated_ts": r.get("updated_ts") or now,
            }
            for r in lineage_rows
        }
        for p, m in marks.items():
            cur = out.setdefault(
                p,
                {"partition": p, "applied_lsn": -1, "epoch": epoch,
                 "n_applied": 0, "updated_ts": now},
            )
            cur["applied_lsn"] = max(cur["applied_lsn"], m["applied_lsn"])
            cur["n_applied"] += m["n_applied"]
            cur["epoch"] = epoch
            cur["updated_ts"] = now
        return sorted(out.values(), key=lambda r: r["partition"])

    # ------------------------------------------------------------------ #
    def _union_row_schema(self, compacted: DataFrame) -> T.StructType:
        """Additive union of the stored schema and this batch's row schema
        (S6 — target DDL follows source, docs/consideration.md:13-18)."""
        meta = {"op", "partition", "lsn", "ts_ms", BUCKET_COL, "_n_fresh"}
        batch_fields = [
            f for f in compacted.schema.fields if f.name not in meta
        ]
        stored = self.store.schema()
        if stored is None:
            return T.StructType(batch_fields)
        names = {f.name for f in stored.fields}
        return T.StructType(
            list(stored.fields) + [f for f in batch_fields if f.name not in names]
        )

    def _write_metrics(
        self,
        events: DataFrame,
        marks: dict[int, dict],
        epoch: int,
        applied_before: dict,
    ) -> None:
        """Per-partition per-epoch replication metrics (SURVEY.md §2.4 A6-A7,
        §2.9 T6): records, duplicates masked, bytes, lag inputs. Mirrors the
        MM2 JMX metric set record-count/record-age-ms/replication-latency-ms
        (mirror-maker-2/mm2-jmx-exporter.yaml:28-43). Non-transactional
        append — monitoring data, not engine state. ``marks`` comes from the
        compacted cache, so this adds exactly one raw-batch scan (for the
        duplicate/byte totals that dedup necessarily discards)."""
        spark = events.sparkSession
        all_agg = events.groupBy("partition").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("lsn").alias("max_lsn"),
            F.min("ts_ms").alias("min_ts"),
            F.max("ts_ms").alias("max_ts"),
            F.sum(F.length(F.col("after.content"))).alias("bytes_in"),
        )
        fresh_agg = spark.createDataFrame(
            [(int(p), int(m["n_applied"])) for p, m in marks.items()],
            "partition int, n_applied long",
        )
        before_df = spark.createDataFrame(
            [(int(k), int(v)) for k, v in applied_before.items()] or [],
            "partition int, applied_lsn_before long",
        )
        m = (
            all_agg.join(fresh_agg, "partition", "left")
            .join(F.broadcast(before_df), "partition", "left")
            .select(
                F.lit(epoch).cast("long").alias("epoch"),
                "partition",
                "n_events",
                F.coalesce("n_applied", F.lit(0)).alias("n_applied"),
                (F.col("n_events") - F.coalesce("n_applied", F.lit(0))).alias("n_duplicates"),
                "bytes_in",
                "max_lsn",
                "applied_lsn_before",
                "min_ts",
                "max_ts",
            )
        )
        m.coalesce(1).write.mode("append").parquet(
            os.path.join(self.store.root, "metrics")
        )

    # ------------------------------------------------------------------ #
    def replay_batch(self, spark: SparkSession, changelog_path: str) -> dict:
        """Full batch replay (`--from-beginning`, S4): the whole changelog as
        one epoch."""
        df = spark.read.option("mergeSchema", "true").parquet(changelog_path)
        return self.apply_batch(df, self.store.current_epoch() + 1)

    def start_stream(
        self,
        spark: SparkSession,
        changelog_path: str,
        checkpoint_dir: str,
        read_schema: T.StructType,
        max_files_per_trigger: int = 1,
        available_now: bool = True,
    ):
        """Continuous tail with restart-resume (T1): file-source analogue of
        the MM2 consume loop; `maxFilesPerTrigger` is the rate-throttle
        (docs/perf-tests.md:166 `--throughput`; T7). With
        ``available_now`` the query drains all pending input then stops —
        the replay-to-caught-up mode used by tests and bench."""
        src = (
            spark.readStream.schema(read_schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(changelog_path)
        )
        writer = (
            src.writeStream.foreachBatch(
                lambda df, eid: self.apply_batch(df, eid) and None
            )
            .option("checkpointLocation", checkpoint_dir)
            .queryName("cdc-apply")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="5 seconds")
        return writer.start()


def final_state(spark: SparkSession, store: TableStore) -> DataFrame:
    """Current replicated table state with the sha256 invariant column."""
    df = store.read_state(spark)
    if "content" in df.columns:
        df = df.withColumn("content_sha", F.sha2("content", 256))
    return df
