"""Multi-topic routing: one target table PER replicated topic, auto-created
on first sight (SURVEY.md §2.1 S6 auto-create; reference
`refresh.topics.interval.seconds=10`, docs/mm2-provisioning.md:199).

MM2 discovers new whitelisted topics on an interval and materializes new
target topics mid-stream. The Spark-native analogue: every micro-batch lists
the DISTINCT whitelisted topics it carries (the file-source trigger IS the
refresh interval) and routes each topic's events into that topic's own
TableStore — created on demand, schema'd from its first batch. Each
(topic) target keeps its own writer-scoped epoch fencing and per-group
lineage, so topics fail/resume independently.

Scale note: the discovery step is one distinct() over the (slim, dictionary-
encoded) topic column; per-topic applies reuse the SAME batch DataFrame —
Spark prunes each pass down to one topic's rows via the pushed whitelist
filter, so a T-topic batch costs T filtered passes over the batch, not T
full materializations. For very large T, batch the applies by grouping
topics; the reference's deployments run tens of topics per flow
(mirror-maker-2 configs), where this shape is right.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field, replace

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..operators.filters import select_topics
from ..sources.table_store import TableStore
from .apply import CdcApplyEngine, EngineConfig


def _safe_dirname(topic: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", topic)


@dataclass
class TopicRouter:
    """Routes a changelog carrying MANY topics into one TableStore per topic.

    ``use_catalog=True``: after the per-topic table commits of an epoch,
    publish ONE atomic catalog version mapping every topic to its new
    table version (sources/catalog.py) — readers resolving through the
    catalog can never observe a torn cross-topic snapshot (topic A at the
    new epoch, topic B at the old one), which is exactly the consistency
    Kafka cannot give a consumer of several replicated topics. Crash
    anywhere inside the epoch: the catalog still points at the previous
    consistent snapshot; the resumed epoch fences the committed tables to
    noops, finishes the rest, and the catalog advances once."""

    root: str
    config: EngineConfig = field(default_factory=EngineConfig)
    n_buckets: int = 16
    use_catalog: bool = False

    @property
    def catalog(self):
        from ..sources.catalog import Catalog

        return Catalog(os.path.join(self.root, "_catalog"))

    def read_consistent(self, spark, topic: str, version: int | None = None):
        """Open a topic's table AS OF the catalog snapshot (never its own
        head) — the torn-read-free path."""
        return self.catalog.read(spark, self.store_for(topic), topic, version)

    def store_for(self, topic: str) -> TableStore:
        return TableStore(
            os.path.join(self.root, _safe_dirname(topic)), n_buckets=self.n_buckets
        )

    def topics_seen(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.exists(os.path.join(self.root, d, "_current"))
        )

    # ---------- per-flow pause/resume (rolling-migration surface) ----------
    # The Connect REST `PUT /connectors/{name}/pause` analogue the
    # reference's provisioning runbook leans on (docs/mm2-provisioning.md:132
    # stops/restarts one connector while the rest of the worker group keeps
    # replicating). One engine loop runs every topic here, so pause is a
    # per-topic gate INSIDE the loop: the stream keeps triggering, other
    # flows keep applying, and the paused flow's table — including its
    # per-partition lineage watermarks — stops moving. Resume closes the
    # gap with a catch-up replay over the changelog: the lineage
    # anti-filter masks everything the flow already applied, so only the
    # events that arrived while paused land, exactly once, and the flow
    # rejoins the live loop sha-equal with a never-paused twin.

    def _pause_path(self, topic: str) -> str:
        return os.path.join(
            self.root, _safe_dirname(topic), "_flow_paused"
        )

    def paused_topics(self) -> list[str]:
        return [t for t in self.topics_seen() if self.is_paused(t)]

    def is_paused(self, topic: str) -> bool:
        return os.path.exists(self._pause_path(topic))

    def pause(self, topic: str) -> dict:
        """Gate one topic's flow off without touching the others. The
        marker snapshots the flow's applied watermarks at pause time (the
        offsets a Connect worker would persist on PAUSED) — resume does
        not need them for correctness (lineage is the guard) but an
        operator auditing the drained flow does."""
        import json
        import time as _time

        store = self.store_for(topic)
        if not store.exists():
            raise ValueError(
                f"unknown topic {topic!r}: no target table under "
                f"{self.root} (flows materialize on first sight)"
            )
        info = {
            "topic": topic,
            "paused_at_ms": int(_time.time() * 1000),
            "watermarks": {
                f"{r.get('consumer_group') or 'default'}:{r['partition']}":
                    r["applied_lsn"]
                for r in store.read_lineage_rows()
            },
        }
        p = self._pause_path(topic)
        with open(p + ".tmp", "w") as f:
            json.dump(info, f)
        os.replace(p + ".tmp", p)
        return info

    def resume(
        self,
        spark: SparkSession | None,
        topic: str,
        changelog_path: str | None = None,
        read_schema: T.StructType | None = None,
    ) -> dict:
        """Lift the gate and close the gap. With ``changelog_path``, runs
        a catch-up replay of the (whole) changelog filtered to this topic
        under the dedicated replay writer: the lineage watermark
        anti-filter reduces it to exactly the events skipped while paused
        — at-scale cost is one pushed-filter scan, and the skipped-event
        MERGE itself is O(missed batch). Without it, the flow simply
        rejoins the live loop from the NEXT trigger (events that streamed
        past while paused stay missing until a replay runs — the Connect
        analogue of resuming a connector whose topic retention already
        dropped the gap)."""
        import json

        p = self._pause_path(topic)
        info = {}
        was_paused = os.path.exists(p)
        if was_paused:
            with open(p) as f:
                info = json.load(f)
        out: dict = {"topic": topic, "was_paused": was_paused}
        # The catch-up replay runs while the gate is STILL DOWN: the marker
        # only blocks router.apply_batch (live triggers), never
        # replay_batch, and removing it before the replay commits would
        # open a data-loss window — a live post-gap batch advancing the
        # partition watermark past the paused gap makes the replay's
        # lineage anti-filter silently mask the gap events. The marker
        # comes off only after the replay commits successfully (a failed
        # replay leaves the flow gated and the gap replayable).
        if changelog_path is not None:
            if spark is None:
                raise ValueError("catch-up resume needs a SparkSession")
            store = self.store_for(topic)
            engine = CdcApplyEngine(
                store,
                replace(self.config, whitelist=f"^{re.escape(topic)}$"),
            )
            out["catchup"] = engine.replay_batch(
                spark, changelog_path, read_schema=read_schema
            )
            if self.use_catalog:
                # publish the caught-up table version (mirroring
                # apply_batch): read_consistent() otherwise keeps serving
                # the frozen pre-pause snapshot until the next live epoch
                # that happens to touch this topic
                out["_catalog_version"] = self.catalog.commit(
                    {topic: store.current_version()},
                    writer_id=f"resume:{topic}",
                )
                snap = self.catalog.snapshot()
                for t, tv in snap.items():
                    self.store_for(t).record_consumer(
                        f"catalog:{os.path.abspath(self.root)}", tv
                    )
        if was_paused:
            os.remove(p)
        return out

    def apply_batch(self, batch, epoch: int, writer_id: str = "default") -> dict:
        """Discover this batch's whitelisted topics, apply each to its own
        target (auto-created on first sight). Fencing is per (topic, writer):
        a topic added mid-stream starts its own epoch sequence safely."""
        selected = select_topics(batch, self.config.whitelist, self.config.blacklist)
        topics = sorted(
            r[0] for r in selected.select("source_topic").distinct().collect()
        )
        out = {}
        applied = []
        for t in topics:
            if self.is_paused(t):
                # the flow's gate is down: this topic's events pass by
                # unapplied (the changelog retains them; resume replays),
                # its lineage/table stay frozen, everyone else proceeds
                out[t] = {"epoch": epoch, "status": "paused"}
                continue
            engine = CdcApplyEngine(
                self.store_for(t),
                replace(self.config, whitelist=f"^{re.escape(t)}$"),
            )
            out[t] = engine.apply_batch(batch, epoch, writer_id=f"{writer_id}:{t}")
            applied.append(t)
        topics = applied
        if self.use_catalog and topics:
            # one atomic snapshot publish AFTER every table commit of the
            # epoch; fenced per (writer, epoch) so a replayed epoch whose
            # table halves all no-op doesn't re-advance the catalog
            out["_catalog_version"] = self.catalog.commit(
                {t: self.store_for(t).current_version() for t in topics},
                writer_id=writer_id,
                epoch=epoch,
            )
            # pin by MECHANISM: register the catalog as a consumer of the
            # exact table version its new snapshot serves, so an aggressive
            # per-table vacuum can never expire a version the live catalog
            # still resolves (the crash window where the catalog trails a
            # table's head is then retention-safe, not retention-lucky)
            snap = self.catalog.snapshot()
            for t, tv in snap.items():
                self.store_for(t).record_consumer(
                    f"catalog:{os.path.abspath(self.root)}", tv
                )
        return out

    def start_stream(
        self,
        spark: SparkSession,
        changelog_path: str,
        checkpoint_dir: str,
        read_schema: T.StructType,
        max_files_per_trigger: int = 1,
        available_now: bool = True,
    ):
        """Continuous tail with per-trigger topic discovery — new whitelisted
        topics appearing mid-stream materialize new target tables on the
        next trigger (the `refresh.topics.interval` behavior)."""
        src = (
            spark.readStream.schema(read_schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(changelog_path)
        )
        writer_id = f"stream:{os.path.abspath(checkpoint_dir)}"
        writer = (
            src.writeStream.foreachBatch(
                lambda df, eid: self.apply_batch(df, eid, writer_id=writer_id)
                and None
            )
            .option("checkpointLocation", checkpoint_dir)
            .queryName("cdc-topic-router")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="5 seconds")
        return writer.start()
