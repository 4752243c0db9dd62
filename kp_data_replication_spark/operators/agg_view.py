"""Incremental aggregate view maintenance from the changefeed (exact IVM).

The reference replicates topics precisely so consumers can keep derived
state near the data (docs/index.md:32-52 — mirrored topics feeding local
analytics). The lakehouse analogue of that derived state is a
MATERIALIZED AGGREGATE VIEW over the replicated table, and the engine
already re-emits row-level changes between any two committed versions
(operators/changefeed.py) — so the view can advance the way
Flink/Materialize maintain aggregates over a retraction stream, re-expressed
on batch epochs: every change image contributes ``+1`` (insert /
update_postimage) or ``-1`` (delete / update_preimage) of its measure
values, and the view merges O(batch) deltas instead of rescanning the
table.

Scale shape (100 TB base table / 10^10 events):
  * Per-epoch cost is O(changed rows), never O(table). The CDF read is
    manifest-bucket pruned; the delta aggregate produces at most one row
    per touched group (partial/map-side combine — the shuffle carries
    groups, not rows); the MERGE rewrites only the view buckets those
    groups hash into.
  * COUNT / SUM / AVG keep exact running partials. Integer-typed measures
    (``dtype='long'``) retract exactly; float sums accumulate the usual
    re-association drift under retraction — declare ``dtype='double'``
    deliberately and treat equality as approximate.
  * MIN / MAX survive retraction WITHOUT base-table recompute — the
    classic exact-IVM construction: a per-(group, value) multiset sidecar
    table tracks each distinct measure value's multiplicity; a delete
    decrements it, and a dirty group's new extreme is re-derived from its
    multiset slice alone (bucket-pruned by the same group hash, so a
    group's whole multiset is co-located). State is O(distinct values per
    group), updates are O(batch).
  * COUNT(DISTINCT) rides the same sidecar and is EXACT under retraction
    (which no mergeable sketch is — HLL can union but never subtract): a
    value stays counted until its last copy retracts, and the distinct
    count is just the dirty group's live multiset-entry count.
  * Null semantics match ANSI SQL: SUM/AVG/MIN/MAX ignore null measure
    values (a separate non-null counter backs SUM's empty->NULL and AVG's
    denominator); COUNT(*) counts all rows; a group whose live row count
    reaches zero leaves the view entirely.

Both stores are plain :class:`TableStore`s, so the view inherits the
engine's exactly-once machinery: writer-fenced epochs keyed to the SOURCE
version (a crash between the sidecar commit and the view commit replays
deterministically — the sidecar commit is fenced, the view delta is
re-derived from the same immutable version range), retention auto-pin via
the consumer registry, time travel, and vacuum.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.table_store import BUCKET_COL, TableStore, bucket_expr
from .changefeed import CHANGE_TYPE_COL, table_changes_cdf

_ADDITIVE = ("count", "sum", "avg")
_EXTREMES = ("min", "max")
# kinds whose exact maintenance needs the value-multiset sidecar: min/max
# (retraction of the reigning extreme), count_distinct (a value stays
# counted until its LAST copy retracts — sketches like HLL can't retract,
# the multiset can: the distinct count is just the group's live-entry
# count), and quantile (EXACT discrete percentiles under retraction — the
# dirty group's multiset slice is a weighted value histogram, so the
# rank-q value is a cumulative walk over O(distinct values) entries; no
# mergeable sketch gives exact retractable quantiles, the multiset does)
_DETAILED = (*_EXTREMES, "count_distinct", "quantile")


@dataclass(frozen=True)
class Measure:
    """One aggregate column of the view.

    ``kind``: count | sum | avg | min | max | count_distinct | quantile
    (exact discrete percentile under retraction, see ``q``). ``expr`` is
    any SQL expression over a source row (ignored for count); ``alias``
    is the published column name; ``dtype`` ('long' | 'double') is the
    partial's storage type — use 'long' for integral measures to make
    retraction exact. ``count_distinct`` is exact (multiset-backed, never
    a sketch) and always publishes long; distinctness is over the value
    cast to double, exact for integral values up to 2^53.
    """

    kind: str
    expr: str | None
    alias: str
    dtype: str = "double"
    # quantile only: the rank fraction. The published value is the
    # DISCRETE quantile — the smallest live value whose cumulative
    # multiplicity reaches ceil(q * n_non_null) — i.e. an actual data
    # value (SQL's quantile_disc), exact under retraction.
    q: float | None = None

    def __post_init__(self):
        if self.kind not in (*_ADDITIVE, *_DETAILED):
            raise ValueError(f"unknown measure kind '{self.kind}'")
        if self.kind != "count" and not self.expr:
            raise ValueError(f"measure '{self.alias}' ({self.kind}) needs expr")
        if self.dtype not in ("long", "double"):
            raise ValueError(f"measure '{self.alias}': dtype long|double")
        if self.kind == "quantile":
            if self.q is None or not (0.0 < self.q <= 1.0):
                raise ValueError(
                    f"measure '{self.alias}': quantile needs q in (0, 1]")
        elif self.q is not None:
            raise ValueError(f"measure '{self.alias}': q is quantile-only")


class IncrementalAggView:
    """Persisted aggregate view over a source :class:`TableStore`,
    maintained per-epoch from the full-CDF changefeed.

    Layout under ``root``: ``view/`` (one row per live group: group cols,
    ``_cnt``, per-measure partials, published min/max) and — only when a
    min/max measure exists — ``detail/`` (the (group, measure, value) ->
    multiplicity multiset sidecar), both bucketed by the group-key hash.
    """

    def __init__(
        self,
        root: str,
        group_cols: list[str],
        measures: list[Measure],
        n_buckets: int = 8,
    ):
        if not measures:
            raise ValueError("need at least one measure")
        aliases = [m.alias for m in measures]
        if len(set(aliases)) != len(aliases) or set(aliases) & set(group_cols):
            raise ValueError("measure aliases must be unique and disjoint "
                             "from group columns")
        self.root = root
        self.group_cols = list(group_cols)
        self.measures = list(measures)
        self.view = TableStore(os.path.join(root, "view"), n_buckets=n_buckets)
        self._needs_detail = any(m.kind in _DETAILED for m in measures)
        self.detail = (
            TableStore(os.path.join(root, "detail"), n_buckets=n_buckets)
            if self._needs_detail
            else None
        )

    # ------------------------------------------------------------------ #
    def _valued(self) -> list[Measure]:
        return [m for m in self.measures if m.kind != "count"]

    def _sums(self) -> list[Measure]:
        return [m for m in self.measures if m.kind in ("sum", "avg")]

    def _detailed(self) -> list[Measure]:
        """Measures maintained through the multiset sidecar."""
        return [m for m in self.measures if m.kind in _DETAILED]

    @staticmethod
    def _zero(dtype: str) -> F.Column:
        return F.lit(0).cast(dtype)

    def _group_eq(self, left: str, right: str) -> F.Column:
        cond = F.lit(True)
        for g in self.group_cols:
            # null-safe: SQL GROUP BY treats NULL as one group
            cond = cond & F.col(f"{left}.{g}").eqNullSafe(F.col(f"{right}.{g}"))
        return cond

    # ------------------------------------------------------------------ #
    def update(self, spark: SparkSession, src: TableStore) -> dict:
        """Advance the view to the source's current version. Idempotent
        (writer-fenced per store); cost O(changed rows in the range)."""
        writer = f"agg-view:{os.path.abspath(src.root)}"
        last = max(self.view.writer_epoch(writer), 0)
        head = src.current_version()
        if head <= last:
            return {"status": "noop", "from": last, "to": head}
        consumer = f"agg-view:{os.path.abspath(self.root)}"
        if last > 0:
            # retention auto-pin: the diff needs v_from to survive vacuum
            src.record_consumer(consumer, last)

        cdf = table_changes_cdf(spark, src, last, head)
        sign = F.when(
            F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        proj = cdf.select(
            *self.group_cols,
            sign.alias("_sign"),
            *[
                F.expr(m.expr).cast(m.dtype).alias(f"_v_{m.alias}")
                for m in self._valued()
            ],
        ).cache()
        try:
            n_vb = self.view.n_buckets
            vb = bucket_expr(n_vb, self.group_cols)
            # ONE driver-bounded job: dirty view buckets, changed-image
            # count, AND (when min/max/count_distinct exist) which of those
            # buckets carry a non-null detailed value — the sidecar's dirty
            # set, folded into the same per-bucket aggregate so the whole
            # epoch plans exactly two writes and one stats collect
            det_cols = [F.col(f"_v_{m.alias}") for m in self._detailed()]
            aggs = [F.count(F.lit(1)).alias("n")]
            if det_cols:
                aggs.append(
                    F.count(
                        det_cols[0] if len(det_cols) == 1
                        else F.coalesce(*det_cols)
                    ).alias("nd")
                )
            stats = proj.groupBy(vb.alias("b")).agg(*aggs).collect()
            if not stats:
                # physical-only rewrites in range: nothing to fold, but the
                # cursor must still advance (fenced no-data commit)
                self.view.commit(None, [], [], head, self._view_schema(spark),
                                 writer_id=writer)
                src.record_consumer(consumer, head)
                return {"status": "committed", "from": last, "to": head,
                        "n_changes": 0, "dirty_view_buckets": 0}
            dirty_view = sorted(r["b"] for r in stats)
            n_changes = sum(r["n"] for r in stats)
            dirty_det = sorted(r["b"] for r in stats if r["nd"] > 0) \
                if det_cols else []

            delta = self._additive_delta(proj)
            mm = self._advance_detail(spark, proj, head, writer, dirty_view,
                                      dirty_det)
            merged = self._merge_view(spark, delta, mm, dirty_view, n_vb)
            self.view.commit(
                merged.withColumn(BUCKET_COL, bucket_expr(n_vb, self.group_cols)),
                dirty_view,
                [],
                head,
                T.StructType(merged.schema.fields),
                writer_id=writer,
            )
            src.record_consumer(consumer, head)
            return {
                "status": "committed",
                "from": last,
                "to": head,
                "n_changes": n_changes,
                "dirty_view_buckets": len(dirty_view),
            }
        finally:
            proj.unpersist()

    # ------------------------------------------------------------------ #
    def _additive_delta(self, proj: DataFrame) -> DataFrame:
        """Per-group additive partials of this batch: count delta, and for
        every sum/avg measure a (signed sum, signed non-null count) pair.
        Map-side combine collapses this to <= one shuffled row per group."""
        aggs = [F.sum("_sign").cast("long").alias("_d_cnt")]
        for m in self._sums():
            v = F.col(f"_v_{m.alias}")
            aggs.append(
                F.sum(F.col("_sign") * v).cast(m.dtype).alias(f"_d_sum_{m.alias}")
            )
            aggs.append(
                F.sum(F.when(v.isNotNull(), F.col("_sign")).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"_d_nn_{m.alias}")
            )
        return proj.groupBy(*self.group_cols).agg(*aggs)

    # ------------------------------------------------------------------ #
    def _advance_detail(
        self,
        spark: SparkSession,
        proj: DataFrame,
        head: int,
        writer: str,
        touched_buckets: list[int],
        dirty_det: list[int],
    ) -> DataFrame | None:
        """Fold the batch into the (group, measure, value) multiset sidecar
        and return the dirty groups' recomputed extremes (None when the
        view has no min/max measure). The sidecar commit is fenced at the
        same source version as the view commit, so a crash between the two
        replays cleanly.

        ``touched_buckets``: group-hash buckets of EVERY group in the
        batch (view and sidecar share ``n_buckets``, so the ids line up).
        The recompute must read these, not just the buckets whose
        multisets changed — a group touched only by null-valued
        contributions keeps its old extreme, which lives in an otherwise
        clean bucket. ``dirty_det``: the subset of those buckets with a
        non-null detailed contribution (the sidecar's dirty set) —
        computed by the caller's single stats job, no extra collect here.
        """
        if not self._needs_detail:
            return None
        exts = self._detailed()
        parts = [
            proj.filter(F.col(f"_v_{m.alias}").isNotNull()).select(
                *self.group_cols,
                F.lit(m.alias).alias("_m"),
                F.col(f"_v_{m.alias}").cast("double").alias("_val"),
                F.col("_sign"),
            )
            for m in exts
        ]
        ddelta = parts[0]
        for p in parts[1:]:
            ddelta = ddelta.unionByName(p)
        ddelta = (
            ddelta.groupBy(*self.group_cols, "_m", "_val")
            .agg(F.sum("_sign").cast("long").alias("_d"))
        )
        n_db = self.detail.n_buckets
        if n_db != self.view.n_buckets:
            raise ValueError(
                "view/detail bucket counts diverged (rebucket both together): "
                f"{self.view.n_buckets} != {n_db}"
            )
        if self.detail.writer_epoch(writer) < head and dirty_det:
            old = (
                self.detail.read_state(spark, buckets=dirty_det)
                if self.detail._bucket_files(dirty_det)
                else None
            )
            d = ddelta.alias("d")
            if old is None:
                merged = ddelta.filter(F.col("_d") > 0).select(
                    *self.group_cols, "_m", "_val",
                    F.col("_d").alias("_mult"),
                )
            else:
                o = old.alias("o")
                cond = (
                    self._group_eq("o", "d")
                    & F.col("o._m").eqNullSafe(F.col("d._m"))
                    & F.col("o._val").eqNullSafe(F.col("d._val"))
                )
                j = o.join(d, cond, "full_outer")
                mult = F.coalesce(F.col("o._mult"), F.lit(0)) + F.coalesce(
                    F.col("d._d"), F.lit(0)
                )
                merged = j.select(
                    *[
                        F.coalesce(F.col(f"o.{g}"), F.col(f"d.{g}")).alias(g)
                        for g in self.group_cols
                    ],
                    F.coalesce(F.col("o._m"), F.col("d._m")).alias("_m"),
                    F.coalesce(F.col("o._val"), F.col("d._val")).alias("_val"),
                    mult.cast("long").alias("_mult"),
                ).filter(F.col("_mult") > 0)
            self.detail.commit(
                merged.withColumn(BUCKET_COL, bucket_expr(n_db, self.group_cols)),
                dirty_det,
                [],
                head,
                T.StructType(merged.schema.fields),
                writer_id=writer,
            )
        # recompute extremes for the touched groups from the POST-commit
        # multiset: bucket-pruned read joined to the (batch-bounded)
        # dirty-group set — the base table is never consulted
        dirty_groups = proj.select(*self.group_cols).distinct()
        if not self.detail._bucket_files(touched_buckets):
            # no multiset state for any touched group: all extremes null
            # (count_distinct publishes 0 via read()'s coalesce)
            exts_null = [
                F.lit(None).cast(self._detail_dtype(m)).alias(f"_mm_{m.alias}")
                for m in exts
            ]
            return dirty_groups.select(*self.group_cols, *exts_null)
        det = self.detail.read_state(spark, buckets=touched_buckets).alias("s")
        g = dirty_groups.alias("g")
        sel = det.join(
            F.broadcast(g), self._group_eq("s", "g"), "inner"
        ).select(*[F.col(f"s.{c}").alias(c) for c in det.columns])
        mm_aggs = []
        quantiles = [m for m in exts if m.kind == "quantile"]
        for m in exts:
            slice_ = F.when(F.col("_m") == m.alias, F.col("_val"))
            if m.kind == "quantile":
                # gather the group's weighted value histogram (one entry
                # per live distinct value — O(distinct), the multiset's
                # own size) plus its total multiplicity; the rank walk
                # happens post-aggregation, below
                ent = F.when(
                    F.col("_m") == m.alias,
                    F.struct(F.col("_val"), F.col("_mult")),
                )
                mm_aggs.append(
                    F.array_sort(F.collect_list(ent)).alias(f"_ent_{m.alias}")
                )
                mm_aggs.append(
                    F.sum(F.when(F.col("_m") == m.alias, F.col("_mult")))
                    .alias(f"_tot_{m.alias}")
                )
                continue
            if m.kind == "count_distinct":
                # one multiset row per live distinct value: counting the
                # slice IS the distinct count
                agg = F.count(slice_)
            else:
                agg = (F.min if m.kind == "min" else F.max)(slice_)
            mm_aggs.append(
                agg.cast(self._detail_dtype(m)).alias(f"_mm_{m.alias}")
            )
        mm = sel.groupBy(*self.group_cols).agg(*mm_aggs)
        for m in quantiles:
            # discrete quantile: smallest value whose cumulative
            # multiplicity reaches ceil(q * total) — one JVM fold over the
            # sorted histogram, no explode back to row-per-copy
            rank = F.ceil(F.lit(m.q) * F.col(f"_tot_{m.alias}"))
            walk = F.aggregate(
                F.col(f"_ent_{m.alias}"),
                F.struct(
                    F.lit(0).cast("long").alias("cum"),
                    F.lit(None).cast("double").alias("ans"),
                ),
                lambda acc, e: F.struct(
                    (acc["cum"] + e["_mult"]).alias("cum"),
                    F.when(acc["ans"].isNotNull(), acc["ans"])
                    .when(acc["cum"] + e["_mult"] >= rank, e["_val"])
                    .alias("ans"),
                ),
                lambda acc: acc["ans"],
            )
            mm = mm.withColumn(
                f"_mm_{m.alias}", walk.cast(self._detail_dtype(m))
            ).drop(f"_ent_{m.alias}", f"_tot_{m.alias}")
        # right outer onto the dirty groups so a group whose multiset
        # emptied still gets an (all-null) recompute row
        mm = mm.alias("mm")
        return (
            g.join(mm, self._group_eq("g", "mm"), "left")
            .select(
                *[F.col(f"g.{c}").alias(c) for c in self.group_cols],
                *[F.col(f"_mm_{m.alias}") for m in exts],
            )
        )

    @staticmethod
    def _detail_dtype(m: Measure) -> str:
        # count_distinct publishes a count: long, whatever dtype says
        return "long" if m.kind == "count_distinct" else m.dtype

    # ------------------------------------------------------------------ #
    def _merge_view(
        self,
        spark: SparkSession,
        delta: DataFrame,
        mm: DataFrame | None,
        dirty_view: list[int],
        n_vb: int,
    ) -> DataFrame:
        if mm is not None:
            d = delta.alias("dl")
            m = mm.alias("mm")
            delta = d.join(m, self._group_eq("dl", "mm"), "left").select(
                *[F.col(f"dl.{c}").alias(c) for c in delta.columns],
                *[F.col(f"mm._mm_{x.alias}") for x in self._detailed()],
            )
        delta = delta.withColumn("_dirty", F.lit(True))
        old = (
            self.view.read_state(spark, buckets=dirty_view)
            if self.view._bucket_files(dirty_view)
            else None
        )
        if old is None:
            out = delta.filter(F.col("_d_cnt") > 0).select(
                *self.group_cols,
                F.col("_d_cnt").alias("_cnt"),
                *[
                    c
                    for m_ in self._sums()
                    for c in (
                        F.col(f"_d_sum_{m_.alias}").alias(f"_sum_{m_.alias}"),
                        F.col(f"_d_nn_{m_.alias}").alias(f"_nn_{m_.alias}"),
                    )
                ],
                *[
                    F.col(f"_mm_{m_.alias}").alias(m_.alias)
                    for m_ in self._detailed()
                ],
            )
            return out
        o = old.alias("o")
        d = delta.alias("d")
        j = o.join(d, self._group_eq("o", "d"), "full_outer")
        dirty = F.col("d._dirty").isNotNull()
        cnt = F.coalesce(F.col("o._cnt"), F.lit(0)) + F.coalesce(
            F.col("d._d_cnt"), F.lit(0)
        )
        cols = [
            *[
                F.coalesce(F.col(f"o.{g}"), F.col(f"d.{g}")).alias(g)
                for g in self.group_cols
            ],
            cnt.cast("long").alias("_cnt"),
        ]
        for m_ in self._sums():
            z = self._zero(m_.dtype)
            cols.append(
                (
                    F.coalesce(F.col(f"o._sum_{m_.alias}"), z)
                    + F.coalesce(F.col(f"d._d_sum_{m_.alias}"), z)
                ).cast(m_.dtype).alias(f"_sum_{m_.alias}")
            )
            cols.append(
                (
                    F.coalesce(F.col(f"o._nn_{m_.alias}"), F.lit(0))
                    + F.coalesce(F.col(f"d._d_nn_{m_.alias}"), F.lit(0))
                ).cast("long").alias(f"_nn_{m_.alias}")
            )
        for m_ in self._detailed():
            cols.append(
                F.when(dirty, F.col(f"d._mm_{m_.alias}"))
                .otherwise(F.col(f"o.{m_.alias}"))
                .cast(self._detail_dtype(m_))
                .alias(m_.alias)
            )
        return j.select(*cols).filter(F.col("_cnt") > 0)

    # ------------------------------------------------------------------ #
    def _view_schema(self, spark: SparkSession) -> T.StructType:
        existing = self.view.schema()
        if existing is not None:
            return existing
        # no committed schema yet and an empty range: minimal placeholder
        return T.StructType(
            [T.StructField(g, T.StringType()) for g in self.group_cols]
            + [T.StructField("_cnt", T.LongType())]
        )

    # ------------------------------------------------------------------ #
    def rebucket(self, spark: SparkSession, n_buckets: int) -> dict:
        """Rescale BOTH stores to ``n_buckets`` (hashed on the group
        columns — the co-location invariant the update path depends on:
        view and sidecar must agree so dirty-bucket ids line up). Use when
        the group-key universe has outgrown the bucket budget, same
        rationale as the base table's auto-rebucket."""
        v = self.view.rebucket(spark, n_buckets, key_cols=self.group_cols)
        if self.detail is not None:
            self.detail.rebucket(spark, n_buckets, key_cols=self.group_cols)
        return v

    # ------------------------------------------------------------------ #
    def read(self, spark: SparkSession) -> DataFrame:
        """The published view: group cols + one column per measure, with
        ANSI aggregate null semantics (empty SUM/AVG/MIN/MAX -> NULL)."""
        st = self.view.read_state(spark)
        cols: list[F.Column] = [F.col(g) for g in self.group_cols]
        for m in self.measures:
            if m.kind == "count":
                cols.append(F.col("_cnt").alias(m.alias))
            elif m.kind == "sum":
                cols.append(
                    F.when(F.col(f"_nn_{m.alias}") > 0, F.col(f"_sum_{m.alias}"))
                    .alias(m.alias)
                )
            elif m.kind == "avg":
                cols.append(
                    F.when(
                        F.col(f"_nn_{m.alias}") > 0,
                        F.col(f"_sum_{m.alias}").cast("double")
                        / F.col(f"_nn_{m.alias}"),
                    ).alias(m.alias)
                )
            elif m.kind == "count_distinct":
                # SQL count(DISTINCT x) over an all-null group is 0
                cols.append(F.coalesce(F.col(m.alias), F.lit(0)).alias(m.alias))
            else:
                cols.append(F.col(m.alias))
        return st.select(*cols)
