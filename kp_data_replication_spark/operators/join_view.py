"""Incremental equi-join view maintenance from two changefeeds (delta join).

The reference replicates topics so consumers can keep derived state near
the data (docs/index.md:32-52); next to :mod:`.agg_view`'s GROUP BY view,
the other canonical piece of consumer-side derived state is an ENRICHMENT
JOIN — a fact stream joined to a replicated dimension (Kafka Streams'
KTable-KTable join, Flink's two-input streaming join). This module
materializes ``fact LEFT OUTER JOIN dim`` as a persisted
:class:`~..sources.table_store.TableStore` and advances it per epoch from
BOTH tables' full-CDF changefeeds — O(changed + affected) per epoch,
never a base-table rescan on either side.

Why LEFT OUTER (with an explicit ``_matched`` flag) rather than inner:
incremental INNER-join maintenance needs an index of unmatched fact rows
by join key — when a dim row arrives late, the rows it should match are
exactly the ones an inner view discarded, and finding them in the fact
table would be an O(fact) scan per epoch (the fact store is bucketed by
its OWN key, not the foreign key). The left view keeps one row per live
fact row, so it IS that index: the view store is bucketed by the
FOREIGN-KEY hash, making every dim-driven patch (update propagation, dim
delete un-matching, late dim arrival re-matching) a bucket-pruned read of
only the affected slice. ``read(inner=True)`` is the inner join.

Per-epoch delta, one commit, all side frames O(batch):
  * fact delta  -> drop the view rows of every changed fact key
    (broadcast anti-join on the fact pk), re-add post-images joined
    against a key-pruned read of the CURRENT dim slice they reference.
    A foreign-key change moves the row between view buckets: the
    pre-image's fk dirties the old bucket, the post-image's the new.
  * dim delta   -> patch surviving view rows whose fk is a changed dim
    key: new images overwrite the dim columns (``_matched`` true), a
    deleted dim key nulls them (``_matched`` false). Rows of untouched
    fks pass through byte-identical.
  * both deltas in one epoch compose: fact-driven additions join the
    post-epoch dim state, so they never need the patch.

Two-source exactly-once cursor: the view's writer fence stores ONE epoch
int per writer, so the (fact_version, dim_version) cursor pair rides it
through the Cantor pairing function — strictly monotone along the
reachable chain (both versions only grow), exactly invertible, and
atomic WITH the commit (a crash before the commit replays from the old
pair; after it, the fence returns the new pair — there is no window
where the cursor disagrees with the committed state). Both sources get a
consumer-registry pin at the cursor version so vacuum cannot expire the
changefeed range the next update needs.

Scale shape (100 TB fact / 10^10 events): per-epoch reads are the two
CDF ranges (manifest-pruned), the dim slice for the batch's foreign keys
(bucket-pruned point pattern, same as ``TableStore.lookup``), and the
view's dirty fk-buckets; shuffles are only the commit's bucket
repartition — every join in the epoch broadcasts an O(batch) side. The
known hot spot is a HOT DIMENSION KEY (one fk owning a disproportionate
share of fact rows): its patches rewrite one big bucket — raise
``n_buckets`` or pass ``write_salt`` to split the bucket's write across
tasks (the same straggler fix the base table uses).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import KEY_COLS
from ..sources.table_store import BUCKET_COL, TableStore, bucket_expr
from .changefeed import CHANGE_TYPE_COL, table_changes_cdf

MATCHED_COL = "_matched"
_FK_PREFIX = "_fk_"


def _pair(a: int, b: int) -> int:
    """Cantor pairing — unique, invertible, and strictly increasing along
    any chain where neither component decreases and at least one grows."""
    s = a + b
    return s * (s + 1) // 2 + b


def _unpair(z: int) -> tuple[int, int]:
    s = int(((8 * z + 1) ** 0.5 - 1) // 2)
    # float-sqrt safety at large z: settle s exactly
    while s * (s + 1) // 2 > z:
        s -= 1
    while (s + 1) * (s + 2) // 2 <= z:
        s += 1
    b = z - s * (s + 1) // 2
    return s - b, b


class IncrementalJoinView:
    """Persisted ``fact LEFT JOIN dim`` view, maintained per epoch from
    both stores' changefeeds.

    ``fk_exprs``: one SQL expression over a FACT row per dim key column
    (in :data:`~..schema.KEY_COLS` order), e.g.
    ``{"repo": "'cust'", "path": "custkey"}`` — the join condition is
    ``dim.repo = 'cust' AND dim.path = fact.custkey``. ``fact_cols`` /
    ``dim_cols``: published columns as ``{alias: sql_expr}`` over the
    respective row; aliases must be unique across both sides and disjoint
    from the fact key columns. Expression result types must be stable
    across epochs (they define the view schema at first commit).

    View layout: fact key cols, ``_fk_<dimkey>`` join-key cols, fact
    aliases, dim aliases, ``_matched`` — bucketed by the fk hash.
    """

    def __init__(
        self,
        root: str,
        fk_exprs: dict[str, str],
        fact_cols: dict[str, str],
        dim_cols: dict[str, str],
        n_buckets: int = 8,
        write_salt: int = 1,
    ):
        missing = [k for k in KEY_COLS if k not in fk_exprs]
        if missing or set(fk_exprs) != set(KEY_COLS):
            raise ValueError(
                f"fk_exprs must map exactly the dim key columns {KEY_COLS}"
            )
        aliases = [*fact_cols, *dim_cols]
        reserved = set(KEY_COLS) | {MATCHED_COL, BUCKET_COL} | {
            _FK_PREFIX + k for k in KEY_COLS
        }
        if len(set(aliases)) != len(aliases) or set(aliases) & reserved:
            raise ValueError(
                "fact_cols/dim_cols aliases must be unique and disjoint "
                f"from key/reserved columns {sorted(reserved)}"
            )
        self.root = root
        self.fk_exprs = dict(fk_exprs)
        self.fact_cols = dict(fact_cols)
        self.dim_cols = dict(dim_cols)
        self.write_salt = write_salt
        self.view = TableStore(os.path.join(root, "view"), n_buckets=n_buckets)

    # ------------------------------------------------------------------ #
    @property
    def _fk_cols(self) -> list[str]:
        return [_FK_PREFIX + k for k in KEY_COLS]

    def _fk_select(self) -> list[F.Column]:
        """The fk columns, evaluated over a fact row and CAST to the dim
        key type (string keys) so bucket hashing and join equality agree
        with the dim store's own layout."""
        return [
            F.expr(self.fk_exprs[k]).cast("string").alias(_FK_PREFIX + k)
            for k in KEY_COLS
        ]

    def _fk_eq(self, left: str, right: str) -> F.Column:
        cond = F.lit(True)
        for k in KEY_COLS:
            # null-safe OFF on purpose: SQL equi-joins never match null keys
            cond = cond & (
                F.col(f"{left}.{_FK_PREFIX}{k}") == F.col(f"{right}.{k}")
            )
        return cond

    def _pk_eq(self, left: str, right: str) -> F.Column:
        cond = F.lit(True)
        for k in KEY_COLS:
            cond = cond & F.col(f"{left}.{k}").eqNullSafe(F.col(f"{right}.{k}"))
        return cond

    # ------------------------------------------------------------------ #
    def update(self, spark: SparkSession, fact: TableStore, dim: TableStore) -> dict:
        """Advance the view to both sources' current versions. Idempotent
        (writer-fenced; the fence epoch IS the Cantor-paired cursor)."""
        writer = (
            f"join-view:{os.path.abspath(fact.root)}:{os.path.abspath(dim.root)}"
        )
        prev = self.view.writer_epoch(writer)
        lf, ld = _unpair(prev) if prev > 0 else (0, 0)
        hf, hd = fact.current_version(), dim.current_version()
        if hf <= lf and hd <= ld:
            return {"status": "noop", "fact": (lf, hf), "dim": (ld, hd)}
        if hf == 0 or hd == 0:
            raise ValueError(
                "join view needs at least one committed version on both "
                f"stores (fact v{hf}, dim v{hd}) — seed the dim first or "
                "in the same epoch"
            )
        consumer = f"join-view:{os.path.abspath(self.root)}"
        if lf > 0:
            fact.record_consumer(consumer, lf)  # retention pin for the diff
        if ld > 0:
            dim.record_consumer(consumer, ld)

        # empty ranges (one source idle) read as typed empty frames with
        # ZERO data files (narrowed to a point — changefeed.narrow_versions)
        cdf_f = table_changes_cdf(spark, fact, lf if hf > lf else hf, hf)
        cdf_d = table_changes_cdf(spark, dim, ld if hd > ld else hd, hd)

        is_post = F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage")

        # project-and-CACHE each delta once: several downstream frames
        # derive from it, and without the cache every one would re-run the
        # full-outer diff join (O(batch) rows — cheap to hold, expensive
        # to recompute)
        fproj = cdf_f.select(
            *KEY_COLS,
            F.col(CHANGE_TYPE_COL),
            *self._fk_select(),
            *[F.expr(e).alias(a) for a, e in self.fact_cols.items()],
        ).cache()
        dproj = cdf_d.select(*KEY_COLS).cache()
        return self._advance(
            spark, fact, dim, fproj, dproj, is_post,
            lf, ld, hf, hd, writer, consumer,
        )

    def _advance(
        self, spark, fact, dim, fproj, dproj, is_post,
        lf, ld, hf, hd, writer, consumer,
    ) -> dict:
        try:
            return self._advance_inner(
                spark, fact, dim, fproj, dproj, is_post,
                lf, ld, hf, hd, writer, consumer,
            )
        finally:
            fproj.unpersist()
            dproj.unpersist()

    def _advance_inner(
        self, spark, fact, dim, fproj, dproj, is_post,
        lf, ld, hf, hd, writer, consumer,
    ) -> dict:
        # ---- fact-side frames (all O(batch)) ------------------------- #
        f_keys = fproj.select(*KEY_COLS).distinct()
        f_add = fproj.filter(is_post).select(
            *KEY_COLS,
            *self._fk_cols,
            *self.fact_cols,
        )
        # every fk this delta touches, pre AND post image (a changed fk
        # dirties both its old and its new view bucket)
        f_fks = fproj.select(*self._fk_cols)

        # ---- dim-side frames ------------------------------------------ #
        d_keys = dproj.distinct()

        n_vb = self.view.n_buckets
        vb = bucket_expr(n_vb, self._fk_cols)
        dirty_rows = (
            f_fks.select(vb.alias("b"))
            .unionByName(
                d_keys.select(
                    bucket_expr(
                        n_vb, KEY_COLS
                    ).alias("b")
                )
            )
            .distinct()
            .collect()
        )  # driver-bounded by n_buckets
        dirty = sorted({r["b"] for r in dirty_rows})

        if not dirty:
            # maintenance-only / no-op ranges: advance the cursor with a
            # fenced no-data commit so the next diff range stays O(batch)
            if self.view.current_version() == 0:
                return {"status": "noop", "fact": (lf, hf), "dim": (ld, hd)}
            self.view.commit(
                None, [], [], _pair(hf, hd),
                self._committed_schema(spark), writer_id=writer,
            )
            fact.record_consumer(consumer, hf)
            dim.record_consumer(consumer, hd)
            return {"status": "committed", "fact": (lf, hf), "dim": (ld, hd),
                    "dirty_view_buckets": 0, "n_rows_written": 0}

        # dim rows the epoch needs: keys referenced by fact additions plus
        # the changed dim keys — a point-pattern read of the CURRENT dim
        # state, bucket-pruned by the dim store's own key hash
        need = (
            f_add.select(*[F.col(_FK_PREFIX + k).alias(k) for k in KEY_COLS])
            .unionByName(d_keys)
            .distinct()
        )
        need_rows = need.select(
            bucket_expr(dim.n_buckets, KEY_COLS).alias("b")
        ).distinct().collect()
        d_slice = dim.read_state(
            spark, buckets=sorted({r["b"] for r in need_rows})
        )
        d_need = (
            d_slice.join(F.broadcast(need), on=KEY_COLS, how="left_semi")
            .select(
                *KEY_COLS,
                *[F.expr(e).alias(a) for a, e in self.dim_cols.items()],
                F.lit(True).alias("_ex"),
            )
        )

        # ---- survivors: old slice minus changed fact keys ------------- #
        has_state = self.view.current_version() > 0
        if has_state:
            old_slice = self.view.read_state(spark, buckets=dirty)
            survivors = old_slice.alias("o").join(
                F.broadcast(f_keys.alias("k")),
                self._pk_eq("o", "k"),
                "left_anti",
            )
        else:
            survivors = None

        # ---- dim-driven patch over survivors -------------------------- #
        if survivors is not None:
            d_patch = (
                d_keys.alias("dk")
                .join(
                    F.broadcast(d_need.alias("dn")),
                    self._pk_eq("dk", "dn"),
                    "left",
                )
                .select(
                    *[F.col(f"dk.{k}").alias(k) for k in KEY_COLS],
                    *[F.col(f"dn.{a}").alias(f"_new_{a}") for a in self.dim_cols],
                    F.coalesce(F.col("dn._ex"), F.lit(False)).alias("_ex"),
                    F.lit(True).alias("_in_kd"),
                )
            )
            s = survivors.alias("s").join(
                F.broadcast(d_patch.alias("p")), self._fk_eq("s", "p"), "left"
            )
            in_kd = F.col("p._in_kd").isNotNull()
            patched = s.select(
                *[F.col(f"s.{k}").alias(k) for k in KEY_COLS],
                *[F.col(f"s.{c}").alias(c) for c in self._fk_cols],
                *[F.col(f"s.{a}").alias(a) for a in self.fact_cols],
                *[
                    F.when(in_kd, F.col(f"p._new_{a}"))
                    .otherwise(F.col(f"s.{a}"))
                    .alias(a)
                    for a in self.dim_cols
                ],
                F.when(in_kd, F.col("p._ex"))
                .otherwise(F.col(f"s.{MATCHED_COL}"))
                .alias(MATCHED_COL),
            )
        else:
            patched = None

        # ---- fact-driven additions against the post-epoch dim --------- #
        additions = (
            f_add.alias("f")
            .join(F.broadcast(d_need.alias("d")), self._fk_eq("f", "d"), "left")
            .select(
                *[F.col(f"f.{k}").alias(k) for k in KEY_COLS],
                *[F.col(f"f.{c}").alias(c) for c in self._fk_cols],
                *[F.col(f"f.{a}").alias(a) for a in self.fact_cols],
                *[F.col(f"d.{a}").alias(a) for a in self.dim_cols],
                F.coalesce(F.col("d._ex"), F.lit(False)).alias(MATCHED_COL),
            )
        )
        new_slice = (
            additions if patched is None else patched.unionByName(additions)
        )
        row_schema = T.StructType(new_slice.schema.fields)
        n_written = self.view.commit(
            new_slice.withColumn(BUCKET_COL, bucket_expr(n_vb, self._fk_cols)),
            dirty,
            [],
            _pair(hf, hd),
            row_schema,
            writer_id=writer,
            write_salt=self.write_salt,
        )
        fact.record_consumer(consumer, hf)
        dim.record_consumer(consumer, hd)
        return {
            "status": "committed",
            "fact": (lf, hf),
            "dim": (ld, hd),
            "dirty_view_buckets": len(dirty),
            "version": n_written,
        }

    # ------------------------------------------------------------------ #
    def rebucket(self, spark: SparkSession, n_buckets: int) -> int:
        """Rescale the view on the FOREIGN-KEY hash (the layout that makes
        dim-driven patches prune) — same volume-growth rationale as the
        base table's auto-rebucket; the maintenance version is
        row-preserving, so incremental readers narrow across it."""
        v = self.view.rebucket(spark, n_buckets, key_cols=self._fk_cols)
        return v

    # ------------------------------------------------------------------ #
    def _committed_schema(self, spark: SparkSession) -> T.StructType:
        st = self.view.read_state(spark, buckets=[])
        return T.StructType(
            [f for f in st.schema.fields if f.name != BUCKET_COL]
        )

    # ------------------------------------------------------------------ #
    def read(self, spark: SparkSession, inner: bool = False) -> DataFrame:
        """The published view: fact keys, fk cols, fact aliases, dim
        aliases, ``_matched``. ``inner=True`` keeps matched rows only (the
        INNER join; dim aliases are then never null unless the dim row's
        own column is null)."""
        st = self.view.read_state(spark)
        out = st.select(
            *KEY_COLS,
            *self._fk_cols,
            *self.fact_cols,
            *self.dim_cols,
            MATCHED_COL,
        )
        return out.filter(F.col(MATCHED_COL)) if inner else out
