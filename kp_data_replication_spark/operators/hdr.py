"""Mergeable HDR-histogram quantile sketches + changefeed-maintained
quantile view — bounded-relative-error percentiles at O(bins) state per
group, with EXACT retraction under CDC deletes.

The sketch-family completion (see operators/sketches.py for HLL /
distinct, operators/cms.py for count-min / frequency): the remaining
metric a replication pipeline monitors at 10^10 events is the LATENCY /
SIZE PERCENTILE (the reference's Grafana p99 panels over consumer lag
and end-to-end latency, monitoring/prometheus-rules.yaml; the engine's
own `cdc_latency_percentiles` computes exact percentiles O(n) per
query). The exact-IVM aggregate view (operators/agg_view.py) keeps
quantiles exact under retraction but its multiset sidecar is O(distinct
values per group) — for latencies in microseconds that IS the data. The
industry answer (HdrHistogram, Prometheus native histograms) is a
log-scaled histogram: bounded RELATIVE error (here <= 1/16 = 6.25%),
O(bins) state (~16 x 60 bins covers the full long range), mergeable by
counter add.

Determinism / oracle-exactness: binning is INTEGER-ONLY — no float log
whose boundary rounding could differ between engines:

    shift = max(0, bit_length(v) - 5)      # bit_length = length(bin(v))
    bin   = shift * 16 + (v >> shift)

Values < 16 are exact (bin = v); larger values keep their top 5 bits
(sub-bucket in [16, 32)), so a bin's range is [sub << shift,
((sub+1) << shift) - 1] and the relative width is <= 1/16. bit_length
and >> exist in both Spark (`F.bin`, `F.shiftright`) and DuckDB
(`bin()`, `>>`), so bin tables AND quantile reads hash-match exactly.

Linearity: like count-min (and unlike HLL), the histogram is a LINEAR
sketch — merge = counter add, retraction = signed add — so
:class:`IncrementalHdrHistogram`, fed by the full-CDF changefeed
(insert +1, delete -1, update retracts the pre-image), equals the batch
recompute over the CURRENT LIVE state at every epoch.

Quantile read: rank = ceil(q * total) (1-based), the answer is the
first bin whose cumulative count reaches the rank, reported as the
bin's exact [lo, hi] value bounds — deterministic, and the true
rank-q value provably lies within them.

Scale shape (10^10 events): the bin projection is map-side pure JVM
(one bit_length + shift per row); the shuffle carries at most
(groups x ~976) counter rows per epoch after partial combine; quantile
reads window over O(bins) rows per group, never data. Domain: values
must be non-negative (latencies, sizes, lags); negative values raise at
bin time rather than silently corrupting percentiles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.table_store import BUCKET_COL, TableStore, bucket_expr
from .changefeed import CHANGE_TYPE_COL, table_changes_cdf

HDR_SUB_BITS = 4                # 16 sub-buckets -> relative error <= 1/16
HDR_SUB = 1 << HDR_SUB_BITS


def hdr_bin_expr(col: F.Column) -> F.Column:
    """Integer-exact HDR bin of a non-negative long (see module docs)."""
    v = col.cast("long")
    # bit_length(v) for v > 0 == length(bin(v)); shift so 5 bits remain
    blen = F.length(F.bin(v))
    shift = F.greatest(F.lit(0), (blen - F.lit(HDR_SUB_BITS + 1))).cast("int")
    checked = F.when(v < 0, F.raise_error(
        F.concat(F.lit("hdr_bin_expr: negative value "), v.cast("string"))
    )).otherwise(F.call_function("shiftright", v, shift))
    return (shift.cast("long") * F.lit(HDR_SUB) + checked).cast("long")


def hdr_bounds_exprs(bin_col: F.Column) -> tuple[F.Column, F.Column]:
    """Exact [lo, hi] value bounds of a bin (inverse of hdr_bin_expr)."""
    b = bin_col.cast("long")
    shift = F.when(b < HDR_SUB, F.lit(0)).otherwise(
        (b / F.lit(HDR_SUB)).cast("long") - F.lit(1)
    ).cast("int")
    sub = b - shift.cast("long") * F.lit(HDR_SUB)
    lo = F.call_function("shiftleft", sub, shift)
    hi = F.call_function("shiftleft", sub + F.lit(1), shift) - F.lit(1)
    return lo.cast("long"), F.when(b < HDR_SUB, b).otherwise(hi).cast("long")


def hdr_bins(
    df: DataFrame,
    group_cols: list[str],
    value_expr: str,
    weight_expr: str = "1",
) -> DataFrame:
    """Per-group histogram: (group..., bin, cnt). Map-side bin projection
    (bit_length + shift, pure JVM), partial-agg sum — the shuffle carries
    bins, not events. ``weight_expr`` is the signed contribution (the
    incremental view passes the CDF sign)."""
    v = F.expr(value_expr).cast("long")
    rows = df.filter(v.isNotNull()).select(
        *group_cols,
        hdr_bin_expr(v).alias("bin"),
        F.expr(weight_expr).cast("long").alias("_wt"),
    )
    return (
        rows.groupBy(*group_cols, "bin")
        .agg(F.sum("_wt").cast("long").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )


def merge_hdr_bins(parts: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Elementwise counter sum — linear, so merge = add and a negated
    delta is retraction."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(*group_cols, "bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )


def hdr_quantiles(
    bins_df: DataFrame,
    group_cols: list[str],
    qs: list[float],
) -> DataFrame:
    """Quantile read: (group..., q, est_lo, est_hi) — the exact value
    bounds of the bin holding rank ceil(q * total). Windows over O(bins)
    rows per group; the true rank-q value lies in [est_lo, est_hi], whose
    relative width is <= 1/16."""
    wc = Window.partitionBy(*group_cols).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy(*group_cols)
    c = (
        bins_df.withColumn("_cum", F.sum("cnt").over(wc))
        .withColumn("_total", F.sum("cnt").over(wt))
        .withColumn("q", F.explode(F.array(*[F.lit(float(q)) for q in qs])))
        .withColumn("_rank", F.ceil(F.col("q") * F.col("_total")))
    )
    hit = c.filter(F.col("_cum") >= F.col("_rank")).groupBy(
        *group_cols, "q"
    ).agg(F.min("bin").alias("_bin"))
    lo, hi = hdr_bounds_exprs(F.col("_bin"))
    return hit.select(
        *group_cols, "q", lo.alias("est_lo"), hi.alias("est_hi")
    )


class IncrementalHdrHistogram:
    """Persisted per-group HDR histogram over a source TableStore,
    maintained per-epoch from the FULL-CDF changefeed — the percentile
    view that stays fresh at O(changed rows) per epoch and equals the
    batch recompute over the live state exactly (linear sketch; contrast
    agg_view's exact quantiles at O(distinct) state and
    `cdc_latency_percentiles`' O(n) per query).

    Same exactly-once contract as the other incremental views: writer-
    fenced epochs keyed to the source version (idempotent replay, no
    double-subtract), consumer-registry retention pin, dirty-bucket-only
    MERGEs with the histogram bucketed by the group hash."""

    def __init__(
        self,
        root: str,
        group_cols: list[str],
        value_expr: str,
        n_buckets: int = 8,
    ):
        self.root = root
        self.group_cols = list(group_cols)
        self.value_expr = value_expr
        self.store = TableStore(root, n_buckets=n_buckets)

    # ------------------------------------------------------------------ #
    def update(self, spark: SparkSession, src: TableStore) -> dict:
        writer = f"hdr-sketch:{os.path.abspath(src.root)}"
        last = max(self.store.writer_epoch(writer), 0)
        head = src.current_version()
        if head <= last:
            return {"status": "noop", "from": last, "to": head}
        consumer = f"hdr-sketch:{os.path.abspath(self.root)}"
        if last > 0:
            src.record_consumer(consumer, last)

        cdf = table_changes_cdf(spark, src, last, head)
        sign = F.when(
            F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        delta = hdr_bins(
            cdf.withColumn("_sign", sign),
            self.group_cols,
            self.value_expr,
            weight_expr="_sign",
        ).cache()
        try:
            n_b = self.store.n_buckets
            gb = bucket_expr(n_b, self.group_cols)
            stats = (
                delta.groupBy(gb.alias("b"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            if not stats:
                self.store.commit(None, [], [], head, self._schema(spark),
                                  writer_id=writer)
                src.record_consumer(consumer, head)
                return {"status": "committed", "from": last, "to": head,
                        "n_bin_updates": 0, "dirty_buckets": 0}
            dirty = sorted(r["b"] for r in stats)
            n_upd = sum(r["n"] for r in stats)
            old = (
                self.store.read_state(spark, buckets=dirty)
                if self.store._bucket_files(dirty)
                else None
            )
            if old is None:
                merged = delta
            else:
                o, dl = old.alias("o"), delta.alias("dl")
                on = [
                    F.col(f"o.{c}").eqNullSafe(F.col(f"dl.{c}"))
                    for c in (*self.group_cols, "bin")
                ]
                cond = on[0]
                for c in on[1:]:
                    cond = cond & c
                merged = o.join(dl, cond, "full_outer").select(
                    *[
                        F.coalesce(F.col(f"o.{g}"), F.col(f"dl.{g}")).alias(g)
                        for g in (*self.group_cols, "bin")
                    ],
                    (
                        F.coalesce(F.col("o.cnt"), F.lit(0))
                        + F.coalesce(F.col("dl.cnt"), F.lit(0))
                    ).cast("long").alias("cnt"),
                )
            merged = merged.filter(F.col("cnt") != 0).withColumn(
                BUCKET_COL, bucket_expr(n_b, self.group_cols)
            )
            self.store.commit(
                merged, dirty, [], head,
                T.StructType(
                    [f for f in merged.schema.fields if f.name != BUCKET_COL]
                ),
                writer_id=writer,
            )
            src.record_consumer(consumer, head)
            return {
                "status": "committed",
                "from": last,
                "to": head,
                "n_bin_updates": n_upd,
                "dirty_buckets": len(dirty),
            }
        finally:
            delta.unpersist()

    # ------------------------------------------------------------------ #
    def _schema(self, spark: SparkSession) -> T.StructType:
        existing = self.store.schema()
        if existing is not None:
            return existing
        return T.StructType(
            [T.StructField(g, T.StringType()) for g in self.group_cols]
            + [T.StructField("bin", T.LongType()),
               T.StructField("cnt", T.LongType())]
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """The bin table — equals the batch recompute over live state."""
        return self.store.read_state(spark).select(
            *self.group_cols, "bin", "cnt"
        )

    def quantiles(self, spark: SparkSession, qs: list[float]) -> DataFrame:
        return hdr_quantiles(self.read(spark), self.group_cols, qs)


def py_hdr_bin(v: int) -> int:
    """Pure-python twin for tests."""
    if v < 0:
        raise ValueError("negative")
    shift = max(0, v.bit_length() - (HDR_SUB_BITS + 1))
    return shift * HDR_SUB + (v >> shift)


def py_hdr_quantile(values: list[int], q: float) -> tuple[int, int]:
    """Pure-python quantile twin: exact bounds of the rank-q bin."""
    import math

    bins: dict[int, int] = {}
    for v in values:
        b = py_hdr_bin(v)
        bins[b] = bins.get(b, 0) + 1
    rank = math.ceil(q * len(values))
    cum = 0
    for b in sorted(bins):
        cum += bins[b]
        if cum >= rank:
            if b < HDR_SUB:
                return b, b
            shift = b // HDR_SUB - 1
            sub = b - shift * HDR_SUB
            return sub << shift, ((sub + 1) << shift) - 1
    raise ValueError("empty")
