"""Consumer-group offset translation — the as-of join (SURVEY.md §2.3 J1, §2.5 W3).

Reference semantics (docs/consideration.md:37-48): MM2's checkpoint connector
maps a consumer group's last-committed SOURCE offset to the corresponding
TARGET offset. Offset-sync points are sparse — emitted "at the beginning of
the replication and when ... numbering sequencing diverges"
(docs/consideration.md:46) — so the translation is an as-of lookup: the
greatest sync point whose source offset <= the committed offset ("last read
committed offset ... 3 is mapped as 12 in the target partition").

Two implementations, same semantics, chosen by `translate_offsets_auto`:
  * `translate_offsets`       — broadcast range join + max_by aggregation.
    Right when syncs are SPARSE (the reference's normal mode: one row per
    divergence event per partition): the join is map-side and cheap. But
    the range join emits one row per (commit x qualifying sync) before the
    max_by — with DENSE syncs (a sync per divergence on a flappy flow) a
    commit at offset k matches ~k/stride syncs: quadratic-ish candidates.
  * `translate_offsets_window`— union + window (last ignorenulls over an
    unbounded-preceding frame) — no join, no candidate blowup; one sort of
    (commits + syncs) per partition. The scale-safe shape for dense syncs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def translate_offsets(commits: DataFrame, offset_syncs: DataFrame) -> DataFrame:
    """Map each (group, partition, committed src offset) to a target offset.

    commits:       group, partition, src_offset
    offset_syncs:  partition, sync_src_offset, sync_tgt_offset
    result:        group, partition, src_offset, tgt_offset
                   (tgt = sync_tgt + (src - sync_src) under the greatest
                    sync_src <= src; null if no sync point precedes — an
                    untranslatable commit must surface, not disappear)
    """
    # explicit aliases: commits and syncs often derive from the same source
    # frame (self-join), where bare column references resolve ambiguously
    c = commits.alias("_c")
    s = F.broadcast(offset_syncs.alias("_s"))
    j = c.join(
        s,
        (F.col("_c.partition") == F.col("_s.partition"))
        & (F.col("_s.sync_src_offset") <= F.col("_c.src_offset")),
        "left",
    ).select(
        F.col("_c.group").alias("group"),
        F.col("_c.partition").alias("partition"),
        F.col("_c.src_offset").alias("src_offset"),
        F.col("_s.sync_src_offset").alias("sync_src_offset"),
        F.col("_s.sync_tgt_offset").alias("sync_tgt_offset"),
    )
    best = j.groupBy("group", "partition", "src_offset").agg(
        F.max_by(
            F.struct("sync_src_offset", "sync_tgt_offset"),
            F.col("sync_src_offset"),
        ).alias("_sync")
    )
    return best.select(
        "group",
        "partition",
        "src_offset",
        (
            F.col("_sync.sync_tgt_offset")
            + (F.col("src_offset") - F.col("_sync.sync_src_offset"))
        ).alias("tgt_offset"),
    )


def translate_offsets_auto(
    commits: DataFrame,
    offset_syncs: DataFrame,
    dense_sync_threshold: int = 10_000,
) -> DataFrame:
    """Production dispatcher: pick the join form for sparse syncs, the
    window form for dense syncs.

    The density probe is one count over the (slim) sync table — cheap at
    any scale, and the whole point is to avoid the range join's
    (commit x qualifying sync) candidate explosion precisely when that
    count is large. Threshold is per-job tunable; the default assumes a
    commit set in the thousands, where 10k+ syncs make the window sort
    cheaper than the candidate fan-out.
    """
    n_syncs = offset_syncs.count()
    if n_syncs > dense_sync_threshold:
        return translate_offsets_window(commits, offset_syncs)
    return translate_offsets(commits, offset_syncs)


def translate_offsets_window(commits: DataFrame, offset_syncs: DataFrame) -> DataFrame:
    """Window formulation: union sync points and commits per partition,
    order by offset, carry the last sync point forward
    (`last(..., ignorenulls=True)` over unbounded-preceding — W3)."""
    syncs = offset_syncs.select(
        "partition",
        F.col("sync_src_offset").alias("offset"),
        F.lit(None).cast("string").alias("group"),
        F.lit(None).cast("long").alias("src_offset"),
        F.struct("sync_src_offset", "sync_tgt_offset").alias("_sync"),
        F.lit(0).alias("_kind"),  # syncs sort before commits at equal offset
    )
    cs = commits.select(
        "partition",
        F.col("src_offset").alias("offset"),
        "group",
        "src_offset",
        F.lit(None)
        .cast("struct<sync_src_offset:bigint,sync_tgt_offset:bigint>")
        .alias("_sync"),
        F.lit(1).alias("_kind"),
    )
    w = (
        W.partitionBy("partition")
        .orderBy("offset", "_kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = syncs.unionByName(cs).withColumn(
        "_last_sync", F.last("_sync", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("_kind") == 1).select(
        "group",
        "partition",
        "src_offset",
        (
            F.col("_last_sync.sync_tgt_offset")
            + (F.col("src_offset") - F.col("_last_sync.sync_src_offset"))
        ).alias("tgt_offset"),
    )
