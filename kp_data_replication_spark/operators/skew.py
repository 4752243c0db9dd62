"""Salted-key skew mitigation + scalable per-partition sequence audit
(SURVEY.md §4 "hot-partition skew"; reference docs/mm2-provisioning.md:87,116-124).

The reference scales by topic-partition count and warns that record-size vs
CPU/network saturation makes single partitions hot. In the rebuild two spots
can skew:

1. The changelog's ``partition`` column has low cardinality (e.g. 32
   partitions) — any groupBy/window keyed only on ``partition`` puts one
   log-partition's entire history into one task. Salting splits each
   partition into SALT slices for the heavy pass, then re-aggregates the
   tiny per-slice results.

2. A hot repo (org-wide refactor touching 10^6 paths) concentrates key-hash
   traffic; AQE's skew-join splitting handles the join side, and the
   compaction aggregate is immune (map-side partial aggregation), so no
   extra engine code is needed there — documented here for the audit trail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame, n: int, partition_col: str = "partition", salt: int = 8
) -> DataFrame:
    """Spread each log partition across ``salt`` tasks; deterministic salt
    from the lsn so re-runs produce identical task layouts."""
    return df.repartition(
        n, F.col(partition_col), F.pmod(F.col("lsn"), F.lit(salt))
    )


def gap_audit_salted(events: DataFrame, chunk: int = 100_000, expected_step: int = 1) -> DataFrame:
    """W1 at scale: detect offset-sequence gaps without sorting whole
    partitions in single tasks.

    Splits each partition's lsn range into ``chunk``-sized slices, finds
    gaps inside each slice with a window (parallel across slices), and gaps
    ACROSS slice boundaries with a second, tiny window over per-slice
    min/max. Equivalent to the naive single-window audit (tested), but the
    heavy sort parallelism is n_partitions × n_slices instead of
    n_partitions.
    """
    sliced = events.select(
        "partition", "lsn", F.floor(F.col("lsn") / chunk).alias("_slice")
    )
    w_in = W.partitionBy("partition", "_slice").orderBy("lsn")
    inner = (
        sliced.withColumn("prev_lsn", F.lag("lsn").over(w_in))
        .filter(
            F.col("prev_lsn").isNotNull()
            & (F.col("lsn") - F.col("prev_lsn") != expected_step)
        )
        .select("partition", "prev_lsn", "lsn")
    )

    bounds = sliced.groupBy("partition", "_slice").agg(
        F.min("lsn").alias("_lo"), F.max("lsn").alias("_hi")
    )
    w_b = W.partitionBy("partition").orderBy("_slice")
    boundary = (
        bounds.withColumn("_prev_hi", F.lag("_hi").over(w_b))
        .filter(
            F.col("_prev_hi").isNotNull()
            & (F.col("_lo") - F.col("_prev_hi") != expected_step)
        )
        .select("partition", F.col("_prev_hi").alias("prev_lsn"), F.col("_lo").alias("lsn"))
    )
    return (
        inner.unionByName(boundary)
        .withColumn("gap", F.col("lsn") - F.col("prev_lsn"))
    )
