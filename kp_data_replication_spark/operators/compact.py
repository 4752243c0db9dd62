"""In-batch last-write-wins compaction (SURVEY.md §2.4 A2, §2.5 W2).

A replicated compacted topic converges to the newest record per key; the
per-partition ordering contract (docs/consideration.md:20) makes "newest" =
highest lsn. Before MERGE, each micro-batch is compacted to one change per
key — the newest event wins, so a key updated 50× in one batch costs one
upsert, and the MERGE join sees unique keys on the source side.

Plan shape (scale rationale): ``groupBy(keys).agg(max_by(struct, lsn))`` is a
hash aggregate with map-side partial aggregation — strictly better at 100 TB
than the window-function formulation (row_number over partitionBy keys),
which must sort every shuffle partition. The aggregate's output is hash-
partitioned on the key columns, which is exactly the partitioning the MERGE
join needs next, so Catalyst inserts no second exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..schema import KEY_COLS


def last_write_wins(df: DataFrame, key_cols: list[str] | None = None, order_col: str = "lsn") -> DataFrame:
    """Newest event per key: one row per (repo, path) with all original columns.

    Ties on ``order_col`` only occur for at-least-once duplicate deliveries,
    which carry identical payloads (docs/consideration.md:52-58), so any
    winner is correct.
    """
    key_cols = key_cols or KEY_COLS
    payload = [c for c in df.columns if c not in key_cols]
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.col(order_col)).alias("_newest")
    )
    return agg.select(*key_cols, *[F.col(f"_newest.{c}").alias(c) for c in payload])


def last_write_wins_window(
    df: DataFrame, key_cols: list[str] | None = None, order_col: str = "lsn"
) -> DataFrame:
    """Window-function twin of :func:`last_write_wins` (kept for tests /
    plan comparison; the aggregate form is the production path)."""
    key_cols = key_cols or KEY_COLS
    w = W.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
