"""Deterministic corpus shuffle, exact distributed ranking, and
training-shard export — the step between curation and the trainer.

A training run wants the curated corpus as (a) a REPRODUCIBLE global
pseudo-random permutation (same seed -> byte-identical epoch order, the
property data-loader resume and ablation comparisons depend on), (b) cut
into fixed-size shards a loader can fetch independently. The reference's
pipeline hands replicated topics to downstream consumers in partition
order (docs/index.md:17-52); training ingestion is the downstream consumer
that must NOT read in key order — key order correlates with source
(repo/time) and biases every batch.

Mix function: ``md5(seed \\x01 key...)`` hex — deterministic, seed-keyed,
uniform, and available bit-identically in every SQL engine (the DuckDB
oracle recomputes it verbatim; Spark's xxhash64 would be faster but is not
reproducible outside Spark, and a one-time md5 per exported row is noise
next to the shard write).

Exact global rank WITHOUT a global window (the single-partition
``row_number`` trap at 10^9 rows): classic two-pass distributed ranking —
  1. slice the hash space by a fixed-width hex prefix (256/4096/65536
     slices — prefix ranges are a deterministic partition of the space),
     ONE count aggregate gives exact per-slice sizes (driver-bounded:
     n_slices rows);
  2. rank = (cumulative size of lower slices) + row_number within the
     slice — ONE shuffle on the slice id, window partitions bounded by
     ~n_rows / n_slices.
md5 over distinct keys is collision-unique for any realizable corpus
(2^-64 birthday scale at 10^9 docs); the tie-break appends the key cols to
the window order anyway so even a collision ranks deterministically.

``export_shards`` writes shard files of exactly ``rows_per_shard`` rows
(last shard ragged) in permutation order: one repartition on the shard id
(rows already carry it — no second ranking pass), one file per shard.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SEP = "\x01"


def shuffle_rank(
    df: DataFrame,
    key_cols: list[str],
    seed: str = "0",
    slice_hex: int = 2,
) -> DataFrame:
    """Input rows + ``_h`` (the seeded mix hash) + ``_rank`` (exact 1-based
    global rank in ``_h`` order). Two jobs: the slice-count aggregate and
    the windowed main pass; no global sort, no single-partition window.

    ``slice_hex``: hex chars of the slice prefix — 2 -> 256 slices
    (default, right up to ~10^8 rows), 3 -> 4096, 4 -> 65536 for the
    10^9+ regime (window partitions stay ~n/slices rows).
    """
    if not key_cols:
        raise ValueError("need key_cols")
    if not (1 <= slice_hex <= 8):
        raise ValueError("slice_hex in [1, 8]")
    h = F.md5(F.concat_ws(_SEP, F.lit(seed), *[F.col(c) for c in key_cols]))
    d = df.withColumn("_h", h).withColumn(
        "_slice", F.substring("_h", 1, slice_hex)
    )
    sizes = d.groupBy("_slice").agg(F.count(F.lit(1)).alias("n")).collect()
    offsets = []
    acc = 0
    for r in sorted(sizes, key=lambda r: r["_slice"]):
        offsets.append((r["_slice"], acc))
        acc += r["n"]
    # broadcast the (slice -> offset) table back — n_slices rows, so the
    # join is map-side; a literal-map expression would bloat the plan at
    # slice_hex >= 4 (65536 entries)
    off = df.sparkSession.createDataFrame(
        offsets, "_slice string, _off long"
    )
    w = Window.partitionBy("_slice").orderBy("_h", *key_cols)
    return (
        d.join(F.broadcast(off), "_slice")
        .withColumn(
            "_rank",
            (F.col("_off") + F.row_number().over(w)).cast("long"),
        )
        .drop("_slice", "_off")
    )


def assign_shards(
    df: DataFrame,
    key_cols: list[str],
    rows_per_shard: int,
    seed: str = "0",
    slice_hex: int = 2,
) -> DataFrame:
    """Rows + ``_h``/``_rank``/``_shard`` — shard i holds permutation ranks
    [i*rows_per_shard, (i+1)*rows_per_shard), so every shard except the
    last has exactly ``rows_per_shard`` rows and concatenating shards in
    id order replays the full permutation."""
    if rows_per_shard <= 0:
        raise ValueError("rows_per_shard must be positive")
    ranked = shuffle_rank(df, key_cols, seed=seed, slice_hex=slice_hex)
    return ranked.withColumn(
        "_shard",
        F.floor((F.col("_rank") - 1) / rows_per_shard).cast("long"),
    )


def export_shards(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    key_cols: list[str],
    rows_per_shard: int,
    seed: str = "0",
    slice_hex: int = 2,
) -> dict:
    """Write the permuted corpus as ``shard=N`` parquet directories, rows
    within a shard in permutation order (``_rank`` sorted). One shuffle on
    the shard id, one file per shard; deterministic across runs (same
    seed -> byte-order-identical shard contents)."""
    sharded = assign_shards(
        df, key_cols, rows_per_shard, seed=seed, slice_hex=slice_hex
    )
    n_rows = sharded.count()
    n_shards = (n_rows + rows_per_shard - 1) // rows_per_shard
    (
        sharded.repartition(max(n_shards, 1), F.col("_shard"))
        .sortWithinPartitions("_shard", "_rank")
        .write.mode("overwrite")
        .partitionBy("_shard")
        .parquet(out_dir)
    )
    return {
        "out_dir": os.path.abspath(out_dir),
        "n_rows": n_rows,
        "n_shards": n_shards,
        "rows_per_shard": rows_per_shard,
        "seed": seed,
    }
