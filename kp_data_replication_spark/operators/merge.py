"""MERGE upsert with delete branch + additive schema evolution
(SURVEY.md §2.3 J2, §2.1 S6, §2.2 F7).

Semantics (BASELINE north_star; reference end-state semantics
docs/local-to-es.md:97-106, keying mirror-maker-2/SendProductToKafka.py:48):

    MERGE INTO target t USING batch s
    ON t.repo = s.repo AND t.path = s.path
    WHEN MATCHED AND s.op = 'd' THEN DELETE
    WHEN MATCHED            THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op <> 'd' THEN INSERT *

Without Iceberg/Delta jars in the sandbox, MERGE is emulated with a
full-outer join + coalesce; the TableStore restricts the join to the hash
buckets the batch actually touches (copy-on-write at bucket granularity —
the same file-pruning an Iceberg MERGE does with its partition transform),
so at 100 TB a micro-batch rewrites only dirty buckets, never the table.

Schema evolution (S6): the batch's row schema may have grown additively
(docs/consideration.md:13-18 — topic config changes propagate source ->
target automatically). `align_schemas` null-pads the target to the union
schema before the join, the analogue of `ALTER TABLE ADD COLUMNS`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import KEY_COLS


def evolve_columns(target: DataFrame, batch_row_cols: list[tuple[str, object]]) -> DataFrame:
    """Additive column propagation: add any batch column the target lacks
    (null-padded), never drop or retype existing ones."""
    existing = set(target.columns)
    for name, dtype in batch_row_cols:
        if name not in existing:
            target = target.withColumn(name, F.lit(None).cast(dtype))
    return target


def merge_upsert(
    target: DataFrame,
    batch: DataFrame,
    key_cols: list[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Apply one compacted batch (unique keys, newest change each) to target.

    ``batch`` columns: key cols + op + row data cols (+ meta ignored here).
    Returns the new target state with the union schema. The join keys carry
    the same hash partitioning the compaction aggregate produced, so Catalyst
    shuffles only the target side.
    """
    key_cols = key_cols or KEY_COLS
    data_cols = [c for c in batch.columns if c not in (*key_cols, op_col, "partition", "lsn", "ts_ms")]

    # S6: union schema — null-pad target for newly appeared columns
    batch_types = dict(zip(batch.schema.names, [f.dataType for f in batch.schema.fields]))
    target = evolve_columns(target, [(c, batch_types[c]) for c in data_cols])
    target_cols = [c for c in target.columns if c not in key_cols]

    t = target.select(*key_cols, *[F.col(c).alias(f"_t_{c}") for c in target_cols])
    s = batch.select(
        *key_cols,
        F.col(op_col).alias("_s_op"),
        *[F.col(c).alias(f"_s_{c}") for c in data_cols],
    )

    joined = t.join(s, key_cols, "full_outer")
    has_source = F.col("_s_op").isNotNull()
    matched_delete = has_source & (F.col("_s_op") == "d")

    # WHEN MATCHED AND op='d' THEN DELETE; a delete for an absent key is a no-op
    kept = joined.filter(~matched_delete)

    # Debezium after-images are FULL row images: an update overwrites every
    # data column with the source image (a column missing from a
    # pre-evolution image becomes null — full-image semantics), an untouched
    # row keeps its target values, an insert takes the source image.
    target_types = {f.name: f.dataType for f in target.schema.fields}
    return kept.select(
        *key_cols,
        *[
            F.when(
                has_source,
                F.col(f"_s_{c}") if c in data_cols else F.lit(None).cast(target_types[c]),
            )
            .otherwise(F.col(f"_t_{c}"))
            .alias(c)
            for c in target_cols
        ],
    )
