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
target automatically). `evolve_columns` null-pads the target to the union
schema before the join (the analogue of `ALTER TABLE ADD COLUMNS`), and
`widen_type` implements TYPE WIDENING for a column whose source type grew
(int -> long, float -> double, ... — the Iceberg/Delta type-widening
lattice): the target column is promoted, never truncated. Old parquet
files need no rewrite — Spark's parquet reader upcasts int32 pages into a
bigint read schema natively, so widening is a pure metadata change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import KEY_COLS

_INT_RANK = {T.ByteType(): 1, T.ShortType(): 2, T.IntegerType(): 3, T.LongType(): 4}
_FLOAT_RANK = {T.FloatType(): 1, T.DoubleType(): 2}


def widen_type(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """The narrower-to-wider promotion of two types, or None when neither
    losslessly contains the other (the Delta/Iceberg type-widening lattice:
    byte<short<int<long; float<double; byte/short/int -> double —
    long -> double is lossy and refused).

    Recurses into nested types (the evolution contract the reference's own
    payloads need — mirror-maker-2/data/FreshProductOrder.json:1-9 nests
    address objects, and Debezium envelopes evolve nested ``after`` schemas
    additively, docs/consideration.md:15-18): two structs widen field-wise
    — overlapping leaves widen, fields present on either side are kept
    (add-only; a field can appear mid-stream but never disappear or
    narrow), preserving ``a``'s field order with ``b``'s new fields
    appended. Arrays widen by element; maps by value (keys must match —
    key promotion would re-key the data)."""
    if a == b:
        return a
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        by_name = {f.name: f for f in b.fields}
        out: list[T.StructField] = []
        for f in a.fields:
            bf = by_name.get(f.name)
            if bf is None:
                out.append(f)  # old field a pre-evolution producer still sends
                continue
            w = widen_type(f.dataType, bf.dataType)
            if w is None:
                return None
            out.append(T.StructField(f.name, w, True))
        names = {f.name for f in a.fields}
        out += [
            T.StructField(f.name, f.dataType, True)
            for f in b.fields
            if f.name not in names
        ]
        return T.StructType(out)
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        w = widen_type(a.elementType, b.elementType)
        if w is None:
            return None
        return T.ArrayType(w, a.containsNull or b.containsNull)
    if isinstance(a, T.MapType) and isinstance(b, T.MapType):
        if a.keyType != b.keyType:
            return None
        w = widen_type(a.valueType, b.valueType)
        if w is None:
            return None
        return T.MapType(a.keyType, w, a.valueContainsNull or b.valueContainsNull)
    if a in _INT_RANK and b in _INT_RANK:
        return a if _INT_RANK[a] >= _INT_RANK[b] else b
    if a in _FLOAT_RANK and b in _FLOAT_RANK:
        return T.DoubleType()
    ints = {a, b} & set(_INT_RANK)
    floats = {a, b} & set(_FLOAT_RANK)
    if ints and floats:
        (i,), (f,) = ints, floats
        # byte/short/int are exact in double; float -> double also exact
        if _INT_RANK[i] <= 3:
            return T.DoubleType()
    return None


def cast_up(col: F.Column, src: T.DataType, dst: T.DataType) -> F.Column:
    """Cast a value from ``src`` to the WIDER ``dst`` (``dst`` must be
    ``widen_type(src, dst)``-compatible). Plain ``Column.cast`` refuses a
    struct-to-struct cast whose field counts differ, so struct widening is
    rebuilt structurally: existing fields recurse, fields ``src`` lacks
    become typed nulls, and a null struct stays null (never a struct of
    nulls). Arrays/maps recurse through ``transform``/``transform_values``
    — all JVM expressions, no Python in the path."""
    if src == dst:
        return col
    if isinstance(dst, T.StructType) and isinstance(src, T.StructType):
        src_fields = {f.name: f.dataType for f in src.fields}
        parts = []
        for f in dst.fields:
            if f.name in src_fields:
                parts.append(
                    cast_up(
                        col.getField(f.name), src_fields[f.name], f.dataType
                    ).alias(f.name)
                )
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        return F.when(col.isNotNull(), F.struct(*parts))
    if isinstance(dst, T.ArrayType) and isinstance(src, T.ArrayType):
        return F.transform(
            col, lambda x: cast_up(x, src.elementType, dst.elementType)
        )
    if isinstance(dst, T.MapType) and isinstance(src, T.MapType):
        return F.transform_values(
            col, lambda _, v: cast_up(v, src.valueType, dst.valueType)
        )
    return col.cast(dst)


def widen_fields(
    stored: T.StructType, batch_fields: list[T.StructField]
) -> T.StructType:
    """Union schema with type widening: stored column order is preserved,
    overlapping columns take the widened type, new batch columns append.
    Raises on a non-widenable type change (that is a breaking change, not
    schema evolution — e.g. string -> int)."""
    by_name = {f.name: f for f in batch_fields}
    out: list[T.StructField] = []
    for f in stored.fields:
        b = by_name.get(f.name)
        if b is None or b.dataType == f.dataType:
            out.append(f)
            continue
        w = widen_type(f.dataType, b.dataType)
        if w is None:
            raise ValueError(
                f"incompatible type change for column '{f.name}': "
                f"{f.dataType.simpleString()} -> {b.dataType.simpleString()} "
                "is not a widening (additive evolution only)"
            )
        out.append(T.StructField(f.name, w, True))
    names = {f.name for f in stored.fields}
    out += [f for f in batch_fields if f.name not in names]
    return T.StructType(out)


def evolve_columns(target: DataFrame, batch_row_cols: list[tuple[str, object]]) -> DataFrame:
    """Additive column propagation: add any batch column the target lacks
    (null-padded) and widen any existing column whose batch type grew;
    never drop or narrow."""
    existing = {f.name: f.dataType for f in target.schema.fields}
    for name, dtype in batch_row_cols:
        if name not in existing:
            target = target.withColumn(name, F.lit(None).cast(dtype))
        elif dtype != existing[name]:
            w = widen_type(existing[name], dtype)
            if w is None:
                raise ValueError(
                    f"incompatible type change for column '{name}': "
                    f"{existing[name].simpleString()} -> {dtype.simpleString()}"
                )
            if w != existing[name]:
                target = target.withColumn(
                    name, cast_up(F.col(name), existing[name], w)
                )
    return target


from ..schema import LWW_DELETED_COL, LWW_SRC_COL, LWW_TS_COL  # noqa: E402,F401 (re-export)


def merge_upsert(
    target: DataFrame,
    batch: DataFrame,
    key_cols: list[str] | None = None,
    op_col: str = "op",
    lww: bool = False,
) -> DataFrame:
    """Apply one compacted batch (unique keys, newest change each) to target.

    ``batch`` columns: key cols + op + row data cols (+ meta ignored here).
    Returns the new target state with the union schema. The join keys carry
    the same hash partitioning the compaction aggregate produced, so Catalyst
    shuffles only the target side.

    ``lww``: CRDT-style last-write-wins conflict resolution for
    bidirectional topologies (the reference's active/active accounts
    scenario, docs/consideration.md:29-35, where concurrent writes to the
    SAME key would otherwise flip-flop per cascade round). Rows carry a
    total-order conflict stamp (``_lww_ts``, ``_lww_src``) — origin event
    time + origin cluster id, stamped at first ingest and carried through
    every cascade as ordinary data columns. A matched source row wins ONLY
    when its stamp is lexicographically >= the target row's (>= so a
    re-delivered identical winner stays idempotent); both replicas compare
    the same two stamps, so they pick the same winner and the state diff
    of the losing application is empty — convergence instead of ping-pong.
    Stampless rows (pre-LWW data) compare as -infinity and lose to any
    stamped write.

    Tombstones are PERSISTED under lww: a winning delete leaves a row with
    data columns null, ``_lww_deleted=true``, and the DELETE'S OWN stamp —
    so (a) a re-delivered arbitrarily old insert after a newer delete
    loses deterministically even outside monotone-changefeed delivery, and
    (b) a cascaded delete carries its origin stamp to every replica
    (delete-vs-concurrent-update resolves identically everywhere — the
    round-3 divergence/echo hazard, closed). The tombstone image IS the
    source image of an ``op='d'`` row (after-image null, stamps coalesced
    from the before image by the envelope unpack), so no special delete
    branch is needed: the stamp comparison decides, and the winner's full
    image — row or tombstone — is written. Normal reads exclude
    ``_lww_deleted`` rows (TableStore.read_state); expired tombstones are
    GC'd by :meth:`TableStore.purge_tombstones`.
    """
    key_cols = key_cols or KEY_COLS
    data_cols = [c for c in batch.columns if c not in (*key_cols, op_col, "partition", "lsn", "ts_ms")]

    # S6: union schema — null-pad target for newly appeared columns
    batch_types = dict(zip(batch.schema.names, [f.dataType for f in batch.schema.fields]))
    target = evolve_columns(target, [(c, batch_types[c]) for c in data_cols])
    target_cols = [c for c in target.columns if c not in key_cols]

    t = target.select(
        *key_cols,
        F.lit(True).alias("_t_present"),
        *[F.col(c).alias(f"_t_{c}") for c in target_cols],
    )
    s = batch.select(
        *key_cols,
        F.col(op_col).alias("_s_op"),
        *[F.col(c).alias(f"_s_{c}") for c in data_cols],
    )

    joined = t.join(s, key_cols, "full_outer")
    has_source = F.col("_s_op").isNotNull()
    target_present = F.col("_t_present").isNotNull()

    if lww and LWW_TS_COL in data_cols:
        s_ts = F.coalesce(F.col(f"_s_{LWW_TS_COL}"), F.lit(-1))
        t_ts = (
            F.coalesce(F.col(f"_t_{LWW_TS_COL}"), F.lit(-1))
            if LWW_TS_COL in target_cols
            else F.lit(-1)
        )
        s_src = F.coalesce(F.col(f"_s_{LWW_SRC_COL}"), F.lit(""))
        t_src = (
            F.coalesce(F.col(f"_t_{LWW_SRC_COL}"), F.lit(""))
            if LWW_SRC_COL in target_cols
            else F.lit("")
        )
        s_wins = (s_ts > t_ts) | ((s_ts == t_ts) & (s_src >= t_src))
    else:
        s_wins = F.lit(True)

    persist_tombstones = lww and LWW_DELETED_COL in data_cols
    if persist_tombstones:
        # a winning delete WRITES its tombstone image (nulls + stamp +
        # _lww_deleted=true) instead of dropping the row — the stamp
        # comparison below is the whole delete branch; this also persists
        # a tombstone for a never-seen key (the delete may out-race the
        # insert through a cascade)
        kept = joined
    else:
        # WHEN MATCHED AND op='d' THEN DELETE; a delete for an absent key
        # is a no-op (dropped either way)
        matched_delete = (
            has_source & (F.col("_s_op") == "d") & (~target_present | s_wins)
        )
        kept = joined.filter(~matched_delete)

    # Debezium after-images are FULL row images: an update overwrites every
    # data column with the source image (a column missing from a
    # pre-evolution image becomes null — full-image semantics), an untouched
    # row keeps its target values, an insert takes the source image. Under
    # lww a matched source that LOSES the stamp comparison leaves the
    # target row byte-identical (so the cascade's state diff is empty).
    take_source = has_source & (~target_present | s_wins)
    target_types = {f.name: f.dataType for f in target.schema.fields}
    return kept.select(
        *key_cols,
        *[
            F.when(
                take_source,
                # cast_up: a pre-widening producer may still send the narrow
                # type (incl. a struct missing newly added nested fields)
                cast_up(F.col(f"_s_{c}"), batch_types[c], target_types[c])
                if c in data_cols
                else F.lit(None).cast(target_types[c]),
            )
            .otherwise(F.col(f"_t_{c}"))
            .alias(c)
            for c in target_cols
        ],
    )
