"""Single Message Transforms — the Kafka Connect SMT chain, Catalyst-compiled.

The reference replicates through MirrorMaker 2, which runs ON Kafka Connect
(docs/index.md:17-23; every flow config in docs/es-to-local.md /
local-to-es.md is a Connect connector config) — and Connect's per-record
transformation surface is the `transforms=` SMT chain: a declared list of
named transforms each record passes through, in order, before the sink
writes it. Debezium pipelines (the envelope shape this engine ingests)
conventionally start that chain with ExtractNewRecordState ("unwrap") and
then run field-level SMTs over the flattened row — which is exactly where
this module plugs in: the engine's envelope unpack IS the unwrap, and
``apply_smt_chain`` runs the declared chain over the unpacked per-record
rows BEFORE last-write-wins compaction (Connect semantics: transforms see
every record; a Filter that drops the newest record makes the previous one
the survivor, it does not resurrect nothing).

Spark-first design: a chain is data (a list of dicts, JSON-serializable —
the Connect config file analogue, hot-reloadable like every other flow
field), compiled ONCE per batch into plain Column expressions that fuse
into the ingest projection. No UDFs, no extra jobs, zero cost for
flows with no chain; at 100 TB the whole chain is a single map-side
projection inside whole-stage codegen.

Supported transform types (Connect class names, same param spirit):

  ReplaceField        renames={old:new}, exclude=[...], include=[...]
  MaskField           fields=[...], replacement=<literal|None->typed null>
  InsertField         static_field/static_value, timestamp_field,
                      offset_field, partition_field, topic_field
  Cast                spec={field: int|long|float|double|string|boolean}
  RegexRouter         regex, replacement, field (default source_topic)
  Filter              predicate=<SQL boolean>, negate=False
                      (drops records WHERE predicate — null does not match,
                      so tombstones with null data columns pass through
                      unless the predicate addresses envelope columns)
  TimestampConverter  field, target_type=string|unix|timestamp,
                      format=<Spark datetime pattern, for string>
  ExtractField        field="a.b.c" (struct path), name=<new column>
  Flatten             delimiter="_" (all struct columns)
  HoistField          field=<struct column name> (wraps data columns)

Value transforms (MaskField, InsertField, RegexRouter) additionally take a
per-record ``when`` guard (+ ``negate_when``) — the Connect KIP-585
``predicates=`` mechanism: the step applies only to records matching the
SQL predicate, others keep their original value; NULL does not match.
Structural transforms refuse the guard at compile time (a rename/drop/
cast changes the frame-global schema, which cannot vary per record).

Guard rails (mechanism, not convention): a transform may not rename, drop,
mask, cast, or overwrite the engine's identity columns — the merge keys
(schema.KEY_COLS) and the exactly-once bookkeeping columns (op, partition,
lsn). Losing those mid-chain would silently break keyed MERGE and the
per-partition applied watermark; the chain refuses at COMPILE time, before
a single row moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import KEY_COLS

# identity + bookkeeping columns no transform may remove or rewrite
PROTECTED_COLS = tuple(KEY_COLS) + ("op", "partition", "lsn")

_CAST_TYPES = {
    "int8": "tinyint", "int16": "smallint", "int32": "int", "int": "int",
    "int64": "long", "long": "long", "float32": "float", "float": "float",
    "float64": "double", "double": "double", "string": "string",
    "boolean": "boolean",
}


class SmtError(ValueError):
    """A transform spec is malformed or touches a protected column.

    Raised at compile time (``compile_smt_chain``), before any data moves —
    the Connect analogue is a connector that fails validation at PUT, not a
    poisoned record mid-stream."""


def _require(step: dict, key: str):
    if key not in step:
        raise SmtError(
            f"SMT step {step.get('type')!r} requires param {key!r}: {step}"
        )
    return step[key]


def _guard(step: dict, cols) -> None:
    bad = sorted(set(cols) & set(PROTECTED_COLS))
    if bad:
        raise SmtError(
            f"SMT step {step.get('type')!r} touches protected column(s) "
            f"{bad}: the merge keys {list(KEY_COLS)} and the exactly-once "
            "bookkeeping columns ('op','partition','lsn') carry record "
            "identity — renaming/masking/dropping them would silently break "
            "keyed MERGE or the applied-offset watermark"
        )


# --------------------------------------------------------------------- #
# per-type appliers: (DataFrame, step) -> DataFrame, all pure Column ops
# --------------------------------------------------------------------- #
def _replace_field(df: DataFrame, step: dict) -> DataFrame:
    renames = dict(step.get("renames") or {})
    exclude = list(step.get("exclude") or [])
    include = step.get("include")
    _guard(step, list(renames) + exclude)
    if include is not None:
        missing = [c for c in PROTECTED_COLS if c in df.columns
                   and c not in include]
        if missing:
            raise SmtError(
                f"SMT ReplaceField include list must keep protected "
                f"column(s) {missing}"
            )
        df = df.select(*[c for c in df.columns if c in set(include)
                         or c in PROTECTED_COLS])
    for c in exclude:
        if c in df.columns:
            df = df.drop(c)
    for old, new in renames.items():
        if new in df.columns:
            raise SmtError(
                f"SMT ReplaceField rename {old!r}->{new!r} collides with an "
                "existing column"
            )
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df


def _when_cond(step: dict):
    """Per-transform predicate (the Connect KIP-585 ``predicates=`` guard):
    the step applies only to records where ``when`` holds. NULL does not
    match (the record keeps its original value). Only VALUE transforms may
    be conditional — a structural transform (rename/drop/cast/flatten)
    changes the frame-global schema, which cannot vary per record in Spark
    (Connect's per-record schemas can; the compile check names the
    difference instead of silently ignoring the guard)."""
    w = step.get("when")
    if w is None:
        return None
    cond = F.coalesce(F.expr(w), F.lit(False))
    return ~cond if step.get("negate_when") else cond


def _mask_field(df: DataFrame, step: dict) -> DataFrame:
    fields = list(_require(step, "fields"))
    _guard(step, fields)
    repl = step.get("replacement")
    cond = _when_cond(step)
    types = dict(df.dtypes)
    for c in fields:
        if c not in types:
            raise SmtError(f"SMT MaskField: no such column {c!r}")
        # Connect masks to the type's empty value or a configured literal;
        # here None means a typed null (the honest Spark empty)
        masked = F.lit(repl).cast(types[c])
        if cond is not None:
            masked = F.when(cond, masked).otherwise(F.col(c))
        df = df.withColumn(c, masked)
    return df


def _insert_field(df: DataFrame, step: dict) -> DataFrame:
    added: list[tuple[str, Column]] = []
    if "static_field" in step:
        added.append((step["static_field"], F.lit(_require(step, "static_value"))))
    if "timestamp_field" in step:
        src = "ts_ms" if "ts_ms" in df.columns else "ts"
        added.append((step["timestamp_field"], F.col(src)))
    if "offset_field" in step:
        added.append((step["offset_field"], F.col("lsn")))
    if "partition_field" in step:
        added.append((step["partition_field"], F.col("partition")))
    if "topic_field" in step:
        if "source_topic" not in df.columns:
            raise SmtError("SMT InsertField topic_field: no source_topic "
                           "column on this flow")
        added.append((step["topic_field"], F.col("source_topic")))
    if not added:
        raise SmtError(f"SMT InsertField: no *_field param given: {step}")
    _guard(step, [n for n, _ in added])
    cond = _when_cond(step)
    for name, col in added:
        if name in df.columns:
            raise SmtError(
                f"SMT InsertField: column {name!r} already exists"
            )
        df = df.withColumn(
            name, col if cond is None else F.when(cond, col)
        )
    return df


def _cast(df: DataFrame, step: dict) -> DataFrame:
    spec = dict(_require(step, "spec"))
    _guard(step, spec)
    for c, t in spec.items():
        if c not in df.columns:
            raise SmtError(f"SMT Cast: no such column {c!r}")
        t_norm = _CAST_TYPES.get(str(t).lower())
        if t_norm is None:
            raise SmtError(
                f"SMT Cast: unsupported type {t!r} "
                f"(supported: {sorted(set(_CAST_TYPES))})"
            )
        df = df.withColumn(c, F.col(c).cast(t_norm))
    return df


def _regex_router(df: DataFrame, step: dict) -> DataFrame:
    field = step.get("field", "source_topic")
    _guard(step, [field] if field not in ("source_topic",) else [])
    if field not in df.columns:
        raise SmtError(f"SMT RegexRouter: no such column {field!r}")
    routed = F.regexp_replace(
        F.col(field), _require(step, "regex"), _require(step, "replacement")
    )
    cond = _when_cond(step)
    if cond is not None:
        routed = F.when(cond, routed).otherwise(F.col(field))
    return df.withColumn(field, routed)


def _filter(df: DataFrame, step: dict) -> DataFrame:
    pred = F.expr(_require(step, "predicate"))
    if step.get("negate"):
        pred = ~pred
    # Connect Filter DROPS matching records; NULL predicate (e.g. a data
    # column on a tombstone) does not match, so the record passes
    return df.filter(~F.coalesce(pred, F.lit(False)))


def _timestamp_converter(df: DataFrame, step: dict) -> DataFrame:
    field = _require(step, "field")
    _guard(step, [field])
    if field not in df.columns:
        raise SmtError(f"SMT TimestampConverter: no such column {field!r}")
    target = step.get("target_type", "string")
    col = F.col(field)
    if target == "string":
        out = F.date_format(col, step.get("format", "yyyy-MM-dd HH:mm:ss"))
    elif target == "unix":
        out = F.unix_millis(col.cast("timestamp"))
    elif target == "timestamp":
        out = (col / F.lit(1000)).cast("timestamp") if dict(df.dtypes).get(
            field) in ("bigint", "long") else col.cast("timestamp")
    else:
        raise SmtError(
            f"SMT TimestampConverter: target_type {target!r} not in "
            "('string','unix','timestamp')"
        )
    return df.withColumn(field, out)


def _extract_field(df: DataFrame, step: dict) -> DataFrame:
    path = _require(step, "field")
    name = step.get("name", path.split(".")[-1])
    _guard(step, [name])
    if name in df.columns:
        raise SmtError(f"SMT ExtractField: column {name!r} already exists")
    return df.withColumn(name, F.col(path))


def _flatten(df: DataFrame, step: dict) -> DataFrame:
    delim = step.get("delimiter", "_")
    out_cols: list[Column] = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            for sub in f.dataType.fields:
                out_cols.append(
                    F.col(f"{f.name}.{sub.name}").alias(
                        f"{f.name}{delim}{sub.name}"
                    )
                )
        else:
            out_cols.append(F.col(f.name))
    return df.select(*out_cols)


def _hoist_field(df: DataFrame, step: dict) -> DataFrame:
    name = _require(step, "field")
    _guard(step, [name])
    if name in df.columns:
        raise SmtError(f"SMT HoistField: column {name!r} already exists")
    data_cols = [c for c in df.columns if c not in PROTECTED_COLS
                 and c not in ("ts_ms", "ts", "source_topic", "headers")]
    keep = [c for c in df.columns if c not in data_cols]
    return df.select(
        *keep, F.struct(*[F.col(c) for c in data_cols]).alias(name)
    )


# statically-known columns each step type writes/removes — guarded at
# COMPILE time (fail at PUT), before any frame exists
def _static_cols(t: str, step: dict) -> list:
    if t == "ReplaceField":
        return list(step.get("renames") or {}) + list(step.get("exclude") or [])
    if t == "MaskField":
        return list(step.get("fields") or [])
    if t == "InsertField":
        return [step[k] for k in ("static_field", "timestamp_field",
                                  "offset_field", "partition_field",
                                  "topic_field") if k in step]
    if t == "Cast":
        return list(step.get("spec") or {})
    if t == "RegexRouter":
        f = step.get("field", "source_topic")
        return [] if f == "source_topic" else [f]
    if t == "TimestampConverter":
        return [step["field"]] if "field" in step else []
    if t == "ExtractField":
        return [step.get("name", str(step.get("field", "")).split(".")[-1])]
    if t == "HoistField":
        return [step["field"]] if "field" in step else []
    return []


# step types that may carry a per-record ``when`` guard (KIP-585
# predicates): VALUE transforms only — a structural transform changes the
# frame-global schema, which cannot vary per record in Spark
_CONDITIONABLE = {"MaskField", "InsertField", "RegexRouter"}

# params a step type cannot run without — checked at COMPILE time
_REQUIRED = {
    "MaskField": ("fields",),
    "Cast": ("spec",),
    "RegexRouter": ("regex", "replacement"),
    "Filter": ("predicate",),
    "TimestampConverter": ("field",),
    "ExtractField": ("field",),
    "HoistField": ("field",),
}

_APPLIERS = {
    "ReplaceField": _replace_field,
    "MaskField": _mask_field,
    "InsertField": _insert_field,
    "Cast": _cast,
    "RegexRouter": _regex_router,
    "Filter": _filter,
    "TimestampConverter": _timestamp_converter,
    "ExtractField": _extract_field,
    "Flatten": _flatten,
    "HoistField": _hoist_field,
}


def compile_smt_chain(chain: list[dict]) -> list:
    """Validate a chain's STRUCTURE eagerly (unknown types, missing params
    that don't need the frame) and return the ordered (type, step, applier)
    list. Column-existence checks run at apply time, against the actual
    frame — the same two-phase validation Connect does (config validation
    at PUT, schema resolution per record batch)."""
    if not isinstance(chain, (list, tuple)):
        raise SmtError(f"SMT chain must be a list of steps, got {type(chain)}")
    compiled = []
    for i, step in enumerate(chain):
        if not isinstance(step, dict) or "type" not in step:
            raise SmtError(f"SMT step {i} must be a dict with 'type': {step}")
        t = step["type"]
        if t not in _APPLIERS:
            raise SmtError(
                f"SMT step {i}: unknown type {t!r} "
                f"(supported: {sorted(_APPLIERS)})"
            )
        for p in _REQUIRED.get(t, ()):
            _require(step, p)
        if ("when" in step or "negate_when" in step) \
                and t not in _CONDITIONABLE:
            raise SmtError(
                f"SMT step {i}: {t!r} cannot take a 'when' guard — it "
                "changes the frame-global schema, which cannot vary per "
                f"record (conditionable: {sorted(_CONDITIONABLE)}; for "
                "conditional row DROPS use Filter's own predicate)"
            )
        _guard(step, _static_cols(t, step))
        compiled.append((t, dict(step), _APPLIERS[t]))
    return compiled


def chain_touches(chain: list[dict], cols) -> set:
    """Columns from ``cols`` that any step of ``chain`` statically names as
    a write/remove target. Lets a caller fence context-specific columns the
    generic guard doesn't know about (e.g. the engine refuses a chain that
    touches the LWW conflict stamps when conflict_policy='lww')."""
    named: set = set()
    for t, step, _ in compile_smt_chain(chain):
        named.update(_static_cols(t, step))
        if t == "ReplaceField" and step.get("include") is not None:
            named.update(set(cols) - set(step["include"]))
    return named & set(cols)


def apply_smt_chain(df: DataFrame, chain: list[dict]) -> DataFrame:
    """Run every step of ``chain`` over ``df``, in order, as pure Column
    expressions. Catalyst collapses the chain of projections into ONE
    map-side projection — `.explain` shows a single Project over the scan,
    so a 10-step chain costs the same as its fused expression."""
    for _t, step, applier in compile_smt_chain(chain):
        df = applier(df, step)
    return df
