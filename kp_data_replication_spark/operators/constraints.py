"""CHECK-constraint enforcement at apply time (Delta `ALTER TABLE ADD
CONSTRAINT` / Kafka Connect `errors.tolerance` analogue).

The reference's connector stack validates payloads structurally and routes
rejects to a DLQ topic (Kafka Connect errors.tolerance=all — the same
contract the engine's malformed-envelope quarantine already implements);
what it cannot express is a *semantic* contract over the payload ("stars
is non-negative", "content is non-empty"). Lakehouse tables solve this
with CHECK constraints stored in TABLE metadata so every writer enforces
them — mechanism, not convention. This module is that analogue:

- Constraints are named SQL boolean expressions over the row's data
  columns, persisted per-name under ``<table>/_constraints.d/`` by
  :meth:`TableStore.add_constraint` (same atomic-file-per-entry registry
  shape as consumers and grants — concurrent adds never lose each other).
- The apply engine evaluates the union of table-persisted and
  flow-config constraints every epoch, on UPSERT images only (a
  tombstone's data columns are null by construction — deletes are exempt,
  matching Delta, where constraints gate incoming values, not removals).
- SQL-standard semantics: a row violates a constraint only when the
  expression evaluates to **FALSE** — NULL passes (unknown is not a
  violation), exactly like ANSI CHECK.
- Violations route to the engine's DLQ with the failing rule names
  recorded in the envelope ``headers`` map (key ``_violated``), byte-
  faithful for repair + replay; with no DLQ configured the batch FAILS
  before any state is written (Delta's strict default).

Everything here is pure Catalyst expression assembly — the per-rule
``when`` columns fuse into the same WholeStageCodegen stage as the rest
of the ingest filter; no extra pass over the batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: headers key under which the DLQ records the failing rule names
VIOLATED_HEADER = "_violated"


class ConstraintViolationError(ValueError):
    """Strict-mode CHECK failure: raised BEFORE any state is written when
    constraints are configured but no DLQ is (Delta's strict default).
    Carries per-rule violation counts for the operator."""

    def __init__(self, counts: dict[str, int]):
        self.counts = dict(counts)
        total = sum(self.counts.values())
        super().__init__(
            f"{total} row(s) violate CHECK constraint(s) "
            f"{self.counts} and no dlq_dir is configured; fix the "
            "producer, drop the constraint, or set dlq_dir to quarantine "
            "instead (errors.tolerance=all)"
        )


def violation_names(constraints: dict[str, str]) -> Column:
    """Array of the rule names the current row violates (empty = clean).
    Evaluate in a scope where the row's DATA columns are visible. NULL
    expression results pass (ANSI CHECK)."""
    if not constraints:
        return F.array().cast("array<string>")
    return F.array_compact(
        F.array(*[
            F.when(
                ~F.coalesce(F.expr(expr), F.lit(True)), F.lit(name)
            )
            for name, expr in sorted(constraints.items())
        ])
    )


def check_constraints(
    df: DataFrame, constraints: dict[str, str], out_col: str = "_violations"
) -> DataFrame:
    """Append the violated-rule-names array to ``df`` (data columns in
    scope)."""
    return df.withColumn(out_col, violation_names(constraints))


def violation_counts(
    df: DataFrame, constraints: dict[str, str]
) -> DataFrame:
    """Per-rule violation counts over ``df`` — the audit form
    (columns ``rule``, ``n_violations``). One scan; the per-rule counts
    are conditional aggregates, not one job per rule."""
    return df.select(
        F.explode(violation_names(constraints)).alias("rule")
    ).groupBy("rule").agg(F.count(F.lit(1)).alias("n_violations"))


def check_envelope(
    env: DataFrame, constraints: dict[str, str], out_col: str = "_violations"
) -> DataFrame:
    """Evaluate constraints over a CHANGELOG envelope's ``after`` image and
    append the violated-names array, leaving every envelope column intact.

    Constraint expressions are written against the row's DATA columns
    ("value <= 200"), which live nested under ``after`` here — so the
    evaluation scope is built by projecting ``after.*`` beside a struct of
    the whole envelope, then re-expanding. Catalyst collapses the
    struct/re-expand into the same projection node; no extra pass.

    Tombstones are EXEMPT by mechanism, not by NULL-propagation luck: a
    rule like ``content IS NOT NULL`` evaluates FALSE on a delete's null
    after image, but deletes gate nothing — constraints check incoming
    values (Delta semantics), so ``op='d'`` short-circuits to the empty
    array.
    """
    after = next(f for f in env.schema.fields if f.name == "after")
    data_cols = [f.name for f in after.dataType.fields]
    scoped = env.select(
        F.struct(*[F.col(c) for c in env.columns]).alias("_env"),
        *[F.col(f"after.{c}").alias(c) for c in data_cols],
    )
    names = F.when(
        F.col("_env.op") == "d", F.array().cast("array<string>")
    ).otherwise(violation_names(constraints))
    return scoped.withColumn(out_col, names).select("_env.*", out_col)


def stamp_violated_header(
    df: DataFrame, names_col: str = "_violations"
) -> DataFrame:
    """Record the failing rule names in the envelope's ``headers`` map
    under :data:`VIOLATED_HEADER` (comma-joined), preserving every other
    header byte-faithfully — the repaired row replays with its audit trail
    attached, exactly like Kafka Connect's DLQ error headers."""
    existing = F.map_filter(
        F.coalesce(
            F.col("headers"),
            F.create_map().cast("map<string,string>"),
        ),
        lambda k, _v: k != VIOLATED_HEADER,
    )
    stamped = F.map_concat(
        existing,
        F.create_map(
            F.lit(VIOLATED_HEADER), F.array_join(F.col(names_col), ",")
        ),
    )
    return df.withColumn("headers", stamped)
