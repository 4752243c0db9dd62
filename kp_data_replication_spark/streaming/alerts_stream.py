"""Streaming alert evaluation with Prometheus ``for:`` duration semantics.

The reference's alert rules carry a duration (``for: 10s`` in
``monitoring/prometheus-rules.yaml``): a condition must HOLD before the
alert transitions pending → firing, and Prometheus emits a resolve when
it stops holding. :mod:`..operators.alerts` evaluates thresholds
point-in-time; this module is the streaming twin over the engine's
per-epoch metrics table, where the natural duration unit is the epoch —
a rule fires only after its condition holds ``for_epochs`` CONSECUTIVE
epochs for the same identity (the log partition), and a RESOLVED row is
emitted when a firing identity goes healthy again.

That pending/firing ratchet is inherently cross-trigger state (whether
epoch N fires depends on epochs N-1, N-2 seen in earlier micro-batches),
which built-in windowed aggregation can't express — the
``applyInPandasWithState`` case, same as the offset-sync emitter
(:mod:`.state`). Two scale-shape choices keep it honest at 10^4+
partitions:

* rule CONDITIONS are evaluated JVM-side (``F.expr`` projections before
  the stateful operator) — only (epoch, partition, bool-per-rule) rows
  ever cross the Arrow boundary, never the metric payload;
* state per partition is two small int arrays (consecutive count +
  firing flag per rule), grouped BY the log partition so state locality
  follows the shuffle.

The metrics directory the engine appends per epoch is itself a file
stream: ``readStream.schema(METRICS_SCHEMA).parquet(<target>/metrics)``
turns the ops surface into a live alert feed with checkpoint resume for
free (the driver can tail alerts without touching the apply loop).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# mirror of the pyarrow schema CdcApplyEngine appends per epoch
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_applied", T.LongType()),
        T.StructField("n_duplicates", T.LongType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("applied_lsn_before", T.LongType()),
        T.StructField("min_ts", T.TimestampType()),
        T.StructField("max_ts", T.TimestampType()),
        T.StructField("apply_ts", T.TimestampType()),
    ]
)


@dataclass(frozen=True)
class EpochRule:
    """A per-epoch condition over one partition's metrics row. ``expr`` is
    an ANSI-SQL boolean over :data:`METRICS_SCHEMA` columns; the alert
    transitions to FIRING once it holds ``for_epochs`` consecutive epochs
    (the ``for:`` analogue) and emits RESOLVED when it next fails."""

    name: str
    expr: str
    for_epochs: int = 1
    severity: str = "warning"


DEFAULT_EPOCH_RULES: list[EpochRule] = [
    # a partition that keeps receiving events but applies none of them:
    # at-least-once redelivery storms / a wedged consumer. One dup epoch
    # is normal recovery; two consecutive is a stall.
    EpochRule(
        "PartitionStalled", "n_events > 0 AND n_applied = 0",
        for_epochs=2, severity="critical",
    ),
    # replication latency (ts3 - ts2, docs/perf-tests.md:173-187) over
    # 60s for 2 consecutive epochs
    EpochRule(
        "ReplicationLatencyHigh",
        "max_ts IS NOT NULL AND "
        "unix_micros(apply_ts) - unix_micros(max_ts) > 60000000",
        for_epochs=2,
    ),
    # more duplicates than applies while real traffic flows: upstream
    # producer retry storm (docs/consideration.md:52-58 duplicate window)
    EpochRule(
        "DuplicateStorm", "n_duplicates > n_applied AND n_events > 0",
        for_epochs=3,
    ),
]

ALERT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType()),
        T.StructField("epoch", T.LongType()),
        T.StructField("alert", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("status", T.StringType()),  # firing | resolved
        T.StructField("held_epochs", T.LongType()),
    ]
)


def _state_schema(n_rules: int) -> T.StructType:
    return T.StructType(
        [
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("firing", T.ArrayType(T.BooleanType())),
        ]
    )


def alert_stream(
    metrics: DataFrame, rules: list[EpochRule] | None = None
) -> DataFrame:
    """metrics (streaming or batch-test, :data:`METRICS_SCHEMA` shape) →
    alert TRANSITION rows: one ``firing`` row when a rule's condition has
    held ``for_epochs`` consecutive epochs for a partition, one
    ``resolved`` row when a firing rule next goes healthy. Steady states
    (still-pending, still-firing, still-healthy) emit nothing — the
    alerts feed carries edges, like Prometheus notifications.
    """
    rules = list(rules if rules is not None else DEFAULT_EPOCH_RULES)
    names = [r.name for r in rules]
    sevs = [r.severity for r in rules]
    fors = [max(int(r.for_epochs), 1) for r in rules]

    # JVM-side condition evaluation: the stateful operator only ever sees
    # (partition, epoch, one boolean per rule)
    slim = metrics.select(
        "partition",
        "epoch",
        *[
            F.coalesce(F.expr(r.expr), F.lit(False)).alias(f"_c{i}")
            for i, r in enumerate(rules)
        ],
    )

    def _ratchet(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (partition,) = key
        if state.exists:
            counts, firing = state.get
            counts, firing = list(counts), list(firing)
        else:
            counts, firing = [0] * len(names), [False] * len(names)

        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("epoch")
            conds = [pdf[f"_c{i}"].tolist() for i in range(len(names))]
            for j, epoch in enumerate(int(e) for e in pdf["epoch"].tolist()):
                for i in range(len(names)):
                    held = bool(conds[i][j])
                    counts[i] = counts[i] + 1 if held else 0
                    if not firing[i] and counts[i] >= fors[i]:
                        firing[i] = True
                        out.append(
                            (partition, epoch, names[i], sevs[i], "firing",
                             counts[i])
                        )
                    elif firing[i] and counts[i] == 0:
                        firing[i] = False
                        out.append(
                            (partition, epoch, names[i], sevs[i], "resolved",
                             0)
                        )
        state.update((counts, firing))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in ALERT_EVENT_SCHEMA])

    return slim.groupBy("partition").applyInPandasWithState(
        _ratchet,
        outputStructType=ALERT_EVENT_SCHEMA,
        stateStructType=_state_schema(len(rules)),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def alert_stream_from_store(
    spark, store, rules: list[EpochRule] | None = None
) -> DataFrame:
    """Tail a live target table's metrics directory as the alert feed —
    ``readStream`` file source, so checkpointed resume and exactly-once
    sink semantics come from Structured Streaming itself."""
    import os

    mdir = os.path.join(store.root, "metrics")
    return alert_stream(
        spark.readStream.schema(METRICS_SCHEMA).parquet(mdir), rules
    )
