"""Custom stateful streaming operator: the offset-sync emitter
(SURVEY.md §2.1 S9, §2.10; reference docs/consideration.md:44-48).

MM2's MirrorSourceConnector writes to the offset-syncs topic "at the
beginning of the replication and when ... numbering sequencing diverges".
That is inherently CROSS-TRIGGER state: whether an incoming lsn diverges
depends on the last lsn seen in any earlier micro-batch. Spark's built-in
windowed aggregations can't express "emit only on change vs running state",
so this is the `applyInPandasWithState` case: per-partition state = the
last applied (src, tgt) offsets; each trigger emits one sync row per
divergence event (and one at stream start), nothing otherwise.

State size is O(log partitions) — two longs each — so at 10^4 partitions
the state store is trivially small; the grouping key IS the log partition,
so state locality follows the shuffle and no executor ever holds more than
its partitions' stubs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SYNC_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType()),
        T.StructField("sync_src_offset", T.LongType()),
        T.StructField("sync_tgt_offset", T.LongType()),
        T.StructField("reason", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_src", T.LongType()),
        T.StructField("last_tgt", T.LongType()),
    ]
)


def _emit_syncs(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-partition divergence detector. Input rows: (partition, lsn,
    tgt_offset) sorted within the trigger; emits a sync row at stream start
    and whenever src/tgt numbering diverges from the +1 continuation the
    consumer would otherwise assume (docs/consideration.md:46)."""
    (partition,) = key
    if state.exists:
        last_src, last_tgt = state.get
    else:
        last_src, last_tgt = None, None

    out: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("lsn")
        for src, tgt in zip(pdf["lsn"].tolist(), pdf["tgt_offset"].tolist()):
            if last_src is None:
                out.append((partition, src, tgt, "start"))
            elif src != last_src + 1 or tgt != last_tgt + 1:
                out.append((partition, src, tgt, "divergence"))
            last_src, last_tgt = src, tgt
    if last_src is not None:
        state.update((int(last_src), int(last_tgt)))
    if out:
        yield pd.DataFrame(
            out, columns=["partition", "sync_src_offset", "sync_tgt_offset", "reason"]
        )


def offset_sync_stream(events: DataFrame) -> DataFrame:
    """events (streaming or batch-test): partition int, lsn long,
    tgt_offset long -> sync rows, emitted ONLY at start/divergence.

    The per-partition ordering contract (docs/consideration.md:20) holds
    within a trigger after the sort in `_emit_syncs`; across triggers the
    state carries the tail."""
    return events.groupBy("partition").applyInPandasWithState(
        _emit_syncs,
        outputStructType=SYNC_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
