"""Physical-plan audits: assert the plan we designed is the plan Spark runs.

SURVEY.md §7 hard part (c): keep every transform vectorized — no
`BatchEvalPython` (row-at-a-time Python) nodes, only `ArrowEvalPython` /
`MapInPandas`; filters must reach the parquet scan (`PushedFilters`); small
joins must broadcast; the compact->merge pipeline must not add avoidable
exchanges. These helpers make those properties testable instead of folklore.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """Capture `df.explain(mode)` output as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_no_row_python(df: DataFrame) -> None:
    """No row-at-a-time Python UDF in the plan (Arrow-vectorized only —
    BASELINE mandate 'no per-row Python')."""
    plan = plan_string(df)
    assert "BatchEvalPython" not in plan, f"row-wise Python UDF in plan:\n{plan}"


def assert_arrow_only(df: DataFrame) -> None:
    """Any Python in the plan is Arrow-batched (ArrowEvalPython/MapInPandas)."""
    plan = plan_string(df)
    assert "BatchEvalPython" not in plan, plan
    # FlatMapGroupsInPandas / MapInPandas / ArrowEvalPython are the ok forms


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The named filter reached the data source (predicate pushdown)."""
    plan = plan_string(df)
    assert "PushedFilters" in plan, f"no pushdown section in plan:\n{plan}"
    assert fragment in plan, f"filter '{fragment}' not pushed:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (excluding
    broadcast exchanges and AQE reuse nodes)."""
    plan = plan_string(df, mode="simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema fragment of the scan — verify column/field pruning."""
    plan = plan_string(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""
