"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship CDC query (replicated-topic end state) on sf0.001.
queries()      — one entry per implemented operator from SURVEY.md §2,
                 implemented in kp_data_replication_spark.queries.
oracle_sql()   — DuckDB-equivalent ANSI SQL for each query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kp_data_replication_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: CDC last-write-wins state
    reconstruction with tombstone drop (SURVEY.md §2.4 A2, §2.2 F7)."""
    fn, _ = all_queries()["cdc_state_lastwrite"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_queries().items() if sql is not None}
