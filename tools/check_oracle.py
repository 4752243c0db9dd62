"""Local stand-in for the driver's DuckDB correctness harness.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB at
sf0.01, compares row count, sorted column names, and order-insensitive
values (rounded canonicalization).
Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
Args that aren't directories are treated as query names to check (default all).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype(float).round(6)
        elif str(df[c].dtype).startswith(("int", "Int", "uint", "UInt")):
            df[c] = df[c].astype("int64", errors="ignore")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    only: set[str] = set()
    for a in sys.argv[1:]:
        if os.path.isdir(a):
            sf_dir = a
        else:
            only.add(a)
    import __spark_entry__ as e
    from kp_data_replication_spark.session import get_spark

    spark = get_spark(
        app_name="oracle-check", cpus=8, shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(fn(spark, sf_dir).toPandas())
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows")
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {ex}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6)
            print(f"OK   {name}: {len(got)} rows")
        except AssertionError as ex:
            print(f"FAIL {name}: value mismatch\n{str(ex)[:500]}")
            failures += 1
    # smoke entry()
    n = e.entry(spark).count()
    print(f"entry(): {n} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
