"""Round-6 measurement harness (bench.py is frozen for the driver; this
file exists for guide-§1 isolation work: per-query timing with the noop
sink, .explain("formatted") capture, and before/after comparisons).

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --queries a,b,c \
      [--repeats 2] [--plans plans/r06 --tag before] [--noop]

Prints one JSON line: {"queries": {name: best_sec}, "samples": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kp_data_replication_spark.queries import all_queries  # noqa: E402
from kp_data_replication_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", required=True)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans", default=None, help="directory for explain output")
    ap.add_argument("--tag", default="before", help="plan filename suffix")
    ap.add_argument("--noop", action="store_true", help="noop sink instead of count()")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # identical session shape to bench.py main()
    spark = get_spark(
        app_name="bench_extra", cpus=cpus, shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    registry = all_queries()
    names = [n for n in args.queries.split(",") if n]
    samples: dict[str, list[float]] = {n: [] for n in names}
    for p in range(args.repeats):
        for name in names:
            fn, _ = registry[name]
            spark.sparkContext.setJobDescription(f"{name}[{p}]")
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            print(f"{name}[{p}]: {n} rows in {dt}s", file=sys.stderr, flush=True)
            if p == 0 and args.plans:
                os.makedirs(args.plans, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(plan)
    out = {"sf": args.sf, "queries": {n: min(samples[n]) for n in names},
           "samples": samples}
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
