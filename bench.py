"""Headline benchmark: CDC apply throughput + operator query suite.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "cdc": {...apply throughput detail...}}

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_CDC_KEYS / BENCH_CDC_VERSIONS / BENCH_CDC_PARTITIONS to resize the
  synthetic changelog (defaults sized for ~60-90 s total runtime).

All progress chatter goes to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog  # noqa: E402
from kp_data_replication_spark.queries import all_queries  # noqa: E402
from kp_data_replication_spark.schema import CHANGELOG_SCHEMA_EVOLVED  # noqa: E402
from kp_data_replication_spark.session import get_spark  # noqa: E402
from kp_data_replication_spark.sources.table_store import TableStore  # noqa: E402
from kp_data_replication_spark.streaming.apply import (  # noqa: E402
    CdcApplyEngine,
    EngineConfig,
)

HEADLINE_QUERIES = [
    "cdc_state_lastwrite",
    "cdc_merge_upsert",
    "cdc_table_changes",
    "cdc_dedup_anti",
    "cdc_offset_translation",
    "cdc_gap_stats",
    "cdc_group_checkpoints",
    "cdc_replication_latency",
    "cdc_throughput_1h",
    "cdc_latency_percentiles",
    "cdc_sha_invariant",
    "agg_pricing_summary",
    "join_segment_revenue",
    "window_topk_orders",
    "antijoin_orphans",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_cdc_apply(spark, work_dir: str) -> dict:
    """Generate a changelog (untimed), replay it through the exactly-once
    engine (timed) — the BASELINE.json headline metric."""
    spec = ChangelogSpec(
        n_keys=int(os.environ.get("BENCH_CDC_KEYS", "100000")),
        versions_per_key=int(os.environ.get("BENCH_CDC_VERSIONS", "5")),
        n_partitions=int(os.environ.get("BENCH_CDC_PARTITIONS", "32")),
        files=4,
        content_chains=int(os.environ.get("BENCH_CDC_CHAINS", "24")),
        parts_per_file=8,
    )
    cl_dir = os.path.join(work_dir, "changelog")
    t0 = time.time()
    write_changelog(spark, cl_dir, spec)
    gen_sec = time.time() - t0
    log(f"changelog generated: {spec.n_events} events in {gen_sec:.1f}s")

    # best-of-N fresh replays: the sandbox host shows multi-x wall-clock
    # variance from outside contention; best-of is the least-noisy estimator
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    # settle BEFORE the first timed run: the freshly-written changelog is
    # gigabytes of dirty pages and background writeback otherwise stalls
    # run 0 (this host's dominant noise mode); run 0 additionally pays JIT/
    # codegen warmup, so best-of-3 is the engine, not the host
    os.sync()
    runs = []
    summary = {}
    n_state = 0
    for i in range(repeats):
        store = TableStore(os.path.join(work_dir, f"target{i}"), n_buckets=64)
        engine = CdcApplyEngine(store, EngineConfig())
        t0 = time.time()
        summary = engine.replay_batch(spark, cl_dir, read_schema=CHANGELOG_SCHEMA_EVOLVED)
        runs.append(time.time() - t0)
        n_state = store.read_state(spark).count()
        log(f"cdc apply[{i}]: {spec.n_events} events -> {n_state} rows in {runs[-1]:.1f}s")
    apply_sec = min(runs)
    return {
        "n_events": spec.n_events,
        "gen_sec": round(gen_sec, 3),
        "apply_sec": round(apply_sec, 3),
        "apply_sec_runs": [round(r, 3) for r in runs],
        "events_per_sec": round(spec.n_events / apply_sec, 1),
        "state_rows": n_state,
        "keys_changed": summary.get("keys_changed"),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    # shuffle.partitions = 64 = n_buckets: the compaction shuffle is then
    # bucket-aligned and the engine skips the pre-write repartition; 8MB
    # scan splits keep map waves balanced (changelog chunks are written
    # with 8MB row groups, so they really split)
    spark = get_spark(
        app_name="bench", cpus=cpus, shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )

    work_dir = tempfile.mkdtemp(prefix="kp_bench_")
    try:
        cdc = bench_cdc_apply(spark, work_dir)

        qtimes: dict[str, float] = {}
        registry = all_queries()
        for name in HEADLINE_QUERIES:
            fn, _ = registry[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            qtimes[name] = round(time.time() - t0, 3)
            log(f"query {name}: {n} rows in {qtimes[name]}s")

        total = round(cdc["apply_sec"] + sum(qtimes.values()), 3)
        out = {
            "metric": "cdc_apply_plus_headline_queries",
            "value": total,
            "unit": "sec",
            "queries": {"cdc_apply": cdc["apply_sec"], **qtimes},
            "sf": sf,
            "cpus": cpus,
            "cdc": cdc,
        }
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(work_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
