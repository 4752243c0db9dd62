"""Two-cluster-size scaling bench (BASELINE.json: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real multi-node cluster exists in this sandbox, so the criterion is
evidenced per BASELINE.md: the identical CDC apply job runs at two local
parallelism levels (local[8] vs local[32] — fresh JVM each, spawned via
subprocess) on the identical pre-generated changelog; efficiency =
(T_N / T_4N) / 4. Results are appended to BENCH/BASELINE.md.

Usage:
  python tools/bench_scaling.py                 # full comparison (default 8 vs 32)
  python tools/bench_scaling.py --run-one --cpus 8 --changelog DIR  # child mode
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cpus: int, changelog: str, repeats: int, warmup: bool = True) -> dict:
    from kp_data_replication_spark.schema import CHANGELOG_SCHEMA_EVOLVED
    from kp_data_replication_spark.session import get_spark
    from kp_data_replication_spark.sources.table_store import TableStore
    from kp_data_replication_spark.streaming.apply import CdcApplyEngine, EngineConfig

    # shuffle.partitions is a JOB config, identical at both cluster sizes
    # (as on a real cluster): 64 = n_buckets, so the compaction shuffle is
    # bucket-aligned and the engine skips the pre-write repartition; 8MB
    # scan splits keep map-stage waves balanced at every level.
    spark = get_spark(
        app_name=f"scaling-{cpus}", cpus=cpus, shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    n_events = spark.read.option("mergeSchema", "true").parquet(changelog).count()
    times = []
    with tempfile.TemporaryDirectory(prefix=f"scal{cpus}_") as wd:
        runs = (["w"] if warmup else []) + list(range(repeats))
        for i in runs:
            sdir = os.path.join(wd, f"t{i}")
            store = TableStore(sdir, n_buckets=64)
            engine = CdcApplyEngine(store, EngineConfig())
            t0 = time.time()
            engine.replay_batch(spark, changelog, read_schema=CHANGELOG_SCHEMA_EVOLVED)
            dt = time.time() - t0
            if i != "w":  # first run is JIT/page-cache warmup, untimed
                times.append(dt)
            print(f"  local[{cpus}] run {i}: {dt:.1f}s", file=sys.stderr)
            # UNTIMED hygiene: drop this run's ~GBs of output and flush
            # dirty pages NOW, so accumulated writeback debt from run k
            # can't stall run k+1 mid-flight (this box's dominant noise
            # mode: kernel writeback/compaction stalls, not CPU steal)
            import shutil as _shutil

            _shutil.rmtree(sdir, ignore_errors=True)
            os.sync()
    spark.stop()
    best = min(times)
    return {
        "cpus": cpus,
        "n_events": n_events,
        "apply_sec": round(best, 3),
        "apply_sec_runs": [round(t, 3) for t in times],
        "events_per_sec": round(n_events / best, 1),
    }


def _canary() -> float:
    """Fixed single-core hash spin. The host has documented multi-x noise
    episodes; a canary >~1.5x its typical value marks a contaminated
    window so per-level minima can be interpreted."""
    import hashlib

    t0 = time.time()
    for i in range(300_000):
        hashlib.md5(b"canary%d" % i).digest()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-one", action="store_true")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--changelog", type=str, default=None)
    # N=8 vs 4N=32 (the pair BASELINE.md itself names). Measured on this
    # box with pinned multiprocessing hash loops: raw 8->32 scaling is
    # ~0.89, while any pair that includes a <=4-core level is capped near
    # 0.71 by per-core clock behavior at low occupancy — an artifact of the
    # host, not of the engine, so the low-core pair would mismeasure the
    # engine's own scalability.
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n4", type=int, default=32)
    ap.add_argument("--keys", type=int, default=int(os.environ.get("SCALING_KEYS", "500000")))
    ap.add_argument("--versions", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--chains", type=int, default=24,
                    help="content md5-chain count (~40B each; 24 ~= 1 KiB source files)")
    ap.add_argument("--parts", type=int, default=32,
                    help="parquet chunks per file-batch (files*parts total files)")
    ap.add_argument("--reuse-changelog", type=str, default=None,
                    help="skip generation and replay this existing changelog dir")
    args = ap.parse_args()

    if args.run_one:
        print(json.dumps(run_one(args.cpus, args.changelog, args.repeats)))
        return

    # parent: generate once, then one fresh JVM per parallelism level
    from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog
    from kp_data_replication_spark.session import get_spark

    spec = ChangelogSpec(
        n_keys=args.keys, versions_per_key=args.versions, n_partitions=64, files=4,
        content_chains=args.chains, parts_per_file=args.parts,
    )
    if args.reuse_changelog:
        cl = args.reuse_changelog
    else:
        work = tempfile.mkdtemp(prefix="kp_scaling_")
        cl = os.path.join(work, "changelog")
        print(f"generating {spec.n_events} events ...", file=sys.stderr)
        spark = get_spark(app_name="scaling-gen", cpus=args.n4,
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
        write_changelog(spark, cl, spec)
        spark.stop()
        # settle BEFORE the first timed round: the freshly-written changelog
        # is gigabytes of dirty pages, and background writeback otherwise
        # stalls the early rounds (this box's dominant noise mode)
        os.sync()
        time.sleep(5)

    # Interleave the two levels across rounds so host-noise windows hit both
    # symmetrically (sequential A-then-B attributes a noisy first half
    # entirely to A). taskset pins the WHOLE process (executor threads, GC,
    # parquet IO, python workers) to exactly `cpus` cores — a faithful
    # stand-in for an N-core cluster; without it the smaller config borrows
    # idle cores through JVM service threads.
    samples: dict[int, list[dict]] = {args.n: [], args.n4: []}
    for rnd in range(args.repeats):
        for cpus in (args.n, args.n4):
            canary = _canary()  # single-core spin: flags host-noise episodes
            print(
                f"round {rnd}: local[{cpus}] (taskset 0-{cpus - 1}, canary {canary:.2f}s) ...",
                file=sys.stderr,
            )
            out = subprocess.run(
                ["taskset", "-c", f"0-{cpus - 1}",
                 sys.executable, os.path.abspath(__file__), "--run-one",
                 "--cpus", str(cpus), "--changelog", cl, "--repeats", "1"],
                capture_output=True, text=True, cwd=REPO, check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            r["canary_sec"] = canary
            print(f"  -> {r['apply_sec']}s", file=sys.stderr)
            samples[cpus].append(r)

    results = {}
    for cpus, rs in samples.items():
        best = min(rs, key=lambda r: r["apply_sec"])
        best = dict(best)
        best["apply_sec_runs"] = [r["apply_sec"] for r in rs]
        results[cpus] = best

    t_n, t_4n = results[args.n]["apply_sec"], results[args.n4]["apply_sec"]
    speedup = t_n / t_4n
    eff = speedup / (args.n4 / args.n)
    report = {
        "n_events": results[args.n]["n_events"],
        f"local[{args.n}]": results[args.n],
        f"local[{args.n4}]": results[args.n4],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report, indent=2))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    header_needed = not os.path.exists(md)
    with open(md, "a") as f:
        if header_needed:
            f.write(
                "# BENCH/BASELINE — two-parallelism-level scaling evidence\n\n"
                "BASELINE.json requires throughput scaling efficiency >= 0.8 from N to 4N\n"
                "executors. No real cluster exists in this sandbox, so per BASELINE.md the\n"
                "identical CDC apply job (full changelog replay -> exactly-once upsert)\n"
                "runs at two local parallelism levels on identical input, each in a fresh\n"
                "JVM; efficiency = (T_N / T_4N) / (4N / N).\n\n"
                "| date | events | T_N (local[N]) | T_4N (local[4N]) | ev/s @N | ev/s @4N | speedup | efficiency |\n"
                "|---|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {time.strftime('%Y-%m-%d %H:%M')} | {report['n_events']} "
            f"| {t_n}s (local[{args.n}]) | {t_4n}s (local[{args.n4}]) "
            f"| {results[args.n]['events_per_sec']} | {results[args.n4]['events_per_sec']} "
            f"| {report['speedup']} | {report['scaling_efficiency']} |\n"
        )
    print(f"appended to {md}", file=sys.stderr)


if __name__ == "__main__":
    main()
