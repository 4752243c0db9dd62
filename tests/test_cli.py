"""CLI surface smoke test (the spark-submit entry, SURVEY.md §3)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv: str) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "kp_data_replication_spark.cli", "--cpus", "4", *argv],
        capture_output=True, text=True, cwd=REPO, check=True, timeout=300,
    )
    return out.stdout.strip().splitlines()[-1]


def test_gen_replay_state_roundtrip(tmp_path):
    cl = str(tmp_path / "cl")
    tgt = str(tmp_path / "tgt")
    g = json.loads(_run("gen", cl, "--keys", "80", "--versions", "2",
                        "--partitions", "2", "--files", "2"))
    assert g["events"] == 160

    r = json.loads(_run("replay", cl, tgt))
    assert r["status"] == "committed"

    s = json.loads(_run("state", tgt))
    assert s["rows"] > 0 and s["version"] == 1


def test_maintenance_and_changes_subcommands(tmp_path):
    cl = str(tmp_path / "cl")
    tgt = str(tmp_path / "tgt")
    _run("gen", cl, "--keys", "60", "--versions", "2",
         "--partitions", "2", "--files", "2")
    _run("replay", cl, tgt)

    rb = json.loads(_run("rebucket", tgt, "8"))
    assert rb["n_buckets"] == 8 and rb["version"] == 2

    # physical-only rebucket: empty changefeed v1 -> v2
    ch = json.loads(_run("changes", tgt, "1", "2"))
    assert ch["changes"] == {}

    # everything in v1 is an insert relative to the empty table
    ch0 = json.loads(_run("changes", tgt, "0", "1"))
    assert set(ch0["changes"]) == {"insert"} and ch0["changes"]["insert"] > 0

    rw = json.loads(_run("rewrite", tgt))
    assert rw["rewritten_buckets"] == []  # bucket-CoW commits: 1 file each

    s1 = json.loads(_run("state", tgt, "--version", "1"))
    s2 = json.loads(_run("state", tgt))
    assert s1["rows"] == s2["rows"] and s2["version"] == 2


def test_lookup_and_clone_subcommands(tmp_path):
    cl = str(tmp_path / "cl")
    tgt = str(tmp_path / "tgt")
    _run("gen", cl, "--keys", "40", "--versions", "1",
         "--partitions", "2", "--files", "2")
    _run("replay", cl, tgt)

    c = json.loads(_run("clone", tgt, str(tmp_path / "branch")))
    assert c["version"] == 1 and c["cloned_from"]["version"] == 1
    sb = json.loads(_run("state", str(tmp_path / "branch")))
    st = json.loads(_run("state", tgt))
    assert sb["rows"] == st["rows"]

    # grab one real key driver-side (pyarrow, no Spark), then point-read it
    import pyarrow.parquet as pq

    from kp_data_replication_spark.sources.table_store import TableStore

    row = pq.read_table(
        TableStore(tgt)._bucket_files()[0], columns=["repo", "path"]
    ).to_pylist()[0]
    key = f"{row['repo']}:{row['path']}"
    lk = json.loads(_run("lookup", tgt, key))
    assert lk["n"] == 1 and lk["rows"][0]["path"] == row["path"]


def test_metrics_prometheus_exposition(tmp_path):
    import re

    cl = str(tmp_path / "cl")
    tgt = str(tmp_path / "tgt")
    _run("gen", cl, "--keys", "60", "--versions", "2",
         "--partitions", "2", "--files", "2")
    _run("replay", cl, tgt)
    out = subprocess.run(
        [sys.executable, "-m", "kp_data_replication_spark.cli", "--cpus", "4",
         "metrics", tgt, "--format", "prometheus"],
        capture_output=True, text=True, cwd=REPO, check=True, timeout=300,
    ).stdout
    lines = [ln for ln in out.splitlines() if ln and not ln.startswith("# ")]
    sample = re.compile(r'^[a-z_]+\{job="cdc-engine"(,partition="\d+")?\} ')
    assert lines and all(sample.match(ln) for ln in lines)
    # both partitions applied 60 events each; watermark gauge present
    applied = {ln for ln in lines
               if ln.startswith("cdc_partition_applied_total")}
    assert len(applied) == 2
    assert any(ln.startswith("cdc_partition_applied_lsn") for ln in lines)
    assert 'cdc_table_version{job="cdc-engine"} 1' in lines


def test_text_index_and_search_subcommands(tmp_path):
    cl = str(tmp_path / "cl")
    tgt = str(tmp_path / "tgt")
    idx = str(tmp_path / "tidx")
    _run("gen", cl, "--keys", "60", "--versions", "2",
         "--partitions", "2", "--files", "2")
    _run("replay", cl, tgt)

    ti = json.loads(_run("text-index", tgt, idx, "--buckets", "8"))
    assert ti["status"] == "committed" and ti["n_postings_delta"] > 0

    # fenced: a second advance over the same head is a noop
    ti2 = json.loads(_run("text-index", tgt, idx))
    assert ti2["status"] == "noop"

    # generated content is hex-ish words; probe with a term drawn from it
    import duckdb  # noqa: F401  (env sanity only)
    from pyspark.sql import functions as F  # noqa: F401
    # use a raw read to pick a real term deterministically
    import pyarrow.parquet as pq
    import glob as _glob
    import re
    part = sorted(_glob.glob(tgt + "/data/v1/*/*.parquet"))[0]
    text = pq.read_table(part, columns=["content"])["content"][0].as_py()
    term = next(t for t in re.split("[^a-z0-9]+", text.lower()) if t)

    hits = json.loads(_run("search", idx, term, "-k", "3"))
    assert 0 < len(hits) <= 3
    assert all(h["score"] > 0 and h["n_terms"] == 1 for h in hits)


def test_export_shards_subcommand(tmp_path):
    cl = str(tmp_path / "cl")
    tgt = str(tmp_path / "tgt")
    out = str(tmp_path / "shards")
    _run("gen", cl, "--keys", "60", "--versions", "2",
         "--partitions", "2", "--files", "2")
    _run("replay", cl, tgt)

    s = json.loads(_run("state", tgt))
    x = json.loads(_run("export-shards", tgt, out,
                        "--rows-per-shard", "25", "--seed", "s1"))
    assert x["n_rows"] == s["rows"] > 0
    want_shards = (s["rows"] + 24) // 25
    assert x["n_shards"] == want_shards
    import glob as _glob
    assert len(_glob.glob(out + "/_shard=*")) == want_shards


def test_clone_index_and_forks_subcommands(tmp_path):
    cl = str(tmp_path / "cl")
    tgt = str(tmp_path / "tgt")
    idx = str(tmp_path / "cidx")
    _run("gen", cl, "--keys", "60", "--versions", "2",
         "--partitions", "2", "--files", "2")
    _run("replay", cl, tgt)

    out = json.loads(_run("clone-index", tgt, idx, "--buckets", "4",
                          "--pairs-out", str(tmp_path / "pairs"),
                          "--matches-out", str(tmp_path / "matches")))
    assert out["status"] == "committed" and out["n_changed"] > 0
    assert out["n_matches"] >= 0 and out["n_new_pairs"] >= 0
    # second run with no new source version is a noop
    out2 = json.loads(_run("clone-index", tgt, idx, "--buckets", "4"))
    assert out2["status"] == "noop"

    forks = json.loads(_run("forks", tgt, "--min-jaccard", "0.0",
                            "--max-df", "1000"))
    assert isinstance(forks, list)
    if forks:
        r = forks[0]
        assert {"repo1", "repo2", "n_common", "n1", "n2", "jaccard"} <= set(r)


def test_fork_index_subcommand(tmp_path):
    cl = str(tmp_path / "cl")
    tgt = str(tmp_path / "tgt")
    idx = str(tmp_path / "fidx")
    _run("gen", cl, "--keys", "40", "--versions", "2",
         "--partitions", "2", "--files", "2")
    _run("replay", cl, tgt)
    out = json.loads(_run("fork-index", tgt, idx, "--buckets", "4",
                          "--min-jaccard", "0.0", "--max-df", "1000",
                          "--pairs-out", str(tmp_path / "fpairs")))
    assert out["status"] == "committed" and out["n_changed"] > 0
    assert out["n_pairs"] >= 0
    assert json.loads(_run("fork-index", tgt, idx, "--buckets", "4"))[
        "status"] == "noop"


def test_restore_and_forget_subcommands(tmp_path):
    cl = str(tmp_path / "cl")
    cl2 = str(tmp_path / "cl2")
    tgt = str(tmp_path / "tgt")
    _run("gen", cl, "--keys", "40", "--versions", "2",
         "--partitions", "2", "--files", "2")
    _run("replay", cl, tgt)
    _run("gen", cl2, "--keys", "20", "--versions", "1",
         "--partitions", "2", "--files", "1")
    _run("replay", cl2, tgt)
    s = json.loads(_run("state", tgt))
    head = s["version"]
    assert head >= 2

    r = json.loads(_run("restore", tgt, "--to-version", "1"))
    assert r == {"restored_to": 1, "new_version": head + 1}
    s1 = json.loads(_run("state", tgt))
    assert s1["version"] == head + 1

    # forget one live key end-to-end through the CLI
    import duckdb  # noqa: F401  (env sanity: same interpreter the CLI uses)
    from kp_data_replication_spark.sources.table_store import TableStore

    store = TableStore(tgt)
    man = store.current_manifest()
    # pick any key from the state via the lineage-free lookup path:
    # cheapest is reading one data file raw
    import glob

    import pyarrow.parquet as pq

    f = glob.glob(f"{tgt}/data/**/*.parquet", recursive=True)[0]
    t = pq.read_table(f, columns=["repo", "path"])
    repo, path = t.column("repo")[0].as_py(), t.column("path")[0].as_py()
    out = json.loads(_run("forget", tgt, "--key", f"{repo}:{path}"))
    assert out["rows_removed"] + out["live_deleted"] > 0
    # the key is gone from every file under the table root
    for f in glob.glob(f"{tgt}/data/**/*.parquet", recursive=True):
        t = pq.read_table(f, columns=["repo", "path"])
        assert not any(
            r == repo and p == path
            for r, p in zip(t.column("repo").to_pylist(),
                            t.column("path").to_pylist())
        )


def test_pause_resume_subcommands(tmp_path, spark):
    """Per-flow gate through the CLI: pause is pure metadata, resume with
    --changelog runs the catch-up replay in its own spark-submit-style
    process (the operator's rolling-migration loop)."""
    from pyspark.sql import functions as F

    from kp_data_replication_spark.datagen import ChangelogSpec, write_changelog
    from kp_data_replication_spark.streaming.apply import EngineConfig
    from kp_data_replication_spark.streaming.router import TopicRouter

    cl = str(tmp_path / "cl")
    write_changelog(
        spark, cl,
        ChangelogSpec(n_keys=30, versions_per_key=1, n_partitions=2,
                      files=1, dup_every=0),
    )
    root = str(tmp_path / "targets")
    router = TopicRouter(
        root, EngineConfig(metrics=False, whitelist="^repos"), n_buckets=4
    )
    batch = spark.read.option("mergeSchema", "true").parquet(cl)
    router.apply_batch(batch.filter(F.col("lsn") <= 10), 0)

    p = json.loads(_run("pause", root, "repos"))
    assert p["topic"] == "repos" and p["watermarks"]
    # paused: the router skips this flow's batches
    out = router.apply_batch(batch, 1)
    assert out["repos"]["status"] == "paused"

    r = json.loads(_run("resume", root, "repos", "--changelog", cl))
    assert r["was_paused"] and r["catchup"]["status"] == "committed"
    from kp_data_replication_spark.datagen import compute_expected_state_pandas

    n = router.store_for("repos").read_state(spark).count()
    assert n == len(compute_expected_state_pandas(cl))
