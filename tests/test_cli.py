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
