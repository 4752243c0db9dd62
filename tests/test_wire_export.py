"""JSON-lines wire export: the producer half of engine-to-engine
replication over a durable wire (no shared TableStore). An upstream
engine commits epochs; `export_changefeed_json` emits one ordered
envelope file per version; a REMOTE engine tails the directory with
source_format="json" and converges to the upstream state — resumable on
both sides, redelivery deduped at the lsn watermark."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from kp_data_replication_spark.operators.changefeed import (
    export_changefeed_json,
    wire_read_schema,
)
from kp_data_replication_spark.schema import CHANGELOG_SCHEMA
from kp_data_replication_spark.sources.table_store import TableStore
from kp_data_replication_spark.streaming.apply import (
    CdcApplyEngine,
    EngineConfig,
)


def _env(path, op, content, lsn):
    img = Row(repo="r", path=str(path), commit="c0", lang="py",
              content=content)
    return Row(partition=path % 4, lsn=lsn, op=op,
               before=img if op == "d" else None,
               after=None if op == "d" else img,
               ts_ms=None, headers=None, source_topic="repos")


def _state(spark, store):
    return {
        (r.repo, r.path): r.content
        for r in store.read_state(spark)
        .select("repo", "path", "content").collect()
    }


def _mk_upstream(spark, tmp_path):
    src = TableStore(str(tmp_path / "A"), n_buckets=4)
    eng = CdcApplyEngine(src, EngineConfig(metrics=False))
    batches = [
        [_env(i, "c", f"v1-{i}", i) for i in range(24)],
        [_env(i, "u", f"v2-{i}", 100 + i) for i in range(0, 24, 3)],
        [_env(i, "d", None, 200 + i) for i in range(0, 24, 5)],
    ]
    return src, eng, batches


def test_wire_roundtrip_converges_and_resumes(spark, tmp_path):
    """Per-epoch export -> remote tail: final remote state equals the
    upstream state exactly, including updates and deletes; the remote
    stream is killed after the first file and resumed."""
    src, eng, batches = _mk_upstream(spark, tmp_path)
    wire = str(tmp_path / "wire")

    for e, b in enumerate(batches):
        eng.apply_batch(spark.createDataFrame(b, CHANGELOG_SCHEMA), e)
        out = export_changefeed_json(spark, src, wire)
        assert out["status"] == "exported" and out["files"] == 1

    files = sorted(f for f in os.listdir(wire) if f.startswith("changes_"))
    assert files == [f"changes_{v:010d}.json" for v in (1, 2, 3)]

    dst = TableStore(str(tmp_path / "B"), n_buckets=4)
    remote = CdcApplyEngine(dst, EngineConfig(metrics=False))
    cp = str(tmp_path / "cp")
    schema = wire_read_schema(wire)

    # first leg: one file, then "crash"
    q = remote.start_stream(spark, wire, cp, schema,
                            max_files_per_trigger=1, source_format="json")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    # resume: remaining files replay from the checkpoint
    q = remote.start_stream(spark, wire, cp, schema,
                            max_files_per_trigger=1, source_format="json")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()

    assert _state(spark, dst) == _state(spark, src)


def test_wire_export_is_resumable_and_idempotent(spark, tmp_path):
    """The cursor survives restarts (a second call is a noop); a crash
    between file write and cursor write (simulated by deleting the
    cursor) re-exports into the SAME filenames and a remote that already
    consumed them dedups the redelivery to zero state change."""
    src, eng, batches = _mk_upstream(spark, tmp_path)
    wire = str(tmp_path / "wire")

    for e, b in enumerate(batches[:2]):
        eng.apply_batch(spark.createDataFrame(b, CHANGELOG_SCHEMA), e)
    out = export_changefeed_json(spark, src, wire)
    assert out["status"] == "exported" and out["files"] == 2
    assert export_changefeed_json(spark, src, wire)["status"] == "noop"

    dst = TableStore(str(tmp_path / "B"), n_buckets=4)
    remote = CdcApplyEngine(dst, EngineConfig(metrics=False))
    cp = str(tmp_path / "cp")
    q = remote.start_stream(spark, wire, cp, wire_read_schema(wire),
                            source_format="json")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    before = _state(spark, dst)

    # crash window: cursor lost AFTER files landed -> full re-export
    os.remove(os.path.join(wire, "_cursor.json"))
    out = export_changefeed_json(spark, src, wire)
    assert out["status"] == "exported"
    assert sorted(
        f for f in os.listdir(wire) if f.startswith("changes_")
    ) == [f"changes_{v:010d}.json" for v in (1, 2)]

    # remote re-reads nothing new by filename; even a FRESH remote
    # applying the re-exported files converges to the same state
    q = remote.start_stream(spark, wire, cp, wire_read_schema(wire),
                            source_format="json")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    assert _state(spark, dst) == before

    dst2 = TableStore(str(tmp_path / "B2"), n_buckets=4)
    remote2 = CdcApplyEngine(dst2, EngineConfig(metrics=False))
    q = remote2.start_stream(spark, wire, str(tmp_path / "cp2"),
                             wire_read_schema(wire), source_format="json")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    assert _state(spark, dst2) == before == _state(spark, src)


def test_wire_schema_sidecar_evolves(spark, tmp_path):
    """Additive source evolution mid-wire: the sidecar schema grows, a
    reader restarted with the new schema applies the new column, and the
    remote target evolves additively (old rows null-padded)."""
    src = TableStore(str(tmp_path / "A"), n_buckets=4)
    eng = CdcApplyEngine(src, EngineConfig(metrics=False))
    wire = str(tmp_path / "wire")

    eng.apply_batch(
        spark.createDataFrame([_env(i, "c", f"x{i}", i) for i in range(8)],
                              CHANGELOG_SCHEMA), 0)
    export_changefeed_json(spark, src, wire)
    s1 = wire_read_schema(wire)

    # evolve: new column arrives in the upstream payload
    evolved = [
        Row(partition=0, lsn=100 + i, op="u",
            before=None,
            after=Row(repo="r", path=str(i), commit="c1", lang="py",
                      content=f"y{i}", stars=i),
            ts_ms=None, headers=None, source_topic="repos")
        for i in range(4)
    ]
    sch = (
        "partition int, lsn long, op string, "
        "before struct<repo:string,path:string,commit:string,lang:string,"
        "content:string,stars:bigint>, "
        "after struct<repo:string,path:string,commit:string,lang:string,"
        "content:string,stars:bigint>, "
        "ts_ms timestamp, headers map<string,string>, source_topic string"
    )
    eng.apply_batch(spark.createDataFrame(evolved, sch), 1)
    export_changefeed_json(spark, src, wire)
    s2 = wire_read_schema(wire)
    assert "stars" in s2["after"].dataType.fieldNames()
    assert "stars" not in s1["after"].dataType.fieldNames()

    dst = TableStore(str(tmp_path / "B"), n_buckets=4)
    remote = CdcApplyEngine(dst, EngineConfig(metrics=False))
    q = remote.start_stream(spark, wire, str(tmp_path / "cp"), s2,
                            source_format="json")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    got = {
        r.path: (r.content, r.stars)
        for r in dst.read_state(spark).select("path", "content", "stars")
        .collect()
    }
    assert got[str(0)] == ("y0", 0)
    assert got[str(7)] == ("x7", None)  # pre-evolution row null-padded


def test_wire_ring_converges_with_lww_and_echo_damping(spark, tmp_path):
    """The three-cluster LWW ring (tests/test_ring_topology.py) carried
    over the JSON wire instead of in-process cascades: each hop is
    export_changefeed_json at the source + ordered batch apply of the
    not-yet-applied wire files at the destination (the batch analogue of
    tailing with source_format=json). Convergence and echo damping must
    survive the wire because the export uses the same exact per-version
    diff: a losing/echo apply leaves state byte-identical, no new version
    commits, the next export is a noop, the ring drains."""
    import json as _json
    import os
    from datetime import datetime, timezone

    from pyspark.sql import Row

    from kp_data_replication_spark.schema import CHANGELOG_SCHEMA

    def _img(repo, path, content):
        return Row(repo=repo, path=path, commit="c0", lang="py",
                   content=content)

    def _ev(partition, lsn, op, image, ts):
        return Row(partition=partition, lsn=lsn, op=op,
                   before=image if op == "d" else None,
                   after=None if op == "d" else image,
                   ts_ms=ts, headers=None, source_topic="repos")

    def _ts(s):
        return datetime.strptime(s, "%Y-%m-%d %H:%M:%S").replace(
            tzinfo=timezone.utc)

    def _mk(name):
        store = TableStore(str(tmp_path / name), n_buckets=4)
        engine = CdcApplyEngine(store, EngineConfig(
            metrics=False, conflict_policy="lww", cluster_id=name))
        return store, engine

    a, eng_a = _mk("a")
    b, eng_b = _mk("b")
    c, eng_c = _mk("c")

    eng_a.apply_batch(spark.createDataFrame([
        _ev(0, 0, "c", _img("org/shared", "k.py", "K-from-A"),
            _ts("2026-01-01 00:00:03")),
        _ev(1, 0, "c", _img("org/a", "a.py", "A-local"),
            _ts("2026-01-01 00:00:01")),
    ], CHANGELOG_SCHEMA), 0)
    eng_b.apply_batch(spark.createDataFrame([
        _ev(0, 0, "c", _img("org/shared", "k.py", "K-from-B"),
            _ts("2026-01-01 00:00:01")),
        _ev(1, 0, "c", _img("org/b", "b.py", "B-local"),
            _ts("2026-01-01 00:00:01")),
    ], CHANGELOG_SCHEMA), 0)
    eng_c.apply_batch(spark.createDataFrame([
        _ev(0, 0, "c", _img("org/shared", "k.py", "K-from-C"),
            _ts("2026-01-01 00:00:05")),
        _ev(1, 0, "c", _img("org/c", "c.py", "C-local"),
            _ts("2026-01-01 00:00:01")),
    ], CHANGELOG_SCHEMA), 0)

    def wire_hop(src_store, wire_dir, dst_engine):
        """One wire hop: export at the source, apply new files at dst.
        Returns the list of wire versions applied."""
        export_changefeed_json(spark, src_store, wire_dir, n_partitions=2)
        if not os.path.isdir(wire_dir):
            return []
        files = sorted(
            f for f in os.listdir(wire_dir) if f.startswith("changes_")
        )
        if not files:
            return []
        schema = wire_read_schema(wire_dir)
        writer = f"wire:{os.path.abspath(wire_dir)}"
        done = max(dst_engine.store.writer_epoch(writer), 0)
        applied = []
        for f in files:
            v = int(f[len("changes_"):-len(".json")])
            if v <= done:
                continue
            df = spark.read.schema(schema).json(os.path.join(wire_dir, f))
            dst_engine.apply_batch(df, v, writer_id=writer)
            applied.append(v)
        return applied

    w_ab = str(tmp_path / "wire_ab")
    w_bc = str(tmp_path / "wire_bc")
    w_ca = str(tmp_path / "wire_ca")
    history = []
    for _ in range(12):
        applied = (
            wire_hop(a, w_ab, eng_b),
            wire_hop(b, w_bc, eng_c),
            wire_hop(c, w_ca, eng_a),
        )
        history.append(applied)
        if applied == ([], [], []):
            break
    assert history[-1] == ([], [], [])
    assert len(history) < 12  # drained, not capped

    states = [
        {r["path"]: r["content"] for r in s.read_state(spark).collect()}
        for s in (a, b, c)
    ]
    assert states[0] == states[1] == states[2] == {
        "k.py": "K-from-C",  # newest origin stamp wins over two wire hops
        "a.py": "A-local", "b.py": "B-local", "c.py": "C-local",
    }


def test_corrupted_wire_line_quarantines_to_dlq(spark, tmp_path):
    """Wire durability meets errors.tolerance: a corrupted JSON line in a
    wire file (torn copy, bit rot) parses to null key fields under the
    explicit read schema; with dlq_dir set the malformed split
    quarantines it and applies the REST of the file — the merge is never
    poisoned and nothing is silently dropped."""
    import json as _json

    src, eng, batches = _mk_upstream(spark, tmp_path)
    wire = str(tmp_path / "wire")
    eng.apply_batch(spark.createDataFrame(batches[0], CHANGELOG_SCHEMA), 0)
    export_changefeed_json(spark, src, wire)

    # corrupt one line: valid JSON, but key fields unparseable -> null
    wf = os.path.join(wire, "changes_0000000001.json")
    lines = open(wf).read().splitlines()
    doc = _json.loads(lines[0])
    doc["lsn"] = "not-a-number"
    doc["op"] = None
    lines[0] = _json.dumps(doc)
    with open(wf, "w") as f:
        f.write("\n".join(lines) + "\n")

    dst = TableStore(str(tmp_path / "B"), n_buckets=4)
    dlq = str(tmp_path / "dlq")
    remote = CdcApplyEngine(dst, EngineConfig(metrics=False, dlq_dir=dlq))
    q = remote.start_stream(spark, wire, str(tmp_path / "cp"),
                            wire_read_schema(wire), source_format="json")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()

    good = _state(spark, src)
    got = _state(spark, dst)
    assert len(got) == len(good) - 1          # one row quarantined
    assert set(got) < set(good)
    n_dlq = spark.read.option("recursiveFileLookup", "true").parquet(
        dlq).count()
    assert n_dlq == 1


def test_wire_exporter_pins_retention_against_vacuum(spark, tmp_path):
    """The exporter registers as a changefeed consumer on the source, so
    a lagging wire export pins the versions it still needs: aggressive
    vacuum retains them, the next export catches up incrementally (no
    FileNotFoundError, no gap on the wire), and once caught up the pin
    advances and vacuum expires the old versions."""
    src, eng, batches = _mk_upstream(spark, tmp_path)
    wire = str(tmp_path / "wire")

    eng.apply_batch(spark.createDataFrame(batches[0], CHANGELOG_SCHEMA), 0)
    assert export_changefeed_json(spark, src, wire)["files"] == 1
    consumer = f"wire-export:{os.path.abspath(wire)}"
    assert src.consumers()[consumer] == 1

    # source races ahead two versions; aggressive vacuum would keep only
    # the head — the exporter's floor pins v1..head
    for e, b in enumerate(batches[1:], start=1):
        eng.apply_batch(spark.createDataFrame(b, CHANGELOG_SCHEMA), e)
    report = src.vacuum(keep_versions=1)
    assert report["removed_manifests"] == 0

    out = export_changefeed_json(spark, src, wire)
    assert out["status"] == "exported" and out["to"] == 3
    files = sorted(f for f in os.listdir(wire) if f.startswith("changes_"))
    assert files == [f"changes_{v:010d}.json" for v in (1, 2, 3)]
    assert src.consumers()[consumer] == 3

    # pin advanced: vacuum can now expire below the window
    src.vacuum(keep_versions=1)
    # and a fresh remote replaying the complete wire still converges
    dst = TableStore(str(tmp_path / "B"), n_buckets=4)
    remote = CdcApplyEngine(dst, EngineConfig(metrics=False))
    q = remote.start_stream(spark, wire, str(tmp_path / "cp"),
                            wire_read_schema(wire), source_format="json")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    assert _state(spark, dst) == _state(spark, src)


def test_wire_multi_file_version_is_deterministic_and_converges(spark, tmp_path):
    """files_per_version > 1: a version exports as K parallel slices with
    deterministic (content-hashed) row->file assignment — a crash
    re-export reproduces identical slices, and a remote that consumed a
    MIX of old and re-exported slices still converges (no row lost to a
    reshuffled slice boundary)."""
    src, eng, batches = _mk_upstream(spark, tmp_path)
    wire = str(tmp_path / "wire")
    eng.apply_batch(spark.createDataFrame(batches[0], CHANGELOG_SCHEMA), 0)
    out = export_changefeed_json(spark, src, wire, n_partitions=8,
                                 files_per_version=3)
    # empty hash slices write no part file, so the count is content-
    # dependent but <= K and DETERMINISTIC given the content
    assert 1 <= out["files"] <= 3
    files = sorted(f for f in os.listdir(wire) if f.startswith("changes_"))
    assert files == [f"changes_{1:010d}_{i:04d}.json"
                     for i in range(out["files"])]

    # crash window: cursor lost, full re-export — slices must reproduce
    os.remove(os.path.join(wire, "_cursor.json"))
    export_changefeed_json(spark, src, wire, n_partitions=8,
                           files_per_version=3)
    refiles = sorted(f for f in os.listdir(wire) if f.startswith("changes_"))
    assert refiles == files  # identical name set on re-export
    # ts_ms is export-time wall clock, so compare content minus ts_ms
    def strip(f):
        import json as _json
        rows = []
        for line in open(os.path.join(wire, f)):
            d = _json.loads(line)
            d.pop("ts_ms", None)
            rows.append(_json.dumps(d, sort_keys=True))
        return sorted(rows)

    # deterministic assignment: every slice holds the same row SET
    # (modulo the wall-clock stamp) across exports
    re_rows = {f: strip(f) for f in files}
    assert sum(len(v) for v in re_rows.values()) == 24
    assert all(len(set(v)) == len(v) for v in re_rows.values())

    dst = TableStore(str(tmp_path / "B"), n_buckets=4)
    remote = CdcApplyEngine(dst, EngineConfig(metrics=False))
    q = remote.start_stream(spark, wire, str(tmp_path / "cp"),
                            wire_read_schema(wire), source_format="json")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    assert _state(spark, dst) == _state(spark, src)


def test_forget_propagates_across_the_wire_as_key_only_deletes(
    spark, tmp_path
):
    """Takedown ACROSS the wire: the remote consumed through v1, the
    source then commits more versions AND forget_keys one of them — the
    scrub erases the key's diff evidence from every retained version, so
    the lagging remote's catch-up range would show NOTHING for the key
    without the markers. The export must carry the key-only delete
    markers in the envelope, the remote must converge to physical absence
    in its live state, and no wire line may leak the forgotten payload."""
    src, eng, batches = _mk_upstream(spark, tmp_path)
    wire = str(tmp_path / "wire")

    # v1 on the wire, remote applies it (key "7" is live at the remote)
    eng.apply_batch(spark.createDataFrame(batches[0], CHANGELOG_SCHEMA), 0)
    export_changefeed_json(spark, src, wire)
    dst = TableStore(str(tmp_path / "B"), n_buckets=4)
    remote = CdcApplyEngine(dst, EngineConfig(metrics=False))
    cp = str(tmp_path / "cp")
    q = remote.start_stream(spark, wire, cp, wire_read_schema(wire),
                            source_format="json")
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    assert ("r", "7") in _state(spark, dst)

    # source moves on (v2, v3) WITHOUT exporting, then forgets key "7":
    # head delete commit (v4) + history scrub + key-only markers
    for e, b in enumerate(batches[1:], start=1):
        eng.apply_batch(spark.createDataFrame(b, CHANGELOG_SCHEMA), e)
    out = src.forget_keys(spark, keys=[("r", "7")])
    assert out["rows_removed"] >= 1
    v_head = src.current_version()

    # catch-up export crosses the redaction; the wire must never carry
    # the forgotten content, only the key
    export_changefeed_json(spark, src, wire)
    leaked = []
    for f in sorted(os.listdir(wire)):
        if not f.startswith("changes_"):
            continue
        with open(os.path.join(wire, f)) as fh:
            for line in fh:
                if '"v1-7"' in line or '"v2-7"' in line:
                    leaked.append((f, line[:200]))
    # v1's file was exported BEFORE the forget and already consumed; the
    # compliance duty for already-shipped wire files is the wire owner's
    # retention (like Kafka topic retention) — but the POST-forget files
    # must be clean
    post = [
        f for f in sorted(os.listdir(wire))
        if f.startswith("changes_") and int(f.split("_")[1].split(".")[0]) > 1
    ]
    assert post, "catch-up export produced no files"
    assert not [x for x in leaked if x[0] in post], leaked

    # remote tails through the scrubbed range and converges: key gone
    # from live state, everything else matches the source exactly
    q = remote.start_stream(spark, wire, cp, wire_read_schema(wire),
                            source_format="json")
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    got = _state(spark, dst)
    assert ("r", "7") not in got
    assert got == _state(spark, src)
    del v_head
