"""Per-operator unit tests on tiny deterministic frames (SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kp_data_replication_spark.operators.asof import (
    translate_offsets,
    translate_offsets_window,
)
from kp_data_replication_spark.operators.compact import (
    last_write_wins,
    last_write_wins_window,
)
from kp_data_replication_spark.operators.dedup_cdc import (
    applied_watermarks,
    filter_applied,
    gap_audit,
)
from kp_data_replication_spark.operators.filters import (
    cluster_prefix,
    fan_in_union,
    select_topics,
    topic_blacklist,
    topic_whitelist,
)
from kp_data_replication_spark.operators.merge import merge_upsert
from kp_data_replication_spark.operators.metrics import latency_stats, record_count
from kp_data_replication_spark.operators.skew import gap_audit_salted


# ---------------------------------------------------------------- filters
def _topics(spark):
    return spark.createDataFrame(
        [("repos",), ("orders",), ("mm2-configs.source.internal",), ("__consumer_offsets",)],
        "source_topic string",
    )


def test_topic_whitelist(spark):
    got = topic_whitelist(_topics(spark), "^(repos|orders)$").collect()
    assert sorted(r.source_topic for r in got) == ["orders", "repos"]


def test_topic_blacklist_default(spark):
    got = topic_blacklist(_topics(spark)).collect()
    assert sorted(r.source_topic for r in got) == ["orders", "repos"]


def test_select_topics_combined(spark):
    got = select_topics(_topics(spark), whitelist="^repos").collect()
    assert [r.source_topic for r in got] == ["repos"]


def test_cluster_prefix(spark):
    # DefaultReplicationPolicy rename: kp-remote.kp-topic-1
    got = cluster_prefix(_topics(spark), "kp-remote").collect()
    assert ("kp-remote.repos", "repos") in {(r.target_topic, r.source_topic) for r in got}


def test_fan_in_union_allows_schema_drift(spark):
    a = spark.createDataFrame([("r1", 1)], "repo string, x int")
    b = spark.createDataFrame([("r2", "extra")], "repo string, y string")
    got = fan_in_union([a, b])
    assert set(got.columns) == {"repo", "x", "y"}
    assert got.count() == 2


# ---------------------------------------------------------------- compact
def _events(spark):
    rows = [
        # (repo, path, lsn, op, commit)
        ("r1", "a", 0, "c", "c0"),
        ("r1", "a", 5, "u", "c1"),
        ("r1", "a", 9, "u", "c2"),
        ("r1", "b", 1, "c", "c0"),
        ("r2", "a", 2, "c", "c0"),
        ("r2", "a", 7, "d", None),
    ]
    return spark.createDataFrame(rows, "repo string, path string, lsn long, op string, commit string")


def test_last_write_wins_agg(spark):
    got = {(r.repo, r.path): (r.lsn, r.op) for r in last_write_wins(_events(spark)).collect()}
    assert got == {("r1", "a"): (9, "u"), ("r1", "b"): (1, "c"), ("r2", "a"): (7, "d")}


def test_last_write_wins_window_parity(spark):
    df = _events(spark)
    a = {tuple(r) for r in last_write_wins(df).collect()}
    b = {tuple(r) for r in last_write_wins_window(df).collect()}
    assert a == b


# ---------------------------------------------------------------- dedup / lineage
def test_filter_applied_watermark(spark):
    events = spark.createDataFrame(
        [(0, 5), (0, 6), (1, 2), (2, 0)], "partition int, lsn long"
    )
    lineage = spark.createDataFrame(
        [(0, 5, 1, 6, None)],
        "partition int, applied_lsn long, epoch long, n_applied long, updated_ts timestamp",
    )
    got = {(r.partition, r.lsn) for r in filter_applied(events, lineage).collect()}
    assert got == {(0, 6), (1, 2), (2, 0)}  # (0,5) already applied


def test_applied_watermarks(spark):
    events = spark.createDataFrame([(0, 5), (0, 9), (1, 2)], "partition int, lsn long")
    got = {(r.partition, r.applied_lsn, r.n_applied) for r in applied_watermarks(events).collect()}
    assert got == {(0, 9, 2), (1, 2, 1)}


def test_gap_audit_finds_divergence(spark):
    events = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2), (0, 5), (1, 0), (1, 1)], "partition int, lsn long"
    )
    got = gap_audit(events).collect()
    assert len(got) == 1 and (got[0].partition, got[0].prev_lsn, got[0].lsn, got[0].gap) == (0, 2, 5, 3)


def test_gap_audit_salted_parity(spark):
    rows = [(p, l) for p in range(3) for l in range(40) if (p, l) not in {(0, 7), (1, 21), (1, 22)}]
    events = spark.createDataFrame(rows, "partition int, lsn long")
    naive = {(r.partition, r.prev_lsn, r.lsn) for r in gap_audit(events).collect()}
    salted = {(r.partition, r.prev_lsn, r.lsn) for r in gap_audit_salted(events, chunk=10).collect()}
    assert naive == salted and len(naive) == 2


# ---------------------------------------------------------------- as-of join
def _sync_tables(spark):
    # offset 3 at the source maps to 12 at the target (docs/consideration.md:39-48)
    syncs = spark.createDataFrame(
        [(0, 0, 9), (0, 20, 17), (1, 0, 0)],
        "partition int, sync_src_offset long, sync_tgt_offset long",
    )
    commits = spark.createDataFrame(
        [("g1", 0, 3), ("g1", 0, 25), ("g1", 1, 4), ("g2", 0, 20)],
        "group string, partition int, src_offset long",
    )
    return commits, syncs


def test_translate_offsets(spark):
    commits, syncs = _sync_tables(spark)
    got = {(r.group, r.partition, r.src_offset): r.tgt_offset
           for r in translate_offsets(commits, syncs).collect()}
    assert got == {("g1", 0, 3): 12, ("g1", 0, 25): 22, ("g1", 1, 4): 4, ("g2", 0, 20): 17}


def test_translate_offsets_window_parity(spark):
    commits, syncs = _sync_tables(spark)
    a = {tuple(r) for r in translate_offsets(commits, syncs).collect()}
    b = {tuple(r) for r in translate_offsets_window(commits, syncs).collect()}
    assert a == b


def test_translate_offsets_auto_dense_uses_window_no_blowup(spark):
    """Dense syncs (a sync per divergence on a flappy flow): the auto
    dispatcher must take the window path — its plan contains NO join, so
    the (commit x qualifying sync) candidate explosion cannot happen —
    and the result must equal the join form's."""
    from pyspark.sql import functions as F

    from kp_data_replication_spark.operators.asof import translate_offsets_auto

    # 20k sync points on one partition; commits near the tail would each
    # match ~20k candidates in the range join
    syncs = spark.range(20_000).select(
        F.lit(0).alias("partition"),
        (F.col("id") * 2).alias("sync_src_offset"),
        (F.col("id") * 2 + 7).alias("sync_tgt_offset"),
    )
    commits = spark.createDataFrame(
        [("g", 0, 39_999), ("g", 0, 11), ("g", 0, 0)],
        "group string, partition int, src_offset long",
    )
    auto = translate_offsets_auto(commits, syncs, dense_sync_threshold=10_000)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    got = {r.src_offset: r.tgt_offset for r in auto.collect()}
    exp = {r.src_offset: r.tgt_offset for r in translate_offsets(commits, syncs).collect()}
    assert got == exp == {39_999: 40_006, 11: 18, 0: 7}

    # sparse syncs keep the broadcast range join
    commits2, syncs2 = _sync_tables(spark)
    sparse = translate_offsets_auto(commits2, syncs2, dense_sync_threshold=10_000)
    assert "Join" in sparse._jdf.queryExecution().executedPlan().toString()


def test_translate_offsets_no_preceding_sync_surfaces_null(spark):
    """A commit before the first sync point is untranslatable — it must
    surface with a null target offset, not disappear (both variants)."""
    syncs = spark.createDataFrame(
        [(0, 10, 9)], "partition int, sync_src_offset long, sync_tgt_offset long"
    )
    commits = spark.createDataFrame(
        [("g", 0, 5), ("g", 0, 15)], "group string, partition int, src_offset long"
    )
    for fn in (translate_offsets, translate_offsets_window):
        got = {(r.src_offset): r.tgt_offset for r in fn(commits, syncs).collect()}
        assert got == {5: None, 15: 14}, fn.__name__


# ---------------------------------------------------------------- merge
def test_merge_upsert_insert_update_delete(spark):
    target = spark.createDataFrame(
        [("r1", "a", "old", "py"), ("r1", "b", "keep", "md")],
        "repo string, path string, commit string, lang string",
    )
    batch = spark.createDataFrame(
        [("r1", "a", "u", "new", "py"), ("r1", "b", "d", None, None), ("r2", "c", "c", "ins", "go")],
        "repo string, path string, op string, commit string, lang string",
    )
    got = {(r.repo, r.path): (r.commit, r.lang) for r in merge_upsert(target, batch).collect()}
    assert got == {("r1", "a"): ("new", "py"), ("r2", "c"): ("ins", "go")}


def test_merge_schema_evolution_null_pads_target(spark):
    target = spark.createDataFrame([("r1", "a", "c0")], "repo string, path string, commit string")
    batch = spark.createDataFrame(
        [("r2", "b", "c", "c1", 5)], "repo string, path string, op string, commit string, stars int"
    )
    got = {(r.repo, r.path): (r.commit, r.stars) for r in merge_upsert(target, batch).collect()}
    assert got == {("r1", "a"): ("c0", None), ("r2", "b"): ("c1", 5)}


def test_merge_full_image_semantics(spark):
    """An update whose image lacks an evolved column nulls it (full-image)."""
    target = spark.createDataFrame([("r1", "a", "c0", 7)], "repo string, path string, commit string, stars int")
    batch = spark.createDataFrame([("r1", "a", "u", "c1")], "repo string, path string, op string, commit string")
    got = merge_upsert(target, batch).collect()
    assert len(got) == 1 and got[0].commit == "c1" and got[0].stars is None


# ---------------------------------------------------------------- metrics
def test_record_count(spark):
    df = spark.range(500)
    assert record_count(df).collect()[0].n_records == 500  # docs/perf-tests.md:92


def test_latency_stats_percentiles(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "latency_ms double")
    row = latency_stats(df).collect()[0]
    assert row.n == 100 and row.min_ms == 1.0 and row.max_ms == 100.0
    assert abs(row.p50_ms - 50.5) < 1e-9 and abs(row.avg_ms - 50.5) < 1e-9


def test_sessionize_gap_semantics(spark):
    """Gap-based sessions: a 30-min+ gap starts a new session; equal
    timestamps break ties by event_id; stats are per (user, session)."""
    from datetime import datetime

    from kp_data_replication_spark.operators.sessions import (
        session_stats,
        sessionize,
    )

    t = lambda m, s=0: datetime(2024, 1, 1, 0, m, s)  # noqa: E731
    rows = [
        # user 1: 3 events tight, then a 40-min gap, then 1 event
        (0, t(0), 1, "a", 1.0),
        (1, t(5), 1, "b", 2.0),
        (2, t(10), 1, "a", 3.0),
        (3, t(50), 1, "c", 4.0),
        # user 2: 29:59 gap is NOT a new session; exactly 30 min IS
        # (diff >= gap — the session_window boundary rule)
        (4, t(0), 2, "a", 1.0),
        (5, t(29, 59), 2, "a", 1.0),
        (6, t(59, 59), 2, "a", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double"
    )
    lab = {(r.user_id, r.event_id): r.session_id
           for r in sessionize(df, 30).collect()}
    assert lab[(1, 0)] == lab[(1, 1)] == lab[(1, 2)] == 1
    assert lab[(1, 3)] == 2
    assert lab[(2, 4)] == lab[(2, 5)] == 1  # 29:59: same session
    assert lab[(2, 6)] == 2                 # exactly 30:00 later: new

    stats = {(r.user_id, r.session_id): r for r in session_stats(df, 30).collect()}
    s11 = stats[(1, 1)]
    assert s11.n_events == 3 and s11.n_event_types == 2
    assert s11.total_value == 6.0
    assert s11.duration_us == 10 * 60 * 1_000_000


def test_session_stream_matches_batch_for_closed_sessions(spark, tmp_path):
    """The streaming sessionizer (session_window + watermark, append mode)
    emits each finalized session exactly once, with the SAME stats the
    batch twin computes; a watermark-advancing sentinel in a later trigger
    flushes the real sessions."""
    import glob
    import shutil
    from datetime import datetime, timedelta

    from kp_data_replication_spark.operators.sessions import (
        session_stats,
        session_stream,
    )

    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for u in range(3):
        t = base + timedelta(minutes=u * 3)
        for s in range(2):                      # 2 sessions per user
            for k in range(3 + u):              # 3..5 events per session
                rows.append((eid, t, u, f"e{k % 2}", float(k + 1)))
                eid += 1
                t += timedelta(minutes=7, seconds=13)
            t += timedelta(minutes=45)          # gap > 30min: next session
    schema = ("event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double")
    ev_dir = tmp_path / "ev"
    ev_dir.mkdir()

    def put(name, data):
        tmp = str(tmp_path / ("_w_" + name))
        spark.createDataFrame(data, schema).coalesce(1).write.mode(
            "overwrite").parquet(tmp)
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0],
                    str(ev_dir / (name + ".parquet")))

    put("f0", rows)
    # sentinel 10 days later: advances the watermark past every real
    # session on the SECOND trigger so append mode finalizes them
    put("f1", [(9999, base + timedelta(days=10), 99, "e0", 0.0)])

    q = (
        session_stream(spark, str(ev_dir), spark.createDataFrame([], schema).schema,
                       max_files_per_trigger=1)
        .writeStream.format("memory").queryName("sess")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start): (r.n_events, r.n_event_types,
                                       r.total_value, r.session_end)
        for r in spark.sql("select * from sess").collect()
        if r.user_id != 99
    }
    batch = spark.createDataFrame(rows, schema)
    exp = {
        (r.user_id, r.session_start): (r.n_events, r.n_event_types,
                                       r.total_value, r.session_end)
        for r in session_stats(batch, 30).collect()
    }
    assert got == exp and len(got) == 6


def test_funnel_ordered_semantics(spark):
    """Each step must be STRICTLY AFTER the previous one: out-of-order
    completions don't count; re-occurrences pick the first qualifying
    time; depth counts contiguous completed steps."""
    from datetime import datetime

    from kp_data_replication_spark.operators.sessions import funnel

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: full ordered funnel a->b->c
        (0, t(0), 1, "a", 0.0), (1, t(1), 1, "b", 0.0), (2, t(2), 1, "c", 0.0),
        # user 2: b BEFORE a -> only reaches step 1 (needs b after a)
        (3, t(0), 2, "b", 0.0), (4, t(1), 2, "a", 0.0),
        # user 3: a, then c, then b, then c-again -> reaches 3 via the
        # SECOND c (first qualifying after b)
        (5, t(0), 3, "a", 0.0), (6, t(1), 3, "c", 0.0),
        (7, t(2), 3, "b", 0.0), (8, t(3), 3, "c", 0.0),
        # user 4: never starts
        (9, t(0), 4, "x", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double")
    got = {r.step: r.n_users for r in funnel(df, ["a", "b", "c"]).collect()}
    assert got == {1: 3, 2: 2, 3: 2}


def test_retention_cohorts_triangle(spark):
    """Users bucket by first active week; returning users count in their
    offset week; a user active twice in one week counts once."""
    from datetime import datetime, timedelta

    from kp_data_replication_spark.operators.sessions import retention_cohorts

    w0 = datetime(2024, 1, 4)  # inside some epoch week W
    rows = [
        # u1: weeks W, W+1, W+2 ; u2: W only (twice) ; u3: W+1, W+3
        (0, w0, 1, "a", 0.0),
        (1, w0 + timedelta(days=7), 1, "a", 0.0),
        (2, w0 + timedelta(days=14), 1, "a", 0.0),
        (3, w0, 2, "a", 0.0),
        (4, w0 + timedelta(hours=2), 2, "a", 0.0),
        (5, w0 + timedelta(days=7), 3, "a", 0.0),
        (6, w0 + timedelta(days=21), 3, "a", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double")
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in retention_cohorts(df).collect()}
    weeks = sorted({k[0] for k in got})
    wA = weeks[0]          # u1+u2's cohort
    wB = wA + 1            # u3's cohort
    assert got[(wA, 0)] == 2      # u1, u2 (u2's two events count once)
    assert got[(wA, 1)] == 1      # u1 returned
    assert got[(wA, 2)] == 1      # u1 returned
    assert got[(wB, 0)] == 1      # u3
    assert got[(wB, 2)] == 1      # u3 at W+3 = offset 2 from its cohort
    assert (wA, 3) not in got


def test_two_phase_sessionize_equals_direct(spark):
    """The hot-user scale path (local sessions per (user, slice) + session
    stitch) equals the direct sessionizer EXACTLY — including sessions
    crossing one or several slice boundaries, boundary-adjacent events,
    and per-user session numbering."""
    from datetime import datetime, timedelta

    from kp_data_replication_spark.operators.sessions import (
        session_stats,
        session_stats_scalable,
    )

    base = datetime(2024, 1, 1)
    rows, eid = [], 0
    # user 1: one long session of events every 20 min for 5 hours —
    # crosses FOUR 1-hour slices and must stitch back into ONE session
    t = base
    for _ in range(16):
        rows.append((eid, t, 1, f"e{eid % 3}", 1.5)); eid += 1
        t += timedelta(minutes=20)
    # user 2: sessions separated by exactly the gap at a slice boundary
    rows.append((eid, base + timedelta(minutes=55), 2, "a", 2.0)); eid += 1
    rows.append((eid, base + timedelta(minutes=85), 2, "b", 3.0)); eid += 1
    # user 3: single event
    rows.append((eid, base + timedelta(hours=9), 3, "a", 1.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double")

    def canon(res):
        return sorted(
            (r.user_id, r.session_id, r.session_start, r.session_end,
             r.n_events, r.n_event_types, r.total_value, r.duration_us)
            for r in res.collect()
        )

    direct = canon(session_stats(df, 30))
    twophase = canon(session_stats_scalable(df, 30, slice_minutes=60))
    assert twophase == direct
    # the long session really did cross slices and stitch to one row
    u1 = [r for r in direct if r[0] == 1]
    assert len(u1) == 1 and u1[0][4] == 16
    # exactly-gap pair split into two sessions in both forms
    assert len([r for r in direct if r[0] == 2]) == 2

    with __import__("pytest").raises(ValueError, match="slice"):
        session_stats_scalable(df, 30, slice_minutes=10)
