"""Manifest zonemaps (file-level column stats) + predicate-pruned scans.

The Iceberg manifest lower_bounds/upper_bounds + SORT ORDER split-planning
analogue (reference parity: the store IS the engine's Iceberg stand-in —
SURVEY.md §2.1 S6-S8): commit/rewrite harvest per-file [min,max,nulls]
from parquet footers into the manifest; ``read_state(where=...)`` skips
whole files whose bounds cannot satisfy a conjunct, and
``rewrite_buckets(cluster_by=...)`` makes the bounds tight. The invariant
under test everywhere: pruned scan == unpruned scan + filter, EXACTLY.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from kp_data_replication_spark.schema import ROW_SCHEMA
from kp_data_replication_spark.sources.table_store import (
    BUCKET_COL,
    TableStore,
    _file_may_match,
    _string_upper_bound,
    bucket_expr,
    where_column,
)

LANGS = ["python", "go", "rust", "java"]


def _corpus(spark, n=400):
    return spark.range(n).select(
        F.lit("corpus").alias("repo"),
        F.col("id").cast("string").alias("path"),
        F.lit("c0").alias("commit"),
        F.element_at(
            F.array(*[F.lit(lang) for lang in LANGS]),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("x" * 200), F.col("id").cast("string")).alias(
            "content"
        ),
    )


def _store(spark, n=400, n_buckets=4):
    store = TableStore(tempfile.mkdtemp(prefix="zonemap_"), n_buckets=n_buckets)
    store.commit(
        _corpus(spark, n).withColumn(BUCKET_COL, bucket_expr(n_buckets)),
        list(range(n_buckets)),
        [],
        epoch=1,
        row_schema=ROW_SCHEMA,
    )
    return store


def _rows(df):
    return sorted((r["repo"], r["path"]) for r in df.collect())


def test_commit_harvests_stats_into_manifest(spark):
    store = _store(spark)
    m = store.current_manifest()
    stats = m.get("stats")
    assert stats and set(stats) == {
        p for fs in m["buckets"].values() for p in fs
    }
    ent = next(iter(stats.values()))
    assert ent["rows"] > 0
    # every atomic ROW_SCHEMA column has bounds; nulls counted
    for col in ("repo", "path", "commit", "lang", "content"):
        lo, hi, nulls = ent["cols"][col]
        assert lo is not None and nulls == 0
    assert ent["cols"]["repo"] == ["corpus", "corpus", 0]
    # long strings are truncated to a valid bound, not stored whole
    lo, hi, _ = ent["cols"]["content"]
    assert len(lo) <= 64 and (hi is None or len(hi) <= 64)
    assert lo.startswith("x" * 60)


def test_clustered_rewrite_prunes_and_scan_is_exact(spark):
    store = _store(spark)
    store.rewrite_buckets(spark, min_files=0, cluster_by=["lang"], split_files=4)
    rep = store.prune_report([("lang", "=", "python")])
    # the point of cluster_by: most files are skippable for a lang filter
    assert rep["files_selected"] <= rep["files_total"] // 2
    assert rep["rows_skipped_max"] >= 200
    pruned = store.read_state(spark, where=[("lang", "=", "python")])
    full = store.read_state(spark).filter(F.col("lang") == "python")
    assert _rows(pruned) == _rows(full) and pruned.count() == 100


@pytest.mark.parametrize(
    "where",
    [
        [("lang", "=", "go")],
        [("path", "<", "2")],
        [("path", ">=", "95")],
        [("path", "prefix", "17")],
        [("lang", ">", "python")],
        [("lang", "<=", "go"), ("path", "prefix", "3")],
        [("lang", "=", "cobol")],  # empty result, likely all files pruned
    ],
)
def test_where_matches_plain_filter(spark, where):
    store = _store(spark)
    store.rewrite_buckets(
        spark, min_files=0, cluster_by=["lang", "path"], split_files=3
    )
    got = store.read_state(spark, where=where)
    exp = store.read_state(spark).filter(where_column(where))
    assert _rows(got) == _rows(exp)


def test_unclustered_buckets_prune_nothing_but_stay_exact(spark):
    # key-hash bucket files span the whole lang domain: zonemaps are wide,
    # pruning is a no-op — correctness must not depend on it firing
    store = _store(spark)
    rep = store.prune_report([("lang", "=", "go")])
    assert rep["files_selected"] == rep["files_total"]
    got = store.read_state(spark, where=[("lang", "=", "go")])
    assert got.count() == 100


def test_pruning_skips_nothing_without_stats(spark):
    store = TableStore(tempfile.mkdtemp(prefix="nostats_"), n_buckets=4)
    store.collect_stats = False
    store.commit(
        _corpus(spark).withColumn(BUCKET_COL, bucket_expr(4)),
        [0, 1, 2, 3],
        [],
        epoch=1,
        row_schema=ROW_SCHEMA,
    )
    assert "stats" not in store.current_manifest()
    rep = store.prune_report([("lang", "=", "python")])
    assert rep["files_selected"] == rep["files_total"] > 0
    assert store.read_state(spark, where=[("lang", "=", "python")]).count() == 100


def test_mor_layers_are_never_pruned_and_resolve_first(spark):
    """Skipping a delta layer could skip the delete/update that beats an
    older surviving row — layered buckets scan fully, filter after
    last-layer-wins resolution."""
    from kp_data_replication_spark.schema import MOR_DELETED_COL, MOR_V_COL

    store = _store(spark)
    # delta layer: retract every python row (tombstones) — as a MoR commit
    batch = (
        _corpus(spark)
        .filter(F.col("lang") == "python")
        .withColumn(BUCKET_COL, bucket_expr(4))
        .withColumn(MOR_V_COL, F.lit(2).cast("long"))
        .withColumn(MOR_DELETED_COL, F.lit(True))
    )
    store.commit(
        batch, [0, 1, 2, 3], [], epoch=2, row_schema=ROW_SCHEMA, mor=True
    )
    rep = store.prune_report([("lang", "=", "python")])
    assert rep["mor_files"] > 0 and rep["files_total"] == 0
    got = store.read_state(spark, where=[("lang", "=", "python")])
    assert got.count() == 0  # the layer's tombstones won
    assert store.read_state(spark, where=[("lang", "=", "go")]).count() == 100


def test_stats_survive_rebucket_and_clone(spark):
    store = _store(spark)
    store.rebucket(spark, 8)
    m = store.current_manifest()
    assert set(m["stats"]) == {p for fs in m["buckets"].values() for p in fs}
    clone = store.clone(tempfile.mkdtemp(prefix="zclone_") + "/t")
    cm = clone.current_manifest()
    assert set(cm["stats"]) == {
        p for fs in cm["buckets"].values() for p in fs
    }
    assert (
        clone.read_state(spark, where=[("lang", "=", "rust")]).count() == 100
    )


def test_string_upper_bound_algebra():
    assert _string_upper_bound("abc") == "abd"
    assert _string_upper_bound("ab" + chr(0x10FFFF)) == "ac"
    assert _string_upper_bound(chr(0x10FFFF) * 3) is None
    # the truncated-max contract: bound > every string with the prefix
    s = "q" * 100
    from kp_data_replication_spark.sources.table_store import _bound_pair

    lo, hi = _bound_pair(s, s)
    assert lo == "q" * 64 and hi == "q" * 63 + "r"
    assert lo <= s <= hi


def test_file_may_match_bounds_algebra():
    st = {"rows": 10, "cols": {"lang": ["go", "python", 0]}}
    assert _file_may_match(st, [("lang", "=", "java")])
    assert not _file_may_match(st, [("lang", "=", "rust")])
    assert not _file_may_match(st, [("lang", "<", "go")])
    assert _file_may_match(st, [("lang", "<=", "go")])
    assert not _file_may_match(st, [("lang", ">", "python")])
    assert _file_may_match(st, [("lang", "prefix", "py")])
    assert not _file_may_match(st, [("lang", "prefix", "z")])
    # unknown column / absent stats: conservative keep
    assert _file_may_match(st, [("other", "=", 1)])
    assert _file_may_match(None, [("lang", "=", "zzz")])
    # all-null column is a provable miss for null-rejecting ops
    assert not _file_may_match(
        {"rows": 10, "cols": {"lang": [None, None, 10]}},
        [("lang", "=", "go")],
    )
    # type confusion keeps the file rather than guessing
    assert _file_may_match(st, [("lang", "=", 7)])
