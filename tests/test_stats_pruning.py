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


def test_zorder_prunes_on_second_cluster_column(spark):
    """The Delta OPTIMIZE ZORDER BY analogue: linear lexicographic
    clustering on (lang, path) leaves path spanning its whole domain
    inside every lang slice, so a path-only predicate prunes (almost)
    nothing; z-order interleaving makes each file a tight
    hyper-rectangle so the SAME predicate skips files — and the scan
    stays row-exact on every dimension."""
    where = [("path", "prefix", "1")]  # second cluster column only
    lin = _store(spark)
    lin.rewrite_buckets(
        spark, min_files=0, cluster_by=["lang", "path"], split_files=4
    )
    rep_lin = lin.prune_report(where)
    z = _store(spark)
    z.rewrite_buckets(
        spark,
        min_files=0,
        cluster_by=["lang", "path"],
        split_files=4,
        cluster_strategy="zorder",
    )
    rep_z = z.prune_report(where)
    assert 0 < rep_z["files_selected"] < rep_z["files_total"]
    assert rep_z["files_selected"] < rep_lin["files_selected"]
    # leading-column pruning still fires under zorder
    rep_lang = z.prune_report([("lang", "=", "python")])
    assert rep_lang["files_selected"] < rep_lang["files_total"]
    # exactness on any predicate mix, pruned or not
    for w in (
        where,
        [("lang", "=", "go")],
        [("lang", "=", "rust"), ("path", "prefix", "2")],
    ):
        got = z.read_state(spark, where=w)
        exp = z.read_state(spark).filter(where_column(w))
        assert _rows(got) == _rows(exp)


def test_zorder_requires_multiple_cluster_columns(spark):
    store = _store(spark, n=40)
    with pytest.raises(ValueError, match="zorder"):
        store.rewrite_buckets(
            spark,
            min_files=0,
            cluster_by=["lang"],
            cluster_strategy="zorder",
        )
    with pytest.raises(ValueError, match="cluster_strategy"):
        store.rewrite_buckets(spark, min_files=0, cluster_strategy="hilbert")


def test_z_boundaries_and_interleave_algebra(spark):
    from kp_data_replication_spark.sources.table_store import (
        _z_boundaries,
        _z_cell,
        _zvalue,
    )

    # equal-height cuts, deduped, ascending; nulls dropped
    cuts = _z_boundaries([5, 1, 3, None, 3, 9, 7], 4)
    assert cuts == sorted(set(cuts)) and len(cuts) <= 3
    assert _z_boundaries([], 8) == []
    assert _z_boundaries([2] * 50, 8) == [2]
    # interleave: bit i of column j lands at z bit i*n + j
    df = spark.range(1).select(
        _zvalue([F.lit(0b11).cast("int"), F.lit(0b01).cast("int")]).alias(
            "z"
        ),
        _z_cell(F.lit(None).cast("int"), [1, 2, 3]).alias("null_cell"),
    )
    row = df.collect()[0]
    # col0 bits {0,1} -> z bits {0,2}; col1 bit {0} -> z bit {1}
    assert row["z"] == 0b111
    assert row["null_cell"] == 0  # nulls cluster at the low edge


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


# ---------- per-file bloom filters (point-predicate skipping) ----------


def _bloom_store(spark, n=400, n_buckets=4):
    """Hash-bucketed layout: every file spans ~the whole path domain, so
    zonemaps are USELESS for a path point probe — the bloom's exact job."""
    store = TableStore(
        tempfile.mkdtemp(prefix="bloom_"), n_buckets=n_buckets,
        bloom_cols=["path"],
    )
    store.commit(
        _corpus(spark, n).withColumn(BUCKET_COL, bucket_expr(n_buckets)),
        list(range(n_buckets)),
        [],
        epoch=1,
        row_schema=ROW_SCHEMA,
    )
    return store


def test_bloom_harvested_into_manifest(spark):
    store = _bloom_store(spark)
    stats = store.current_manifest()["stats"]
    for ent in stats.values():
        assert "bloom" in ent and "path" in ent["bloom"]
        assert int(ent["bloom"]["path"], 16) != 0


def test_bloom_prunes_point_probe_where_zonemaps_cannot(spark):
    store = _bloom_store(spark)
    where = [("path", "=", "137")]
    rep = store.prune_report(where)
    # the key lives in exactly one bucket file; blooms must skip most of
    # the rest (false positives allowed, certainty of the hit required)
    assert rep["files_selected"] < rep["files_total"]
    got = _rows(store.read_state(spark, where=where))
    exp = _rows(store.read_state(spark).filter(where_column(where)))
    assert got == exp == [("corpus", "137")]

    # zonemap-only twin CANNOT prune this probe (hash layout spans domain)
    plain = TableStore(store.root, n_buckets=store.n_buckets)
    m = store.current_manifest()
    nobloom = {
        p: {"rows": s["rows"], "cols": s["cols"]}
        for p, s in m["stats"].items()
    }
    kept = sum(
         1 for fs in m["buckets"].values() for p in fs
         if _file_may_match(nobloom.get(p), where)
    )
    assert kept > rep["files_selected"]


def test_bloom_absent_value_prunes_everything_exactly(spark):
    store = _bloom_store(spark)
    where = [("path", "=", "no-such-key")]
    got = _rows(store.read_state(spark, where=where))
    assert got == []
    # and the report shows the skip (bloom may false-positive a file or
    # two, but most of the table is provably skipped)
    rep = store.prune_report(where)
    assert rep["files_selected"] <= rep["files_total"] // 2


def test_bloom_carries_through_rewrite_and_more_commits(spark):
    store = _bloom_store(spark, n=200)
    # second commit appends new keys -> new files get their own blooms
    extra = _corpus(spark, 400).filter(F.col("path").cast("long") >= 200)
    store.commit(
        store.read_state(spark).unionByName(extra)
        .withColumn(BUCKET_COL, bucket_expr(store.n_buckets)),
        list(range(store.n_buckets)),
        [],
        epoch=2,
        row_schema=ROW_SCHEMA,
    )
    for key in ("5", "399"):
        where = [("path", "=", key)]
        got = _rows(store.read_state(spark, where=where))
        assert got == [("corpus", key)]
    stats = store.current_manifest()["stats"]
    assert all("bloom" in ent for ent in stats.values())
