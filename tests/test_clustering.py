"""Corpus-curation operators: connected-components duplicate clustering,
deterministic stratified sampling, sequence packing (chunk + greedy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kp_data_replication_spark.operators.clustering import (
    connected_components,
    dedup_clusters,
    pack_chunks,
    pack_greedy,
    sample_stratified,
)


def _cc_reference(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    # two triangles bridged by one edge + an isolated pair
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (3, 10), (50, 51)]
    df = spark.createDataFrame(pairs, "doc1 long, doc2 long")
    got = {r["node"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == _cc_reference(pairs)


def test_connected_components_chain_converges_logarithmically(spark):
    # a 64-node path graph: naive min-propagation needs ~64 rounds; pointer
    # jumping must finish well inside max_iter=10
    pairs = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(pairs, "doc1 long, doc2 long")
    got = {r["node"]: r["cluster_id"] for r in
           connected_components(df, max_iter=10).collect()}
    assert got == {i: 0 for i in range(65)}


def test_dedup_clusters_keep_flag(spark):
    docs = spark.createDataFrame(
        [(i, "x") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "doc1 long, doc2 long")
    rows = {r["doc_id"]: (r["cluster_id"], r["keep"])
            for r in dedup_clusters(docs, pairs).collect()}
    assert rows == {
        0: (0, True), 1: (1, True), 2: (2, True), 3: (3, True),
        4: (1, False), 5: (1, False),
    }


def test_sample_stratified_deterministic_and_monotone(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    a = sample_stratified(docs, {"en": 0.5, "fr": 0.1})
    b = sample_stratified(docs, {"en": 0.5, "fr": 0.1})
    ids_a = sorted(r["doc_id"] for r in a.collect())
    assert ids_a == sorted(r["doc_id"] for r in b.collect())  # re-run stable
    # higher rate strictly supersets the lower-rate selection per stratum
    wider = sorted(
        r["doc_id"] for r in sample_stratified(docs, {"en": 0.8, "fr": 0.1}).collect()
    )
    assert set(ids_a) <= set(wider)
    # rates land near expectation (hash is uniform)
    n_en = sum(1 for i in ids_a if i % 2 == 0)
    n_fr = len(ids_a) - n_en
    assert abs(n_en - 500) < 60 and abs(n_fr - 100) < 40


def _greedy_reference(docs: list[tuple[int, int]], budget: int):
    """(n_docs, n_tokens) per pack for one shard, docs sorted by id."""
    packs, cur, tok = [], 0, 0
    for _, n in sorted(docs):
        if cur and tok + n > budget:
            packs.append((cur, tok))
            cur, tok = 0, 0
        cur += 1
        tok += n
    if cur:
        packs.append((cur, tok))
    return packs


def test_pack_greedy_matches_reference_and_never_splits(spark):
    rows = [(i, " ".join(["w"] * (7 + (i * 13) % 40))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_greedy(docs, budget=64, n_shards=4).collect()
    # every pack respects the budget unless it is a single oversized doc
    for r in out:
        assert r["n_tokens"] <= 64 or r["n_docs"] == 1
        assert r["n_docs"] == len(r["doc_ids"])
    # per-shard parity with the pure-Python reference
    from kp_data_replication_spark.operators.clustering import _id_hash_mod

    shard_of = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", (_id_hash_mod("doc_id") % 4).cast("int").alias("s")
        ).collect()
    }
    n_tok = {i: 7 + (i * 13) % 40 for i, _ in rows}
    for s in range(4):
        ref = _greedy_reference(
            [(i, n_tok[i]) for i in n_tok if shard_of[i] == s], 64
        )
        got = sorted(
            (r["n_docs"], r["n_tokens"]) for r in out if r["shard"] == s
        )
        # reference preserves order; compare as multisets plus count
        assert sorted(ref) == got
        assert len(ref) == len([r for r in out if r["shard"] == s])


def test_pack_chunks_totals_conserved(spark):
    rows = [(i, " ".join(["w"] * (5 + i % 11))) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_chunks(docs, budget=100, n_shards=4)
    total = out.agg(F.sum("n_tokens"), F.sum("n_docs")).first()
    assert total[0] == sum(5 + i % 11 for i in range(300))
    assert total[1] == 300
    # no chunk id gaps per shard (contiguous boundaries)
    per = out.groupBy("shard").agg(
        F.min("chunk_id").alias("lo"),
        F.max("chunk_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    for r in per:
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1


def test_curate_funnel_end_to_end(spark, tmp_path):
    """Full curation pipeline over a corpus with planted exact and near
    duplicates: the funnel removes exactly the planted dupes, sampling is
    deterministic, and every surviving doc lands in exactly one pack."""
    from kp_data_replication_spark.curate import curate_to_dir, parse_rates

    assert parse_rates("en=0.5, fr=0.25") == {"en": 0.5, "fr": 0.25}

    base = [
        (i, " ".join(f"tok{i}_{j}" for j in range(30)), "en")
        for i in range(40)
    ]
    rows = list(base)
    # exact dupes: 5 copies of doc 0's text under new ids
    rows += [(100 + i, base[0][1], "en") for i in range(5)]
    # near dupes: doc 1's text with ONE token changed (same shingle mass)
    t1 = base[1][1].split()
    rows += [
        (200 + i, " ".join(t1[:-1] + [f"alt{i}"]), "en") for i in range(3)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    p_in = str(tmp_path / "docs_in")
    docs.withColumn("source", F.lit("s0")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(p_in)

    out = str(tmp_path / "curated_out")
    stats = curate_to_dir(spark, p_in, out, pack_budget=128, pack_shards=4)

    assert stats["n_input"] == 48
    assert stats["exact_dupes_removed"] == 5
    # the three near-dup variants of doc 1 cluster with it; 3 drop
    assert stats["neardup_removed"] == 3
    assert stats["n_after_sampling"] == 40  # no rates -> identity
    curated = spark.read.parquet(out + "/curated")
    assert curated.count() == 40
    packs = spark.read.parquet(out + "/packs")
    packed_ids = sorted(
        i for r in packs.select("doc_ids").collect() for i in r["doc_ids"]
    )
    assert packed_ids == sorted(r["doc_id"] for r in curated.collect())
    assert stats["n_tokens_packed"] == 30 * 40


def test_dsir_select_ranks_in_domain_docs_first(spark):
    """Importance weights order corpus docs by target-likeness: a doc made
    of target vocabulary outranks a partial overlap, which outranks a
    fully out-of-domain doc; output is exactly n_keep rows with dense
    deterministic ranks."""
    from kp_data_replication_spark.operators.clustering import dsir_select

    target = spark.createDataFrame(
        [(0, "alpha beta gamma alpha beta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (10, "alpha beta gamma alpha"),      # in-domain
            (11, "zzz yyy xxx www vvv uuu"),     # out-of-domain
            (12, "alpha beta zzz yyy"),          # partial
        ],
        "doc_id long, text string",
    )
    got = dsir_select(corpus, target, n_keep=3, n_buckets=32).collect()
    assert [r.rank for r in got] == [1, 2, 3]
    by_rank = {r.rank: r for r in got}
    assert by_rank[1].doc_id == 10
    assert by_rank[3].doc_id == 11
    assert by_rank[1].logw > by_rank[2].logw > by_rank[3].logw
    # n_keep truncates below the corpus size
    top1 = dsir_select(corpus, target, n_keep=1, n_buckets=32).collect()
    assert len(top1) == 1 and top1[0].doc_id == 10


def test_curate_funnel_dsir_and_scrub_stages(spark, tmp_path):
    """The optional DSIR stage keeps exactly the dsir_keep most
    target-like docs after dedup, and the scrub stage redacts planted PII
    before packing (funnel stats record both)."""
    from kp_data_replication_spark.curate import curate_to_dir

    rows = (
        # 10 in-domain docs (target vocabulary)
        [(i, "alpha beta gamma delta " * 8, "en") for i in range(10)]
        # 30 out-of-domain docs with a planted email each
        + [(100 + i,
            f"zz{i} yy{i} contact bob{i}@example.com now " * 6, "en")
           for i in range(30)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    p_in = str(tmp_path / "docs_in")
    docs.write.parquet(p_in)
    p_tgt = str(tmp_path / "target")
    spark.createDataFrame(
        [(0, "alpha beta gamma delta alpha beta")], "doc_id long, text string"
    ).write.parquet(p_tgt)

    out = str(tmp_path / "curated_out")
    stats = curate_to_dir(
        spark, p_in, out, target_path=p_tgt, dsir_keep=12, scrub=True,
        pack_budget=256, pack_shards=2,
    )
    # the 10 identical in-domain docs collapse to 1 by exact dedup; DSIR
    # then keeps the 12 most target-like of the 31 survivors — the
    # in-domain survivor must be among them
    assert stats["n_after_exact_dedup"] == 31
    assert stats["n_after_dsir"] == 12
    assert stats["dsir_dropped"] == 31 - 12
    assert stats["pii_hits"] >= 11 * 6  # >=11 out-of-domain survivors x 6 emails
    curated = spark.read.parquet(out + "/curated")
    ids = {r.doc_id for r in curated.select("doc_id").collect()}
    assert min(i for i in ids if i < 100) in ids  # in-domain survivor kept
    assert curated.filter(F.col("text").contains("@example.com")).count() == 0
    assert curated.filter(F.col("text").contains("<EMAIL>")).count() == 11


def test_curate_funnel_lm_cut_stage(spark, tmp_path):
    """The optional LM stage (CCNet-style perplexity head-cut) trains the
    bigram model on the trusted lang slice of the deduped corpus and
    drops the gibberish tail; in-domain docs and the funnel stats
    survive consistently."""
    from kp_data_replication_spark.curate import curate_to_dir

    # 20 distinct "fluent" docs over a SHARED 29-word vocabulary (per-doc
    # multiplicative stride => zero shingle overlap, so LSH dedup keeps
    # them all, while every bigram is in-model for the LM)
    vocab = [f"w{k}" for k in range(29)]
    rows = (
        [(i, " ".join(vocab[(j * (i + 2)) % 29] for j in range(30)), "en")
         for i in range(20)]
        # gibberish: unique OOV tokens, every bigram hits the floor
        + [(100 + i, " ".join(f"zx{i}_{j}" for j in range(30)), "xx")
           for i in range(8)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    p_in = str(tmp_path / "docs_lm_in")
    docs.write.parquet(p_in)

    out = str(tmp_path / "curated_lm_out")
    stats = curate_to_dir(
        spark, p_in, out, lm_cut=-2.5, lm_train_lang="en",
        pack_budget=512, pack_shards=2,
    )
    assert stats["n_after_lm_cut"] == 20
    assert stats["lm_dropped"] == 8
    curated = spark.read.parquet(out + "/curated")
    assert curated.filter(F.col("lang") == "xx").count() == 0
    assert curated.filter(F.col("lang") == "en").count() == 20
