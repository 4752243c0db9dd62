"""End-to-end corpus curation pipeline: the job a training-data team runs
over the replicated corpus (reference scope: the replicated topics of
docs/index.md become a training corpus downstream; this is the
beyond-reference curation surface).

    documents(doc_id, text, lang, source)
      │ exact dedup         keep lowest id per normalized-content hash
      │ near-dup dedup      MinHash+LSH pairs -> connected components ->
      │                     keep the cluster-canonical doc
      │ stratified sample   deterministic hash-mod per-language rates
      └ sequence packing    greedy token-budget packs (no splitting)

Output: curated documents parquet + packs parquet + a JSON funnel report.

Scale shape: every stage is the already-audited operator (hash aggregate /
band-bucket join + O(log n) component rounds / scan-side filter / one
shard shuffle); the stage joins against "drop" sets are broadcast-able
whenever duplicates are a small fraction of the corpus — the normal case —
and AQE picks that automatically. Nothing here collects data to the
driver; the funnel counts are scalar aggregates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.clustering import (
    dedup_clusters,
    pack_greedy,
    sample_stratified,
)
from .operators.dedup_docs import dedup_exact, minhash_lsh_pairs


def curate(
    docs: DataFrame,
    lang_rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    pack_budget: int = 2048,
    pack_shards: int = 64,
    min_shared_bands: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, dict]:
    """Run the full curation funnel. Returns (curated_docs, packs, stats).

    ``min_shared_bands``: LSH candidate pairs must collide in at least this
    many bands to count as near-duplicates (1 = any collision; raise to
    trade recall for precision).
    """
    n_in = docs.count()

    # 1. exact dedup — keep the lowest id per normalized-content group
    exact_keep = dedup_exact(docs, id_col=id_col, text_col=text_col).select(
        F.col("keep_id").alias(id_col)
    )
    docs1 = docs.join(exact_keep, id_col, "inner")
    n_exact = docs1.count()

    # 2. near-dup dedup — LSH pairs -> components -> cluster-canonical keep
    pairs = minhash_lsh_pairs(docs1, id_col=id_col, text_col=text_col).filter(
        F.col("n_shared_bands") >= min_shared_bands
    )
    clusters = dedup_clusters(docs1, pairs, id_col=id_col)
    docs2 = docs1.join(
        clusters.filter(F.col("keep")).select(F.col("doc_id").alias(id_col)),
        id_col,
        "inner",
    )
    n_neardup = docs2.count()

    # 3. deterministic stratified sampling (identity when no rates given)
    if lang_rates:
        docs3 = sample_stratified(
            docs2, lang_rates, stratum_col="lang", id_col=id_col,
            default_rate=default_rate,
        )
    else:
        docs3 = docs2
    n_sampled = docs3.count()

    # 4. greedy no-split sequence packing
    packs = pack_greedy(
        docs3, budget=pack_budget, n_shards=pack_shards,
        id_col=id_col, text_col=text_col,
    )

    stats = {
        "n_input": n_in,
        "n_after_exact_dedup": n_exact,
        "n_after_neardup_dedup": n_neardup,
        "n_after_sampling": n_sampled,
        "exact_dupes_removed": n_in - n_exact,
        "neardup_removed": n_exact - n_neardup,
        "sampled_out": n_neardup - n_sampled,
    }
    return docs3, packs, stats


def curate_to_dir(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    **kwargs,
) -> dict:
    """Read a documents parquet, run :func:`curate`, write
    ``out_dir/curated`` and ``out_dir/packs``, return the funnel stats."""
    docs = spark.read.parquet(in_path)
    curated, packs, stats = curate(docs, **kwargs)
    curated.write.mode("overwrite").parquet(os.path.join(out_dir, "curated"))
    packs.write.mode("overwrite").parquet(os.path.join(out_dir, "packs"))
    p = spark.read.parquet(os.path.join(out_dir, "packs"))
    stats["n_packs"] = p.count()
    stats["n_tokens_packed"] = (p.agg(F.sum("n_tokens")).first()[0]) or 0
    return stats


def parse_rates(spec: str | None) -> dict[str, float]:
    """Parse 'en=0.5,fr=0.25' CLI syntax into a rate dict."""
    if not spec:
        return {}
    out = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        out[k.strip()] = float(v)
    return out
