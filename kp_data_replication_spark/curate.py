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
    target_docs: DataFrame | None = None,
    dsir_keep: int = 0,
    scrub: bool = False,
    lm_cut: float | None = None,
    lm_train_lang: str | None = None,
    code_filter: bool = False,
) -> tuple[DataFrame, DataFrame, dict]:
    """Run the full curation funnel. Returns (curated_docs, packs, stats).

    ``min_shared_bands``: LSH candidate pairs must collide in at least this
    many bands to count as near-duplicates (1 = any collision; raise to
    trade recall for precision).

    ``target_docs``/``dsir_keep``: optional DSIR stage after near-dup dedup
    — keep only the ``dsir_keep`` docs whose hashed-n-gram importance
    weights rank highest against the target probe set
    (operators/clustering.py:dsir_select).

    ``scrub``: redact PII in-place before packing (functions/text.py rule
    table; map-side only), recording total match count in the stats.
    """
    n_in = docs.count()

    # 0.5 optional code-quality gate — FIRST, because it is the cheapest
    # stage (one scan-speed projection, functions/code.py) and the
    # StarCoder order: drop minified blobs / machine tables / symbol soup
    # / declared auto-generated files before paying for any dedup join
    n_code = None
    if code_filter:
        from .functions.code import analyze_code, code_quality_flag

        kept = (
            analyze_code(docs, text_col=text_col)
            .filter(code_quality_flag())
            .select(*docs.columns)
        )
        docs = kept
        n_code = docs.count()

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

    # 2.5 optional DSIR target selection — runs on the deduplicated corpus
    # (the paper's order: dedup first so importance weights don't double-
    # count duplicated text)
    n_dsir = None
    if target_docs is not None and dsir_keep:
        from .operators.clustering import dsir_select

        sel = dsir_select(
            docs2, target_docs, n_keep=dsir_keep,
            id_col=id_col, text_col=text_col,
        ).select(id_col)
        docs2 = docs2.join(sel, id_col, "inner")
        n_dsir = docs2.count()

    # 2.7 optional LM perplexity head-cut (CCNet order: dedup first so the
    # model doesn't overweight duplicated text, then score) — train the
    # bigram stupid-backoff model on the trusted slice of the deduped
    # corpus and keep docs whose mean bigram log10-prob clears the cut
    n_lm = None
    if lm_cut is not None:
        from .operators.lm import lm_counts, lm_select

        train = (
            docs2.filter(F.col("lang") == lm_train_lang)
            if lm_train_lang else docs2
        )
        docs2 = lm_select(
            docs2, lm_counts(train, text_col=text_col), min_avg_logp=lm_cut,
            id_col=id_col, text_col=text_col,
        )
        n_lm = docs2.count()

    # 3. deterministic stratified sampling (identity when no rates given)
    if lang_rates:
        docs3 = sample_stratified(
            docs2, lang_rates, stratum_col="lang", id_col=id_col,
            default_rate=default_rate,
        )
    else:
        docs3 = docs2
    n_sampled = docs3.count()

    # 3.5 optional in-place PII scrub — BEFORE packing, so token budgets
    # see the redacted text (placeholders change lengths)
    pii_hits = None
    if scrub:
        from .functions.text import pii_counts, scrub_pii

        hit_row = docs3.agg(
            *[F.sum(c).alias(f"_h{i}")
              for i, c in enumerate(pii_counts(F.col(text_col)))]
        ).first()
        pii_hits = int(sum((h or 0) for h in hit_row))
        docs3 = docs3.withColumn(text_col, scrub_pii(F.col(text_col)))

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
        "exact_dupes_removed": (
            n_code if n_code is not None else n_in
        ) - n_exact,
        "neardup_removed": n_exact - n_neardup,
        "sampled_out": (
            n_lm if n_lm is not None
            else n_dsir if n_dsir is not None
            else n_neardup
        ) - n_sampled,
    }
    if n_code is not None:
        stats["n_after_code_filter"] = n_code
        stats["code_filtered"] = n_in - n_code
    if n_dsir is not None:
        stats["n_after_dsir"] = n_dsir
        stats["dsir_dropped"] = n_neardup - n_dsir
    if n_lm is not None:
        stats["n_after_lm_cut"] = n_lm
        stats["lm_dropped"] = (
            n_dsir if n_dsir is not None else n_neardup
        ) - n_lm
    if pii_hits is not None:
        stats["pii_hits"] = pii_hits
    return docs3, packs, stats


def curate_to_dir(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    target_path: str | None = None,
    **kwargs,
) -> dict:
    """Read a documents parquet, run :func:`curate`, write
    ``out_dir/curated`` and ``out_dir/packs``, return the funnel stats.

    ``target_path``: optional in-domain probe parquet for the DSIR stage
    (pass ``dsir_keep`` too)."""
    docs = spark.read.parquet(in_path)
    if target_path:
        kwargs["target_docs"] = spark.read.parquet(target_path)
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
