"""Hashed-free n-gram language-model scoring — the CCNet-style
perplexity quality signal for training-data curation, maintained online
from the changefeed.

Why this operator: every serious pretraining pipeline (CCNet, Wenzek et
al. 2020, arXiv 1911.00359; the GPT-3 / LLaMA data recipes that follow
it) ranks candidate documents by the perplexity of a language model
trained on a trusted target corpus, and keeps the low-perplexity head.
The engine already has the cheap heuristics (functions/text.py
quality_score) and the importance-sampling selector (clustering.py
dsir_select); this adds the LM-scoring leg of that triad. The reference
replicates opaque document payloads (docs/consideration.md:60); scoring
them against an in-corpus LM is the value-add curation pass downstream
of replication.

Model: word bigram LM with stupid backoff (Brants et al. 2007, EMNLP —
"Large Language Models in Machine Translation": at corpus scale,
unnormalized backoff `S(w|w1) = c(w1 w)/c(w1)`, else `alpha * S(w)`,
is as good as Kneser-Ney and embarrassingly parallel). No smoothing
state, no float model weights — the MODEL IS A COUNT TABLE, which is
why scoring is exactly SQL-reproducible (the DuckDB oracle recomputes
the same counts and the same log10 arithmetic) and why the incremental
view below can maintain it with exact retraction.

Scale shape (100 TB corpus, 10^10 documents):

* ``lm_counts`` tokenizes once map-side and aggregates to the
  vocabulary-bounded count domain (Heaps' law: ~10M word types, ~10^8-9
  observed bigrams — sublinear in corpus size). The shuffle carries
  (gram, count) rows, never token occurrences. Identical shape to the
  BPE trainer statistic (functions/text.py bpe_pair_counts).
* ``lm_score`` explodes each document's bigrams map-side and joins the
  count tables by gram key — equi-joins against vocabulary-bounded
  sides that AQE broadcasts outright when the model is small and
  shuffle-joins when it is not; either way the corpus side is touched
  exactly once. The scalar token total rides a broadcast 1-row
  crossJoin, never a driver collect.
* ``IncrementalLmCounts`` is the online form: counts are LINEAR (insert
  +1, delete -1, update retracts the pre-image), so the full-CDF
  changefeed maintains a model that equals the batch recompute over the
  live corpus EXACTLY at every epoch — the same property the count-min
  view exploits (operators/cms.py), here carrying the actual LM. A
  continuously-ingesting corpus gets a continuously-fresh quality model
  at O(changed docs) per epoch, never a corpus rescan.

Determinism / oracle-exactness: tokenization is the shared whitespace
split (functions/text.words == DuckDB string_split_regex); probabilities
are ratios of BIGINT counts and one log10 — both engines evaluate the
identical expression tree on IEEE doubles, and the per-document score is
rounded to 4 decimals exactly like the established float queries
(dsir_select, text_stats).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import words
from ..sources.table_store import BUCKET_COL, TableStore, bucket_expr
from .changefeed import CHANGE_TYPE_COL, table_changes_cdf

# stupid-backoff discount (Brants et al. 2007 use 0.4 throughout)
LM_ALPHA = 0.4

# unigram rows carry this sentinel in w2 so the model is ONE table with a
# plain (g, w1, w2) key — '' never appears as a token (the whitespace
# tokenizer cannot emit an empty string past the filter below)
UNIGRAM_W2 = ""


def _doc_unigrams(df: DataFrame, text_col: str) -> DataFrame:
    """(doc cols..., w) — one row per token occurrence, map-side."""
    return df.select(
        "*", F.explode(words(F.lower(F.col(text_col)))).alias("w")
    ).filter(F.col("w") != "")


def _bigram_pairs(ws: Column) -> Column:
    """Adjacent-pair structs from a (pre-projected) token array.

    Callers must hoist the tokenization into its own projection first
    (the analyze_documents lesson: this expression references the array
    ~4 times, and an inlined regex split would re-tokenize the multi-KB
    text per reference — the HOF-hoisting perf find of round 3).
    The sequence guard matters: Spark's ``sequence(1, 0)`` DESCENDS
    instead of returning empty, so single-token documents must short-
    circuit to an empty array.
    """
    return F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.struct(
                F.element_at(ws, i).alias("w1"),
                F.element_at(ws, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, map-side."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            words(F.lower(F.col(text_col))).alias("_ws"),
        )
        .select("_id", F.explode(_bigram_pairs(F.col("_ws"))).alias("p"))
        .select("_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )


def lm_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Train: the bigram stupid-backoff model AS A COUNT TABLE.

    Output: (g, w1, w2, c) — g=1 unigram rows (w2 = ``UNIGRAM_W2``),
    g=2 bigram rows. The token total is ``sum(c) where g=1``; no
    separate scalar row, so the table stays mergeable/linear.
    """
    uni = (
        _doc_unigrams(df, text_col)
        .groupBy(F.col("w").alias("w1"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit(1).alias("g"), "w1", F.lit(UNIGRAM_W2).alias("w2"), "c")
    )
    # id column content is irrelevant for training; reuse the first col
    id_col = df.columns[0]
    bi = (
        _doc_bigrams(df, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit(2).alias("g"), "w1", "w2", "c")
    )
    return uni.unionByName(bi)


def lm_score(
    docs: DataFrame,
    counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = LM_ALPHA,
) -> DataFrame:
    """Score every document against the count-table model.

    Per bigram (w1, w2):
      ``S = c2(w1,w2) / c1(w1)``            when the bigram was seen,
      ``S = alpha * c1(w2) / T``            backoff to the unigram,
      ``S = alpha / T``                     out-of-vocabulary floor,
    and the document score is the mean log10(S) over its bigrams — the
    (negated, unnormalized) log-perplexity CCNet thresholds on. Higher
    is more target-like.

    Output: (id, n_bigrams, avg_logp), documents with >= 1 bigram.
    """
    uni = counts.filter(F.col("g") == 1).select(
        F.col("w1").alias("w"), F.col("c").alias("c1")
    )
    bi = counts.filter(F.col("g") == 2).select("w1", "w2", F.col("c").alias("c2"))
    totals = uni.agg(F.sum("c1").cast("long").alias("t_tokens"))

    # conditional leg: c2/c1 needs the PREFIX unigram count. Every leg's
    # log-prob is pre-rounded to 6 decimals (the dsir_select idiom) so a
    # last-ulp log10 divergence between java.lang.Math and libm can never
    # reach the oracle hash.
    bi_p = bi.join(uni.withColumnRenamed("w", "w1"), "w1").select(
        "w1", "w2", F.round(F.log10(F.col("c2") / F.col("c1")), 6).alias("lp_bi")
    )
    # backoff leg: alpha * c1(w2) / T
    uni_p = uni.crossJoin(F.broadcast(totals)).select(
        F.col("w").alias("w2"),
        F.round(
            F.log10(F.lit(alpha) * F.col("c1") / F.col("t_tokens")), 6
        ).alias("lp_uni"),
    )

    b = _doc_bigrams(docs, id_col, text_col)
    scored = (
        b.join(bi_p, ["w1", "w2"], "left")
        .join(uni_p, "w2", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_id",
            F.coalesce(
                "lp_bi",
                "lp_uni",
                F.round(F.log10(F.lit(alpha) / F.col("t_tokens")), 6),
            ).alias("lp"),
        )
    )
    return scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 4).alias("avg_logp"),
    )


def lm_select(
    docs: DataFrame,
    counts: DataFrame,
    min_avg_logp: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = LM_ALPHA,
) -> DataFrame:
    """The curation form: keep documents whose mean bigram log-prob
    clears the threshold (CCNet's perplexity head cut). Single-token
    documents carry no evidence and are kept."""
    s = lm_score(docs, counts, id_col=id_col, text_col=text_col, alpha=alpha)
    return (
        docs.join(s, id_col, "left")
        .filter(F.col("avg_logp").isNull() | (F.col("avg_logp") >= min_avg_logp))
        .select(*docs.columns)
    )


class IncrementalLmCounts:
    """Persisted LM count table over a source TableStore, maintained
    per-epoch from the full-CDF changefeed with EXACT retraction.

    Counts are linear, so this view equals ``lm_counts(current live
    state)`` at every update() boundary — a deleted document's grams are
    subtracted, an updated document retracts its pre-image text and adds
    the post-image (net zero for unchanged spans). tests/test_lm.py
    asserts per-epoch equality on the shared 3-epoch fixture and the
    ``lm_counts_incremental`` driver query proves the final state against
    DuckDB.

    Exactly-once mirrors the sibling incremental views (cms/hll/hdr/
    dedup): writer-fenced epochs keyed to the source version, consumer-
    registry retention pin on the source, MERGE into only the gram
    buckets the epoch touches (bucketed by w1 so a prefix's unigram and
    bigram rows co-locate with the scoring join's key).
    """

    def __init__(self, root: str, text_col: str = "content", n_buckets: int = 8):
        self.root = root
        self.text_col = text_col
        self.store = TableStore(root, n_buckets=n_buckets)

    # ------------------------------------------------------------------ #
    def update(self, spark: SparkSession, src: TableStore) -> dict:
        """Advance to the source head: O(changed docs) tokenization,
        shuffle bounded by touched grams, dirty-bucket-only MERGE.
        Idempotent (writer-fenced); replay is a noop."""
        writer = f"lm-counts:{os.path.abspath(src.root)}"
        last = max(self.store.writer_epoch(writer), 0)
        head = src.current_version()
        if head <= last:
            return {"status": "noop", "from": last, "to": head}
        consumer = f"lm-counts:{os.path.abspath(self.root)}"
        if last > 0:
            src.record_consumer(consumer, last)

        cdf = table_changes_cdf(spark, src, last, head)
        sign = F.when(
            F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1)).alias("_sign")
        signed = cdf.select(F.col(self.text_col).alias("_text"), sign)
        delta = _signed_counts(signed, "_text").cache()
        try:
            n_b = self.store.n_buckets
            gb = bucket_expr(n_b, ["w1"])
            stats = (
                delta.groupBy(gb.alias("b"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            if not stats:
                self.store.commit(None, [], [], head, self._schema(spark),
                                  writer_id=writer)
                src.record_consumer(consumer, head)
                return {"status": "committed", "from": last, "to": head,
                        "n_gram_updates": 0, "dirty_buckets": 0}
            dirty = sorted(r["b"] for r in stats)
            n_upd = sum(r["n"] for r in stats)
            old = (
                self.store.read_state(spark, buckets=dirty)
                if self.store._bucket_files(dirty)
                else None
            )
            if old is None:
                merged = delta
            else:
                o, dl = old.alias("o"), delta.alias("dl")
                cond = (
                    F.col("o.g").eqNullSafe(F.col("dl.g"))
                    & F.col("o.w1").eqNullSafe(F.col("dl.w1"))
                    & F.col("o.w2").eqNullSafe(F.col("dl.w2"))
                )
                merged = o.join(dl, cond, "full_outer").select(
                    *[
                        F.coalesce(F.col(f"o.{c}"), F.col(f"dl.{c}")).alias(c)
                        for c in ("g", "w1", "w2")
                    ],
                    (
                        F.coalesce(F.col("o.c"), F.lit(0))
                        + F.coalesce(F.col("dl.c"), F.lit(0))
                    ).cast("long").alias("c"),
                )
            merged = merged.filter(F.col("c") != 0).withColumn(
                BUCKET_COL, bucket_expr(n_b, ["w1"])
            )
            self.store.commit(
                merged, dirty, [], head,
                T.StructType(
                    [f for f in merged.schema.fields if f.name != BUCKET_COL]
                ),
                writer_id=writer,
            )
            src.record_consumer(consumer, head)
            return {
                "status": "committed",
                "from": last,
                "to": head,
                "n_gram_updates": n_upd,
                "dirty_buckets": len(dirty),
            }
        finally:
            delta.unpersist()

    # ------------------------------------------------------------------ #
    def read(self, spark: SparkSession) -> DataFrame:
        """The current model as a count table — feed straight into
        :func:`lm_score` / :func:`lm_select`."""
        return self.store.read_state(spark).select("g", "w1", "w2", "c")

    def _schema(self, spark: SparkSession) -> T.StructType:
        existing = self.store.schema()
        if existing is not None:
            return existing
        return T.StructType([
            T.StructField("g", T.IntegerType()),
            T.StructField("w1", T.StringType()),
            T.StructField("w2", T.StringType()),
            T.StructField("c", T.LongType()),
        ])


def _signed_counts(signed: DataFrame, text_col: str) -> DataFrame:
    """Sign-weighted gram counts: (g, w1, w2, c) with c = sum of the CDF
    sign per gram — the retraction-aware twin of :func:`lm_counts`."""
    uni = (
        _doc_unigrams(signed, text_col)
        .groupBy(F.col("w").alias("w1"))
        .agg(F.sum("_sign").cast("long").alias("c"))
        .select(F.lit(1).alias("g"), "w1", F.lit(UNIGRAM_W2).alias("w2"), "c")
    )
    bi = (
        signed.select("_sign", words(F.lower(F.col(text_col))).alias("_ws"))
        .select("_sign", F.explode(_bigram_pairs(F.col("_ws"))).alias("p"))
        .select("_sign", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.sum("_sign").cast("long").alias("c"))
        .select(F.lit(2).alias("g"), "w1", "w2", "c")
    )
    return uni.unionByName(bi).filter(F.col("c") != 0)
