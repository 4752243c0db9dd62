"""Text analysis for large-scale training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

These generalize the engine's payload-inspection surface to the corpus
preparation workloads a 100 TB ingest pipeline feeds (the reference's
payload-agnostic replicator, docs/consideration.md:60, treats documents as
opaque; these operators are the value-add analysis pass).

Everything except the rolling hash is pure `pyspark.sql.functions`
(JVM-side, codegen, oracle-checkable in DuckDB); the rolling hash is a
vectorized Arrow UDF because per-char polynomial folding has no builtin.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

# deterministic, tiny English stopword list (shared with oracle SQL)
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

TOKEN_RE = "[a-zA-Z0-9_]+"


def words(col: Column) -> Column:
    """Whitespace tokenization (regex split, empty-trailing safe)."""
    return F.split(F.trim(col), r"\s+")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def token_count_re(col: Column) -> Column:
    """BPE-ish regex token count (word-character runs)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0))


def stopword_ratio(col: Column) -> Column:
    w = words(col)
    hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return hits / F.greatest(F.size(w), F.lit(1))


def mean_word_len(col: Column) -> Column:
    w = words(col)
    return F.aggregate(
        w, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)
    ) / F.greatest(F.size(w), F.lit(1))


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"[^\p{L}\p{N}\s]", "")
    return (F.length(col) - F.length(stripped)) / F.greatest(F.length(col), F.lit(1))


def lang_id(col: Column, threshold: float = 0.08) -> Column:
    """N-gram-free heuristic language ID: English stopword density.

    Real pipelines plug a fastText/CLD3 model in as a pandas UDF behind the
    same column contract; the heuristic keeps the operator oracle-checkable.
    """
    return F.when(stopword_ratio(col) >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def quality_score(col: Column) -> Column:
    """Composite quality score in [0, 1]: length band + stopword presence +
    moderate punctuation (the classic C4/Gopher-style cheap filters)."""
    n_tok = token_count_ws(col)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(len_ok + stop_ok + punct_ok, 4)


def fingerprint_sha(col: Column) -> Column:
    """Normalized-content fingerprint: lowercase, collapse whitespace,
    sha256 — the document-identity key for exact dedup."""
    normalized = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.sha2(normalized, 256)


ROLLING_B = 1000003
ROLLING_P = (1 << 61) - 1


@F.pandas_udf(T.LongType())
def rolling_hash(s: pd.Series) -> pd.Series:
    """Karp-Rabin polynomial rolling hash over bytes (vectorized Arrow UDF;
    no builtin equivalent). Deterministic across runs/platforms.

    Vectorized across the BATCH dimension: one numpy step per byte
    position updates every document simultaneously, so the Python-level
    loop count is max(len) per batch instead of sum(len) — at a 10k-row
    Arrow batch that is a ~10^4x cut in interpreter iterations. The
    modular multiply stays in uint64 by exploiting the Mersenne modulus
    P = 2^61-1 (so 2^61 === 1 mod P): split h = h_hi*2^41 + h_lo with
    h_hi < 2^20; then h*B = (h_hi*B >> 20) + ((h_hi*B & 0xFFFFF) << 41)
    + h_lo*B (mod P), every term < 2^61 and their sum < 2^63."""
    import numpy as np

    n = len(s)
    if n == 0:
        return pd.Series([], dtype="object")
    raw = [None if x is None else x.encode("utf-8") for x in s]
    lens = np.array([0 if b is None else len(b) for b in raw], dtype=np.int64)
    maxlen = int(lens.max()) if n else 0
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(raw):
        if b:
            buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)

    P = np.uint64(ROLLING_P)
    B = np.uint64(ROLLING_B)
    LO41 = np.uint64((1 << 41) - 1)
    LO20 = np.uint64((1 << 20) - 1)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(maxlen):
        m = (h >> np.uint64(41)) * B  # h_hi*B < 2^40
        t = (
            (m >> np.uint64(20))
            + ((m & LO20) << np.uint64(41))
            + (h & LO41) * B
            + buf[:, j]
        )
        t = (t >> np.uint64(61)) + (t & P)
        t = np.where(t >= P, t - P, t)
        h = np.where(j < lens, t, h)

    # nullable Int64, NOT .mask(None) on int64 — that would coerce to
    # float64 and round values above 2^53
    out = pd.Series(h.astype(np.int64), dtype="Int64")
    out[[b is None for b in raw]] = pd.NA
    return out


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document repetition metrics (the Gopher/C4 repetition
    filters the length/stopword/punct trio doesn't cover): documents that
    loop the same lines or phrases are boilerplate/spam, not prose.

    Output per document: ``n_lines``, ``dup_line_ratio`` (1 - distinct
    lines / lines), ``top_bigram_share`` (occurrences of the most frequent
    word bigram / total bigrams; 0 for docs with < 2 words).

    Scale shape: line metrics are pure array expressions (codegen, no
    shuffle); the bigram share is one explode + two hash aggregates whose
    explode factor is words-1 — the same bounded shape as the shingle
    family, map-side partial throughout.
    """
    lines = F.split(F.col(text_col), "\n")
    base = df.select(
        F.col(id_col).alias("doc"),
        F.size(lines).alias("n_lines"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(lines))
            / F.greatest(F.size(lines), F.lit(1)).cast("double"),
            4,
        ).alias("dup_line_ratio"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_w"),
    )
    bigrams = base.select(
        "doc",
        F.explode(
            F.when(
                F.size("_w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_w") - 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    shares = (
        bigrams.groupBy("doc", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc")
        .agg(
            F.round(F.max("n") / F.sum("n").cast("double"), 4).alias(
                "top_bigram_share"
            )
        )
    )
    return (
        base.select("doc", "n_lines", "dup_line_ratio")
        .join(shares, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_lines",
            "dup_line_ratio",
            F.coalesce(F.col("top_bigram_share"), F.lit(0.0)).alias(
                "top_bigram_share"
            ),
        )
    )


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection over a documents table.

    The whitespace tokenization is HOISTED into one `_w` projection and
    every word-based metric recomputed over it — the per-metric `words()`
    expressions would otherwise regex-split the (multi-KB) text ~8 times
    per row. Same values as the per-metric forms (and the DuckDB oracle);
    only the evaluation count changes."""
    c = F.col(text_col)
    w = F.col("_w")
    n_words = F.greatest(F.size(w), F.lit(1))
    stop_ratio = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))) / n_words
    mean_len = F.aggregate(
        w, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / n_words
    p_ratio = punct_ratio(c)
    n_tok = F.size(w)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(stop_ratio >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    punct_ok = F.when(p_ratio <= 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    return (
        df.withColumn("_w", words(c))
        .select(
            *df.columns,
            n_tok.alias("n_tokens_ws"),
            token_count_re(c).alias("n_tokens_re"),
            F.round(stop_ratio, 4).alias("stopword_ratio"),
            F.round(mean_len, 4).alias("mean_word_len"),
            F.round(p_ratio, 4).alias("punct_ratio"),
            F.when(stop_ratio >= 0.08, F.lit("en")).otherwise(F.lit("unk"))
            .alias("lang_pred"),
            F.round(len_ok + stop_ok + punct_ok, 4).alias("quality"),
            fingerprint_sha(c).alias("fingerprint_sha"),
        )
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """First-iteration BPE merge-candidate counts (Sennrich et al. 2016,
    arXiv 1508.07909): the frequency of every adjacent character pair,
    weighted by word frequency — the statistic a tokenizer trainer computes
    to pick its next merge.

    Scale shape is the word-frequency compression every real BPE trainer
    uses: tokenize once, aggregate to DISTINCT (word, count) first (map-side
    combine over a vocabulary-bounded domain — Heaps' law keeps this
    sublinear in corpus size), and only then explode the per-word character
    bigrams weighted by the count. A 100-TB corpus with a ~10M-type
    vocabulary explodes ~10M short arrays, not 10^13 token occurrences.
    The final pair aggregate lives on an alphabet^2-bounded domain (~5k keys
    for ASCII), so the global top-n window is a single-partition sort over
    a few thousand rows — safe at any corpus size.

    Output: (pair, pair_count, rank) for the top_n pairs, ties broken by
    pair text for determinism. Pure JVM expressions end-to-end.
    """
    wcounts = (
        df.select(F.explode(words(F.lower(F.col(text_col)))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = (
        wcounts.select(
            "wc",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("wc").alias("pair_count"))
    )
    w = W.orderBy(F.col("pair_count").desc(), F.col("pair"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("pair", "pair_count", "rank")
    )


# ---------------------------------------------------------------------------
# PII redaction — the curation stage every shared training corpus runs
# before anything else (the reference treats payloads as opaque documents,
# docs/consideration.md:60; this is the value-add scrub over that surface).
#
# The rule table is the single source of truth for BOTH engines: Spark
# applies the rules with regexp_replace/regexp_count, and the DuckDB oracle
# is generated from the same (pattern, replacement) strings, so scrub +
# match counts are hash-exact. Patterns deliberately use only constructs
# with identical semantics in java.util.regex and RE2 (character classes,
# bounded/greedy quantifiers, \b, non-capturing groups — no lookaround, no
# backreferences, which RE2 lacks).
# ---------------------------------------------------------------------------

PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
]


def scrub_pii(col: Column) -> Column:
    """Apply every PII rule in declared order (order matters: an SSN-shaped
    span inside a longer phone match must see the same rule first on both
    engines). Pure JVM regexp_replace chain — one codegen stage, no UDF."""
    out = col
    for _, pattern, repl in PII_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(col: Column) -> list[Column]:
    """Per-rule match counts over the ORIGINAL text (audit trail: how much
    was redacted), aliased n_<rule>."""
    return [
        F.regexp_count(col, F.lit(pattern)).alias(f"n_{name}")
        for name, pattern, _ in PII_RULES
    ]


def scrub_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII from a documents table: per-rule counts + scrubbed text +
    its sha256 (the invariant a downstream consumer checks). Map-side only —
    no shuffle; at 100 TB this pipelines with the scan."""
    c = F.col(text_col)
    return df.select(
        "doc_id",
        *pii_counts(c),
        scrub_pii(c).alias("scrubbed"),
        F.sha2(scrub_pii(c), 256).alias("scrubbed_sha"),
    )


@F.pandas_udf(T.DoubleType())
def compression_ratio(s: pd.Series) -> pd.Series:
    """zlib compressed/raw byte ratio — the classic redundancy quality
    signal (boilerplate/spam compresses far below prose; extremely high
    ratios flag binary-ish noise). Gopher/CCNet-class pipelines filter on
    exactly this before training.

    Arrow-vectorized pandas UDF (per BATCH python call, zlib is C);
    per-value cost is linear in the text — the same class as the rolling
    hash. No SQL twin exists (DuckDB has no zlib surface), so correctness
    is pinned by a python-twin test instead of the DuckDB oracle, and the
    driver query is declared rows-only."""
    import zlib

    def ratio(t: str | None) -> float | None:
        if t is None:
            return None
        raw = t.encode("utf-8")
        if not raw:
            return None
        return len(zlib.compress(raw, 6)) / len(raw)

    return s.map(ratio)
