"""Exact BPE tokenizer training + encoding (Sennrich et al. 2016,
arXiv 1508.07909) — the step after the merge-candidate statistic
(functions/text.py bpe_pair_counts): actually LEARN the merge list and
ENCODE documents with it, so token budgets for packing
(operators/clustering.py pack_chunks/pack_greedy) come from the real
tokenizer instead of a whitespace proxy.

Spark-first shape:

* Training never touches token occurrences after the first aggregate:
  the corpus collapses to the (word, count) vocabulary once (Heaps'-law
  bounded, the same compression bpe_pair_counts uses), and every merge
  round is ONE vocabulary-sized aggregate + ONE narrow map. Driver state
  is the argmax pair per round (a scalar TakeOrderedAndProject), exactly
  the bounded-codebook pattern of train_ivf_centroids.
* Encoding is a PURE JVM EXPRESSION: the wrapped symbol string
  ``(h)(e)(l)(l)(o)`` folded through one literal ``replace`` per learned
  merge — no UDF, no vocab join, map-side on the corpus scan. Java's
  ``String.replace`` substitutes non-overlapping occurrences left to
  right, which IS the BPE merge rule, and the wrapper parentheses make
  occurrences self-delimiting so adjacent matches never share a
  boundary character.

Determinism / oracle-exactness: integer counts, bytewise string
tie-breaks, and the same replace semantics in DuckDB mean the ENTIRE
train-then-encode pipeline is SQL-reproducible — queries.py generates a
K-stage CTE chain (argmax merge per stage as a scalar subquery) and the
``bpe_encode_tokens`` driver query hash-matches it. Tokenization here is
the word-character regex (``[a-z0-9_]+``, the token_count_re
convention), NOT the whitespace split: symbols must never contain the
wrapper characters, and word-chars guarantee it.

Reference scope: the replicated payloads are opaque documents
(docs/consideration.md:60); tokenizer training/encoding is the
downstream curation surface the engine adds over them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BPE_WORD_RE = "[a-z0-9_]+"
_SYM_RE = r"\(([^)]*)\)"
# replace() with this sentinel is a no-op: \x01 is not a word character,
# so it can never appear in a symbol. Emitted when a tiny corpus runs out
# of pairs before n_merges rounds (the SQL twin coalesces to the same).
BPE_NOOP = "\x01"


def _wrap(word: Column) -> Column:
    """'hello' -> '(h)(e)(l)(l)(o)' — the self-delimiting symbol string."""
    return F.regexp_replace(word, "(.)", r"($1)")


def _symbols(seq: Column) -> Column:
    return F.regexp_extract_all(seq, F.lit(_SYM_RE), 1)


def _doc_words(df: DataFrame, text_col: str) -> Column:
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_WORD_RE), 0)


def bpe_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, wc, seq) — the word-frequency table training iterates on."""
    return (
        df.select(F.explode(_doc_words(df, text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .withColumn("seq", _wrap(F.col("w")))
    )


def bpe_train_merges(
    df: DataFrame, text_col: str = "text", n_merges: int = 10
) -> list[tuple[str, str]]:
    """Learn the merge list: per round, the (count desc, pattern asc)
    argmax adjacent symbol pair over the weighted vocabulary, then fold
    it into every word's symbol string.

    Returns [(pattern, replacement)] like ('(l)(l)', '(ll)'), padded
    with no-op sentinel merges if the corpus runs dry. Each round is one
    vocabulary-bounded aggregate; the corpus itself is scanned exactly
    once (inside bpe_vocab).

    SERIAL-DRIVER BOUND: each round ends in one ``limit(1).collect()``
    argmax, i.e. ``n_merges`` sequential Spark jobs on the driver's
    critical path. That is the exact shape of classical BPE training
    (each merge's pair counts depend on the previous merge) and is fine
    for the bounded vocab sizes this function targets (tens to a few
    hundred merges over a checkpointed vocabulary — each job is
    vocabulary-sized, not corpus-sized). A 32k-merge production
    tokenizer run would mean 32k serial job round-trips: at that scale
    batch rounds by learning the top-k NON-OVERLAPPING pairs per round
    (k merges per job, the standard Hugging-Face-style amortization) or
    pull the checkpointed vocabulary driver-side and finish the merge
    loop in memory — the vocab, unlike the corpus, fits."""
    vocab = bpe_vocab(df, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    # Driver-side merge loop when the vocabulary fits (the amortization the
    # SERIAL-DRIVER BOUND note below prescribes): the vocab, unlike the
    # corpus, is Heaps'-law bounded, and each distributed round otherwise
    # costs two serial job round-trips (aggregate + checkpoint) for a
    # vocabulary-sized computation — ~20 scheduler latencies for 10 merges.
    # Exactness: Python str.replace is the same non-overlapping
    # left-to-right substitution as Spark's replace(); pair counts are
    # exact ints; the (count desc, pattern asc) tie-break compares ASCII
    # patterns identically. The distributed loop below remains the path
    # for vocabularies past the driver bound.
    import os as _os
    import re as _re

    driver_max = int(_os.environ.get("BPE_DRIVER_VOCAB_MAX", "2000000"))
    if vocab.count() <= driver_max:
        rows = vocab.select("wc", "seq").collect()
        seqs = [[int(r["wc"]), r["seq"]] for r in rows]
        sym_re = _re.compile(_SYM_RE)
        for _ in range(n_merges):
            counts: dict[str, int] = {}
            for wc, seq in seqs:
                syms = sym_re.findall(seq)
                for i in range(len(syms) - 1):
                    pat = f"({syms[i]})({syms[i + 1]})"
                    counts[pat] = counts.get(pat, 0) + wc
            if not counts:
                merges.append((BPE_NOOP, BPE_NOOP))
                continue
            pat = min(counts, key=lambda p: (-counts[p], p))
            rep = pat.replace(")(", "")
            merges.append((pat, rep))
            for entry in seqs:
                entry[1] = entry[1].replace(pat, rep)
        return merges
    for _ in range(n_merges):
        s = _symbols(F.col("seq"))
        pats = vocab.select(
            "wc",
            F.explode(
                F.when(
                    F.size(s) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(s) - 1),
                        lambda i: F.concat(
                            F.lit("("), F.element_at(s, i),
                            F.lit(")("), F.element_at(s, i + 1), F.lit(")"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pat"),
        )
        top = (
            pats.groupBy("pat")
            .agg(F.sum("wc").alias("c"))
            .orderBy(F.desc("c"), F.asc("pat"))
            .limit(1)
            .collect()
        )
        if not top:
            merges.append((BPE_NOOP, BPE_NOOP))
            continue
        pat = top[0]["pat"]
        rep = pat.replace(")(", "")  # '(a)(b)' -> '(ab)'
        merges.append((pat, rep))
        vocab = vocab.withColumn(
            "seq", F.replace(F.col("seq"), F.lit(pat), F.lit(rep))
        ).localCheckpoint()
    return merges


def bpe_encode_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """The encoder as a pure Column expression: wrapped symbol string
    folded through the merge list. Feed any word column; map-side."""
    seq = _wrap(word)
    for pat, rep in merges:
        seq = F.replace(seq, F.lit(pat), F.lit(rep))
    return seq


def bpe_encode_tokens(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token counts under the learned merges:
    (id, n_words, n_bpe_tokens). The real token budget for sequence
    packing — one corpus scan, zero shuffles before the per-doc sum."""
    w = (
        df.select(
            F.col(id_col), F.explode(_doc_words(df, text_col)).alias("w")
        )
    )
    enc = w.select(
        id_col,
        F.size(_symbols(bpe_encode_expr(F.col("w"), merges))).alias("n_sym"),
    )
    return enc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
    )
