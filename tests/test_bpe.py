"""Exact BPE trainer + encoder (functions/bpe.py): merge choices and
encoded token counts vs a pure-python BPE reference, left-to-right
non-overlapping merge semantics, and the run-dry no-op sentinel."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kp_data_replication_spark.functions.bpe import (
    BPE_NOOP,
    bpe_encode_expr,
    bpe_encode_tokens,
    bpe_train_merges,
)


def _py_bpe(texts, n_merges):
    vocab: dict = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9_]+", t.lower()):
            vocab[w] = vocab.get(w, 0) + 1
    seqs = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pc: dict = {}
        for w, c in vocab.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            merges.append(None)
            continue
        (a, b), _c = min(pc.items(), key=lambda kv: (-kv[1], f"({kv[0][0]})({kv[0][1]})"))
        merges.append((a, b))
        for w in seqs:
            s = seqs[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "aaa aaaa aa aaa",          # overlapping-merge stress: (a)(a) chains
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )


def test_merges_match_python(spark, corpus):
    got = bpe_train_merges(corpus, n_merges=8)
    exp, _ = _py_bpe(TEXTS, 8)
    assert [m[0] for m in got] == [f"({a})({b})" for a, b in exp]


def test_encode_counts_match_python(spark, corpus):
    merges = bpe_train_merges(corpus, n_merges=8)
    _, seqs = _py_bpe(TEXTS, 8)
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode_tokens(corpus, merges).collect()
    }
    exp = {}
    for d, t in enumerate(TEXTS):
        ws = re.findall(r"[a-z0-9_]+", t.lower())
        exp[d] = (len(ws), sum(len(seqs[w]) for w in ws))
    assert got == exp


def test_left_to_right_nonoverlapping(spark):
    """'(a)(a)' on 'aaaa' must fold to (aa)(aa), then '(aa)(aa)' to
    (aaaa) — the replace chain IS the BPE merge rule."""
    df = spark.range(1).select(F.lit("aaaa").alias("w"))
    enc = df.select(
        bpe_encode_expr(F.col("w"), [("(a)(a)", "(aa)")]).alias("s1"),
        bpe_encode_expr(
            F.col("w"), [("(a)(a)", "(aa)"), ("(aa)(aa)", "(aaaa)")]
        ).alias("s2"),
    ).first()
    assert enc.s1 == "(aa)(aa)"
    assert enc.s2 == "(aaaa)"
    # odd run: leftmost-first, trailing singleton survives
    df3 = spark.range(1).select(F.lit("aaa").alias("w"))
    s = df3.select(
        bpe_encode_expr(F.col("w"), [("(a)(a)", "(aa)")]).alias("s")
    ).first().s
    assert s == "(aa)(a)"


def test_run_dry_pads_noop_sentinel(spark):
    """A corpus of single-char words has no pairs: every round emits the
    no-op sentinel and encoding is unchanged."""
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    merges = bpe_train_merges(df, n_merges=3)
    assert merges == [(BPE_NOOP, BPE_NOOP)] * 3
    got = bpe_encode_tokens(df, merges).first()
    assert (got.n_words, got.n_bpe_tokens) == (3, 3)


def test_encoder_is_pure_expression(spark, corpus):
    """No UDF, no join in the encode plan — map-side expressions only."""
    merges = bpe_train_merges(corpus, n_merges=4)
    plan = bpe_encode_tokens(corpus, merges)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
