"""Property-based tests for bpe_pair_counts and dsir_select over
hypothesis-generated corpora: the Spark plans must equal a direct pure
Python reference (bpe) and hold the selection invariants (dsir) on inputs
no example corpus pins. Alphabet is ASCII (Java regex \\s and Python re
\\s diverge on unicode whitespace; the operators' contract is the Java
one)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

word = st.text(alphabet="abcx", min_size=0, max_size=6)
doc = st.lists(word, min_size=0, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def py_bpe(texts: list[str], top_n: int) -> list[tuple[str, int, int]]:
    wc: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if len(w) >= 2:
                wc[w] += 1
    pc: Counter = Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            pc[w[i:i + 2]] += c
    ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    return [(p, c, i + 1) for i, (p, c) in enumerate(ranked)]


@SLOW
@given(corpus)
def test_bpe_pair_counts_equals_python_reference(spark, texts):
    from kp_data_replication_spark.functions.text import bpe_pair_counts

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [
        (r.pair, r.pair_count, r.rank)
        for r in bpe_pair_counts(df, top_n=10).orderBy("rank").collect()
    ]
    assert got == py_bpe(texts, 10)


@SLOW
@given(corpus, st.integers(min_value=1, max_value=5))
def test_dsir_select_invariants(spark, texts, n_keep):
    """Output has min(n_keep, n_corpus) rows, dense ranks, non-increasing
    logw, ties broken by ascending doc_id, and every id comes from the
    corpus."""
    from kp_data_replication_spark.operators.clustering import dsir_select

    corpus_df = spark.createDataFrame(
        [(i + 10, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    target_df = spark.createDataFrame(
        [(0, "ab cx ab")], "doc_id long, text string"
    )
    rows = (
        dsir_select(corpus_df, target_df, n_keep=n_keep, n_buckets=16)
        .orderBy("rank")
        .collect()
    )
    assert len(rows) == min(n_keep, len(texts))
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert (a.logw, -a.doc_id) >= (b.logw, -b.doc_id)
        assert a.logw > b.logw or a.doc_id < b.doc_id
    assert {r.doc_id for r in rows} <= set(range(10, 10 + len(texts)))


@pytest.mark.parametrize("seed", [7, 23])
def test_semdedup_agrees_with_python_reference(spark, seed):
    """semdedup's full output (cell, dup_of, is_kept) equals a direct
    python recomputation of assignment + greedy keep on a seeded random
    corpus — covering tie and chain shapes no hand fixture pins."""
    import random

    import numpy as np

    from kp_data_replication_spark.operators.similarity import semdedup

    rng = random.Random(seed)
    vecs = {}
    for i in range(40):
        if i >= 4 and rng.random() < 0.4:
            base = vecs[rng.randrange(i)]
            v = [x + rng.choice([0.0, 1e-4]) for x in base]  # near/exact dup
        else:
            v = [rng.uniform(-1, 1) for _ in range(4)]
        vecs[i] = v
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    n_cells, thr = 4, 0.98
    got = {r.vec_id: (r.cell, r.dup_of, r.is_kept)
           for r in semdedup(df, threshold=thr, n_cells=n_cells).collect()}

    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    cents = {c: vecs[c] for c in range(n_cells)}  # lowest-ids sample
    cell = {
        i: max(cents, key=lambda c: (cos(v, cents[c]), c))
        for i, v in vecs.items()
    }
    exp = {}
    for i, v in vecs.items():
        partners = [
            j for j in vecs
            if j < i and cell[j] == cell[i] and cos(vecs[j], v) >= thr
        ]
        dup_of = min(partners) if partners else -1
        exp[i] = (cell[i], dup_of, dup_of == -1)
    assert got == exp
    assert any(not kept for _, _, kept in exp.values())  # dups were planted
