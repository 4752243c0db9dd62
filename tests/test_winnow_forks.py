"""Winnowing fingerprints (operators/winnow.py) and repo-level fork
detection (operators/forks.py).

The winnowing reference implementation below is the PAPER's algorithm
(Schleimer et al. 2003, Fig. 5 shape): slide a w-window over k-gram
hashes, record each window's minimum position. With distinct hashes the
per-window minimum is unique, so the selected SET equals "positions that
are the min of at least one window" — exactly the closed form the Spark
operator computes with two sliding extrema. Ties select all tied minima
(documented superset semantics); the random corpora here use md5 so ties
never occur.
"""

from __future__ import annotations

import hashlib
import random

import pytest

from kp_data_replication_spark.operators.forks import fork_pairs, repo_file_sets
from kp_data_replication_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_match_pairs,
)


def _ref_winnow(text: str, k: int, w: int) -> set[tuple[int, str]]:
    """Brute-force classic winnowing: every full window's minima (1-based)."""
    n = len(text) - k + 1
    if n < w:
        return set()
    hs = [hashlib.md5(text[i : i + k].encode()).hexdigest() for i in range(n)]
    out: set[tuple[int, str]] = set()
    for s in range(n - w + 1):
        window = hs[s : s + w]
        m = min(window)
        for j, h in enumerate(window):
            if h == m:
                out.add((s + j + 1, h))
    return out


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("abcdef gh") for _ in range(n))


def test_winnow_matches_bruteforce_reference(spark):
    rng = random.Random(7)
    docs = [(i, _rand_text(rng, rng.randint(5, 120))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k, w = 8, 5
    got = {
        (r["doc"], r["pos"], r["fp"])
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }
    exp = {
        (i, pos, fp) for i, t in docs for (pos, fp) in _ref_winnow(t, k, w)
    }
    assert got == exp and exp  # non-vacuous: some docs are long enough


def test_winnow_guarantee_shared_substring(spark):
    # any shared substring of length >= w + k - 1 shares a fingerprint
    rng = random.Random(11)
    k, w = 16, 8
    shared = _rand_text(rng, k + w - 1)
    a = _rand_text(rng, 200) + shared + _rand_text(rng, 150)
    b = _rand_text(rng, 90) + shared + _rand_text(rng, 300)
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    rows = winnow_fingerprints(df, k=k, w=w).collect()
    fps1 = {r["fp"] for r in rows if r["doc"] == 1}
    fps2 = {r["fp"] for r in rows if r["doc"] == 2}
    assert fps1 & fps2


def test_winnow_short_doc_selects_nothing(spark):
    k, w = 16, 8
    df = spark.createDataFrame(
        [(1, "x" * (k + w - 2)), (2, "y" * (k + w - 1))],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(df, k=k, w=w).collect()
    assert {r["doc"] for r in rows} == {2}


def test_winnow_density_is_near_two_over_w_plus_one(spark):
    rng = random.Random(23)
    k, w = 8, 7
    text = _rand_text(rng, 8000)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_sel = winnow_fingerprints(df, k=k, w=w).count()
    n_pos = len(text) - k + 1
    density = n_sel / n_pos
    assert 0.5 * 2 / (w + 1) < density < 2.0 * 2 / (w + 1)


def test_winnow_match_pairs_planted_clone_and_df_cap(spark):
    rng = random.Random(31)
    k, w = 16, 8
    clone = _rand_text(rng, 120)  # >> w + k - 1: many shared fingerprints
    boiler = _rand_text(rng, 120)  # license header present in EVERY doc
    docs = [(i, boiler + " " + _rand_text(rng, 250)) for i in range(12)]
    docs[3] = (3, docs[3][1] + clone)
    docs[9] = (9, clone + docs[9][1])
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r["doc1"], r["doc2"]): r["n_shared"]
        for r in winnow_match_pairs(
            df, k=k, w=w, min_shared=2, max_df=4
        ).collect()
    }
    # the planted clone pair survives; boilerplate-only pairs are killed
    # by the df cap (its fingerprints occur in all 12 docs > max_df=4)
    assert (3, 9) in pairs and pairs[(3, 9)] >= 2
    assert all(p == (3, 9) for p in pairs)


def test_fork_pairs_exact_and_partial(spark):
    # repo a: files 0..9; repo b: fork of a missing 2, plus 1 new file;
    # repo c: disjoint; every repo also carries one ubiquitous sha (capped)
    rows = []
    for i in range(10):
        rows.append(("a", f"sha{i}"))
    rows += [("b", f"sha{i}") for i in range(8)] + [("b", "shaX")]
    rows += [("c", f"other{i}") for i in range(6)]
    rows += [(r, "LICENSE") for r in ("a", "b", "c")]
    files = spark.createDataFrame(rows, "repo string, sha string")
    got = {
        (r["repo1"], r["repo2"]): (r["n_common"], r["n1"], r["n2"], r["jaccard"])
        for r in fork_pairs(files, min_jaccard=0.3, max_df=2).collect()
    }
    # capped universe: LICENSE (df=3 > 2) excluded from sizes AND common
    assert got == {("a", "b"): (8, 10, 9, round(8 / (10 + 9 - 8), 4))}


def test_repo_file_sets_distinct(spark):
    state = spark.createDataFrame(
        [("a", "f1", "s1"), ("a", "f2", "s1"), ("a", "f3", "s2")],
        "repo string, path string, content_sha string",
    )
    got = {
        (r["repo"], r["sha"]) for r in repo_file_sets(state).collect()
    }
    assert got == {("a", "s1"), ("a", "s2")}
