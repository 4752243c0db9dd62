"""Document deduplication suite for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB: every variant is shuffle-bounded by CANDIDATE pairs, not
all pairs — exact dedup is one hash aggregate; Jaccard joins only docs
sharing a shingle; MinHash-LSH joins only docs sharing a band bucket;
SimHash buckets by fingerprint prefix. No cross join ever materializes.

All hash math uses md5-hex-prefix integers so the DuckDB oracles compute
bit-identical results (Spark murmur3 `hash()` has no DuckDB twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact
def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized-content hash: keep the lowest id per group.

    One hash aggregate — map-side partial, no join. Output:
    (keep_id, n_dupes) per distinct content.
    """
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return (
        df.select(F.col(id_col), F.md5(normalized).alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _fanout_partitions(df: DataFrame) -> int:
    """Partition count for per-row fan-out stages (tokenize/explode).

    The corpus parquet files scan as 1-2 input splits, so the whole
    tokenize+explode pipeline otherwise runs in 1-2 tasks. Scale-adaptive:
    derived from defaultParallelism, not a local-mode constant; 2x smooths
    per-document length skew."""
    return 2 * df.sparkSession.sparkContext.defaultParallelism


# ---------------------------------------------------------------- shingles
def _word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (the Jaccard/MinHash unit).

    The tokenization is HOISTED into its own projection: referencing the
    `split()` expression inside a per-position lambda makes codegen
    re-evaluate the regex split once PER SHINGLE POSITION (O(words^2) per
    document — measured 11x slower at sf0.1); materializing the word array
    first evaluates it once per row. Shingle extraction explodes the
    POSITION sequence and builds each n-gram with element_at — explode +
    element_at + concat_ws are all codegen expressions, where the previous
    transform() lambda (a higher-order function, CodegenFallback) built an
    interpreted array-of-strings per document. Values are identical:
    concat_ws over the same n consecutive words. The repartition ahead of
    the tokenize stage spreads the fan-out over the cluster (the scan
    itself yields 1-2 splits)."""
    # HASH-partition by the doc id (not round-robin): the distinct below
    # groups by (doc, shingle) and every downstream consumer aggregates by
    # doc — hashpartitioning(doc) satisfies all of those in place, so the
    # exploded shingle stream (2.6M rows at sf1) never crosses an exchange;
    # only the ~300-byte (doc, text) rows do.
    words = df.repartition(_fanout_partitions(df), F.col(id_col)).select(
        F.col(id_col).alias("doc"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_w"),
    )
    idx = F.explode(
        F.when(
            F.size("_w") >= n, F.sequence(F.lit(1), F.size("_w") - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
    )
    return (
        words.select("doc", "_w", idx.alias("i"))
        .select(
            "doc",
            F.concat_ws(
                " ",
                *[F.element_at(F.col("_w"), F.col("i") + F.lit(j)) for j in range(n)],
            ).alias("shingle"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 256,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard similarity.

    Plan: shingle-explode -> document-frequency cap -> self-equi-join ON
    shingle (only co-occurring docs ever meet) -> pair-intersection counts
    -> broadcast doc sizes -> |A∩B| / (|A|+|B|-|A∩B|) >= threshold.
    Output (doc1, doc2, jaccard).

    ``max_df``: drop shingles occurring in more than max_df documents
    BEFORE the self-join. A shingle shared by d documents contributes d^2/2
    join rows — one ubiquitous phrase ("the end of the") makes a quadratic
    hot group at corpus scale. Near-dup recall is essentially unaffected:
    near-duplicates share many RARE shingles. Jaccard is then computed over
    the rare-shingle universe (sizes use the same filtered set, so the
    measure stays a true Jaccard). None disables the cap.
    """
    # the shingle pipeline feeds FOUR consumers (df-cap, sizes, both join
    # sides); without materialization Spark re-runs the tokenize+explode+
    # distinct subtree per consumer (measured: 16 parquet scans in the
    # sf1 plan, ~4x the query wall). localCheckpoint computes it once;
    # the cap is a broadcast ANTI join against the (tiny) HOT set rather
    # than a shuffle join against the (corpus-sized) rare set — identical
    # semantics (df <= max_df), no shuffle of the shingle stream.
    sh = _word_shingles(df, id_col, text_col, n).localCheckpoint()
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti").localCheckpoint()
    # sizes are attached to the SLIM shingle stream (broadcast, 1 row/doc)
    # BEFORE the pair join, so the threshold filter runs directly on the
    # aggregate output: at sf1 the candidate aggregate holds 114M distinct
    # pairs, and joining sizes after it meant two more passes over that
    # stream; grouping by (doc, sz) on both sides is the same grouping
    # (sz is functionally dependent on doc) with the filter applied in
    # place.
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    szb = F.broadcast(sizes)
    a = sh.join(szb, "doc").select(
        F.col("doc").alias("doc1"), F.col("sz").alias("sz1"), "shingle"
    )
    b = sh.join(szb, "doc").select(
        F.col("doc").alias("doc2"), F.col("sz").alias("sz2"), "shingle"
    )
    return (
        a.join(b, "shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2", "sz1", "sz2")
        .agg(F.count(F.lit(1)).alias("inter"))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


# ---------------------------------------------------------------- minhash + LSH
# fixed permutation parameters (shared verbatim with the oracle SQL);
# a < 2^20 keeps a*H + b < 2^52 — exact in BIGINT on both engines
MINHASH_PRIME = 4294967311  # smallest prime > 2^32
MINHASH_PARAMS = [
    (683, 92821), (1289, 54833), (2089, 13397), (3023, 71993),
    (4519, 28447), (5233, 91193), (6361, 33533), (7561, 45613),
    (8369, 60257), (9283, 77041), (10301, 22193), (11731, 84631),
    (12889, 38321), (14033, 65837), (15259, 17903), (16411, 50591),
]
LSH_BANDS = 4  # 16 hashes -> 4 bands x 4 rows


def shingle_hash(col) -> F.Column:
    """32-bit integer hash of a shingle via md5 hex prefix — identical in
    DuckDB: ('0x' || substr(md5(s),1,8))::UBIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _minhash_wide(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """One row per doc with all k minhash values as columns (_m0.._mk).

    Plan: distinct shingles -> hash to int -> ONE groupBy(doc) computing
    the k permutation minima as k aggregate expressions. Replaces the
    k-way broadcast-params explode (k x the shingle stream through the
    aggregate) with k map-side min columns over the un-exploded stream;
    the shuffle then carries one partial row per (map partition, doc)
    instead of k. Identical integer math: min((a*H+b) mod p) per doc."""
    sh = _word_shingles(df, id_col, text_col, n).withColumn(
        "h", shingle_hash(F.col("shingle"))
    )
    return sh.groupBy("doc").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME).alias(f"_m{i}")
            for i, (a, b) in enumerate(MINHASH_PARAMS)
        ]
    )


def minhash_signatures(
    df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """k=16 MinHash signature per document.

    One groupBy(doc) with k min-aggregate columns (see
    :func:`_minhash_wide`), stacked back to the (doc, i, minhash) contract
    with a bounded posexplode.
    """
    wide = _minhash_wide(df, n, id_col, text_col)
    return wide.select(
        "doc",
        F.posexplode(
            F.array(*[F.col(f"_m{i}") for i in range(len(MINHASH_PARAMS))])
        ).alias("i", "minhash"),
    )


def band_buckets(
    df: DataFrame,
    n: int = 3,
    bands: int = LSH_BANDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document LSH band buckets: (doc, band, bucket) — bucket = md5 of
    the band's concatenated minhash values. The shared signature kernel of
    :func:`minhash_lsh_pairs` and the incremental changefeed-maintained
    index (operators/dedup_incremental.py): both MUST hash identically or
    incremental pairs would diverge from full recompute.

    Buckets are built straight from the wide per-doc signature row, with
    the historical array_sort(collect_list("i:minhash")) element order
    precomputed: within a band the "i:minhash" strings always compare on
    the "i:" prefix alone (distinct i, and ':' participates in the
    comparison before any minhash digit can), so the sorted order is a
    STATIC permutation of the band's hash indices — e.g. band 2 is
    [10, 11, 8, 9]. Byte-identical buckets, one aggregate instead of two.
    """
    wide = _minhash_wide(df, n, id_col, text_col)
    rows_per_band = len(MINHASH_PARAMS) // bands

    def bucket_for(b: int) -> F.Column:
        ids = range(b * rows_per_band, (b + 1) * rows_per_band)
        order = sorted(ids, key=lambda i: f"{i}:")
        return F.md5(
            F.concat_ws(
                "-",
                *[
                    F.concat_ws(":", F.lit(str(i)), F.col(f"_m{i}").cast("string"))
                    for i in order
                ],
            )
        )

    return wide.select(
        "doc",
        F.posexplode(F.array(*[bucket_for(b) for b in range(bands)])).alias(
            "band", "bucket"
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    bands: int = LSH_BANDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing ANY band bucket.

    bucket = md5 of the band's concatenated minhash values; the self-join is
    on (band, bucket) — only colliding docs meet. Output (doc1, doc2,
    n_shared_bands).
    """
    # both self-join sides read the band table: materialize it once
    # (4 slim rows per doc) instead of re-running the whole shingle+minhash
    # pipeline per side
    banded = band_buckets(df, n, bands, id_col, text_col).localCheckpoint()
    x = banded.select(F.col("doc").alias("doc1"), "band", "bucket")
    y = banded.select(F.col("doc").alias("doc2"), "band", "bucket")
    return (
        x.join(y, ["band", "bucket"])
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


# ---------------------------------------------------------------- simhash
SIMHASH_BITS = 32


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash over distinct word hashes.

    Each word votes ±1 per bit position of its 32-bit hash; fingerprint bit
    = 1 where the vote sum is positive. The 32 per-position vote sums are
    computed as 32 aggregate expressions over the UN-exploded token stream
    (one groupBy(doc), map-side partial) — the same wide-aggregate shape as
    :func:`_minhash_wide` — instead of a ×32 position explode feeding two
    chained aggregates. Integer math is unchanged: per position,
    sum(±1 over distinct words), fingerprint bit set where the sum is
    positive. The repartition hash-partitions by doc so the (doc, word)
    distinct and the per-doc aggregate both run without a further exchange.
    Output: (doc, simhash).
    """
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    tokens = (
        df.repartition(_fanout_partitions(df), F.col(id_col))
        .select(F.col(id_col).alias("doc"), F.explode(w).alias("word"))
        .distinct()
        .withColumn("h", shingle_hash(F.col("word")))
    )
    votes = tokens.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.expr(f"(shiftright(h, {pos}) & 1) = 1"), 1).otherwise(-1)
            ).alias(f"_v{pos}")
            for pos in range(SIMHASH_BITS)
        ]
    )
    fingerprint = None
    for pos in range(SIMHASH_BITS):
        term = F.when(F.col(f"_v{pos}") > 0, F.lit(1 << pos).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select("doc", fingerprint.alias("simhash"))


def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "doc_id",
    probe_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    n-gram with an evaluation/probe set (train-test overlap is one of the
    classic training-corpus failure modes).

    Plan shape for 100 TB: the probe side (benchmark suites — thousands of
    documents at most) shingles into a small set that is BROADCAST; the
    corpus side streams through the join with no shuffle of document text,
    and the per-doc aggregation is a hash aggregate on (doc, shingle) hits
    only. Output: (id_col, n_hit_ngrams, n_probes) for CONTAMINATED docs —
    anti-join the corpus against it for the clean set.
    """
    d = _word_shingles(docs, id_col, text_col, n)
    p = (
        _word_shingles(probes, probe_id_col, probe_text_col, n)
        .withColumnRenamed("doc", "probe")
    )
    return (
        d.join(F.broadcast(p), "shingle")
        .groupBy("doc")
        .agg(
            F.countDistinct("shingle").alias("n_hit_ngrams"),
            F.countDistinct("probe").alias("n_probes"),
        )
        .withColumnRenamed("doc", id_col)
    )


# ------------------------------------------------------- substring spans
def substring_spans(
    df: DataFrame,
    k: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int | None = 256,
) -> DataFrame:
    """Exact duplicated-SUBSTRING spans across documents — the span-level
    exact-substring dedup of Lee et al. 2021 ("Deduplicating Training Data
    Makes Language Models Better"), re-expressed Spark-first: the paper's
    suffix array (inherently sequential, single-address-space) is replaced
    by a CONTENT-ANCHORED k-gram digest equi-join, the distributed-friendly
    form of the same detector.

    Anchoring is the load-bearing choice. Sampling gram positions at a
    fixed stride looks cheaper but is alignment-BLIND: two documents
    sharing a run at offsets that differ by a non-multiple of the stride
    never sample the same gram (a duplicate prefixed by one extra word
    escapes detection entirely). Anchoring gram starts at CONTENT features
    — here word starts, the same idea as winnowing (Schleimer et al. 2003)
    and content-defined chunking — makes both copies of a shared run pick
    identical in-run positions regardless of where the run sits in each
    document.

    Plan: per document, generate candidate positions (explode of a
    sequence — pipelined inside one codegen stage, never materialized),
    keep word-start anchors (1-char probe, then md5 only for survivors —
    anchor density ~1/avg-word-len); digest each k-char gram with md5 (the
    shuffle carries 16-byte digests, never text — and the DuckDB oracle
    computes the identical digest); cap ubiquitous grams BEFORE the
    self-join (a gram occurring d times contributes O(d^2) join rows —
    boilerplate headers/license blocks are the quadratic hot keys at
    corpus scale, exactly the Jaccard max_df story); self-equi-join on
    digest (candidate-bounded: only docs sharing an exact k-gram ever
    meet); then merge overlapping/adjacent hits into MAXIMAL spans with a
    gaps-and-islands window per (doc_a, doc_b) pair.

    Detection guarantee: every reported span is an exact duplicated
    substring of length >= k present in both documents (md5 collisions are
    negligible and would only ADD a span, deterministically on both
    engines); a shared run is detected once it contains a word start with
    >= k chars of run remaining — i.e. runs of length >= k + one word.
    Wordless blobs (base64, DNA) anchor only at position 1; route those
    through a byte-level anchor upstream if span dedup matters there.

    100-TB shape: the candidate generator streams len rows/doc through one
    WholeStageCodegen filter (O(corpus bytes) map-side CPU, zero shuffle);
    only ~len/6 anchored digests reach the exchange; the join fan-out is
    bounded by max_occurrences; the islands window partitions by
    (doc_a, doc_b) — millions of independent small groups, no skew pole.
    Nothing here is O(corpus^2).

    Output: (doc_a, doc_b, span_start, span_end, n_grams), span in doc_a
    coordinates, 1-based inclusive, doc_a < doc_b.
    """
    d = df.select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("_t")
    ).filter(F.length("_t") >= k)
    pos = F.col("pos")
    grams = (
        d.select(
            "doc",
            F.explode(
                F.sequence(F.lit(1), F.length("_t") - (k - 1), F.lit(1))
            ).alias("pos"),
            "_t",
        )
        # word-start anchor: doc start, or the char before is a space
        .filter(
            (pos == 1) | (F.substring(F.col("_t"), pos - 1, F.lit(1)) == " ")
        )
        .select(
            "doc",
            pos.cast("long").alias("pos"),
            F.md5(F.substring(F.col("_t"), pos, F.lit(k))).alias("h"),
        )
    )
    if max_occurrences is not None:
        # cap as an ANTI-join against the HOT set, not a semi-join against
        # the rare set: at corpus scale almost every gram is rare (the rare
        # set is ~all grams — unbroadcastable), while the hot set is just
        # the boilerplate grams — small by construction, so the exclusion
        # is a broadcast anti-join that never shuffles the gram stream
        hot = (
            grams.groupBy("h")
            .agg(F.count(F.lit(1)).alias("occ"))
            .filter(F.col("occ") > max_occurrences)
            .select("h")
        )
        grams = grams.join(F.broadcast(hot), "h", "left_anti")
    a = grams.select(F.col("doc").alias("doc_a"), F.col("pos").alias("pos_a"), "h")
    b = grams.select(F.col("doc").alias("doc_b"), "h")
    hits = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pos_a")
        .distinct()
    )
    w = W.partitionBy("doc_a", "doc_b").orderBy("pos_a")
    # adjacent/overlapping grams (gap <= k) fuse into one island; the two
    # window functions share partitioning+ordering -> one sort, one pass
    flagged = hits.withColumn(
        "_new",
        F.when(F.col("pos_a") - F.lag("pos_a").over(w) > k, 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        islands.groupBy("doc_a", "doc_b", "_island")
        .agg(
            F.min("pos_a").alias("span_start"),
            (F.max("pos_a") + (k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select("doc_a", "doc_b", "span_start", "span_end", "n_grams")
    )
