"""Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003) — the
standard local document fingerprinting behind MOSS-style code-clone
detection, re-expressed as two sliding-extremum window passes so the WHOLE
selection runs JVM-side with zero UDFs and has an exact DuckDB twin.

Why this matters for a source-code corpus (the reference replicates code
repository topics — mirror-maker-2/data payloads are code-adjacent JSON,
and the target table here is (repo, path, content) source files): exact
and shingle-set dedup miss PARTIAL clones — a function pasted into an
otherwise different file. Winnowing guarantees that any shared substring
of length >= w + k - 1 contributes at least one SHARED fingerprint, while
selecting only ~2/(w+1) of all k-gram positions, so the downstream
candidate join runs on a corpus-sized-but-sparse fingerprint table.

The Spark-first reformulation (the load-bearing idea of this module):
classic winnowing slides a w-window over the per-position k-gram hashes
and keeps each window's minimum — an inherently sequential scan in the
paper. With (effectively) distinct hashes it is equivalent to a closed
form over two sliding extrema:

    win_min[s] = min(h[s .. s+w-1])                  (valid s only)
    selected p <=> h[p] == max(win_min[s] for valid s in [p-w+1, p])

because h[p] >= win_min[s] for every window covering p, with equality iff
p IS that window's minimum — so "p is the min of at least one covering
window" is exactly "the largest covering-window minimum equals h[p]".
Both passes are plain `min`/`max` OVER (PARTITION BY doc ORDER BY pos
ROWS BETWEEN ...) — one shuffle by doc, one sort, WholeStageCodegen
throughout, and DuckDB evaluates the identical frames for the oracle.

Tie semantics: where duplicate hashes tie within a window, this selects
ALL tied minima instead of the paper's rightmost-one — a deterministic
superset on both engines (md5 ties across positions are negligible; a
superset can only ADD detections, never lose the guarantee).

100-TB shape: the candidate explode streams len(text) rows per doc through
one codegen stage (same cost class as the substring-span detector); the
shuffle key is the doc id — millions of small independent groups, no skew
pole; the fingerprint output is ~2/(w+1) of positions, and the match join
is candidate-bounded by shared fingerprints with the usual document-
frequency cap killing boilerplate hot keys (license headers) before the
quadratic join.

Reference anchors: the corpus being replicated is keyed (repo, path) with
full file content (docs/index.md:41, README.md:68); partial-clone
detection is the code-corpus twin of the near-dup operators the training-
data funnel already runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def winnow_fingerprints(
    df: DataFrame,
    k: int = 16,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Selected winnowing fingerprints: one row per (doc, pos) whose k-gram
    hash is the minimum of at least one w-window of consecutive k-grams.

    Guarantee (paper, Thm 1 shape): two documents sharing any substring of
    length >= w + k - 1 share at least one (fp) value; expected density of
    selected positions is 2/(w+1). Documents shorter than w + k - 1 chars
    have no full window and emit nothing (route them through exact dedup —
    they are cheaper to compare whole).

    Output: (doc, pos, fp) — pos 1-based char offset of the k-gram, fp the
    md5 hex digest (md5 so the DuckDB oracle is bit-identical; the 16-byte
    digest is also what the shuffle carries, never text).
    """
    n = (F.length("_t") - (k - 1)).cast("long")  # number of k-gram positions
    # hash-repartition by doc BEFORE the per-position explode: the window
    # passes below need hashpartitioning(doc), and establishing it on the
    # (doc, text) rows moves ~300 bytes/doc through the exchange instead of
    # the exploded ~60 bytes/POSITION (56x fewer shuffle bytes at sf1:
    # 15 MB vs 840 MB) — the explode, md5, and both sliding extrema then
    # run inside one post-shuffle stage with no further exchange. The
    # partition count is scale-adaptive (defaultParallelism), never a
    # local-mode constant.
    n_parts = 2 * df.sparkSession.sparkContext.defaultParallelism
    d = (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_t"))
        .filter(F.length("_t") >= k + w - 1)
        .repartition(n_parts, "doc")
    )
    pos = F.col("pos")
    g = d.select(
        "doc",
        n.alias("_n"),
        F.explode(F.sequence(F.lit(1), n, F.lit(1))).alias("pos"),
        "_t",
    ).select(
        "doc",
        "_n",
        pos.cast("long").alias("pos"),
        F.md5(F.substring(F.col("_t"), pos, F.lit(k))).alias("h"),
    )
    fwd = W.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    back = W.partitionBy("doc").orderBy("pos").rowsBetween(-(w - 1), 0)
    # win_min is defined only for window STARTS that fit entirely in the
    # doc; the masked rows stay NULL and max() skips them in both engines.
    m = g.withColumn(
        "_wm",
        F.when(pos <= F.col("_n") - (w - 1), F.min("h").over(fwd)),
    )
    s = m.withColumn("_mx", F.max("_wm").over(back))
    return (
        s.filter(F.col("h") == F.col("_mx"))
        .select("doc", "pos", F.col("h").alias("fp"))
    )


def winnow_match_pairs(
    df: DataFrame,
    k: int = 16,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 2,
    max_df: int = 256,
) -> DataFrame:
    """Partial-clone candidate pairs: documents sharing >= min_shared
    winnowing fingerprints, the MOSS candidate generator.

    The document-frequency cap runs BEFORE the self-join — a fingerprint
    present in d documents contributes O(d^2) join rows, and boilerplate
    (license blocks, generated headers) is exactly the hot-key family at
    corpus scale; capping mirrors the Jaccard/substring-span operators so
    all three detectors share one scaling argument.

    Shared fingerprints are counted as DISTINCT fp VALUES per pair (a
    fingerprint repeated at several positions in both docs still counts
    once) — the paper's set-of-fingerprints view, and the form that keeps
    the oracle an exact twin.

    Output: (doc1, doc2, n_shared), doc1 < doc2, descending-count order is
    NOT imposed (let the caller sort; the driver compare is order-free).
    """
    fps = winnow_fingerprints(df, k=k, w=w, id_col=id_col, text_col=text_col)
    # the distinct fingerprint set feeds THREE consumers (df-cap and both
    # self-join sides); without materialization the whole explode+md5+
    # window selection re-runs per consumer (8 parquet scans in the sf1
    # plan). One localCheckpoint computes it once; the df-cap is a
    # broadcast ANTI join against the tiny HOT set (boilerplate
    # fingerprints), identical semantics to the rare-semi-join, with no
    # shuffle of the fingerprint stream.
    sets = fps.select("doc", "fp").distinct().localCheckpoint()
    hot = (
        sets.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("fp")
    )
    sf = sets.join(F.broadcast(hot), "fp", "left_anti")
    a = sf.select(F.col("doc").alias("doc1"), "fp")
    b = sf.select(F.col("doc").alias("doc2"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
