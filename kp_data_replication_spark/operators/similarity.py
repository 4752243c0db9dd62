"""Similarity search over embedding columns: brute-force cosine top-k and an
LSH-bucketed approximate variant.

Scale design: brute-force is the correctness baseline (and is exactly right
when the query set is small — broadcast the queries, one pass over the
corpus, per-partition top-k then global top-k). The scale path buckets the
corpus by random-hyperplane LSH signs so each query probes only its bucket
(IVF-style); recall/probe trade is tunable with n_planes/probe_hamming.

The dot products run in JVM expressions (`aggregate`/`zip_with` over
array<float>) so Catalyst keeps the whole plan codegen'd; a numpy pandas-UDF
twin exists for wide vectors where Arrow batching wins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _pairwise_partitions(df: DataFrame) -> int:
    """Partition count for pairwise-scoring stages.

    The corpus parquet files are written with few row groups, so a scan
    yields 1-2 input splits; any join that then evaluates a per-PAIR cosine
    runs its fan-out (corpus x candidates) inside those 1-2 tasks — measured
    110s single-task vs 4.6s at 64 tasks for the same 20M-pair join at sf1.
    An explicit round-robin repartition ahead of the pairwise stage spreads
    the fan-out over the cluster. Scale-adaptive: derived from
    defaultParallelism (cores in local mode, executors x cores on a real
    cluster), never a local[32] constant; 2x smooths per-bucket skew.
    """
    return 2 * df.sparkSession.sparkContext.defaultParallelism


def dot_expr(a, b) -> F.Column:
    """Dot product of two array<float/double> columns, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a) -> F.Column:
    """L2 norm of an array<float/double> column, JVM-side."""
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _py_norm(vals) -> float:
    """Driver-side twin of norm_expr: same left-to-right IEEE fold."""
    import math

    acc = 0.0
    for x in vals:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def _nearest_cell_inline(vec_col, norm_col, crows, cell_type) -> F.Column:
    """Argmax cell over a CODEBOOK-sized centroid list, inlined.

    ``crows``: [(cell, centroid_values, cenn)]. Returns the same
    (sim desc, cell desc) argmax as max_by(cell, struct(sim, cell)) over a
    broadcast centroid table — greatest() over (sim, cell) structs is the
    identical lexicographic maximum — but with the per-cell dot products
    inlined as literal-array expressions, so the assignment is ONE
    map-side projection instead of a crossJoin fan-out + re-group
    exchange. Bit-identical sims: literal doubles equal the cast
    centroid values, same fold order, same division."""
    structs = [
        F.struct(
            (
                # one array literal per centroid (lit over a Python list),
                # not one py4j lit() per element: the codebook otherwise
                # costs n_cells x dim driver round-trips PER PLAN BUILD —
                # a fixed ~0.5s of pure py4j chatter at 16x64
                dot_expr(F.col(vec_col), F.lit([float(x) for x in cv]))
                / (F.col(norm_col) * F.lit(float(cn)))
            ).alias("_s"),
            F.lit(c).cast(cell_type).alias("_c"),
        )
        for (c, cv, cn) in crows
    ]
    best = F.greatest(*structs) if len(structs) > 1 else structs[0]
    return best["_c"]


def cosine_expr(a, b) -> F.Column:
    """Cosine similarity of two array<float/double> columns, JVM-side.

    For PAIRWISE scoring after a join, hoist each side's norm into its own
    projection (``norm_expr``) and divide the dot by the product — this
    inline form re-aggregates both norms per PAIR (k x redundant against a
    k-candidate side); the hoisted form is bitwise identical
    (same sqrt(sum) computation, same division order)."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (self-match excluded).

    Broadcast the (small) query side; rank with a window partitioned by
    query. Ties broken by corpus id for determinism. Output:
    (query_id, neighbor_id, cos_sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        norm_expr(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.repartition(_pairwise_partitions(corpus)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        norm_expr(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            dot_expr(F.col("_qvec"), F.col("_cvec"))
            / (F.col("_qn") * F.col("_cn")),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos_sim"), "rank")
    )


# fixed pseudo-random hyperplanes: plane p component j = centered md5 hash
# of "p:j" — deterministic, identical in SQL if ever needed there
def _plane_component(p: int, j) -> F.Column:
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(str(p)), j.cast("string"))), 1, 8), 16, 10).cast("double")
    return h - F.lit(2147483648.0)  # center around 0


def _plane_vector(p: int, dim: int) -> list[float]:
    """Driver-side twin of :func:`_plane_component`: the same centered md5
    values, precomputed — planes are DATA-INDEPENDENT, so there is no
    reason to recompute ~n_planes x dim md5s per vector at runtime."""
    import hashlib

    return [
        float(int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:8], 16))
        - 2147483648.0
        for j in range(1, dim + 1)
    ]


def lsh_signature(vec_col, n_planes: int = 8, dim: int | None = None) -> F.Column:
    """Random-hyperplane sign bits packed into an int — the LSH bucket id.

    ``dim`` (the fixed embedding width — the normal case): plane
    components are inlined as literal arrays, zero runtime hashing,
    bit-identical values. Must equal every vector's actual length (a
    longer vector would null-pad the zip and zero its sign bit). Without
    ``dim`` the components are computed per element (any-width fallback,
    and the form the DuckDB oracle mirrors)."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        if dim is not None:
            plane = F.array(*[F.lit(v) for v in _plane_vector(p, dim)])
        else:
            plane = F.transform(
                F.sequence(F.lit(1), F.size(vec_col)),
                lambda j: _plane_component(p, j),
            )
        dot = F.aggregate(
            F.zip_with(vec_col, plane, lambda x, pl: x.cast("double") * pl),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket.

    At 10^9 vectors the bucket join replaces the full scan with ~corpus/2^b
    candidates per query; recall is tunable via n_planes (fewer planes =
    bigger buckets = higher recall). Output schema matches the brute-force
    variant for drop-in comparison.
    """
    # fixed-width embedding columns: inline the plane literals (one tiny
    # first() probe; None on an empty corpus keeps the dynamic fallback)
    first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = first["d"] if first is not None else None
    c = corpus.repartition(_pairwise_partitions(corpus)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        norm_expr(F.col(vec_col)).alias("_cn"),
        lsh_signature(F.col(vec_col), n_planes, dim=dim).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        norm_expr(F.col(vec_col)).alias("_qn"),
        lsh_signature(F.col(vec_col), n_planes, dim=dim).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            dot_expr(F.col("_qvec"), F.col("_cvec"))
            / (F.col("_qn") * F.col("_cn")),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos_sim"), "rank")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> DataFrame:
    """Spherical k-means (Lloyd) IVF centroid training, distributed.

    Replaces the deterministic first-N-ids sample with DATA-ADAPTIVE
    centroids: on clustered (non-uniform) corpora a sampled init can land
    every centroid inside one true cluster, collapsing probe recall; 2-3
    Lloyd iterations spread the cells over the actual density
    (tests/test_training_data_ops.py asserts the recall uplift on exactly
    that adversarial distribution).

    Scale shape (10^9 vectors): training runs on a deterministic hash-mod
    SAMPLE of the corpus (``sample_mod``; FAISS practice is ~256 vectors
    per cell — the quantizer is model state, not per-query work). Each
    iteration is one broadcast-assign (argmax over n_cells, the same plan
    the probe uses) + one posexplode mean (shuffle bounded by
    sample x dim), and the n_cells x dim update is collected driver-side —
    bounded by the codebook size, never the corpus. Init picks ``n_cells``
    hash-ordered vectors (deterministic pseudo-random spread, no
    data-order bias). Empty cells keep their previous centroid.

    Returns a (cell int, _centroid array<double>) DataFrame — plug
    straight into :func:`cosine_topk_ivf`'s ``centroids`` parameter.
    """
    spark = corpus.sparkSession
    df = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if sample_mod and sample_mod > 1:
        df = df.filter(F.pmod(F.hash(F.col("_id")), F.lit(sample_mod)) == 0)
    init_rows = (
        df.orderBy(F.md5(F.col("_id").cast("string")))
        .limit(n_cells)
        .select("_v")
        .collect()
    )
    cents = [[float(x) for x in r["_v"]] for r in init_rows]

    cent_schema = "cell int, _centroid array<double>"
    # hoisted row norms, persisted: every Lloyd iteration's assignment AND
    # update job reuses the materialized (id, vec, norm) sample instead of
    # re-reading + re-norming the corpus
    dfn = (
        df.repartition(_pairwise_partitions(df))
        .select("_id", "_v", norm_expr(F.col("_v")).alias("_vn"))
        .persist()
    )
    for _ in range(max(0, n_iters)):
        # inline the codebook (it lives driver-side between rounds anyway):
        # the assignment is a map-side projection over the persisted
        # sample instead of a crossJoin fan-out + re-group exchange per
        # round. Centroid norms fold left-to-right in IEEE doubles exactly
        # like norm_expr (Python floats ARE IEEE doubles).
        crows = [(c, cv, _py_norm(cv)) for c, cv in enumerate(cents)]
        assigned = dfn.withColumn(
            "cell", _nearest_cell_inline("_v", "_vn", crows, "int")
        ).select("_id", "_v", "cell")
        # spherical mean: average the L2-normalized members per cell
        # (posexplode -> (cell, pos) avg; rows shuffled = sample x dim).
        # The norm is HOISTED into its own projection — referencing the
        # aggregate inside the transform lambda would re-evaluate it per
        # element (O(dim^2) per vector)
        upd = (
            assigned.select(
                "cell",
                "_v",
                F.sqrt(
                    F.aggregate(
                        F.col("_v"),
                        F.lit(0.0),
                        lambda a, x: a + x.cast("double") * x.cast("double"),
                    )
                ).alias("_norm"),
            )
            .select(
                "cell",
                F.posexplode(
                    F.transform(
                        F.col("_v"), lambda x: x.cast("double") / F.col("_norm")
                    )
                ).alias("pos", "val"),
            )
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new_cents = {c: list(v) for c, v in enumerate(cents)}  # keep empty cells
        by_cell: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        for c, comps in by_cell.items():
            new_cents[c] = [comps[p] for p in sorted(comps)]
        cents = [new_cents[c] for c in range(n_cells)]
    dfn.unpersist()
    return spark.createDataFrame(list(enumerate(cents)), cent_schema)


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``n_cells`` Voronoi cells, probe each query's ``n_probe`` nearest cells.

    This is the 10^9-vector shape hyperplane-LSH lacks: LSH bucket
    occupancy is data-blind (2^planes buckets regardless of the
    distribution — at a billion vectors a bucket still holds millions),
    while IVF cells adapt to the data and candidate count per query is
    ~n_probe/n_cells of the corpus, tunable independently of recall via
    multi-probe. Default centroids are a deterministic data sample (the
    lowest n_cells ids) — k-means-free, reproducible, exact-oracle
    friendly; pass ``centroids`` (e.g. from :func:`train_ivf_centroids`)
    for data-adaptive cells on clustered corpora. At real scale centroids
    come precomputed (they're model state, not per-query work) and the
    cell assignment is one broadcast join + argmax, done ONCE at ingest
    and persisted as a partition column.

    Output schema matches cosine_topk_bruteforce (query_id, neighbor_id,
    cos_sim, rank) for drop-in recall comparison.
    """
    if centroids is not None:
        cents = centroids.select(
            F.col("cell"), F.col("_centroid")
        )
    else:
        cents = (
            corpus.orderBy(id_col)
            .limit(n_cells)
            .select(
                F.col(id_col).alias("cell"),
                F.col(vec_col).alias("_centroid"),
            )
        )
    # hoisted norms: one norm per row/centroid instead of re-aggregating
    # inside every pair's cosine (bitwise-identical scores)
    cents = cents.select(
        "cell", "_centroid", norm_expr(F.col("_centroid")).alias("_cenn")
    )
    # corpus -> nearest cell: the codebook is bounded by construction, so
    # collect it once (norms JVM-computed above) and inline the argmax as
    # a map-side projection — no crossJoin fan-out, no re-group exchange.
    # Deterministic argmax: ties on cosine break toward the larger cell id
    # (lexicographic struct maximum), matching the SQL oracle.
    crows = [(r["cell"], list(r["_centroid"]), r["_cenn"]) for r in cents.collect()]
    cell_type = cents.schema["cell"].dataType
    c_base = corpus.repartition(_pairwise_partitions(corpus)).select(
        F.col(id_col), F.col(vec_col), norm_expr(F.col(vec_col)).alias("_cn")
    )
    if not crows:
        c_assigned = c_base.withColumn("cell", F.lit(None).cast(cell_type)).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cvec"),
            "_cn",
            "cell",
        )
    else:
        c_assigned = c_base.withColumn(
            "cell", _nearest_cell_inline(vec_col, "_cn", crows, cell_type)
        ).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cvec"),
            "_cn",
            "cell",
        )
    # query -> its n_probe nearest cells (multi-probe)
    wq = W.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("cell"))
    q_probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            norm_expr(F.col(vec_col)).alias("_qn"),
        )
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "_sim",
            dot_expr(F.col("_qvec"), F.col("_centroid"))
            / (F.col("_qn") * F.col("_cenn")),
        )
        .withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "_qvec", "_qn", "cell")
    )
    scored = (
        c_assigned.join(F.broadcast(q_probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            dot_expr(F.col("_qvec"), F.col("_cvec"))
            / (F.col("_qn") * F.col("_cn")),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos_sim"), "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    bucket_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within coarse buckets.

    The bucket equi-join (here: a label/cluster column; in production an IVF
    coarse quantizer) bounds the pair blowup; cosine filters inside buckets.
    Output: (id1, id2, cos_sim).
    """
    a = df.repartition(_pairwise_partitions(df)).select(
        F.col(bucket_col).alias("_b"), F.col(id_col).alias("id1"),
        F.col(vec_col).alias("_v1"), norm_expr(F.col(vec_col)).alias("_n1"),
    )
    b = df.select(
        F.col(bucket_col).alias("_b"), F.col(id_col).alias("id2"),
        F.col(vec_col).alias("_v2"), norm_expr(F.col(vec_col)).alias("_n2"),
    )
    return (
        a.join(b, "_b")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn(
            "cos",
            dot_expr(F.col("_v1"), F.col("_v2")) / (F.col("_n1") * F.col("_n2")),
        )
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", F.round("cos", 4).alias("cos_sim"))
    )


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv
    2303.09540): coarse-cluster the corpus, then inside each cluster drop
    every vector that has a lower-id near-duplicate (cosine >= threshold).

    The cluster equi-join is what makes this the 10^10-vector shape: the
    pairwise cosine never runs corpus x corpus, only within cells whose
    population is ~1/n_cells of the corpus (the paper uses ~100k clusters at
    browser-scale; n_cells is the same knob). The keep rule is the greedy
    deterministic variant — keep the lowest id of each near-dup chain —
    rather than the paper's keep-farthest-from-centroid, so the whole
    pipeline stays exactly reproducible in the SQL oracle (same trade the
    sampled-centroid IVF makes vs trained k-means).

    Default centroids are the deterministic lowest-``n_cells``-ids sample
    (exact-oracle friendly, identical to :func:`cosine_topk_ivf`); pass a
    ``centroids`` frame (e.g. :func:`train_ivf_centroids`) for data-adaptive
    cells. At real scale the cell assignment is done once at ingest and
    persisted (see operators/ann_incremental.py) — this batch form exists
    for the oracle and for one-shot curation runs.

    Output: one row per input vector —
    (vec_id, cell, dup_of, is_kept) where dup_of is the smallest same-cell
    id above threshold (-1 when none) and is_kept = (dup_of == -1).
    """
    if centroids is not None:
        cents = centroids.select(F.col("cell"), F.col("_centroid"))
    else:
        cents = (
            corpus.orderBy(id_col)
            .limit(n_cells)
            .select(
                F.col(id_col).alias("cell"),
                F.col(vec_col).alias("_centroid"),
            )
        )
    cents = cents.select(
        "cell", "_centroid", norm_expr(F.col("_centroid")).alias("_cenn")
    )
    # corpus -> nearest cell: codebook collected once, argmax inlined as a
    # map-side projection (ties break toward the larger cell id, mirroring
    # the SQL oracle's ORDER BY sim DESC, cell DESC) — same assignment
    # shape as cosine_topk_ivf, no crossJoin fan-out / re-group exchange.
    crows = [(r["cell"], list(r["_centroid"]), r["_cenn"]) for r in cents.collect()]
    cell_type = cents.schema["cell"].dataType
    a_base = corpus.repartition(_pairwise_partitions(corpus)).select(
        F.col(id_col), F.col(vec_col), norm_expr(F.col(vec_col)).alias("_n")
    )
    assigned = a_base.withColumn(
        "cell",
        _nearest_cell_inline(vec_col, "_n", crows, cell_type)
        if crows
        else F.lit(None).cast(cell_type),
    )
    a = assigned.select(
        "cell", F.col(id_col).alias("_id1"),
        F.col(vec_col).alias("_v1"), F.col("_n").alias("_n1"),
    )
    b = assigned.select(
        "cell", F.col(id_col).alias("_id2"),
        F.col(vec_col).alias("_v2"), F.col("_n").alias("_n2"),
    )
    dups = (
        a.join(b, "cell")
        .filter(F.col("_id1") < F.col("_id2"))
        .withColumn(
            "_cos",
            dot_expr(F.col("_v1"), F.col("_v2")) / (F.col("_n1") * F.col("_n2")),
        )
        .filter(F.col("_cos") >= threshold)
        .groupBy(F.col("_id2").alias(id_col))
        .agg(F.min("_id1").alias("dup_of"))
    )
    return (
        assigned.join(dups, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.coalesce(F.col("dup_of"), F.lit(-1).cast("long")).alias("dup_of"),
            F.col("dup_of").isNull().alias("is_kept"),
        )
    )


@F.pandas_udf(T.DoubleType())
def cosine_to_query_numpy(v: pd.Series, q: pd.Series) -> pd.Series:
    """Arrow/numpy twin of cosine_expr for wide vectors: stacks the Arrow
    batch into one ndarray, one BLAS matvec per batch."""
    import numpy as np

    mat = np.stack(v.to_numpy())
    qv = np.asarray(q.iloc[0], dtype="float64")
    num = mat @ qv
    den = np.linalg.norm(mat, axis=1) * np.linalg.norm(qv)
    return pd.Series(num / den)


# ---------------------------------------------------------------------------
# SQ8 scalar quantization: the memory/IO-bound scale path for vector search.
#
# At 10^10 vectors the corpus scan is IO-bound: float32x(dim) rows dominate
# the read. Scalar int8 quantization stores one byte per dimension (4x less
# IO, integer SIMD in the scan) and scores candidates against DEQUANTIZED
# codes; only the top rerank_factor*k candidates per query are re-scored
# with exact float cosine. Reference analogue: the perf-test concern of
# docs/perf-tests.md (throughput at replicated-volume scale) applied to the
# embedding column — same recall/latency trade IVF makes, but on the
# per-dimension representation instead of the candidate set.
#
# Everything is deterministic double arithmetic (explicit op order), so the
# whole pipeline carries an exact DuckDB oracle (queries.py
# SQL_ANN_COSINE_TOPK_SQ8). Recall vs brute force is asserted in tests.
# ---------------------------------------------------------------------------


def sq8_stats(corpus: DataFrame, vec_col: str = "embedding") -> tuple[list[float], list[float]]:
    """Per-dimension (min, span) of the corpus in double precision.

    One posexplode aggregate; the collect is codebook-sized (dim rows, e.g.
    64 doubles — same driver-bounded class as the IVF centroid collect).
    At re-train time this is a single scan; stats are then FROZEN with the
    stored codes (recomputing them per query batch would re-quantize the
    world)."""
    rows = (
        corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .select("pos", F.col("x").cast("double").alias("x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("pos")
        .collect()
    )
    mn = [r["mn"] for r in rows]
    span = [r["mx"] - r["mn"] for r in rows]
    return mn, span


def _lit_arr(vals: list[float]) -> F.Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def sq8_encode(vec_col, mn: list[float], span: list[float]) -> F.Column:
    """Quantize an array<float> column to array<int> codes in [0,255].

    code_j = floor(((x_j - mn_j) / span_j) * 256), clamped; constant
    dimensions (span 0) encode as 0. Pure JVM transform — at ingest this is
    the map-side projection that writes the stored code column."""
    mn_a, sp_a = _lit_arr(mn), _lit_arr(span)
    return F.transform(
        vec_col,
        lambda x, j: F.when(F.element_at(sp_a, j + 1) == 0.0, F.lit(0)).otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        ((x.cast("double") - F.element_at(mn_a, j + 1))
                         / F.element_at(sp_a, j + 1)) * 256.0
                    ).cast("int"),
                ),
            )
        ),
    )


def sq8_decode(code_col, mn: list[float], span: list[float]) -> F.Column:
    """Dequantize codes to bucket midpoints: mn_j + ((c_j+0.5)*span_j)/256."""
    mn_a, sp_a = _lit_arr(mn), _lit_arr(span)
    return F.transform(
        code_col,
        lambda c, j: F.element_at(mn_a, j + 1)
        + ((c.cast("double") + 0.5) * F.element_at(sp_a, j + 1)) / 256.0,
    )


def cosine_topk_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: tuple[list[float], list[float]] | None = None,
) -> DataFrame:
    """Top-k cosine via int8-quantized candidate scoring + exact re-rank.

    Phase 1 scores every corpus row against the (broadcast) query set using
    the DEQUANTIZED code array — at scale the scan reads array<tinyint>
    codes instead of array<float> vectors (4x less IO; here the codes are
    derived inline from the same scan for oracle parity). Phase 2 re-scores
    only the top rerank_factor*k candidates per query with exact float
    cosine, reading full vectors for that bounded set alone. Determinism:
    explicit double op order, ties broken by neighbor id at both ranks.
    """
    if stats is None:
        stats = sq8_stats(corpus, vec_col)
    mn, span = stats
    c = corpus.repartition(_pairwise_partitions(corpus)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        norm_expr(F.col(vec_col)).alias("_cn"),
        sq8_decode(sq8_encode(F.col(vec_col), mn, span), mn, span).alias("_dq"),
    ).withColumn("_dqn", norm_expr(F.col("_dq")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        norm_expr(F.col(vec_col)).alias("_qn"),
    )
    approx = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "_ascore",
            dot_expr(F.col("_qvec"), F.col("_dq")) / (F.col("_qn") * F.col("_dqn")),
        )
    )
    w1 = W.partitionBy("query_id").orderBy(F.col("_ascore").desc(), F.col("neighbor_id"))
    cand = approx.withColumn("_arank", F.row_number().over(w1)).filter(
        F.col("_arank") <= rerank_factor * k
    )
    rer = cand.withColumn(
        "cos", dot_expr(F.col("_qvec"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn"))
    )
    w2 = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos_sim"), "rank")
    )
