"""Repo-level fork detection: near-duplicate REPOSITORIES by Jaccard over
their file-content hash sets.

The corpus this engine replicates is an Iceberg table of source-code
repositories keyed (repo, path) with full file content (README.md:68,
docs/index.md:41). Document-level dedup (exact / MinHash / winnowing)
finds duplicated FILES; a training-data pipeline over a code corpus also
needs the coarser question — which REPOS are forks/mirrors of each other —
because forks multiply every file they share and repo-level sampling
decisions (keep one fork, weight the family once) happen above the file
level (the Stack/StarCoder pipelines dedup exactly this way).

Plan shape (the same scaling argument as the document Jaccard operator,
one level up the hierarchy):

  1. file sets: distinct (repo, sha) — sha is the content hash the engine
     already maintains per row, so this is a scan + distinct, no hashing
     of content in this operator;
  2. document-frequency cap BEFORE the self-join: a sha present in d
     repos contributes O(d^2) join rows, and ubiquitous files (empty
     __init__.py, LICENSE, generated lockfiles) are exactly the quadratic
     hot keys at corpus scale — they also carry no fork signal;
  3. candidate-bounded self-equi-join on sha (only repos sharing a
     surviving file hash ever meet) -> intersection counts;
  4. Jaccard = inter / (|A| + |B| - inter) with sizes computed over the
     CAPPED sets (numerator and denominator see the same universe, so the
     cap is a well-defined projection of the metric, mirrored exactly in
     the oracle — the dedup_jaccard convention).

100-TB shape: no cross join, shuffle keyed by 16-byte sha then by
(repo1, repo2); fan-out bounded by max_df^2 per hot sha; everything
JVM-side aggregates. At 10^8 repos the pair space never materializes —
only pairs sharing rare files do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repo_file_sets(
    state: DataFrame,
    repo_col: str = "repo",
    sha_col: str = "content_sha",
    content_col: str = "content",
) -> DataFrame:
    """Distinct (repo, sha) file-set rows from a table state.

    Uses the persisted ``sha_col`` when the state carries one; otherwise
    derives sha2-256 over ``content_col`` at the scan (one map-side hash,
    the same digest ``final_state`` projects)."""
    sha = (
        F.col(sha_col)
        if sha_col in state.columns
        else F.sha2(F.col(content_col), 256)
    )
    return state.select(
        F.col(repo_col).alias("repo"), sha.alias("sha")
    ).distinct()


def fork_pairs(
    files: DataFrame,
    min_jaccard: float = 0.3,
    max_df: int = 64,
) -> DataFrame:
    """Fork candidates: repo pairs with file-set Jaccard >= min_jaccard.

    ``files``: (repo, sha) rows as produced by :func:`repo_file_sets`.

    Output: (repo1, repo2, n_common, n1, n2, jaccard) with repo1 < repo2
    and jaccard rounded to 4dp (both engines round identically; the raw
    ratio gates the threshold BEFORE rounding on both sides).
    """
    sets = files.select("repo", "sha").distinct()
    rare = (
        sets.groupBy("sha")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("sha")
    )
    capped = sets.join(rare, "sha")
    sizes = capped.groupBy("repo").agg(F.count("*").alias("sz"))
    a = capped.select(F.col("repo").alias("repo1"), "sha")
    b = capped.select(F.col("repo").alias("repo2"), "sha")
    inter = (
        a.join(b, "sha")
        .filter(F.col("repo1") < F.col("repo2"))
        .groupBy("repo1", "repo2")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    return (
        inter.join(
            sizes.select(F.col("repo").alias("repo1"), F.col("sz").alias("n1")),
            "repo1",
        )
        .join(
            sizes.select(F.col("repo").alias("repo2"), F.col("sz").alias("n2")),
            "repo2",
        )
        .filter(jac >= min_jaccard)
        .select(
            "repo1",
            "repo2",
            "n_common",
            "n1",
            "n2",
            F.round(jac, 4).alias("jaccard"),
        )
    )
