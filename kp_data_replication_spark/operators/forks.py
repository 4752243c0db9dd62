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


# --------------------------------------------------------------- index
from pyspark.sql import SparkSession, types as T  # noqa: E402

from .dedup_incremental import IncrementalDedupIndex  # noqa: E402

FORK_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("sha", T.StringType()),
    ]
)


class IncrementalForkIndex(IncrementalDedupIndex):
    """Persisted per-file content-sha index maintained from the
    changefeed — the cheapest derived store in the family (one 64-char
    digest per file) and the one that turns fork detection from an
    O(corpus-bytes) sweep into an O(index) sweep.

    Why it pays: :func:`repo_file_sets` over a raw state must read the
    content column (the corpus bytes) to hash it; this index hashes each
    file ONCE when the changefeed delivers it (O(changed files) per
    epoch on the shared skeleton: manifest-pruned read, dirty-bucket
    MERGE, writer fencing, retention pin) and the periodic fork sweep
    then scans ~40 bytes/file instead of the file. At 100 TB of source
    text the sha index is ~tens of GB — the difference between a
    nightly job and an interactive one.

    ``fork_pairs_view`` runs the standard df-capped Jaccard over the
    index. The band-pair miners of the parent are not meaningful for a
    single-digest feature and raise."""

    FEATURE_COL = "sha"
    WRITER_PREFIX = "fork-index"
    INDEX_SCHEMA = FORK_INDEX_SCHEMA

    def __init__(self, root: str, n_buckets: int = 8):
        super().__init__(root, n_buckets=n_buckets)

    def _changed_features(self, upserts: DataFrame, text_col: str) -> DataFrame:
        # sha2 is total (defined for empty text), so no left-join guard
        # is needed — every upsert key gets exactly one replacement row
        return upserts.select(
            "repo", "path", F.sha2(F.col(text_col), 256).alias("sha")
        )

    def pairs_for(self, *a, **kw):  # pragma: no cover - guard
        raise NotImplementedError(
            "fork index has no band pairs; use fork_pairs_view"
        )

    all_pairs = pairs_for

    def fork_pairs_view(
        self,
        spark: SparkSession,
        min_jaccard: float = 0.3,
        max_df: int = 64,
    ) -> DataFrame:
        """Fork candidates from the INDEX alone (corpus text untouched)."""
        files = self.store.read_state(spark).select("repo", "sha")
        return fork_pairs(files, min_jaccard=min_jaccard, max_df=max_df)
