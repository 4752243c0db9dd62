"""Deterministic changelog + expected-state generator (Spark-side, no RNG, no clock).

Spark rebuild of the reference's data-injection entry points:
  * keyed JSON producer        mirror-maker-2/SendProductToKafka.py:43-54
  * timestamped perf producer  perf-tests/kafka/KafkaProducer.py:44-51
  * bulk perf producer knobs   docs/perf-tests.md:125-129,158-172

Everything is a pure function of the event sequence number, so any scale
regenerates bit-identically (the reference's correctness experiments rely on
re-producing the exact same payloads, docs/local-to-es.md:97-106).

Event model: ``n_keys`` logical rows of the source-code-repo table, each
receiving ``versions_per_key`` ordered changes. Event i (0-based global
sequence) touches key ``i % n_keys`` at version ``i // n_keys``:
  * version 0            -> op 'c'
  * intermediate         -> op 'u'
  * last version, ~1/deleted_every keys -> op 'd' (tombstone)
Partition affinity = pmod(murmur3(repo, path), P) — mirrors the Kafka
key-hash partitioner (SendProductToKafka.py:48, partition routing visible in
docs/local-to-es.md:42-47). lsn is the per-partition ordinal (offset
semantics, docs/consideration.md:46).

Duplicates: a deterministic slice of events is re-emitted after the main run
(tail files), modelling MM2's at-least-once redelivery after a crash between
produce and offset commit (docs/consideration.md:52-58).

Schema evolution: events at sequence >= evolve_at carry an extra
``after.stars:int`` field (additive propagation, docs/consideration.md:13-18).

Skew: key_id < hot_keys all live in one hot repo ("org-0000/hot"), giving that
repo (and its log partitions) a configurable share of all events
(hot-partition scenario, docs/mm2-provisioning.md:87,116-124).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ChangelogSpec:
    n_keys: int = 1000
    versions_per_key: int = 5
    n_partitions: int = 8
    n_repos: int = 20
    deleted_every: int = 10  # key_id % deleted_every == 3 -> last op is delete
    hot_key_share: float = 0.2  # share of keys in the single hot repo
    files: int = 4  # number of sequential file batches (streaming triggers)
    dup_every: int = 13  # every 13th event of the last file-batch re-emitted
    evolve_at_frac: float = 0.75  # events past this fraction carry after.stars
    internal_topic_every: int = 17  # key_id % 17 == 0 -> config-like topic (blacklist tests)
    content_chains: int = 3  # md5 chains per content body (~40 bytes each);
    # real source files are KBs — bench/scaling specs raise this to ~24 (1 KiB)
    lsn_base: int = 0  # offset the per-partition lsn sequence — follow-on
    # changelog segments (a later tail of the same log) start above the
    # lsns an earlier segment already applied
    parts_per_file: int = 2  # parquet files per file-batch. Each file holds a
    # CONTIGUOUS slice of the global produce sequence (so per-partition lsn
    # ranges stay ordered across files — the reference's ordering contract,
    # docs/consideration.md:20, which the watermark dedup relies on), and the
    # file count sets the scan-side parallelism floor (one coalesced file per
    # batch would cap the map stage at `files` tasks regardless of cores).

    @property
    def n_events(self) -> int:
        return self.n_keys * self.versions_per_key


def _content_expr(key_id, version, chains: int = 3):
    """Deterministic pseudo-source text, JVM-side only.

    Each body line hashes (key, version, line) INDEPENDENTLY — a chained
    h=md5(h) formulation re-expands the whole prefix chain per line
    (quadratic md5 count + codegen blow-up). ``chains`` scales the body
    size (~40 bytes per line).
    """
    parts = [
        F.format_string("def fn_%s_v%s():\n", key_id.cast("string"), version.cast("string")),
        F.lit('    """'),
        F.md5(F.concat_ws("|", F.lit("content"), key_id, version)),
        F.lit('"""\n'),
    ]
    for i in range(max(chains - 1, 1)):
        parts += [
            F.lit(f"    x{i} = '"),
            F.md5(F.concat_ws("|", key_id, version, F.lit(str(i)))),
            F.lit("'\n"),
        ]
    parts += [F.lit("    return x0 * "), version.cast("string"), F.lit("\n")]
    return F.concat(*parts)


def build_changelog(spark: SparkSession, spec: ChangelogSpec) -> DataFrame:
    """Logical changelog as one DataFrame (columns incl. seq/file_id helpers).

    Fully columnar: spark.range -> expressions; no Python in the loop.
    """
    n_hot = int(spec.n_keys * spec.hot_key_share)
    evolve_at = int(spec.n_events * spec.evolve_at_frac)

    df = spark.range(spec.n_events).withColumnRenamed("id", "seq")
    key_id = (F.col("seq") % spec.n_keys).cast("long")
    version = (F.col("seq") / spec.n_keys).cast("long")
    last_version = F.lit(spec.versions_per_key - 1)

    # repo/path layout: hot keys -> one hot repo; cold keys spread over repos
    repo_id = F.when(key_id < n_hot, F.lit(0)).otherwise(
        (F.pmod(key_id * 2654435761, F.lit(max(spec.n_repos - 1, 1))) + 1).cast("int")
    )
    repo = F.when(repo_id == 0, F.lit("org-0000/hot")).otherwise(
        F.format_string("org-%04d/proj-%d", repo_id, F.pmod(key_id, F.lit(7)).cast("int"))
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in ["py", "java", "go", "md", "yaml"]]),
        (F.pmod(key_id, F.lit(5)) + 1).cast("int"),
    )
    path = F.format_string(
        "src/module_%d/file_%d.%s",
        F.pmod(key_id, F.lit(23)).cast("int"),
        key_id.cast("int"),
        lang,
    )

    is_delete = (F.pmod(key_id, F.lit(spec.deleted_every)) == 3) & (version == last_version)
    op = (
        F.when(version == 0, F.lit("c"))
        .when(is_delete, F.lit("d"))
        .otherwise(F.lit("u"))
    )

    df = df.select(
        "seq",
        key_id.alias("key_id"),
        version.alias("version"),
        op.alias("op"),
        repo.alias("_repo"),
        path.alias("_path"),
    )
    # build images from the materialized repo/path to keep expression tree small
    k = F.col("key_id")
    v = F.col("version")
    rcol, pcol = F.col("_repo"), F.col("_path")
    lang2 = F.element_at(
        F.array(*[F.lit(x) for x in ["py", "java", "go", "md", "yaml"]]),
        (F.pmod(k, F.lit(5)) + 1).cast("int"),
    )

    def image2(ver):
        return F.struct(
            rcol.alias("repo"),
            pcol.alias("path"),
            F.substring(F.sha2(F.concat_ws("|", rcol, pcol, ver.cast("string")), 256), 1, 40).alias("commit"),
            lang2.alias("lang"),
            _content_expr(k, ver, spec.content_chains).alias("content"),
        )

    # partition affinity: Kafka-style key-hash routing
    df = df.withColumn(
        "partition", F.pmod(F.hash(rcol, pcol), F.lit(spec.n_partitions)).cast("int")
    )
    # per-partition monotone offset, ordered by the global produce sequence.
    # NOTE: the lsn window (the only shuffle in the generator) runs BEFORE the
    # heavy before/after images are attached, so only slim rows are sorted.
    w = W.partitionBy("partition").orderBy("seq")
    df = df.withColumn(
        "lsn", F.row_number().over(w).cast("long") - 1 + F.lit(spec.lsn_base)
    )

    df = df.withColumn("after_full", image2(v)).withColumn(
        "before_full", F.when(v > 0, image2(v - 1))
    )

    # event time: deterministic function of seq (producer-set timestamp,
    # perf-tests/kafka/KafkaProducer.py:49) — 2024-01-01 + seq * 50ms
    df = df.withColumn(
        "ts_ms",
        (F.lit(1704067200.0) + F.col("seq") * 0.05).cast("timestamp"),
    )
    df = df.withColumn(
        "headers",
        F.create_map(
            F.lit("origin"), F.lit("source"),
            F.lit("v"), v.cast("string"),
        ),
    )
    df = df.withColumn(
        "source_topic",
        F.when(
            F.pmod(k, F.lit(spec.internal_topic_every)) == 0, F.lit("mm2-configs.source.internal")
        ).otherwise(F.lit("repos")),
    )
    df = df.withColumn(
        "before",
        F.when(F.col("op") != "c", F.col("before_full")),
    ).withColumn(
        "after",
        F.when(F.col("op") != "d", F.col("after_full")),
    )
    df = df.withColumn("evolved", F.col("seq") >= evolve_at)
    file_size = max(1, spec.n_events // spec.files)
    df = df.withColumn("file_id", F.least(F.floor(F.col("seq") / file_size), F.lit(spec.files - 1)).cast("int"))
    return df.select(
        "seq", "file_id", "evolved",
        "partition", "lsn", "op", "before", "after", "ts_ms", "headers", "source_topic",
    )


ENVELOPE_COLS = ["partition", "lsn", "op", "before", "after", "ts_ms", "headers", "source_topic"]


def _with_stars(df: DataFrame) -> DataFrame:
    """Add the evolved `after.stars` field (deterministic from lsn)."""
    return df.withColumn(
        "after",
        F.when(
            F.col("after").isNotNull(),
            F.col("after").withField("stars", F.pmod(F.col("lsn"), F.lit(1000)).cast("int")),
        ),
    )


def write_changelog(spark: SparkSession, out_dir: str, spec: ChangelogSpec) -> None:
    """Write the changelog as `spec.files` sequential parquet file-batches.

    File-batch boundaries model micro-batch triggers; the duplicate tail file
    models at-least-once redelivery (docs/consideration.md:52-58). Later
    batches past the evolution point carry the extra after.stars column —
    readers use mergeSchema (additive evolution, docs/consideration.md:13-18).
    """
    os.makedirs(out_dir, exist_ok=True)
    df = build_changelog(spark, spec)
    df.cache()
    try:
        evolve_at = int(spec.n_events * spec.evolve_at_frac)
        n_chunks = spec.files * spec.parts_per_file
        chunk_size = max(1, spec.n_events // n_chunks)
        for chunk in range(n_chunks):
            lo = chunk * chunk_size
            hi = spec.n_events if chunk == n_chunks - 1 else (chunk + 1) * chunk_size
            if lo >= spec.n_events:
                break
            batch = df.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
            # schema-part boundaries are analytic (seq >= evolve_at) — no
            # isEmpty jobs needed
            parts = []
            if lo < evolve_at:
                parts.append((0, batch.filter(~F.col("evolved")).select(*ENVELOPE_COLS)))
            if hi > evolve_at:
                parts.append((1, _with_stars(batch.filter(F.col("evolved"))).select(*ENVELOPE_COLS)))
            for i, part in parts:
                tmp = os.path.join(out_dir, f"_tmp_chunk_{chunk:04d}_{i}")
                # small row groups keep single-file chunks SPLITTABLE: a
                # coalesce(1) file with the default 128MB block size is one
                # row group, which pins scan parallelism to the file count
                part.coalesce(1).write.mode("overwrite").option(
                    "parquet.block.size", 8 * 1024 * 1024
                ).parquet(tmp)
                src = next(
                    f for f in os.listdir(tmp) if f.endswith(".parquet") and not f.startswith("_")
                )
                os.replace(
                    os.path.join(tmp, src),
                    os.path.join(out_dir, f"batch-{chunk:04d}-{i}.parquet"),
                )
                _rmtree(tmp)
        # duplicate tail: re-emit a deterministic slice of the final batch
        if spec.dup_every:
            dup = df.filter(
                (F.col("file_id") == spec.files - 1)
                & (F.pmod(F.col("seq"), F.lit(spec.dup_every)) == 0)
            )
            dup = _with_stars(dup.filter(F.col("evolved"))).select(*ENVELOPE_COLS).unionByName(
                dup.filter(~F.col("evolved")).select(*ENVELOPE_COLS), allowMissingColumns=True
            )
            if not dup.isEmpty():
                tmp = os.path.join(out_dir, "_tmp_dup")
                dup.coalesce(1).write.mode("overwrite").parquet(tmp)
                src = next(
                    f for f in os.listdir(tmp) if f.endswith(".parquet") and not f.startswith("_")
                )
                # 'z' prefix sorts the duplicate tail after every batch file
                os.replace(os.path.join(tmp, src), os.path.join(out_dir, "batch-z999-dup.parquet"))
                _rmtree(tmp)
    finally:
        df.unpersist()


def _rmtree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def read_changelog(spark: SparkSession, path: str) -> DataFrame:
    """Batch full-replay scan (`--from-beginning` analogue,
    local-cluster/consumeFromLocal.sh:8)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def compute_expected_state_pandas(
    changelog_dir: str, topic_whitelist: str = "^repos$"
) -> pd.DataFrame:
    """Independent (non-Spark) oracle: replay the changelog in pandas.

    End state = for every (repo, path), the after-image of the highest-lsn
    event in its partition, dropped if that event is a delete; duplicate
    (partition, lsn) re-deliveries collapse; only whitelisted topics
    replicate (docs/index.md:42-50). Generalizes the reference's
    payload-equality oracle (docs/local-to-es.md:97-106).
    """
    import pyarrow.parquet as pq

    frames = [
        pq.read_table(os.path.join(changelog_dir, f)).to_pandas()
        for f in sorted(os.listdir(changelog_dir))
        if f.endswith(".parquet")
    ]
    pdf = pd.concat(frames, ignore_index=True)
    if topic_whitelist:
        pdf = pdf[pdf["source_topic"].str.contains(topic_whitelist, regex=True)]
    pdf = pdf.drop_duplicates(subset=["partition", "lsn"])
    key = pdf.apply(
        lambda r: (
            (r["after"] or r["before"])["repo"],
            (r["after"] or r["before"])["path"],
        ),
        axis=1,
    )
    pdf = pdf.assign(_repo=[k[0] for k in key], _path=[k[1] for k in key])
    pdf = pdf.sort_values(["partition", "lsn"])
    last = pdf.groupby(["_repo", "_path"], as_index=False).tail(1)
    live = last[last["op"] != "d"]
    rows = []
    for _, r in live.iterrows():
        img = dict(r["after"])
        rows.append(img)
    out = pd.DataFrame(rows)
    return out.sort_values(["repo", "path"]).reset_index(drop=True)
