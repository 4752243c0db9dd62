"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travel as opaque `binary` columns + typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs via
``mapInPandas``. The image/audio codec libraries are NOT in this container,
so the decode kernels are stubbed: ``decode_image_stub`` raises
NotImplementedError when asked for a real decode and otherwise produces a
deterministic fake (dimensions/features derived from the bytes), keeping the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — real and tested.

Scale notes: media bytes dominate row width, so ops that don't need pixels
must never deserialize them (schema pruning does this for free as long as
decode stays in its own projection); repartition by size class before decode
so one task doesn't get all the 4K videos (skew).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("content_sha", T.StringType()),
    ]
)

FAKE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def to_media_table(df: DataFrame, id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Model a corpus as a media table: opaque binary payload + metadata.

    In production the binary column comes straight from the lake (image
    bytes, audio frames); here the text payload stands in, UTF-8 encoded.
    """
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(payload_col), "UTF-8").alias("media"),
        F.lit("application/octet-stream").alias("mime"),
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata pass that never decodes: byte length, magic-header hex,
    content sha — all JVM expressions over the binary column."""
    return df.select(
        "doc_id",
        F.octet_length("media").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col("media"), 1, 4))).alias("header_hex"),
        F.sha2("media", 256).alias("content_sha"),
    )


def decode_image_stub(data: bytes, real_decode: bool = False) -> dict:
    """STUB decode kernel. With ``real_decode=True`` this is where
    PIL/libvips would run — unavailable in this container."""
    if real_decode:
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "plug PIL/turbojpeg here on a real cluster"
        )
    # deterministic fake: geometry + luma derived from the byte content
    h = hashlib.sha256(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = round(sum(data[:256]) / max(min(len(data), 256), 1) / 255.0, 6)
    return {"width": width, "height": height, "n_channels": 3, "mean_luma": mean_luma}


def decode_media(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode via mapInPandas (the real pipeline shape).

    Each Arrow batch arrives as a pandas DataFrame with the binary column as
    Python bytes; the decode kernel runs per element (vectorized libs would
    take the whole batch). Output is columnar metadata — pixels would go to
    a tensor column (array<float>) in the same pattern.
    """

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_image_stub(b) for b in pdf["media"]]
            out = pd.DataFrame(decoded)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "width", "height", "n_channels", "mean_luma"]]

    return df.select("doc_id", "media").mapInPandas(_decode, schema=FAKE_DECODE_SCHEMA)


TENSOR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("tensor", T.ArrayType(T.FloatType())),
    ]
)


def decode_to_tensor(df: DataFrame, side: int = 8) -> DataFrame:
    """Decode media bytes into a dense luma tensor column (array<float>,
    row-major height x width) — the training-pipeline handoff format.

    The CODEC is the stub boundary (PIL/libvips absent here): pixels are a
    deterministic function of the byte content (sha256-seeded), so tests are
    exact. Everything around it is the production shape: Arrow batches in,
    columnar tensors out, shape metadata beside the data.
    """
    import numpy as np

    def _dec(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = side * side
        for pdf in it:
            tensors = []
            for b in pdf["media"]:
                # stub decode: tile the digest into n pseudo-pixels in [0,1]
                seed = hashlib.sha256(b).digest()
                reps = (n + len(seed) - 1) // len(seed)
                px = np.frombuffer((seed * reps)[:n], dtype=np.uint8)
                tensors.append((px.astype(np.float32) / 255.0))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "height": side,
                    "width": side,
                    "tensor": tensors,
                }
            )

    return df.select("doc_id", "media").mapInPandas(_dec, schema=TENSOR_SCHEMA)


def resize_tensor(df: DataFrame, factor: int = 2) -> DataFrame:
    """REAL vectorized preprocessing (no stub): mean-pool every tensor in
    the Arrow batch by ``factor`` in one stacked numpy op — the shape of a
    production resize stage (whole-batch ndarray math, not per-row Python).
    Requires uniform input shapes per batch (the decode above guarantees
    it; a production pipeline groups by size class first — see the skew
    note in the module docstring)."""
    import numpy as np

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            h = int(pdf["height"].iloc[0])
            w = int(pdf["width"].iloc[0])
            oh, ow = h // factor, w // factor
            batch = np.stack([np.asarray(t, dtype=np.float32) for t in pdf["tensor"]])
            batch = batch.reshape(len(pdf), h, w)
            pooled = batch.reshape(len(pdf), oh, factor, ow, factor).mean(axis=(2, 4))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "height": oh,
                    "width": ow,
                    "tensor": list(pooled.reshape(len(pdf), oh * ow)),
                }
            )

    return df.mapInPandas(_resize, schema=TENSOR_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame index,
    without decoding — the downstream decode UDF receives (media, frame_idx).
    Frame count is faked from byte length (codec metadata in production)."""
    n_frames = (F.octet_length("media") / 16).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select("doc_id", "media", F.explode(idx).alias("frame_idx"))
