"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travel as opaque `binary` columns + typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs via
``mapInPandas``.

Decode kernels come in two tiers:
  * ``decode_netpbm`` is a REAL decoder for binary netpbm images (PGM `P5`
    grayscale / PPM `P6` RGB): header parse + ``np.frombuffer`` pixel read,
    no codec library needed — a genuinely functional image path, exact and
    tested end-to-end (synthesize -> decode -> feature -> resize).
  * compressed formats (JPEG/PNG/video) need codec libraries that are NOT
    in this container; ``decode_image_stub`` marks that boundary (raises on
    ``real_decode=True``, else produces a deterministic fake), keeping the
    Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
    shape — identical to the netpbm path a codec would slot into.

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


def decode_media(
    df: DataFrame,
    batch_hint: int = 1024,
    codec=None,
    codec_schema: T.StructType | None = None,
) -> DataFrame:
    """Arrow-batched decode via mapInPandas (the real pipeline shape).

    Each Arrow batch arrives as a pandas DataFrame with the binary column as
    Python bytes. Output is columnar metadata — pixels would go to a
    tensor column (array<float>) in the same pattern.

    ``codec``: the pluggable slot where a REAL codec binding lands on a
    cluster that has one (PIL / turbojpeg / libvips / pyav). The calling
    convention is BATCH-SHAPED and enforced: the callable receives the
    whole Arrow batch's payloads as one ``pandas.Series`` of ``bytes``
    and must return a ``pandas.DataFrame`` with exactly one row per
    input, columns matching ``codec_schema`` (default
    :data:`FAKE_DECODE_SCHEMA` minus ``doc_id``). One call per Arrow
    batch — never per element — so a vectorized binding amortizes its
    setup across the batch and a per-row loop cannot silently creep into
    the hot path when real codecs appear. Without ``codec`` the
    deterministic stub kernel runs (see module docstring).
    """
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType())]
        + [
            f for f in (codec_schema or FAKE_DECODE_SCHEMA).fields
            if f.name != "doc_id"
        ]
    )
    cols = [f.name for f in out_schema.fields]

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if codec is not None:
                out = codec(pdf["media"])
                if not isinstance(out, pd.DataFrame) or len(out) != len(pdf):
                    raise ValueError(
                        "codec must map a Series of N payloads to a "
                        f"DataFrame of N rows (got {type(out).__name__} "
                        f"of {len(out) if hasattr(out, '__len__') else '?'}"
                        f" for {len(pdf)} inputs)"
                    )
                out = out.reset_index(drop=True)
            else:
                out = pd.DataFrame(
                    [decode_image_stub(b) for b in pdf["media"]]
                )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[cols]

    return df.select("doc_id", "media").mapInPandas(_decode, schema=out_schema)


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


# --------------------------------------------------------------------- #
# REAL image path: binary netpbm (PGM P5 / PPM P6) — no codec libs needed
# --------------------------------------------------------------------- #
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("tensor", T.ArrayType(T.FloatType())),
    ]
)


def encode_netpbm(arr) -> bytes:
    """Encode an HxW (grayscale) or HxWx3 (RGB) uint8 array as binary
    netpbm bytes — the test/generator twin of :func:`decode_netpbm`."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
        h, w = a.shape[:2]
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_netpbm_bytes(data: bytes):
    """Parse one binary netpbm image: returns (height, width, channels,
    float32 pixels in [0,1], row-major HxWxC flattened). Raises ValueError
    on a malformed header/payload — route through the DLQ pattern upstream
    if the corpus may contain junk."""
    import numpy as np

    if len(data) < 2 or data[:1] != b"P" or data[1:2] not in b"56":
        raise ValueError("not a binary netpbm (P5/P6) image")
    channels = 3 if data[1:2] == b"6" else 1

    # header: magic, then 3 whitespace-separated ints (width height maxval),
    # '#' comments allowed between tokens, single whitespace after maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated netpbm header")
        tokens.append(int(data[start:pos]))
    pos += 1  # the single whitespace byte that terminates the header
    width, height, maxval = tokens
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported maxval {maxval} (8-bit only)")
    n = width * height * channels
    if len(data) - pos < n:
        raise ValueError("truncated netpbm payload")
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return height, width, channels, px.astype(np.float32) / float(maxval)


def decode_netpbm(df: DataFrame, payload_col: str = "media") -> DataFrame:
    """REAL decode stage: netpbm binary columns -> dense float tensors,
    Arrow-batched via ``mapInPandas`` (one Python worker pass per batch,
    pixels never row-by-row through py4j). This is the exact shape a
    JPEG/PNG codec slots into on a cluster with codec libs installed."""

    def _dec(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "height": [], "width": [],
                    "n_channels": [], "tensor": []}
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                h, w, c, px = decode_netpbm_bytes(bytes(b))
                rows["doc_id"].append(doc_id)
                rows["height"].append(h)
                rows["width"].append(w)
                rows["n_channels"].append(c)
                rows["tensor"].append(px)
            yield pd.DataFrame(rows)

    return df.select("doc_id", payload_col).mapInPandas(_dec, schema=IMAGE_SCHEMA)


def to_luma(df: DataFrame) -> DataFrame:
    """RGB -> grayscale (Rec.601 luma) as whole-batch numpy; grayscale
    passes through. Output keeps IMAGE_SCHEMA with n_channels=1."""
    import numpy as np

    def _luma(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_t = []
            for c, t in zip(pdf["n_channels"], pdf["tensor"]):
                a = np.asarray(t, dtype=np.float32)
                if int(c) == 3:
                    rgb = a.reshape(-1, 3)
                    a = rgb @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
                out_t.append(a)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "height": pdf["height"].values,
                    "width": pdf["width"].values,
                    "n_channels": 1,
                    "tensor": out_t,
                }
            )

    return df.mapInPandas(_luma, schema=IMAGE_SCHEMA)


def synth_netpbm_table(spark, n: int, side: int = 16, rgb: bool = True) -> DataFrame:
    """Deterministic synthetic image corpus: doc_id-seeded gradient images
    encoded as REAL netpbm bytes, generated distributedly (mapInPandas over
    a range — no driver-side loop, scales to any n)."""
    import numpy as np

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf["id"]:
                base = (np.arange(side * side, dtype=np.int64)
                        .reshape(side, side) + int(i)) % 256
                if rgb:
                    img = np.stack(
                        [base, (base + 85) % 256, (base + 170) % 256], axis=2
                    ).astype(np.uint8)
                else:
                    img = base.astype(np.uint8)
                payloads.append(encode_netpbm(img))
            yield pd.DataFrame({"doc_id": pdf["id"].values, "media": payloads})

    return spark.range(n).mapInPandas(
        _gen,
        schema=T.StructType(
            [T.StructField("doc_id", T.LongType()),
             T.StructField("media", T.BinaryType())]
        ),
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame index,
    without decoding — the downstream decode UDF receives (media, frame_idx).
    Frame count is faked from byte length (codec metadata in production)."""
    n_frames = (F.octet_length("media") / 16).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select("doc_id", "media", F.explode(idx).alias("frame_idx"))
