"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Decode status: PPM (P6) and uncompressed 24-bit BMP decode FOR REAL in pure
numpy (header + raster parse — ``decode_ppm`` / ``decode_bmp`` /
``image_features``), with nearest-neighbour resize. PNG/JPEG genuinely need
PIL/libvips, which this container lacks, so they stay behind
``decode_image_batch``'s disclosed NotImplementedError. The Spark-side
plumbing is real and tested either way: schema contract, Arrow batch shapes,
partition-preserving mapInPandas, and the metadata projection that lets
Catalyst prune the (huge) binary column when a query touches only metadata.

Scale design: binary payloads dominate bytes; they ride in their own parquet
column so column pruning skips them entirely for metadata-only queries, and
``repartition(payload_bucket)`` keeps decode batches balanced when payload
sizes are Zipfian.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table from documents: payload = md5-derived
    bytes (unhex), metadata derived from doc stats. Exists so the plumbing
    has data to run against in tests/bench."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.unhex(F.concat(F.md5("text"), F.md5(F.concat(F.lit("2:"), "text")))).alias("payload"),
        (F.col("n_chars") % 1920).cast("int").alias("meta_width"),
        (F.col("n_chars") % 1080).cast("int").alias("meta_height"),
        (F.col("n_chars") * 7).cast("int").alias("meta_duration_ms"),
    )


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """REAL decoder stub — would use PIL/libvips here.

    Raises NotImplementedError: the container has no imaging libraries.
    The pipeline runs with fake_decode=True instead."""
    raise NotImplementedError("image decode requires PIL/libvips; not available in this container")


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, fixed-schema batches
    out. The fake decoder derives a deterministic 4-float feature from the
    payload bytes (byte-sum moments) — the batch shape, schema and
    partitioning are exactly what a real decoder would use."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                decode_image_batch(pdf["payload"])  # raises: real decoder absent
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload or b"")
                n = max(len(b), 1)
                s = sum(b)
                feats.append(
                    [
                        float(len(b)),
                        float(s % 997),
                        float(s / n),
                        float(b[0] if b else 0),
                    ]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p or b"")) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(fn, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    the explode that a real frame extractor would consume. JVM-side."""
    vids = media.filter(F.col("kind") == "video").filter(F.col("meta_duration_ms") > 0)
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta_duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


# ---------------------------------------------------------------------------
# Real decode for uncompressed formats (pure numpy — no imaging libs needed).
# PNG/JPEG genuinely require PIL/libvips and stay behind decode_image_batch's
# NotImplementedError; PPM (P6) and 24-bit uncompressed BMP are plain header +
# raster bytes, so the "decode step" is a byte-layout parse we can do for real.
# ---------------------------------------------------------------------------

import struct

import numpy as np


def decode_ppm(b: bytes) -> "np.ndarray":
    """Binary PPM (P6, maxval<=255) -> HxWx3 uint8 array. Handles comments."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens, i, n = [], 2, len(b)
    while len(tokens) < 3 and i < n:
        c = b[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and b[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        else:
            j = i
            while j < n and not b[j : j + 1].isspace():
                j += 1
            tokens.append(int(b[i:j]))
            i = j
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    i += 1  # single whitespace after maxval
    raster = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3).copy()


def decode_bmp(b: bytes) -> "np.ndarray":
    """Uncompressed 24-bit bottom-up BMP -> HxWx3 uint8 RGB array."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    w = struct.unpack_from("<i", b, 18)[0]
    h = struct.unpack_from("<i", b, 22)[0]
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp uncompressed BMP supported (bpp={bpp}, comp={compression})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_offset)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR -> RGB


def decode_image(b: bytes) -> "np.ndarray | None":
    """Dispatch on magic bytes. Returns None for unknown payloads (callers
    fall back to byte-level features); raises NotImplementedError for
    formats that truly need an imaging library."""
    if not b:
        return None
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n" or b[:2] == b"\xff\xd8":
        raise NotImplementedError("PNG/JPEG decode requires PIL/libvips; not in this container")
    return None


def resize_nearest(img: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbour resize via index sampling (the real resample a
    thumbnailing stage needs, minus the interpolation kernels)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_rgb", T.ArrayType(T.FloatType()), True),
        T.StructField("thumb_mean", T.ArrayType(T.FloatType()), True),
    ]
)


def image_features(media: DataFrame, thumb: int = 4) -> DataFrame:
    """Decode images for real where the format allows (PPM/BMP), compute
    mean-RGB and a thumb x thumb nearest-resized grayscale signature.
    Arrow-batched mapInPandas; undecodable payloads yield decoded=false
    rows instead of failing the batch, so one corrupt file cannot kill a
    100 TB decode stage."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "decoded", "width", "height", "mean_rgb", "thumb_mean")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = None
                try:
                    img = decode_image(bytes(payload or b""))
                except (ValueError, NotImplementedError):
                    img = None
                out["media_id"].append(mid)
                if img is None:
                    out["decoded"].append(False)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mean_rgb"].append(None)
                    out["thumb_mean"].append(None)
                else:
                    th = resize_nearest(img, thumb, thumb).mean(axis=2)
                    out["decoded"].append(True)
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["mean_rgb"].append([float(x) for x in img.reshape(-1, 3).mean(axis=0)])
                    out["thumb_mean"].append([float(x) for x in th.reshape(-1)])
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(fn, IMAGE_FEATURES_SCHEMA)
