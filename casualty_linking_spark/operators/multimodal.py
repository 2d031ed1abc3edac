"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Decode status: PPM (P6), uncompressed 24-bit BMP, and **PNG** (8-bit,
non-interlaced: gray/RGB/palette/alpha, all five scanline filters) decode
FOR REAL in pure numpy + stdlib zlib (``decode_ppm`` / ``decode_bmp`` /
``decode_png`` / ``image_features``), with nearest-neighbour resize and a
minimal PNG encoder for test/synthesis payloads. JPEG is a full DCT+Huffman
codec — out of scope to reimplement; it stays behind a disclosed
NotImplementedError (a real deployment uses PIL/libvips there). The
Spark-side plumbing is real and tested either way: schema contract, Arrow
batch shapes, partition-preserving mapInPandas, and the metadata projection
that lets Catalyst prune the (huge) binary column when a query touches only
metadata.

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
    """REAL general decoder stub — would use PIL/libvips here for the
    formats the pure-numpy decoders below don't cover (JPEG, WebP, ...).

    Raises NotImplementedError: the container has no imaging libraries.
    PPM/BMP/PNG decode for real via :func:`decode_image`; the generic
    pipeline otherwise runs with fake_decode=True."""
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (bit depth 8, non-interlaced supported)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: "np.ndarray", h: int, stride: int, bpp: int) -> "np.ndarray":
    """Reverse PNG scanline filtering (spec §6: None/Sub/Up/Average/Paeth).

    ``raw`` is the decompressed IDAT stream reshaped to h x (1+stride): one
    filter byte then ``stride`` raster bytes per row. Up is vectorized; Sub/
    Average/Paeth carry a left-neighbour dependency, so those rows walk
    pixel-groups (bpp-wide numpy slices) — rows are short, and at scale the
    decode is parallel across images via mapInPandas, not within one."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(raw[y, 0])
        row = raw[y, 1:].astype(np.int32)
        if ft == 0:
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(0, stride, bpp):
                a = cur[x - bpp : x] if x >= bpp else np.zeros(bpp, dtype=np.int32)
                seg = row[x : x + bpp]
                b_ = prev[x : x + len(seg)]
                a = a[: len(seg)]
                if ft == 1:
                    cur[x : x + len(seg)] = (seg + a) & 0xFF
                elif ft == 3:
                    cur[x : x + len(seg)] = (seg + (a + b_) // 2) & 0xFF
                else:  # Paeth predictor
                    c = (
                        prev[x - bpp : x - bpp + len(seg)]
                        if x >= bpp
                        else np.zeros(len(seg), dtype=np.int32)
                    )
                    p = a + b_ - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b_), np.abs(p - c)
                    pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b_, c))
                    cur[x : x + len(seg)] = (seg + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(b: bytes) -> "np.ndarray":
    """PNG -> HxWx3 uint8 RGB, pure numpy + stdlib zlib (no imaging libs).

    Supports the common training-data case: bit depth 8, color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
    non-interlaced. Gray replicates to 3 channels and alpha is dropped —
    the downstream feature stage consumes RGB. Interlaced (Adam7) and
    16-bit files raise ValueError (callers treat them as undecodable rather
    than failing the batch)."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, n = 8, len(b)
    w = h = None
    color_type = None
    idat = bytearray()
    plte = None
    while i + 8 <= n:
        (length,) = struct.unpack_from(">I", b, i)
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        i += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"only 8-bit PNG supported (depth={depth})")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if color_type not in _PNG_CHANNELS or comp != 0 or filt != 0:
                raise ValueError(f"unsupported PNG (color={color_type}, comp={comp})")
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:  # corrupt IDAT must not kill a decode batch
        raise ValueError(f"corrupt PNG IDAT: {e}") from e
    if raw.size != h * (1 + stride):
        raise ValueError("PNG raster size mismatch")
    px = _png_unfilter(raw.reshape(h, 1 + stride), h, stride, ch).reshape(h, w, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        if int(px.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[px[:, :, 0]].copy()
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # RGB / RGBA


def encode_png(img: "np.ndarray", filter_type: int = 0) -> bytes:
    """Minimal PNG writer (8-bit RGB, one filter type for every scanline) —
    exists so tests/synthesis can plant REAL PNG payloads without imaging
    libs. Filter types 1/3/4 exercise the decoder's sequential unfilter
    paths; the test suite applies the spec's filter formulas here and the
    decoder must invert them."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    assert ch == 3, "encoder supports RGB"
    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.int32)
    for y in range(h):
        row = img[y].astype(np.int32)
        raw.append(filter_type)
        if filter_type == 0:
            enc = row
        elif filter_type == 1:  # Sub
            a = np.vstack([np.zeros((1, 3), np.int32), row[:-1]])
            enc = (row - a) & 0xFF
        elif filter_type == 2:  # Up
            enc = (row - prev) & 0xFF
        elif filter_type == 3:  # Average
            a = np.vstack([np.zeros((1, 3), np.int32), row[:-1]])
            enc = (row - (a + prev) // 2) & 0xFF
        elif filter_type == 4:  # Paeth
            a = np.vstack([np.zeros((1, 3), np.int32), row[:-1]])
            c = np.vstack([np.zeros((1, 3), np.int32), prev[:-1]])
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c))
            enc = (row - pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {filter_type}")
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_image(b: bytes) -> "np.ndarray | None":
    """Dispatch on magic bytes. Returns None for unknown payloads (callers
    fall back to byte-level features); raises NotImplementedError for
    formats that truly need an imaging library (JPEG — a full DCT+Huffman
    codec is out of scope to reimplement; a real deployment uses
    PIL/libvips there)."""
    if not b:
        return None
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == _PNG_SIG:
        return decode_png(b)
    if b[:2] == b"\xff\xd8":
        raise NotImplementedError("JPEG decode requires PIL/libvips; not in this container")
    return None


def resize_nearest(img: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbour resize via index sampling (the real resample a
    thumbnailing stage needs, minus the interpolation kernels)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# Real audio decode: WAV (RIFF PCM 8/16-bit) is a plain chunked byte layout —
# pure struct/numpy, no audio libs. Compressed codecs (MP3/AAC/Opus) would
# need real codec libraries and stay undecodable (callers get decoded=false).
# ---------------------------------------------------------------------------


def decode_wav(b: bytes) -> "tuple[int, np.ndarray]":
    """RIFF/WAVE PCM -> (sample_rate, float32 array (n_samples, n_channels)
    in [-1, 1]). Supports 8-bit unsigned and 16-bit signed little-endian
    PCM, any channel count. Non-PCM formats / other depths / truncated
    files raise ValueError (batch-tolerant, like the image decoders)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(b)
    fmt = None
    data = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        (clen,) = struct.unpack_from("<I", b, i + 4)
        body = b[i + 8 : i + 8 + clen]
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format={audio_format})")
    if n_channels < 1:
        raise ValueError("bad channel count")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2", count=len(data) // 2).astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"only 8/16-bit PCM supported (bits={bits})")
    n_frames = len(x) // n_channels
    return sample_rate, x[: n_frames * n_channels].reshape(n_frames, n_channels)


def encode_wav(samples: "np.ndarray", sample_rate: int) -> bytes:
    """Minimal 16-bit PCM WAV writer (tests/synthesis counterpart of
    :func:`decode_wav`). ``samples``: float array (n, channels) in [-1, 1]."""
    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim == 1:
        samples = samples[:, None]  # 1-D input = mono
    n, ch = samples.shape
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("rms", T.FloatType(), True),
        T.StructField("peak", T.FloatType(), True),
        T.StructField("zero_crossing_rate", T.FloatType(), True),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV payloads for real, compute the standard cheap audio
    descriptors (duration, RMS, peak, zero-crossing rate on the channel
    mean). Arrow-batched mapInPandas, batch-tolerant: undecodable payloads
    (compressed codecs, garbage) yield decoded=false rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "media_id", "decoded", "sample_rate", "n_channels",
            "duration_ms", "rms", "peak", "zero_crossing_rate",
        )
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    rate, x = decode_wav(bytes(payload or b""))
                except ValueError:
                    out["decoded"].append(False)
                    for k in cols[2:]:
                        out[k].append(None)
                    continue
                mono = x.mean(axis=1)
                out["decoded"].append(True)
                out["sample_rate"].append(int(rate))
                out["n_channels"].append(int(x.shape[1]))
                out["duration_ms"].append(int(round(x.shape[0] * 1000.0 / rate)))
                out["rms"].append(float(np.sqrt((mono**2).mean())) if len(mono) else 0.0)
                out["peak"].append(float(np.abs(x).max()) if x.size else 0.0)
                zc = (
                    float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean())
                    if len(mono) > 1
                    else 0.0
                )
                out["zero_crossing_rate"].append(zc)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


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
