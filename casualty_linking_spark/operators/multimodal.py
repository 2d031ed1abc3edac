"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Decode status: PPM (P6), uncompressed 24-bit BMP, and **PNG** (8-bit,
non-interlaced: gray/RGB/palette/alpha, all five scanline filters) decode
FOR REAL in pure numpy + stdlib zlib (``decode_ppm`` / ``decode_bmp`` /
``decode_png`` / ``image_features``), with nearest-neighbour resize and a
minimal PNG encoder for test/synthesis payloads — and **baseline JPEG**
(ITU-T T.81 sequential DCT, 8-bit, grayscale/4:4:4) decodes for real too:
DQT/DHT/SOF0/SOS parse, canonical Huffman built from the stream's own DHT
segments, dequant + inverse zigzag + numpy IDCT, plus a matching minimal
encoder for test payloads. Progressive/subsampled/12-bit/arithmetic/restart
variants raise a disclosed ValueError (a real deployment uses PIL/libvips
for those). The
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
    formats the pure-numpy decoders below don't cover (WebP, progressive or
    chroma-subsampled JPEG, ...).

    Raises NotImplementedError: the container has no imaging libraries.
    PPM/BMP/PNG/baseline-JPEG decode for real via :func:`decode_image`; the
    generic pipeline otherwise runs with fake_decode=True."""
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
# Real decode (pure numpy — no imaging libs needed): PPM (P6) and 24-bit BMP
# are plain header + raster byte layouts; PNG is zlib + scanline unfiltering;
# baseline JPEG is implemented below (DQT/DHT/SOF0/SOS parse, stream-read
# Huffman tables, IDCT). Formats beyond those (WebP, progressive JPEG, ...)
# stay behind decode_image_batch's NotImplementedError.
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


# ---------------------------------------------------------------------------
# Real JPEG decode: BASELINE sequential DCT (ITU-T T.81), 8-bit, grayscale or
# 4:4:4 YCbCr — header/DQT/DHT/SOF0/SOS parse, canonical Huffman decode with
# byte unstuffing, dequant + inverse zigzag + IDCT (numpy matrix form),
# YCbCr->RGB. A matching minimal encoder (Annex K tables, quality-scaled
# quant, standard zigzag/RLE/category coding) synthesizes test payloads, as
# encode_png does for PNG. Disclosed coverage limits (clear ValueError, not
# silent garbage): progressive (SOF2), subsampled chroma, 12-bit precision,
# arithmetic coding, and restart intervals are rejected — the Huffman tables
# themselves are always read from the stream's DHT segments, never assumed.
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K "typical" Huffman tables: (16 length counts, symbol list)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> "np.ndarray":
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    c[0] /= np.sqrt(2)
    return c


_DCTM = _dct_matrix()


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) in JPEG canonical order."""
    out, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment reader with 0xFF00 unstuffing; hitting a real marker
    or running out of bits is a ValueError (truncated/corrupt payload)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: truncated entropy segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated entropy segment")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError("jpeg: unexpected marker inside entropy segment")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huffman(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map size-bit pattern to signed coefficient."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def encode_jpeg(img: "np.ndarray", quality: int = 90) -> bytes:
    """Minimal baseline JPEG encoder (grayscale or RGB -> 4:4:4 YCbCr) for
    test/synthesis payloads, mirroring encode_png's role."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps = [img.astype(np.float64) - 128.0]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y - 128.0, cb - 128.0, cr - 128.0]

    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = [np.clip((t * scale + 50) // 100, 1, 255).astype(np.int32)
          for t in (_QUANT_LUMA, _QUANT_CHROMA)]
    dc_codes = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    bw = _BitWriter()
    mcx, mcy = (w + 7) // 8, (h + 7) // 8
    prev_dc = [0] * len(comps)
    for by in range(mcy):
        for bx in range(mcx):
            for ci, comp in enumerate(comps):
                tq = 0 if ci == 0 else 1
                block = np.zeros((8, 8))
                ys, xs = min(8, h - by * 8), min(8, w - bx * 8)
                block[:ys, :xs] = comp[by * 8:by * 8 + ys, bx * 8:bx * 8 + xs]
                block[ys:, :] = block[ys - 1:ys, :]  # edge-pad
                block[:, xs:] = block[:, xs - 1:xs]
                coef = _DCTM @ block @ _DCTM.T
                q = np.round(coef.reshape(-1)[_ZIGZAG] / qt[tq][_ZIGZAG]).astype(int)
                diff = int(q[0]) - prev_dc[ci]
                prev_dc[ci] = int(q[0])
                size = _category(diff)
                code, length = dc_codes[tq][size]
                bw.write(code, length)
                if size:
                    bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
                run = 0
                last_nz = max(np.nonzero(q[1:])[0]) + 1 if np.any(q[1:]) else 0
                for i in range(1, last_nz + 1):
                    v = int(q[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_codes[tq][0xF0]
                        bw.write(c, ln)
                        run -= 16
                    size = _category(v)
                    c, ln = ac_codes[tq][(run << 4) | size]
                    bw.write(c, ln)
                    bw.write(v if v > 0 else v + (1 << size) - 1, size)
                    run = 0
                if last_nz < 63:
                    c, ln = ac_codes[tq][0x00]  # EOB
                    bw.write(c, ln)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    ncomp = 1 if gray else 3
    out = [b"\xff\xd8", seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")]
    for tq in range(2 if not gray else 1):
        out.append(seg(0xFFDB, bytes([tq]) + bytes(qt[tq][_ZIGZAG].tolist())))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out.append(seg(0xFFC0, sof))
    for tc, th, (counts, syms) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)
    )[: 2 if gray else 4]:
        out.append(seg(0xFFC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out.append(seg(0xFFDA, sos))
    out.append(bw.flush())
    out.append(b"\xff\xd9")
    return b"".join(out)


def decode_jpeg(b: bytes) -> "np.ndarray":
    """Baseline sequential JPEG -> uint8 array (h, w) or (h, w, 3). Tables
    are read from the stream (DQT/DHT), never assumed. Rejects with a clear
    ValueError: progressive/other SOFs, chroma subsampling, 12-bit samples,
    restart intervals, arithmetic coding — disclosed coverage limits."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad SOI")
    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    h = w = 0
    data = None
    while pos < len(b) - 1:
        if b[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0xC2, 0xC1, 0xC3) or 0xC5 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise ValueError("jpeg: only baseline sequential (SOF0) is supported")
        if pos + 2 > len(b):
            raise ValueError("jpeg: truncated segment header")
        (seglen,) = struct.unpack_from(">H", b, pos)
        if pos + seglen > len(b):
            raise ValueError("jpeg: truncated segment")
        payload = b[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:
            o = 0
            while o < len(payload):
                pq, tqid = payload[o] >> 4, payload[o] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(payload[o + 1:o + 65], dtype=np.uint8)
                qt[tqid] = tbl
                o += 65
        elif marker == 0xC4:
            o = 0
            while o < len(payload):
                tc, th = payload[o] >> 4, payload[o] & 0xF
                counts = list(payload[o + 1:o + 17])
                n = sum(counts)
                syms = list(payload[o + 17:o + 17 + n])
                codes = _canonical_codes(counts, syms)
                huff[(tc, th)] = {(ln, code): s for s, (code, ln) in codes.items()}
                o += 17 + n
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            for ci in range(nc):
                cid, samp, tqid = payload[6 + ci * 3:9 + ci * 3]
                if samp != 0x11:
                    raise ValueError("jpeg: chroma subsampling unsupported (4:4:4 only)")
                comps.append((cid, tqid))
        elif marker == 0xDD:
            raise ValueError("jpeg: restart intervals unsupported")
        elif marker == 0xDA:
            ns = payload[0]
            for si in range(ns):
                cs, tt = payload[1 + si * 2:3 + si * 2]
                idx = next(i for i, (cid, _) in enumerate(comps) if cid == cs)
                scan.append((idx, tt >> 4, tt & 0xF))
            data = b[pos:]
            end = data.rfind(b"\xff\xd9")
            data = data[: end if end >= 0 else len(data)]
            break
    if data is None or not comps:
        raise ValueError("jpeg: missing scan")

    br = _BitReader(data)
    mcx, mcy = (w + 7) // 8, (h + 7) // 8
    planes = [np.zeros((mcy * 8, mcx * 8)) for _ in comps]
    prev_dc = [0] * len(comps)
    for by in range(mcy):
        for bx in range(mcx):
            for ci, td, ta in scan:
                dct, act = huff[(0, td)], huff[(1, ta)]
                q = np.zeros(64, dtype=np.int64)
                size = br.huffman(dct)
                prev_dc[ci] += _extend(br.bits(size), size) if size else 0
                q[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = br.huffman(act)
                    if sym == 0x00:
                        break
                    run, size = sym >> 4, sym & 0xF
                    if size == 0 and run == 15:
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("jpeg: coefficient index out of range")
                    q[k] = _extend(br.bits(size), size)
                    k += 1
                coef = np.zeros(64)
                coef[_ZIGZAG] = q * qt[comps[ci][1]]
                block = _DCTM.T @ coef.reshape(8, 8) @ _DCTM
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block
    planes = [p[:h, :w] + 128.0 for p in planes]
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0, 255).astype(np.uint8)


def decode_image(b: bytes) -> "np.ndarray | None":
    """Dispatch on magic bytes. Returns None for unknown payloads (callers
    fall back to byte-level features). PPM/BMP/PNG/baseline-JPEG all decode
    for real in pure numpy; JPEG variants outside baseline-4:4:4 raise a
    disclosed ValueError (a production deployment adds PIL/libvips)."""
    if not b:
        return None
    if b[:2] == b"P6":
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == _PNG_SIG:
        return decode_png(b)
    if b[:2] == b"\xff\xd8":
        return decode_jpeg(b)
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
