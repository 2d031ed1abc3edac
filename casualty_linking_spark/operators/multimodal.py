"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this container —
``decode_image_batch`` raises NotImplementedError unless the deterministic
fake decoder is requested), but the Spark-side plumbing is real and tested:
schema contract, Arrow batch shapes, partition-preserving mapInPandas, and
the metadata projection that lets Catalyst prune the (huge) binary column
when a query touches only metadata.

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
