"""Streaming exact deduplication of a document stream.

A training-data pipeline at 100 TB ingests documents continuously; batch
:func:`~casualty_linking_spark.operators.dedup.exact_duplicates` over the
full corpus per arrival is not an option. This is the incremental face of
the same semantics: documents arrive as parquet files with an event-time
``ts``; duplicates (same text hash) are dropped with
``dropDuplicatesWithinWatermark``, so the dedup state the engine keeps is
bounded by the watermark horizon instead of growing with the corpus, and
exactly-once delivery comes from checkpointed file-source offsets +
idempotent parquet append (same recipe as
:mod:`casualty_linking_spark.streaming.ingest`).

The reference is a pure batch pipeline (SURVEY §2.10); this module is an
engine-only extension. The hash is null-safe (NULL text folds to a
sentinel key) to match the batch operator's null-group behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming import StreamingQuery

NULL_TEXT_SENTINEL = "#null#"

DOCUMENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def text_hash(text) -> F.Column:
    """Null-safe dedup key: md5(text), NULL text folded to a sentinel so a
    null group dedups like any other (md5(NULL) is NULL and NULL keys never
    equal each other in state lookups)."""
    return F.coalesce(F.md5(text), F.lit(NULL_TEXT_SENTINEL))


def read_documents_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_dedup_documents(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str,
    watermark: str = "10 minutes",
    available_now: bool = True,
) -> StreamingQuery:
    """Keep the first-received document per text hash; drop later arrivals
    whose event time falls within ``watermark`` of the seen one. State per
    key is evicted once the watermark passes it — bounded memory at any
    corpus size. Output is an append-only parquet of surviving documents
    (doc_id, text, ts, text_hash)."""
    stream = read_documents_stream(spark, input_dir)
    deduped = (
        stream.withColumn("text_hash", text_hash(F.col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
