"""Structured Streaming ingest: transcripts land as parquet files (the
streaming face of the Iceberg append), mention extraction runs incrementally,
and per-conversation records are maintained with watermarked stateful
aggregation.

The reference is a pure batch pipeline (SURVEY §2.10) — this module is the
engine's incremental-ingest extension: at 10^12-turn scale new conversations
arrive continuously and re-running the batch extraction over the full table
is not an option. Extraction is stateless (same JVM regexp plan as batch);
record assembly uses a watermark on ts + groupBy(conv_id, window) so state
is bounded and late turns within the watermark still fold into their record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import extract
from ..schema import TRANSCRIPTS_SCHEMA


def read_transcripts_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_mentions(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental T0 -> T1: stateless extraction, exactly-once via
    checkpointed file-source offsets + idempotent parquet append."""
    stream = read_transcripts_stream(spark, input_dir)
    mentions = extract.extract_mentions(stream)
    writer = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_record_counts(
    spark: SparkSession, input_dir: str, checkpoint_dir: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked per-conversation turn/mention counts — the bounded-state
    summary a monitoring sink consumes. Returns the streaming DataFrame
    (caller attaches a sink)."""
    stream = read_transcripts_stream(spark, input_dir)
    # stateful agg keyed by (window, conv): state bounded by the watermark
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
    )
