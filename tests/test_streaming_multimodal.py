"""Streaming ingest + multimodal plumbing tests."""

import shutil

from pyspark.sql import functions as F


def test_stream_mentions_availablenow(spark, tmp_path):
    from casualty_linking_spark import synth
    from casualty_linking_spark.streaming.ingest import stream_mentions

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = synth.transcripts_range(spark, 40)
    t.write.parquet(inp)

    q = stream_mentions(spark, inp, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == 40 * synth.TURNS_PER_CONV
    # extraction matches the batch path
    from casualty_linking_spark.operators import extract

    batch = extract.extract_mentions(spark.read.parquet(inp))
    assert (
        got.select("conv_id", "turn_idx", "snimi").exceptAll(
            batch.select("conv_id", "turn_idx", "snimi")
        ).count()
        == 0
    )

    # incremental: appending new files processes only the delta
    synth.transcripts_range(spark, 60).filter(
        F.expr("CAST(substring(conv_id, 6) AS BIGINT)") >= 40
    ).write.mode("append").parquet(inp)
    q2 = stream_mentions(spark, inp, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 60 * synth.TURNS_PER_CONV


def test_multimodal_plumbing(spark, tmp_path):
    from casualty_linking_spark.operators.multimodal import (
        extract_features, frame_sample_plan, synthesize_media,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    media = synthesize_media(docs)
    assert media.schema["payload"].dataType.typeName() == "binary"

    feats = extract_features(media, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r.feature) == 4 for r in rows)
    assert all(r.n_bytes == 32 for r in rows)  # 2x md5 -> 32 bytes

    frames = frame_sample_plan(media, every_ms=1000)
    n_videos = media.filter("kind = 'video' and meta_duration_ms > 0").count()
    assert frames.select("media_id").distinct().count() == n_videos


def test_multimodal_real_decode_stubbed(spark):
    """The real decode path must be a clearly-marked NotImplementedError."""
    import pytest
    from casualty_linking_spark.operators.multimodal import decode_image_batch

    with pytest.raises(NotImplementedError):
        decode_image_batch(None)


def test_streaming_silver_equals_batch(spark):
    """kg_streaming_silver (availableNow file-stream -> incremental T1 ->
    record collapse) returns exactly the batch silver rows at sf0.001 —
    incremental == batch."""
    from casualty_linking_spark.queries import SILVER_COLS, q_records_silver, q_streaming_silver

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in q_records_silver(spark, sf).collect()}
    streamed = {tuple(r) for r in q_streaming_silver(spark, sf).collect()}
    assert streamed == batch
    assert len(batch) > 0
