"""Incremental T0->T5 materialization (streaming/ingest.stream_triples):
the batch-partitioned store built over multiple micro-batches must equal
the batch-built graph exactly, and re-processing a batch id must be
idempotent (overwrite, not duplicate)."""

import tempfile


def test_streaming_triples_equals_batch(spark):
    from casualty_linking_spark import dims, queries as Q, synth
    from casualty_linking_spark.operators.triples import records_to_triples
    from casualty_linking_spark.streaming.ingest import stream_triples

    sf = "/root/testdata/sf0.001"
    tmp = tempfile.mkdtemp(prefix="t_stream_triples_")
    inp, store, ckpt = f"{tmp}/in", f"{tmp}/store", f"{tmp}/ckpt"
    # 16 conversation-complete files, 2 per trigger -> 8 micro-batches:
    # exercises the multi-batch path on any host (the r4 lesson)
    synth.transcripts_from_sf(spark, sf).repartition(16, "conv_id").write.parquet(inp)
    q = stream_triples(spark, inp, store, ckpt, dims.dim_cemeteries(spark), files_per_trigger=2)
    q.awaitTermination()

    cols = ["subj", "pred", "obj", "obj_type", "datatype"]
    streamed = spark.read.parquet(store).select(*cols)
    batch = records_to_triples(
        Q.build_silver(spark, sf), dims.dim_cemeteries(spark)
    ).select(*cols)
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
