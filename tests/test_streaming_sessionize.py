"""applyInPandasWithState sessionization: closed conversations emit exactly
once, carrying whole-conversation features, and match the batch oracle."""

from __future__ import annotations

import pyspark.sql.functions as F


def _write_turns(spark, path, conv_ids, base_epoch, mode="overwrite"):
    """5 turns per conversation, roles alternating, ts 1s apart."""
    df = (
        spark.createDataFrame([(c,) for c in conv_ids], "conv_id string")
        .select(
            "conv_id",
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("turn_idx"),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int"),
            F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant").alias("role"),
            F.concat(F.col("conv_id"), F.lit("-t"), F.col("turn_idx")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(F.lit(base_epoch) + F.col("turn_idx")).alias("ts"),
        )
    )
    df.write.mode(mode).parquet(path)
    return df


def test_sessionize_matches_batch_oracle(spark, tmp_path):
    from casualty_linking_spark.streaming.ingest import read_transcripts_stream
    from casualty_linking_spark.streaming.sessionize import (
        batch_sessions,
        sessionize_conversations,
    )

    inp, outp, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    t0 = 1_700_000_000
    convs = [f"conv{i}" for i in range(6)]
    _write_turns(spark, inp, convs, t0)

    def run_once():
        q = (
            sessionize_conversations(
                read_transcripts_stream(spark, inp), watermark="10 seconds", gap_ms=30_000
            )
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()  # folds all turns into state; nothing closed yet

    # clock conversations: much-later events that push the watermark past
    # every session's timeout (t0+4 + 30s gap). Two runs because a batch
    # evaluates timeouts against the watermark of the PREVIOUS batch.
    _write_turns(spark, inp, ["clock-a"], t0 + 3600, mode="append")
    run_once()
    _write_turns(spark, inp, ["clock-b"], t0 + 7200, mode="append")
    run_once()

    got = spark.read.parquet(outp)
    sessions = {r.conv_id: r for r in got.filter(~F.col("conv_id").startswith("clock")).collect()}
    assert set(sessions) == set(convs)
    # exactly once per conversation
    assert got.filter(~F.col("conv_id").startswith("clock")).count() == len(convs)

    expect = {
        r.conv_id: r
        for r in batch_sessions(spark.read.parquet(inp).filter(~F.col("conv_id").startswith("clock")))
        .collect()
    }
    for c in convs:
        g, e = sessions[c], expect[c]
        assert (
            g.n_turns, g.min_turn_idx, g.max_turn_idx, g.n_user_turns, g.text_fingerprint
        ) == (
            e.n_turns, e.min_turn_idx, e.max_turn_idx, e.n_user_turns, e.text_fingerprint
        ), c


def test_sessionize_replay_many_files_multi_batch(spark, tmp_path):
    """Round-4 driver regression: history replayed as MANY unordered files
    (64 >= the driver's 32) with maxFilesPerTrigger=8 forces >= 8
    micro-batches; files are hash-partitioned so later batches carry OLDER
    timestamps than earlier ones. With a too-small watermark delay those
    rows are dropped as late data (driver saw 751/1500 sessions); with the
    harness contract — delay > full replayed ts span — every session must
    close, loss-free and fingerprint-exact."""
    from casualty_linking_spark.queries import SESSIONS_REPLAY_FILES
    from casualty_linking_spark.streaming.ingest import read_transcripts_stream
    from casualty_linking_spark.streaming.sessionize import (
        batch_sessions,
        sessionize_conversations,
    )

    assert SESSIONS_REPLAY_FILES >= 32  # the harness must exercise >=32 files

    inp, outp, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    t0 = 1_700_000_000
    n_convs = 48
    convs = [f"conv{i:03d}" for i in range(n_convs)]
    # stagger conversations 100s apart -> ts span ~ n_convs*100s, far larger
    # than any per-conversation gap; hash-partition into 64 files so file
    # order is uncorrelated with event time (the adversarial layout)
    base = (
        spark.createDataFrame(
            [(c, i) for i, c in enumerate(convs)], "conv_id string, off int"
        )
        .select(
            "conv_id",
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("turn_idx"),
            "off",
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int"),
            F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant").alias("role"),
            F.concat(F.col("conv_id"), F.lit("-t"), F.col("turn_idx")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(
                F.lit(t0) + F.col("off") * 100 + F.col("turn_idx")
            ).alias("ts"),
        )
        .drop("off")
    )
    base.repartition(64, "conv_id").write.parquet(inp)
    import glob

    assert len(glob.glob(f"{inp}/part-*.parquet")) >= 32

    span_s = n_convs * 100 + 5
    wm_s = span_s + 60

    def run_once():
        q = (
            sessionize_conversations(
                read_transcripts_stream(spark, inp),
                watermark=f"{wm_s} seconds",
                gap_ms=30_000,
            )
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    _write_turns(spark, inp, ["clock-a"], t0 + span_s + wm_s + 3600, mode="append")
    run_once()
    _write_turns(spark, inp, ["clock-b"], t0 + span_s + wm_s + 7200, mode="append")
    run_once()

    got = spark.read.parquet(outp).filter(~F.col("conv_id").startswith("clock"))
    assert got.count() == n_convs, f"lost sessions: {got.count()}/{n_convs}"
    expect = {r.conv_id: r for r in batch_sessions(base).collect()}
    for r in got.collect():
        e = expect[r.conv_id]
        assert (
            r.n_turns, r.min_turn_idx, r.max_turn_idx, r.n_user_turns, r.text_fingerprint
        ) == (
            e.n_turns, e.min_turn_idx, e.max_turn_idx, e.n_user_turns, e.text_fingerprint
        ), r.conv_id


def test_sessionize_folds_out_of_order_arrivals(spark, tmp_path):
    """A conversation split across files arriving out of turn order must
    fold to the same fingerprint (state keys hashes by turn_idx)."""
    from casualty_linking_spark.streaming.ingest import read_transcripts_stream
    from casualty_linking_spark.streaming.sessionize import (
        batch_sessions,
        sessionize_conversations,
    )

    inp, outp, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    t0 = 1_700_000_000
    full = _write_turns(spark, str(tmp_path / "ref"), ["c0"], t0)
    # arrive late turns first, early turns second (both within watermark)
    full.filter("turn_idx >= 3").write.parquet(inp)
    full.filter("turn_idx < 3").write.mode("append").parquet(inp)

    def run_once():
        q = (
            sessionize_conversations(
                read_transcripts_stream(spark, inp), watermark="10 seconds", gap_ms=10_000
            )
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    _write_turns(spark, inp, ["clock-a"], t0 + 3600, mode="append")
    run_once()
    _write_turns(spark, inp, ["clock-b"], t0 + 7200, mode="append")
    run_once()

    got = {r.conv_id: r for r in spark.read.parquet(outp).collect()}
    want = batch_sessions(full).collect()[0]
    assert "c0" in got
    assert got["c0"].text_fingerprint == want.text_fingerprint
    assert got["c0"].n_turns == 5
