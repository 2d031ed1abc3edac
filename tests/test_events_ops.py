"""Event-analytics operator semantics (the oracle checks values at sf0.01;
these pin the boundary behaviors a synthetic corpus never hits)."""

import datetime as dt

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, "x", v, "{}") for (i, ts, uid, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_session_gap_boundary(spark):
    """delta == gap MERGES (Spark session semantics, mirrored by the
    oracle's strict '>' break); delta just over gap splits."""
    from casualty_linking_spark.operators.events import user_sessions

    base = dt.datetime(2024, 1, 1)
    merged = _ev(spark, [(1, base, 7, 1.0), (2, base + dt.timedelta(hours=6), 7, 1.0)])
    assert user_sessions(merged).count() == 1
    split = _ev(
        spark,
        [(1, base, 7, 1.0), (2, base + dt.timedelta(hours=6, microseconds=1), 7, 1.0)],
    )
    out = user_sessions(split).orderBy("session_start").collect()
    assert len(out) == 2 and all(r.n_events == 1 for r in out)
    # end = last event + gap
    assert out[0].session_end == base + dt.timedelta(hours=6)


def test_rollup_decimal_sum_exact(spark):
    """0.1-style doubles sum exactly through the decimal path."""
    from casualty_linking_spark.operators.events import hourly_rollup

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=i), 7, 0.1) for i in range(10)]
    r = hourly_rollup(_ev(spark, rows)).collect()[0]
    assert r.n == 10 and r.sum_value == 1.0  # naive double fold gives 0.9999999999999999


def test_transcripts_context_windows(spark):
    """Sliding-context assembly: per-turn context = previous <=K turns in
    turn_idx order as 'role: text' lines; first turn of a conversation has
    an empty context. Recomputed independently in pandas."""
    from casualty_linking_spark.queries import (
        TRANSCRIPT_CTX_TURNS, q_transcripts_context,
    )
    from casualty_linking_spark import synth

    sf = "/root/testdata/sf0.001"
    got = (
        q_transcripts_context(spark, sf)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    t = (
        synth.transcripts_from_sf(spark, sf)
        .select("conv_id", "turn_idx", "role", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    assert len(got) == len(t)
    for conv_id, grp in t.groupby("conv_id"):
        grp = grp.reset_index(drop=True)
        sel = got[got.conv_id == conv_id].reset_index(drop=True)
        for i in range(len(grp)):
            prev = grp.iloc[max(0, i - TRANSCRIPT_CTX_TURNS):i]
            expect = "\n".join(
                f"{r.role}: {r.text if r.text is not None else ''}"
                for r in prev.itertuples()
            )
            assert sel.iloc[i].n_ctx == len(prev)
            assert sel.iloc[i].context == expect, (conv_id, i)
    first = got.groupby("conv_id").first()
    assert (first.n_ctx == 0).all() and (first.context == "").all()
