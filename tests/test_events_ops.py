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


def test_interval_join_boundaries_and_buckets(spark):
    """Half-open [start, end): ts == start matches, ts == end does not; a
    point in a LATER epoch bucket than its interval's start still matches
    (the bucket-explosion leg); same-user constraint enforced."""
    import datetime as dt

    from casualty_linking_spark.operators.events import interval_join

    base = dt.datetime(2024, 1, 1, 0, 14)  # interval straddles a 900s bucket edge
    iv = spark.createDataFrame(
        [(100, 7, base, base + dt.timedelta(seconds=900))],
        "interval_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    pts = spark.createDataFrame(
        [
            (1, base, 7),  # == start -> in
            (2, base + dt.timedelta(seconds=899), 7),  # in, next bucket
            (3, base + dt.timedelta(seconds=900), 7),  # == end -> out
            (4, base - dt.timedelta(seconds=1), 7),  # before -> out
            (5, base + dt.timedelta(seconds=10), 8),  # other user -> out
        ],
        "event_id long, ts timestamp, user_id long",
    )
    got = sorted(
        r.event_id for r in interval_join(pts, iv, bucket_seconds=900).collect()
    )
    assert got == [1, 2]


def test_interval_join_no_duplicate_pairs(spark):
    """An interval exploded into several buckets still meets each point at
    most once (the point owns exactly one bucket)."""
    import datetime as dt

    from casualty_linking_spark.operators.events import interval_join

    base = dt.datetime(2024, 1, 1)
    iv = spark.createDataFrame(
        [(100, 7, base, base + dt.timedelta(seconds=3600))],
        "interval_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    pts = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=1800), 7)],
        "event_id long, ts timestamp, user_id long",
    )
    # bucket (600s) much smaller than the interval: 7 exploded rows, 1 match
    assert interval_join(pts, iv, bucket_seconds=600).count() == 1


def test_cube_rollup_grouping_sets_and_null_disambiguation(spark):
    """All four grouping sets from one pass; a NULL event_type in the DATA
    stays distinguishable from a CUBE subtotal NULL via gid (bit set =
    column rolled up)."""
    from casualty_linking_spark.operators.events import cube_rollup

    t0 = dt.datetime(2024, 1, 1, 1, 0)
    rows = [
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t0, 1, "a", 2.0, "{}"),
        (3, t0, 1, None, 4.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 2, 0), 1, "a", 8.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        (r.event_type, r.hod, r.gid): (r.n, r.sum_value)
        for r in cube_rollup(df).collect()
    }
    assert len(out) == 8  # 3 detail + 2 per-type + 2 per-hour + grand total
    assert out[("a", 1, 0)] == (2, 3.0)      # detail
    assert out[(None, 1, 0)] == (1, 4.0)     # data NULL, gid says detail
    assert out[(None, 1, 2)] == (3, 7.0)     # hour-1 subtotal over types
    assert out[("a", None, 1)] == (3, 11.0)  # type-a subtotal over hours
    assert out[(None, None, 3)] == (4, 15.0)  # grand total


def test_retention_cohorts_hand_data(spark):
    """Two users in the Jan-1 cohort (one active again on day 2), one user
    in the Jan-3 cohort; repeat events on the same day count once."""
    from casualty_linking_spark.operators.events import retention_cohorts

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1, 9), 10, 1.0),
        (2, d(2024, 1, 1, 17), 10, 1.0),   # same user+day dedups
        (3, d(2024, 1, 3, 9), 10, 1.0),    # u10 active at offset 2
        (4, d(2024, 1, 1, 9), 20, 1.0),
        (5, d(2024, 1, 3, 9), 30, 1.0),    # second cohort
    ]
    out = {
        (str(r.cohort_day), r.day_offset): r.n_active
        for r in retention_cohorts(_ev(spark, rows)).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-03", 0): 1,
    }


def _evt(spark, rows):
    """(event_id, ts, user_id, event_type, value) frames for funnel tests."""
    return spark.createDataFrame(
        [(i, ts, uid, et, v, "{}") for (i, ts, uid, et, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_strict_order_hand_data(spark):
    """Steps must occur in strictly increasing ts: a click BEFORE the first
    view doesn't count, a click AT the view's timestamp doesn't count, and
    a purchase before the qualifying click doesn't count."""
    from casualty_linking_spark.operators.events import funnel

    d = dt.datetime
    rows = [
        # u1: complete funnel
        (1, d(2024, 1, 1, 9), 1, "view", 1.0),
        (2, d(2024, 1, 1, 10), 1, "click", 1.0),
        (3, d(2024, 1, 1, 11), 1, "purchase", 1.0),
        # u2: click precedes the view -> stops at step 1
        (4, d(2024, 1, 1, 8), 2, "click", 1.0),
        (5, d(2024, 1, 1, 9), 2, "view", 1.0),
        # u3: view only
        (6, d(2024, 1, 1, 9), 3, "view", 1.0),
        # u4: click TIED with view (strictly-after fails); orphan purchase
        (7, d(2024, 1, 1, 9), 4, "view", 1.0),
        (8, d(2024, 1, 1, 9), 4, "click", 1.0),
        (9, d(2024, 1, 1, 10), 4, "purchase", 1.0),
        # u5: early purchase doesn't count, later click does
        (10, d(2024, 1, 1, 8), 5, "purchase", 1.0),
        (11, d(2024, 1, 1, 9), 5, "view", 1.0),
        (12, d(2024, 1, 1, 9, 30), 5, "click", 1.0),
        (13, d(2024, 1, 1, 9, 15), 5, "purchase", 1.0),
    ]
    out = {r.step: (r.event_type, r.n_users) for r in funnel(_evt(spark, rows)).collect()}
    assert out == {1: ("view", 5), 2: ("click", 2), 3: ("purchase", 1)}


def test_hopping_rollup_two_windows_per_event(spark):
    """1h/30min hopping: an event at :15 lands in the :00 window and the
    previous :30 window — exactly two rows each, decimal-exact sums."""
    from casualty_linking_spark.operators.events import hopping_rollup

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1, 9, 15), 1, 1.25),
        (2, d(2024, 1, 1, 9, 45), 1, 2.0),
    ]
    out = {
        (str(r.ws), r.event_type): (r.n, r.sum_value)
        for r in hopping_rollup(_ev(spark, rows)).collect()
    }
    assert out == {
        ("2024-01-01 08:30:00", "x"): (1, 1.25),
        ("2024-01-01 09:00:00", "x"): (2, 3.25),
        ("2024-01-01 09:30:00", "x"): (1, 2.0),
    }


def test_stream_interval_join_cross_batch_match(spark):
    """Stream-stream join must match pairs that arrive in DIFFERENT
    micro-batches in event-time-reversed order: the purchase's file is
    replayed before its incident's file (maxFilesPerTrigger=1 forces one
    file per batch), so the buffered purchase must still be joined when the
    incident arrives — and a span-sized watermark must keep it loss-free."""
    import tempfile

    from casualty_linking_spark.operators.events import stream_interval_join

    tmp = tempfile.mkdtemp(prefix="t_ssj_")
    inp, outp, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    d = dt.datetime
    # file 0: LATER purchase events; file 1: the EARLIER error incident
    _ev_rows = [
        # (event_id, ts, user_id, event_type, value)
        [(2, d(2024, 1, 1, 9, 10), 7, "purchase", 1.0),
         (3, d(2024, 1, 1, 9, 40), 7, "purchase", 1.0),   # outside 30 min
         (4, d(2024, 1, 1, 9, 5), 8, "purchase", 1.0)],   # other user
        [(1, d(2024, 1, 1, 9, 0), 7, "error", 1.0)],
    ]
    for i, rows in enumerate(_ev_rows):
        spark.createDataFrame(
            [(e, ts, u, et, v, "{}") for (e, ts, u, et, v) in rows],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("append").parquet(inp)
    q = stream_interval_join(
        spark, inp, ckpt, outp,
        window_sec=1800, watermark_sec=24 * 3600, max_files=1,
    )
    q.awaitTermination()
    out = spark.read.parquet(outp).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.incident_id, r.event_id, r.user_id) == (1, 2, 7)
    assert r.delta_us == 10 * 60 * 1_000_000


def test_approx_distinct_kmv_hand_recompute(spark):
    """A group with < k members returns its exact count; a group with >= k
    members returns (k-1)/h_k recomputed here from hashlib.md5 — the sketch
    is deterministic, not just approximately right."""
    import hashlib

    from casualty_linking_spark.operators.events import approx_distinct_kmv

    d = dt.datetime
    rows = [(i, d(2024, 1, 1), uid, "big", 1.0) for i, uid in enumerate(range(100, 120))]
    rows += [(200 + j, d(2024, 1, 1), 5 + j, "small", 1.0) for j in range(3)]
    out = {r.event_type: (r.n_kept, r.est_distinct)
           for r in approx_distinct_kmv(_evt(spark, rows), k=8).collect()}
    assert out["small"] == (3, 3.0)
    hashes = sorted(hashlib.md5(str(u).encode()).hexdigest() for u in range(100, 120))
    hk = int(hashes[7][:8], 16) / 2**32
    assert out["big"] == (8, round(7.0 / hk, 4))


def test_value_histogram_bin_edges_and_clamp(spark):
    """49.99 stays in bin 0, exactly 50.0 moves to bin 1, and any value at
    or past width*(n_bins-1) clamps into the overflow bin."""
    from casualty_linking_spark.operators.events import value_histogram

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1), 1, "a", 49.99),
        (2, d(2024, 1, 1), 1, "a", 50.0),
        (3, d(2024, 1, 1), 1, "a", 9999.0),
        (4, d(2024, 1, 1), 1, "a", 450.0),
    ]
    out = {(r.event_type, r.bin): (r.n, r.sum_value)
           for r in value_histogram(_evt(spark, rows)).collect()}
    assert out == {
        ("a", 0): (1, 49.99),
        ("a", 1): (1, 50.0),
        ("a", 9): (2, 10449.0),
    }


def test_zscore_outliers_hand_recompute(spark):
    """z recomputed here from the exact decimal moments (population std):
    only the planted spike crosses |z| >= 2.5, and its rounded z matches the
    operator bit-for-bit. A second type with zero variance emits nothing
    (z = x/0 = NULL/inf never passes the abs filter)."""
    import math

    from casualty_linking_spark.operators.events import zscore_outliers

    d = dt.datetime(2024, 1, 1)
    vals = [10.0] * 20 + [10.5] * 20 + [9.5] * 19 + [40.0]
    rows = [(i, d, 1, "a", v) for i, v in enumerate(vals)]
    rows += [(100 + j, d, 1, "flat", 5.0) for j in range(5)]
    out = zscore_outliers(_evt(spark, rows), threshold=2.5).collect()
    assert [r.event_id for r in out] == [59]
    n = len(vals)
    s1, s2 = sum(vals), sum(v * v for v in vals)
    mean = s1 / n
    std = math.sqrt(s2 / n - mean * mean)
    assert out[0].z == round((40.0 - mean) / std, 6)
    assert out[0].event_type == "a"


def test_ohlc_downsample_hand_data(spark):
    """OHLC: open/close follow the (ts, event_id) total order — a ts tie is
    broken by event_id (the padded-key contract), high/low are plain
    extrema, and each bucket aggregates independently."""
    from casualty_linking_spark.operators.events import ohlc_downsample

    d = dt.datetime
    rows = [
        (2, d(2024, 1, 1, 9, 0, 0), 7, 5.0),  # ts-tied with id 1: loses open
        (1, d(2024, 1, 1, 9, 0, 0), 7, 7.0),
        (3, d(2024, 1, 1, 9, 30, 0), 7, 1.0),  # latest -> close
        (4, d(2024, 1, 1, 10, 5, 0), 7, 9.0),  # alone in the 10:00 bucket
    ]
    out = {
        str(r.ws): (r.open, r.high, r.low, r.close, r.n)
        for r in ohlc_downsample(_ev(spark, rows)).collect()
    }
    assert out == {
        "2024-01-01 09:00:00": (7.0, 7.0, 1.0, 1.0, 3),
        "2024-01-01 10:00:00": (9.0, 9.0, 9.0, 9.0, 1),
    }


def test_time_weighted_average_hand_recompute(spark):
    """TWA: LOCF segments in exact microseconds — 2.0 held 10 s then 4.0
    held 30 s is (2*10 + 4*30)/40 = 3.5; the bucket's last observation
    carries no segment; a single-observation bucket has no elapsed time so
    twa and dur_us are NULL (never a divide-by-zero)."""
    from casualty_linking_spark.operators.events import time_weighted_average

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1, 9, 0, 0), 7, 2.0),
        (2, d(2024, 1, 1, 9, 0, 10), 7, 4.0),
        (3, d(2024, 1, 1, 9, 0, 40), 7, 1.0),  # last in bucket: no segment
        (4, d(2024, 1, 1, 10, 5, 0), 7, 9.0),  # single-observation bucket
    ]
    out = {
        str(r.ws): (r.n, r.dur_us, r.twa)
        for r in time_weighted_average(_ev(spark, rows)).collect()
    }
    assert out == {
        "2024-01-01 09:00:00": (3, 40_000_000, 3.5),
        "2024-01-01 10:00:00": (1, None, None),
    }
