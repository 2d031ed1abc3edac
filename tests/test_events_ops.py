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
