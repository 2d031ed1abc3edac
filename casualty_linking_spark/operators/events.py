"""Event-stream analytics over the ``events`` table (event_id, ts, user_id,
event_type, value, props-JSON) — the hypertable-rollup / sessionization
idioms a telemetry pipeline runs, expressed as window aggregations.

Determinism across engines: the money column (``sum_value``) is summed as
DECIMAL(18,3), not double — floating-point summation order differs between
a shuffled Spark agg and DuckDB's serial fold, and a knife-edge double sum
would flap the oracle hash; decimal addition is exact and order-free (the final cast back to double is then bit-identical in both engines).
JSON extraction (``props -> k``) uses the engines' native JSON functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """1-hour tumbling window x event_type: count, exact decimal value sum,
    JSON-extracted k sum. Window start is epoch-aligned (matches DuckDB's
    time_bucket). Map-side combinable single shuffle."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").start.alias("ws"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("double")
            .alias("sum_value"),
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        )
    )


def cube_rollup(events: DataFrame) -> DataFrame:
    """event_type × hour-of-day CUBE — all four grouping sets (full detail,
    per-type, per-hour, grand total) in ONE pass, disambiguated by
    ``grouping_id`` (bit set = that column is rolled up, so a NULL grouping
    VALUE in the data is distinguishable from a CUBE subtotal NULL). The
    standard OLAP dashboard query: Spark expands the sets BEFORE the
    exchange and partial-aggregates each, so the shuffle carries the
    combined (types × hours) subtotal cardinality — bounded by the group
    space, never the event count — exactly once instead of four scans.
    Sums go through DECIMAL so they are summation-order-free (the
    events_rollup discipline), then surface as DOUBLE."""
    return (
        events.select(
            "event_type",
            F.hour("ts").alias("hod"),
            F.col("value").cast("decimal(18,3)").alias("v"),
        )
        .cube("event_type", "hod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("double").alias("sum_value"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_day, day_offset, n_active) — classic cohort retention: users
    grouped by the calendar day of their FIRST event, counted active on
    each later day. The growth/engagement rollup every event pipeline
    ships, and the canonical two-level-aggregation shape.

    One window pass assigns each event its user's cohort day (single
    Exchange on user_id — no groupBy+join-back round trip), then a
    count_distinct per (cohort, offset): Spark plans the distinct as a
    partial-aggregated expand, so the shuffle carries (cohort × offset ×
    user) triples already deduplicated map-side — bounded by active-user
    days, never raw events. Offsets are integer day arithmetic (no
    week-truncation semantics to disagree on across engines)."""
    w = Window.partitionBy("user_id")
    d = F.to_date("ts")
    return (
        events.select(
            F.min(d).over(w).alias("cohort_day"),
            d.alias("day"),
            "user_id",
        )
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


def funnel(
    events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """(step, event_type, n_users) — ordered funnel conversion: a user
    completes step k when an event of the k-th type occurs STRICTLY after
    their step-(k-1) completion time (same-timestamp events do not advance
    the funnel; step 1 is the user's first event of the first type). The
    canonical product-analytics query — the shape ClickHouse ships a
    dedicated windowFunnel() for.

    Joinless and single-Exchange: each step time is a conditional min over
    the SAME user_id window partitioning, so Spark chains the Window
    operators behind one Exchange and funnel depth adds ZERO shuffles
    (plan-asserted); the per-user collapse then reuses that partitioning
    (groupBy on the window's own key — no new Exchange), and only K counts
    cross the final single-row aggregation. No per-user arrays are ever
    collected — a whale user costs window-scan time, not executor memory."""
    w = Window.partitionBy("user_id")
    df = events.select("user_id", "ts", "event_type")
    prev = None
    for i, st in enumerate(steps, 1):
        cond = F.col("event_type") == st
        if prev is not None:
            cond = cond & (F.col("ts") > F.col(prev))
        df = df.withColumn(f"t{i}", F.min(F.when(cond, F.col("ts"))).over(w))
        prev = f"t{i}"
    per_user = df.groupBy("user_id").agg(
        *[F.min(f"t{i}").alias(f"t{i}") for i in range(1, len(steps) + 1)]
    )
    counts = per_user.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in range(1, len(steps) + 1)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("step"),
                F.lit(st).alias("event_type"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, st in enumerate(steps, 1)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def hopping_rollup(events: DataFrame) -> DataFrame:
    """(ws, event_type, n, sum_value) — 1-hour windows sliding every 30
    minutes: each event lands in exactly TWO overlapping windows (the
    smoothed dashboard rollup / rate-limiter shape; the hopping counterpart
    of :func:`hourly_rollup`). Spark's native window(ts, size, slide)
    expands the assignment BEFORE the exchange and partial-aggregates each
    copy, so the shuffle carries 2× the (window × type) group cardinality —
    bounded by the group space, never 2× the events. Sums go through
    DECIMAL (order-free — the events_rollup discipline)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").start.alias("ws"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def approx_distinct_kmv(events: DataFrame, k: int = 8) -> DataFrame:
    """(event_type, n_kept, est_distinct) — approximate distinct users per
    event type via a K-MINIMUM-VALUES sketch (Bar-Yossef et al. 2002): hash
    every member to [0,1), keep the k smallest distinct hashes, estimate
    |D| ≈ (k−1) / h_k. The sketch family engines ship as HLL — chosen here
    in its KMV form because md5 is bit-identical across engines, so unlike
    HLL the ESTIMATE itself is deterministic and value-hash-checkable
    against an independent implementation (groups with fewer than k members
    fall back to their exact count, also deterministic).

    Scale shape: the pre-sketch distinct is a map-side partial aggregation
    (the shuffle carries distinct (type, hash) pairs — the same bound as
    count_distinct, and the k-smallest selection is a row_number window
    over the partitioning that distinct already produced (no extra
    Exchange); only k rows per group survive to the final agg. h_k maps to
    a fraction via its first 8 hex nibbles (conv(…,16,10) / 2^32 — verified
    bit-equal to DuckDB's ('0x'||…)::BIGINT), estimate rounded 4 dp."""
    pairs = (
        events.where(F.col("user_id").isNotNull())
        .select("event_type", F.md5(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kept = pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    n = F.count(F.lit(1))
    frac = F.conv(F.substring(F.max("h"), 1, 8), 16, 10).cast("double") / F.lit(
        float(2**32)
    )
    return kept.groupBy("event_type").agg(
        n.alias("n_kept"),
        F.round(
            F.when(n < k, n.cast("double")).otherwise(F.lit(float(k - 1)) / frac),
            4,
        ).alias("est_distinct"),
    )


def value_histogram(
    events: DataFrame, width: float = 50.0, n_bins: int = 10
) -> DataFrame:
    """(event_type, bin, n, sum_value) — fixed-width value histogram with a
    clamped overflow bin (bin = min(floor(value/width), n_bins−1)), the
    distribution profile behind dashboards and data-quality gates. One
    map-side-combinable shuffle carrying (type × bin) groups; the bin
    arithmetic is spelled identically in both engines (floor of an IEEE
    double division — bit-deterministic) instead of leaning on
    width_bucket, whose edge conventions differ across engines; decimal
    order-free sums (the rollup discipline)."""
    b = F.least(F.floor(F.col("value") / width), F.lit(n_bins - 1)).cast("int")
    return (
        events.where(F.col("value").isNotNull())
        .groupBy("event_type", b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def user_sessions(events: DataFrame, gap: str = "6 hours") -> DataFrame:
    """Gap-based session windows per user (session_window): a session is a
    maximal run of events with inter-event gaps < ``gap``; end = last event
    + gap (Spark's session_window contract, mirrored by the oracle's
    gaps-and-islands SQL). The native operator replaces the O(n^2) self-join
    a naive sessionizer would do; state is per (user, open-session) in
    streaming use."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_hourly_rollup(
    spark, input_dir: str, checkpoint_dir: str, query_name: str,
    watermark: str = "2 hours",
):
    """Streaming face of :func:`hourly_rollup`: file-source stream with a
    watermark on ts, same windowed agg, complete-mode memory sink so an
    availableNow run emits every window for the batch-equality check.
    NOTE: complete mode retains all window state — it is the ORACLE
    harness shape, not the production one. A continuous deployment uses
    outputMode("append") to a real sink, where the watermark finalizes and
    evicts windows (exactly the shape streaming/ingest.stream_record_counts
    runs and tests/test_streaming_multimodal.py's late-data test proves).
    Returns the started query; caller awaits and reads
    ``spark.table(query_name)``."""
    from ..schema import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").start.alias("ws"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("double")
            .alias("sum_value"),
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_interval_join(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    out_path: str,
    window_sec: int,
    watermark_sec: int,
    max_files: int = 8,
):
    """Streaming face of :func:`interval_join` — a WATERMARKED STREAM-STREAM
    inner join (the canonical Structured Streaming two-stream pattern):
    error incidents joined to same-user purchases inside the half-open
    ``window_sec`` window after each incident, both sides read from the same
    event stream. Watermarks on BOTH event-time columns plus the time-range
    join condition let Spark bound the join state: a buffered incident can
    be evicted once the purchase-side watermark passes
    ``incident_ts + window_sec``, and vice versa — state is proportional to
    the in-flight window, never the stream history.

    Inner-join results are emitted as matches are found (append mode needs
    no watermark-close wait for inner joins), so one availableNow pass over
    a replay yields the complete join iff no row is dropped as late — the
    caller must size ``watermark_sec`` above the replay's event-time
    disorder (for hash-partitioned historical files that is the full ts
    span — the round-4 sessionize lesson, applied at design time).

    Returns the started query; caller awaits it and reads ``out_path``."""
    from ..schema import EVENTS_SCHEMA

    def src():
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files)
            .parquet(input_dir)
        )

    wm = f"{watermark_sec} seconds"
    inc = (
        src()
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("incident_ts"),
            F.col("user_id").alias("i_user"),
        )
        .withWatermark("incident_ts", wm)
    )
    pur = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "ts", "user_id")
        .withWatermark("ts", wm)
    )
    joined = inc.join(
        pur,
        F.expr(
            "user_id = i_user AND ts >= incident_ts "
            f"AND ts < incident_ts + INTERVAL {int(window_sec)} SECOND"
        ),
        "inner",
    ).select(
        "incident_id",
        "incident_ts",
        "user_id",
        "event_id",
        "ts",
        F.expr("timestampdiff(MICROSECOND, incident_ts, ts)").alias("delta_us"),
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    bucket_seconds: int,
) -> DataFrame:
    """Point-in-interval join, scale-safe: each ``points`` row (event_id, ts,
    user_id) paired with every ``intervals`` row (interval_id, user_id,
    start_ts, end_ts) of the SAME user whose half-open window
    ``[start_ts, end_ts)`` contains ``ts``.

    The naive formulation is a theta join (``ON user_id = user_id AND ts
    BETWEEN ...``), which Spark plans as a per-user nested loop — O(n*m) per
    user and a broadcast-nested-loop disaster at scale. This operator makes
    it an EQUI-join by time-bucketing: intervals are exploded to every
    ``bucket_seconds`` epoch bucket they overlap, points compute their single
    bucket, the join runs on (user_id, bucket) through the normal hash-join
    machinery (shuffle partitioned, AQE-skew-eligible), and the exact range
    predicate filters afterwards. With ``bucket_seconds`` >= the maximum
    interval length each interval lands in at most 2 buckets, so the
    replication factor is bounded by 2 — and each (interval, point) pair can
    meet at most once because a point has exactly one bucket. This is the
    standard range-join decomposition (Spark has no native range-join
    optimizer; Databricks' range-join hint does the same binning internally).
    """
    us = bucket_seconds * 1_000_000

    def _bkt(col: str):
        # unix_micros requires TIMESTAMP; the events parquet lands as
        # TIMESTAMP_NTZ. The cast maps every column through the SAME
        # ntz->instant function, and the join only needs bucket ids to be
        # consistent and monotone across the two sides, not zone-correct.
        return F.floor(F.unix_micros(F.col(col).cast("timestamp")) / us).cast("long")

    iv = intervals.withColumn("bkt", F.explode(F.sequence(_bkt("start_ts"), _bkt("end_ts"))))
    pts = points.withColumn("bkt", _bkt("ts"))
    return (
        pts.join(iv, ["user_id", "bkt"])
        .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
        .drop("bkt")
    )


def asof_join(events: DataFrame, left_type: str, right_type: str) -> DataFrame:
    """Per-user as-of join: each ``left_type`` event matched to the same
    user's most recent ``right_type`` event at-or-before it (NULLs when
    none precede it) — the time-series enrichment join (attribution,
    feature lookup) that Spark has no native operator for and a naive
    range self-join does in O(n^2) per user.

    Composition shape: union-tag both event sets, ONE shuffle by user_id,
    and a running ``last(..., ignorenulls)`` carry-forward over the
    ts-ordered window — O(n log n) per user, no join at all. At equal ts
    the right row orders first (is_left ascending), matching the <=
    contract; lag is exact integer microseconds (unix_micros) so the
    DuckDB oracle — which recomputes this with its NATIVE ASOF JOIN, an
    independent implementation — hash-matches without float truncation
    games."""
    e = events.filter(F.col("event_type").isin([left_type, right_type])).select(
        "event_id", "ts", "user_id", (F.col("event_type") == left_type).alias("is_left")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_left").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    right_id = F.when(~F.col("is_left"), F.col("event_id"))
    right_ts = F.when(~F.col("is_left"), F.col("ts"))
    return (
        e.withColumn("matched_event_id", F.last(right_id, ignorenulls=True).over(w))
        .withColumn("matched_ts", F.last(right_ts, ignorenulls=True).over(w))
        .filter(F.col("is_left"))
        .select(
            "event_id", "ts", "user_id", "matched_event_id", "matched_ts",
            # timestampdiff is timezone-free (ts is TIMESTAMP_NTZ here) and
            # exact in integer microseconds — per-side float truncation
            # would disagree with the oracle by ±1 on fractional seconds
            F.expr("timestampdiff(MICROSECOND, matched_ts, ts)").alias("lag_us"),
        )
    )


def zscore_outliers(events: DataFrame, threshold: float = 2.5) -> DataFrame:
    """Per-event-type z-score outlier flagging — the telemetry anomaly-scan
    idiom (reference analogue: the validators' out-of-range checks,
    src/csv_to_rdf.py validators, generalized to distributional bounds).

    Mean and variance are derived from EXACT decimal sums (sum v, sum v^2)
    rather than Spark's stddev_pop — float accumulation order differs
    between a shuffled agg and any serial oracle fold and would flap the
    hash; decimal addition is order-free, and the downstream double
    arithmetic (divide, sqrt) is IEEE-deterministic on identical inputs.
    The tiny per-type stats frame broadcasts back onto the stream: one
    map-side-combinable shuffle of the events, no window over full
    partitions, scale-safe at any row count."""
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t"),
        F.sum(F.col("value").cast("decimal(28,3)")).cast("double").alias("s1"),
        F.sum(
            (F.col("value").cast("decimal(18,3)") * F.col("value").cast("decimal(18,3)"))
            .cast("decimal(38,6)")
        )
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("n_t")
    var = F.col("s2") / F.col("n_t") - mean * mean
    z = (F.col("value") - F.col("mean_v")) / F.col("std_v")
    return (
        events.join(
            F.broadcast(
                stats.select(
                    "event_type",
                    mean.alias("mean_v"),
                    F.sqrt(var).alias("std_v"),
                )
                # a zero-variance type can have no outliers; dropping it here
                # (instead of dividing) keeps ANSI mode from raising
                # DIVIDE_BY_ZERO and the oracle from emitting z = inf rows
                .filter(F.col("std_v") > 0)
            ),
            "event_type",
        )
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).alias("z"),
        )
        .filter(F.abs(F.col("z")) >= threshold)
    )


def stream_hopping_rollup(
    spark, input_dir: str, checkpoint_dir: str, query_name: str,
    watermark: str = "2 hours",
):
    """Streaming face of :func:`hopping_rollup`: the overlapping-window
    (1h/30min slide) stateful agg under a watermark — each event updates TWO
    window states, so this exercises the multi-assignment state path the
    tumbling rollup never touches. Complete-mode memory sink for the
    batch-equality oracle check (same caveat as stream_hourly_rollup: a
    production deployment appends with watermark eviction)."""
    from ..schema import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").start.alias("ws"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ohlc_downsample(events: DataFrame, bucket: str = "1 hour") -> DataFrame:
    """OHLC downsample — the hypertable/candlestick compaction (TimescaleDB's
    ``ohlc``/continuous-aggregate shape): per (bucket, event_type) the FIRST
    and LAST value by event time plus min/max, in ONE map-side-combinable
    aggregation. open/close use ``min_by``/``max_by`` so there is no window
    pass and no second shuffle — the partial aggregates carry one candidate
    row each and combine associatively, which is what lets the same plan
    downsample a 100 TB hypertable into O(buckets × types) rows with a
    single Exchange.

    Determinism: event time alone is not a total order (duplicate ``ts``
    within a group would make min_by/max_by engine-dependent), so the
    ordering key is the zero-padded ``(epoch_micros, event_id)`` string —
    lexicographic order == numeric order for non-negative zero-padded
    values, and both engines (Spark min_by/max_by, DuckDB arg_min/arg_max)
    accept a VARCHAR ordering key. ``ts`` arrives as TIMESTAMP_NTZ; the
    cast to TIMESTAMP is exact under the engine's pinned UTC session zone
    (session.py) — and the key is only ever ORDERED on, so any constant
    offset would cancel anyway. value arrives as IEEE double and is only
    selected (open/close) or compared (high/low), never accumulated, so no
    decimal detour is needed."""
    ord_key = F.format_string(
        "%019d%019d", F.unix_micros(F.col("ts").cast("timestamp")), F.col("event_id")
    )
    return events.groupBy(
        F.window("ts", bucket).start.alias("ws"), "event_type"
    ).agg(
        F.min_by("value", ord_key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ord_key).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


def time_weighted_average(events: DataFrame, bucket: str = "1 hour") -> DataFrame:
    """Per (bucket, event_type) time-weighted average — TimescaleDB's
    ``time_weight('LOCF')`` over each bucket: every observation holds until
    the next one IN THE SAME BUCKET, so
    ``twa = Σ value_i · (t_{i+1} − t_i) / Σ (t_{i+1} − t_i)`` with the
    bucket's last observation contributing no segment (single-observation
    buckets surface ``twa = NULL`` — no elapsed time to weight over, made
    explicit with a CASE because bare x/0 diverges across engines:
    Spark NULL, DuckDB ±inf).

    ONE shuffle: the ``lead`` window partitions by (ws, event_type) and the
    groupBy reuses that partitioning, so Spark plans a single Exchange
    (asserted in tests/test_plan_shape.py). Determinism: segment weights are
    exact integer microseconds; ``value`` goes through DECIMAL(18,3) so each
    product is exact and the sum order-free (the hourly_rollup discipline);
    the final division is one IEEE double op on two exactly-converted
    operands, rounded to 6 dp (the tfidf/zscore contract)."""
    w = Window.partitionBy("ws", "event_type").orderBy("ts", "event_id")
    seg = (
        events.withColumn("ws", F.window("ts", bucket).start)
        .withColumn("t_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn("dt_us", F.lead("t_us").over(w) - F.col("t_us"))
    )
    v = F.col("value").cast("decimal(18,3)")
    total_dt = F.sum("dt_us")
    weighted = F.sum(v * F.col("dt_us").cast("decimal(20,0)"))
    return seg.groupBy("ws", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        total_dt.alias("dur_us"),
        F.when(
            total_dt > 0,
            F.round(weighted.cast("double") / total_dt.cast("double"), 6),
        ).alias("twa"),
    )
