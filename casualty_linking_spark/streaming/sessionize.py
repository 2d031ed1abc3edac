"""Custom stateful streaming operator: conversation sessionization with
``applyInPandasWithState``.

The built-in watermarked aggregations (``streaming.ingest``) cover counts;
this operator covers the case they can't express: a conversation is "open"
while its turns keep arriving and must be emitted EXACTLY ONCE as one
closed session row — after a quiet period (no new turns for ``gap_ms``) —
carrying whole-conversation features (turn span, role mix, a text
fingerprint of the ordered turns). That per-key emit-on-timeout contract
is the Structured Streaming custom-state API's job: state is one tiny
accumulator per open conversation, evicted on event-time timeout, so
memory is bounded by the number of OPEN conversations, never by history
(the 10^12-turn posture).

Arrow-batched per the engine's UDF rule (SURVEY §2.10): the state
function receives pandas DataFrames per conversation, never Python rows.
The reference is a pure batch pipeline — this module is engine-only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("min_turn_idx", T.IntegerType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("n_user_turns", T.LongType()),
        T.StructField("text_fingerprint", T.StringType()),
    ]
)

# state: running counts + per-turn text hashes (idx-keyed so out-of-order
# arrival folds deterministically)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("min_turn_idx", T.IntegerType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("n_user_turns", T.LongType()),
        T.StructField("idx_hashes", T.ArrayType(T.StringType())),
        T.StructField("max_ts_ms", T.LongType()),
    ]
)


def _make_fold(gap_ms: int):
    """Build the per-conversation state function (a closure, so the gap
    ships to the workers inside the pickled function — module globals set
    on the driver do not)."""

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            n, mn, mx, users, hashes, _ = state.get
            digest = hashlib.md5("|".join(sorted(hashes)).encode()).hexdigest()
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "conv_id": key[0],
                        "n_turns": n,
                        "min_turn_idx": mn,
                        "max_turn_idx": mx,
                        "n_user_turns": users,
                        "text_fingerprint": digest,
                    }
                ]
            )
            return

        n, mn, mx, users, hashes, max_ts = (
            state.get if state.exists else (0, None, None, 0, [], 0)
        )
        hashes = list(hashes)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            users += int((pdf["role"] == "user").sum())
            lo, hi = int(pdf["turn_idx"].min()), int(pdf["turn_idx"].max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
            for idx, text in zip(pdf["turn_idx"], pdf["text"]):
                h = hashlib.md5(("" if text is None else text).encode()).hexdigest()
                hashes.append(f"{int(idx):08d}:{h}")
            max_ts = max(max_ts, int(pdf["ts"].astype("int64").max() // 1_000_000))
        state.update((n, mn, mx, users, hashes, max_ts))
        # close `gap_ms` after the latest turn seen; the timeout timestamp
        # must sit beyond the current watermark (guards very-late arrivals)
        state.setTimeoutTimestamp(
            max(max_ts + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield from ()

    return fold


def sessionize_conversations(
    transcripts_stream: DataFrame, watermark: str = "30 seconds", gap_ms: int = 60_000
) -> DataFrame:
    """Streaming DataFrame of closed-conversation session rows (append
    mode; attach any sink). ``gap_ms`` is the quiet period after a
    conversation's last turn before it closes."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_fold(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def batch_sessions(transcripts: DataFrame) -> DataFrame:
    """Batch oracle for :func:`sessionize_conversations`: the same session
    rows computed relationally over a static table (what the streamed
    output must equal once every conversation has closed)."""
    per_turn = transcripts.select(
        "conv_id",
        "turn_idx",
        F.concat_ws(
            ":",
            F.lpad(F.col("turn_idx").cast("string"), 8, "0"),
            F.md5(F.coalesce(F.col("text"), F.lit(""))),
        ).alias("idx_hash"),
        (F.col("role") == "user").cast("long").alias("is_user"),
    )
    return per_turn.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("turn_idx").alias("min_turn_idx"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.sum("is_user").alias("n_user_turns"),
        F.md5(F.concat_ws("|", F.array_sort(F.collect_list("idx_hash")))).alias(
            "text_fingerprint"
        ),
    )
