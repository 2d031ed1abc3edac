"""Semantics of conversation_profile (operators/text_analysis.py) — the
per-conversation shape profile behind the transcripts_profile contract
query. The oracle leg checks values at sf0.01; these pin the boundary
behaviors the synthetic corpus doesn't isolate: turn_idx-ordered (not
arrival-ordered) role alternation, NULL text/tool handling, and the
single-shuffle plan posture."""

import datetime as dt

from pyspark.sql import functions as F


def _tx(spark, rows):
    """rows: (conv_id, turn_idx, role, text, tool)."""
    ts = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(c, i, r, t, tool, ts) for (c, i, r, t, tool) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_alternation_counted_in_turn_idx_order(spark):
    """Rows arrive turn_idx-shuffled; transitions must still be counted in
    logical turn order (u,a,u,a = 3 transitions), never arrival order."""
    from casualty_linking_spark.operators.text_analysis import conversation_profile

    rows = [
        ("c1", 2, "user", "q2", None),
        ("c1", 0, "user", "q1", None),
        ("c1", 3, "assistant", "a2", None),
        ("c1", 1, "assistant", "a1", None),
    ]
    r = conversation_profile(_tx(spark, rows).repartition(4)).collect()[0]
    assert r.n_role_transitions == 3
    assert r.n_turns == 4 and r.n_user == 2 and r.n_assistant == 2


def test_same_role_run_is_zero_transitions(spark):
    from casualty_linking_spark.operators.text_analysis import conversation_profile

    rows = [("c1", i, "assistant", "t", None) for i in range(5)]
    r = conversation_profile(_tx(spark, rows)).collect()[0]
    assert r.n_role_transitions == 0 and r.n_assistant == 5 and r.n_user == 0


def test_single_turn_conversation(spark):
    from casualty_linking_spark.operators.text_analysis import conversation_profile

    r = conversation_profile(_tx(spark, [("c1", 0, "user", "hi there", None)])).collect()[0]
    assert r.n_turns == 1 and r.n_role_transitions == 0
    assert r.total_chars == 8 and r.total_tokens == 2


def test_null_text_and_tool_counting(spark):
    """NULL text contributes 0 chars/tokens (not NULL-propagating the sums);
    tool calls count non-null tool values, distinct over names."""
    from casualty_linking_spark.operators.text_analysis import conversation_profile

    rows = [
        ("c1", 0, "user", None, None),
        ("c1", 1, "assistant", "run it", "bash"),
        ("c1", 2, "tool", "ok", "bash"),
        ("c1", 3, "assistant", "done", "grep"),
    ]
    r = conversation_profile(_tx(spark, rows)).collect()[0]
    assert r.n_tool_calls == 3 and r.n_distinct_tools == 2
    assert r.total_chars == 6 + 2 + 4 and r.total_tokens == 2 + 1 + 1
    assert abs(r.mean_turn_chars - 12 / 4) < 1e-9


def test_profile_is_single_shuffle(spark):
    """One groupBy(conv_id) exchange, nothing else — the 100 TB posture."""
    from casualty_linking_spark.operators.text_analysis import conversation_profile

    rows = [("c%d" % (i % 3), i // 3, "user", "t", None) for i in range(12)]
    plan = (
        conversation_profile(_tx(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1


def test_response_latency_tool_turns_and_unanswered(spark):
    """Latency is to the NEXT assistant turn (tool turns counted as
    intervening, non-uniform gaps respected); a trailing user turn with no
    assistant after it surfaces with NULL answer columns."""
    import datetime as dt

    from casualty_linking_spark.operators.text_analysis import response_latency

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def s(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        ("c1", 0, "user", "q1", None, s(0)),
        ("c1", 1, "tool", "t", "search", s(5)),
        ("c1", 2, "tool", "t", "search", s(9)),
        ("c1", 3, "assistant", "a1", None, s(30)),
        ("c1", 4, "user", "q2", None, s(40)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    out = {r.turn_idx: (r.ans_turn_idx, r.n_intervening, r.latency_sec)
           for r in response_latency(df).collect()}
    assert out[0] == (3, 2, 30)
    assert out[4] == (None, None, None)
    assert set(out) == {0, 4}


def test_tool_call_sequences_orders_by_turn_idx(spark):
    """The chain is ordered by turn_idx regardless of row arrival order;
    turns without a tool don't appear; conversations with identical chains
    aggregate."""
    from casualty_linking_spark.operators.text_analysis import tool_call_sequences

    ts = __import__("datetime").datetime(2024, 1, 1)
    rows = [
        # conv A: tools at turns 3, 1 (inserted out of order), plus a no-tool turn
        ("A", 3, "assistant", "t", "search", ts),
        ("A", 1, "assistant", "t", "browse", ts),
        ("A", 2, "user", "t", None, ts),
        # conv B: same chain as A, already ordered
        ("B", 1, "assistant", "t", "browse", ts),
        ("B", 2, "assistant", "t", "search", ts),
        # conv C: tool-less — contributes no sequence at all
        ("C", 1, "user", "t", None, ts),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {r.tool_seq: r.n_convs for r in tool_call_sequences(df).collect()}
    assert out == {"browse>search": 2}
