"""Gazetteer mention-detection semantics (operators/gazetteer.py)."""

from pyspark.sql import functions as F

import pytest

from casualty_linking_spark.operators.gazetteer import gazetteer_mentions


def _labels(spark, rows):
    return spark.createDataFrame(rows, "uri string, label string")


def _texts(spark, rows):
    return spark.createDataFrame(rows, "doc long, text string")


def test_basic_match_positions_and_normalization(spark):
    labels = _labels(spark, [("u:jr8", "JR 8"), ("u:ratsur", "RatsuR")])
    texts = _texts(spark, [(1, "unit was JR 8 then; ratsur followed."), (2, "no match here")])
    out = {(r.doc, r.start_tok): r for r in
           gazetteer_mentions(texts, labels, ["doc"]).collect()}
    # tokens of doc 1: [unit, was, jr, 8, then, ratsur, followed]
    assert set(out) == {(1, 3), (1, 6)}
    m = out[(1, 3)]
    assert (m.n_words, m.mention, m.uri) == (2, "jr 8", "u:jr8")
    assert out[(1, 6)].uri == "u:ratsur"


def test_longest_match_suppresses_overlapped_shorter(spark):
    labels = _labels(spark, [("u:jr8", "JR 8"), ("u:jr8_2k", "2./JR 8")])
    texts = _texts(spark, [(1, "JOSNIMI=2./JR 8")])
    rows = gazetteer_mentions(texts, labels, ["doc"]).collect()
    # tokens: [josnimi, 2, jr, 8] -> "2 jr 8" (start 2, n 3) dominates "jr 8"
    assert len(rows) == 1
    assert (rows[0].start_tok, rows[0].n_words, rows[0].uri) == (2, 3, "u:jr8_2k")


def test_equal_length_overlap_earlier_start_wins(spark):
    labels = _labels(spark, [("u:ab", "alpha beta"), ("u:bg", "beta gamma")])
    texts = _texts(spark, [(1, "alpha beta gamma")])
    rows = gazetteer_mentions(texts, labels, ["doc"]).collect()
    assert len(rows) == 1
    assert (rows[0].start_tok, rows[0].uri) == (1, "u:ab")


def test_ambiguous_same_span_keeps_all_candidate_uris(spark):
    labels = _labels(spark, [("u:a", "JP 6"), ("u:b", "jp 6")])
    texts = _texts(spark, [(1, "JP 6 marched")])
    rows = gazetteer_mentions(texts, labels, ["doc"]).collect()
    assert sorted(r.uri for r in rows) == ["u:a", "u:b"]
    assert {(r.start_tok, r.n_words) for r in rows} == {(1, 2)}


def test_text_shorter_than_label_emits_no_partial_window(spark):
    labels = _labels(spark, [("u:long", "one two three four")])
    texts = _texts(spark, [(1, "one two three"), (2, None), (3, "")])
    assert gazetteer_mentions(texts, labels, ["doc"]).count() == 0


def test_adjacent_non_overlapping_matches_both_kept(spark):
    labels = _labels(spark, [("u:jr8", "JR 8"), ("u:jr1", "JR 1")])
    texts = _texts(spark, [(1, "JR 8 JR 1")])
    rows = gazetteer_mentions(texts, labels, ["doc"]).collect()
    assert {(r.start_tok, r.uri) for r in rows} == {(1, "u:jr8"), (3, "u:jr1")}


def test_empty_dictionary_rejected(spark):
    labels = _labels(spark, [("u:x", "?!  .")])  # normalizes to nothing
    texts = _texts(spark, [(1, "text")])
    with pytest.raises(ValueError):
        gazetteer_mentions(texts, labels, ["doc"])


def test_entity_cooccurrence_counts_and_canonical_direction(spark):
    from casualty_linking_spark.operators.gazetteer import entity_cooccurrence

    m = spark.createDataFrame(
        [
            (1, 0, "u:b"), (1, 1, "u:a"), (1, 1, "u:c"), (1, 2, "u:a"),  # dup mention
            (2, 0, "u:a"), (2, 3, "u:b"),
            (3, 0, "u:only"),  # single-entity unit -> no pair
        ],
        "conv long, turn int, uri string",
    )
    out = {(r.uri_a, r.uri_b): r.n_units
           for r in entity_cooccurrence(m, ["conv"]).collect()}
    assert out == {("u:a", "u:b"): 2, ("u:a", "u:c"): 1, ("u:b", "u:c"): 1}


def test_stateless_form_matches_join_form_exactly(spark):
    """The per-row (streaming-safe) formulation and the broadcast-join
    formulation are the same operator: identical rows on a corpus that
    exercises overlap suppression, same-span ambiguity, NULL/short texts,
    and multi-id text units."""
    from casualty_linking_spark.operators.gazetteer import (
        gazetteer_label_index,
        gazetteer_mentions_stateless,
    )

    labels = _labels(spark, [
        ("u:jr8", "JR 8"), ("u:jr8_2k", "2./JR 8"), ("u:ratsur", "RatsuR"),
        ("u:amb_a", "JP 6"), ("u:amb_b", "jp 6"),
        ("u:ab", "alpha beta"), ("u:bg", "beta gamma"),
    ])
    texts = spark.createDataFrame(
        [
            (1, 0, "JOSNIMI=2./JR 8 and ratsur"),
            (1, 1, "JP 6 with alpha beta gamma"),
            (2, 0, None),
            (2, 1, ""),
            (2, 2, "jr"),
            (3, 0, "JR 8 JR 8"),
        ],
        "conv long, turn int, text string",
    )
    ids = ["conv", "turn"]
    a = sorted(map(tuple, gazetteer_mentions(texts, labels, ids).collect()))
    idx = gazetteer_label_index(labels)
    b = sorted(map(tuple, gazetteer_mentions_stateless(texts, idx, ids).collect()))
    assert a == b and len(a) >= 6


def test_corpus_side_never_shuffles_before_match(spark):
    """The candidate join must broadcast the dictionary: no Exchange between
    the text scan and the match join (corpus shuffles would be 100 TB)."""
    labels = _labels(spark, [("u:jr8", "JR 8")])
    texts = _texts(spark, [(1, "JR 8")])
    matched = gazetteer_mentions(texts, labels, ["doc"])
    plan = matched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
