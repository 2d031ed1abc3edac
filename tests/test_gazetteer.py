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


def test_corpus_side_never_shuffles_before_match(spark):
    """The candidate join must broadcast the dictionary: no Exchange between
    the text scan and the match join (corpus shuffles would be 100 TB)."""
    labels = _labels(spark, [("u:jr8", "JR 8")])
    texts = _texts(spark, [(1, "JR 8")])
    matched = gazetteer_mentions(texts, labels, ["doc"])
    plan = matched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
