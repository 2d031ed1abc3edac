"""dangling_objects semantics (operators/triples.py) — the referential-
integrity audit behind kg_dangling_objects. The oracle leg value-checks the
sf0.01 graph (where the only true danglings are the planted unknown-
municipality codes); these pin the rules on hand-built graphs where every
case appears: subject-defined URIs pass, whitelisted URIs pass, literals are
ignored, and reference counts / example predicates are deterministic."""

COLS = "subj string, pred string, obj string, obj_type string, datatype string"


def _g(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, t, None) for (s, p, o, t) in rows], COLS
    )


def test_subject_defined_and_whitelisted_pass(spark):
    from casualty_linking_spark.operators.triples import dangling_objects

    g = _g(
        spark,
        [
            ("a", "links_to", "b", "uri"),      # b is a subject -> fine
            ("b", "type", "T", "uri"),          # T whitelisted -> fine
            ("a", "ref", "ghost", "uri"),       # dangling
            ("a", "name", "ghost", "literal"),  # literal: same text, ignored
        ],
    )
    wl = spark.createDataFrame([("T",)], "uri string")
    out = dangling_objects(g, wl).collect()
    assert len(out) == 1
    assert out[0].obj == "ghost" and out[0].n_refs == 1


def test_ref_count_and_min_pred(spark):
    from casualty_linking_spark.operators.triples import dangling_objects

    g = _g(
        spark,
        [
            ("a", "z_pred", "ghost", "uri"),
            ("b", "a_pred", "ghost", "uri"),
            ("c", "m_pred", "ghost", "uri"),
        ],
    )
    out = dangling_objects(g).collect()
    assert len(out) == 1
    assert out[0].n_refs == 3 and out[0].example_pred == "a_pred"


def test_no_whitelist_means_only_subjects_defend(spark):
    from casualty_linking_spark.operators.triples import dangling_objects

    g = _g(spark, [("a", "p", "a", "uri")])  # self-reference: defined
    assert dangling_objects(g).count() == 0


def test_clean_graph_is_empty(spark):
    from casualty_linking_spark.operators.triples import dangling_objects

    g = _g(spark, [("a", "p", "b", "uri"), ("b", "p", "x", "literal")])
    wl = spark.createDataFrame([("b",)], "uri string")
    assert dangling_objects(g, wl).count() == 0
