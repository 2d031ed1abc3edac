"""upsert_triples semantics (operators/triples.py) — the incremental graph
maintenance merge behind kg_graph_upsert. The oracle leg checks values at
sf0.01; these pin the merge rules on a hand-built graph: functional
replacement is per-(subj, pred), non-functional predicates accumulate with
set dedup, and untouched subjects pass through byte-identical."""

from pyspark.sql import functions as F

COLS = "subj string, pred string, obj string, obj_type string, datatype string"


def _g(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, "literal", None) for (s, p, o) in rows], COLS
    )


def test_functional_pred_replaced_only_for_delta_subjects(spark):
    from casualty_linking_spark.operators.triples import upsert_triples

    base = _g(spark, [("a", "rank", "old"), ("b", "rank", "keep"), ("a", "note", "x")])
    delta = _g(spark, [("a", "rank", "new")])
    out = upsert_triples(base, delta, functional_preds=("rank",))
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert got == {("a", "rank", "new"), ("b", "rank", "keep"), ("a", "note", "x")}


def test_multivalued_base_rows_all_replaced(spark):
    """A functional overwrite clears EVERY base row for (subj, pred), even
    a dirty multi-valued one — the correction defines the full new state."""
    from casualty_linking_spark.operators.triples import upsert_triples

    base = _g(spark, [("a", "rank", "v1"), ("a", "rank", "v2")])
    delta = _g(spark, [("a", "rank", "v3")])
    out = upsert_triples(base, delta, functional_preds=("rank",))
    assert [(r.subj, r.obj) for r in out.collect()] == [("a", "v3")]


def test_nonfunctional_accumulates_with_set_dedup(spark):
    from casualty_linking_spark.operators.triples import upsert_triples

    base = _g(spark, [("a", "tag", "x")])
    delta = _g(spark, [("a", "tag", "x"), ("a", "tag", "y")])
    out = upsert_triples(base, delta)
    got = sorted((r.subj, r.pred, r.obj) for r in out.collect())
    assert got == [("a", "tag", "x"), ("a", "tag", "y")]


def test_empty_delta_is_identity(spark):
    from casualty_linking_spark.operators.triples import upsert_triples

    base = _g(spark, [("a", "rank", "v"), ("b", "note", "n")])
    empty = base.limit(0)
    out = upsert_triples(base, empty, functional_preds=("rank",))
    assert out.count() == 2


def test_delta_keys_broadcast_in_plan(spark):
    """The overwrite anti-join must broadcast the delta key set — the store
    side never shuffles for a small correction batch."""
    from casualty_linking_spark.operators.triples import upsert_triples

    base = _g(spark, [(f"s{i}", "rank", "v") for i in range(50)])
    delta = _g(spark, [("s1", "rank", "w")])
    out = upsert_triples(base, delta, functional_preds=("rank",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_validity_intervals_scd2(spark):
    """Three versions of one key -> chained [from, to) windows with exactly
    one current row; single-version keys are current from their only batch;
    interleaved other-predicate rows don't cross-contaminate the window."""
    from casualty_linking_spark.operators.triples import validity_intervals

    v = spark.createDataFrame(
        [
            ("s1", "p", "v0", 0),
            ("s1", "p", "v1", 3),
            ("s1", "p", "v2", 7),
            ("s1", "q", "qv", 1),
            ("s2", "p", "w0", 0),
        ],
        "subj string, pred string, obj string, batch_seq long",
    )
    rows = {(r.subj, r.pred, r.obj): r for r in validity_intervals(v).collect()}
    assert len(rows) == 5
    assert (rows[("s1", "p", "v0")].valid_from, rows[("s1", "p", "v0")].valid_to) == (0, 3)
    assert (rows[("s1", "p", "v1")].valid_from, rows[("s1", "p", "v1")].valid_to) == (3, 7)
    cur = rows[("s1", "p", "v2")]
    assert (cur.valid_from, cur.valid_to, cur.is_current) == (7, None, True)
    assert sum(1 for r in rows.values() if r.subj == "s1" and r.pred == "p" and r.is_current) == 1
    assert rows[("s1", "q", "qv")].is_current and rows[("s2", "p", "w0")].is_current
