"""Bucketed SPO/OPS triples store (storage.py): co-located self-joins.

Three claims, each load-bearing for the 100 TB posture:
  1. round-trip — both projections hold exactly the source graph;
  2. plan shape — a subj-subj join of two SPO scans runs with ZERO shuffle
     Exchange (bucketing IS the partitioning), while the identical join over
     the raw in-memory frame shuffles both sides;
  3. semantics — the property-path walk over the store equals the walk over
     the in-memory graph (and the driver's kg_path_bucketed oracle row
     re-proves this against DuckDB at sf0.01).
"""

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from casualty_linking_spark import storage


@pytest.fixture(scope="module", autouse=True)
def _scoped_scan_confs(spark):
    """spo/ops flip two session-global planner confs at call time; scope them
    to this module so the shared pytest Spark session isn't left re-planned
    for every later test file."""
    with storage.scan_conf_scope(spark):
        yield


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(df) -> int:
    # count shuffle exchanges only (BroadcastExchange is not a shuffle)
    return _plan(df).count("Exchange hashpartitioning")


@pytest.fixture(scope="module")
def store(spark):
    from casualty_linking_spark import synth
    from casualty_linking_spark.operators import extract, records as R, triples as T
    from casualty_linking_spark import dims

    rec = R.build_records(
        extract.mentions_to_raw_records(
            extract.extract_mentions(synth.transcripts_range(spark, 200))
        )
    )
    graph = T.records_to_triples(rec, dims.dim_cemeteries(spark))
    name = f"teststore_{uuid.uuid4().hex[:8]}"
    storage.write_triples_store(graph, tempfile.mkdtemp(prefix="store_"), name)
    yield graph, name
    storage.drop_triples_store(spark, name)


def test_round_trip_both_projections(spark, store):
    graph, name = store
    cols = graph.columns
    for scan in (storage.spo(spark, name), storage.ops(spark, name)):
        assert scan.columns == cols
        assert scan.exceptAll(graph).count() == 0
        assert graph.exceptAll(scan).count() == 0


def test_subj_self_join_is_shuffle_free(spark, store):
    graph, name = store
    adaptive = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        s = storage.spo(spark, name)
        a = s.filter(F.col("pred") != "x").select("subj", F.col("obj").alias("o1"))
        b = s.filter(F.col("pred") != "y").select("subj", F.col("obj").alias("o2"))
        bucketed = a.join(b.hint("merge"), "subj")
        assert _exchanges(bucketed) == 0, _plan(bucketed)
        assert "SortMergeJoin" in _plan(bucketed)
        # one file per bucket (compacted write) -> the bucketed scan reports
        # its sortBy order and the merge join needs no Sort either
        assert "Sort " not in _plan(bucketed), _plan(bucketed)

        ra = graph.filter(F.col("pred") != "x").select("subj", F.col("obj").alias("o1"))
        rb = graph.filter(F.col("pred") != "y").select("subj", F.col("obj").alias("o2"))
        raw = ra.join(rb.hint("merge"), "subj")
        assert _exchanges(raw) >= 2, _plan(raw)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", adaptive)


def test_obj_join_over_ops_is_shuffle_free(spark, store):
    graph, name = store
    adaptive = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        o = storage.ops(spark, name)
        a = o.filter(F.col("pred") != "x").select(F.col("obj").alias("k"), "subj")
        b = o.filter(F.col("pred") != "y").select(
            F.col("obj").alias("k"), F.col("subj").alias("s2")
        )
        joined = a.join(b.hint("merge"), "k")
        assert _exchanges(joined) == 0, _plan(joined)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", adaptive)


def test_path_over_store_matches_in_memory(spark):
    from casualty_linking_spark import queries

    sf = "/root/testdata/sf0.001"
    mem = queries.q_property_path_units(spark, sf)
    stored = queries.q_property_path_bucketed(spark, sf)
    assert stored.exceptAll(mem).count() == 0
    assert mem.exceptAll(stored).count() == 0


def test_store_query_restores_session_confs(spark):
    """kg_path_bucketed must leave no trace: the two bucketed-scan planner
    confs restored, its catalog tables dropped (regression for the round-4
    leak where every later query in a bench session ran with
    autoBucketedScan disabled)."""
    from casualty_linking_spark import queries

    keys = [
        "spark.sql.legacy.bucketedTableScan.outputOrdering",
        "spark.sql.sources.bucketing.autoBucketedScan.enabled",
    ]
    before = {k: spark.conf.get(k, None) for k in keys}
    tables_before = {t.name for t in spark.catalog.listTables()}
    out = queries.q_property_path_bucketed(spark, "/root/testdata/sf0.001")
    assert out.count() > 0  # result survives the store drop (checkpointed)
    assert {k: spark.conf.get(k, None) for k in keys} == before
    leaked = {
        t.name for t in spark.catalog.listTables()
    } - tables_before
    assert not {t for t in leaked if t.startswith("kgstore_")}, leaked


def test_point_lookup_prunes_buckets(spark, store):
    """The SPARQL point-lookup idioms (graph[:pred:obj] / graph.value) over
    the store read ONE bucket of n, not the table: equality on the bucket
    column prunes at plan time (SelectedBucketsCount in the scan)."""
    import re

    graph, name = store
    some_subj = graph.select("subj").first()["subj"]
    q = storage.spo(spark, name).filter(F.col("subj") == some_subj)
    plan = _plan(q)
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) == 1 and int(m.group(2)) == storage.DEFAULT_BUCKETS
    assert q.count() >= 1
