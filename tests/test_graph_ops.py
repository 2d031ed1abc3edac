"""Graph-algebra primitives: union set semantics, pattern removal, direct
URI mappings, documents-links join (J8), CC convergence."""

from pyspark.sql import Row, functions as F

from casualty_linking_spark import namespaces as NS
from casualty_linking_spark.operators.triples import (
    documents_links, fix_by_direct_uri_mappings, remove_pattern, union_graphs,
)
from casualty_linking_spark.operators.link_persons import connected_components

TRIPLE = "subj string, pred string, obj string, obj_type string, lang string, datatype string, graph_kind string"


def _g(spark, rows):
    return spark.createDataFrame(
        [Row(subj=s, pred=p, obj=o, obj_type="uri", lang=None, datatype=None, graph_kind="t")
         for s, p, o in rows],
        TRIPLE,
    )


def test_union_dedups(spark):
    a = _g(spark, [("s1", "p", "o1"), ("s1", "p", "o2")])
    b = _g(spark, [("s1", "p", "o2"), ("s2", "p", "o1")])
    assert union_graphs(a, b).count() == 3


def test_remove_pattern(spark):
    g = _g(spark, [("s1", "p1", "o"), ("s2", "p2", "o"), ("s3", "p1", "x")])
    assert remove_pattern(g, pred="p1").count() == 1
    assert remove_pattern(g, pred="p1", obj="x").count() == 2


def test_fix_uri_mappings(spark):
    g = _g(spark, [("s", "p", "Alipuseeri"), ("s", "p2", NS.CEMETERIES + "x"), ("s", "p3", "keep")])
    objs = {r.obj for r in fix_by_direct_uri_mappings(g).collect()}
    assert objs == {"Aliupseeri", NS.CEMETERIES + "hx_0", "keep"}


def test_documents_links_join(spark):
    P70 = NS.CRM + "P70_documents"
    P70I = NS.CRM + "P70i_is_documented_in"
    dr = NS.warsa("DeathRecord")
    g = _g(spark, [
        ("c1", NS.RDF_TYPE, dr),
        ("c2", NS.RDF_TYPE, dr),
        ("c2", P70, "personX"),  # already linked -> skipped
        ("c3", NS.RDF_TYPE, dr),
    ])
    inv = _g(spark, [("personA", P70I, "c1"), ("personB", P70I, "c3"), ("personC", P70I, "c2")])
    got = {(r.subj, r.obj) for r in documents_links(g, inv).collect()}
    assert got == {("c1", "personA"), ("c3", "personB")}


def test_connected_components_chain(spark):
    # a-b-c chain + isolated pair d-e: two components
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], "src string, dst string"
    )
    comp = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}
