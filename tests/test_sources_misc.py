"""TTL export, unique-value audit, remaining converter surface."""

from pyspark.sql import Row, functions as F

from casualty_linking_spark.functions.dates import strip_dash, validate_mother_tongue
from casualty_linking_spark.operators.triples import unique_value_violations
from casualty_linking_spark.sources.ttl import triples_to_ntriples

TRIPLE = "subj string, pred string, obj string, obj_type string, lang string, datatype string, graph_kind string"


def test_ntriples_rendering(spark):
    g = spark.createDataFrame(
        [
            Row(subj="http://x/s", pred="http://x/p", obj="http://x/o",
                obj_type="uri", lang=None, datatype=None, graph_kind="t"),
            Row(subj="http://x/s", pred="http://x/p2", obj='va"lue',
                obj_type="literal", lang="fi", datatype=None, graph_kind="t"),
            Row(subj="http://x/s", pred="http://x/p3", obj="1941-12-23",
                obj_type="literal", lang=None,
                datatype="http://www.w3.org/2001/XMLSchema#date", graph_kind="t"),
        ],
        TRIPLE,
    )
    lines = {r.line for r in triples_to_ntriples(g).collect()}
    assert "<http://x/s> <http://x/p> <http://x/o> ." in lines
    assert '<http://x/s> <http://x/p2> "va\\"lue"@fi .' in lines
    assert (
        '<http://x/s> <http://x/p3> "1941-12-23"^^<http://www.w3.org/2001/XMLSchema#date> .'
        in lines
    )


def test_unique_value_violations(spark):
    g = spark.createDataFrame(
        [
            Row(subj="s1", pred="p", obj="a", obj_type="uri", lang=None, datatype=None, graph_kind="t"),
            Row(subj="s1", pred="p", obj="b", obj_type="uri", lang=None, datatype=None, graph_kind="t"),
            Row(subj="s2", pred="p", obj="a", obj_type="uri", lang=None, datatype=None, graph_kind="t"),
        ],
        TRIPLE,
    )
    v = unique_value_violations(g, "p").collect()
    assert len(v) == 1 and v[0].subj == "s1" and v[0]["values"] == ["a", "b"]


def test_strip_dash_and_mother_tongue(spark):
    df = spark.createDataFrame([("-",), ("x",), (" - ",)], "v string")
    out = [r.s for r in df.select(strip_dash(F.col("v")).alias("s")).collect()]
    assert out == ["", "x", ""]

    df2 = spark.createDataFrame([("su", "su"), ("su", "X"), ("su", ""), ("su", None)],
                                "resolved string, original string")
    errs = [r.e for r in df2.select(validate_mother_tongue(F.col("resolved"), F.col("original")).alias("e")).collect()]
    assert errs == ["Epäselvä arvo", None, None, None]


def test_ntriples_roundtrip(spark, tmp_path):
    """write_ttl -> read_ntriples is the identity on (subj,pred,obj,obj_type,
    lang,datatype) — including escape-sensitive literals."""
    from casualty_linking_spark.sources.ttl import read_ntriples, write_ttl

    g = spark.createDataFrame(
        [
            Row(subj="http://x/s", pred="http://x/p", obj="http://x/o",
                obj_type="uri", lang=None, datatype=None, graph_kind="t"),
            Row(subj="http://x/s", pred="http://x/p2", obj='va"lue\nline2',
                obj_type="literal", lang="fi", datatype=None, graph_kind="t"),
            Row(subj="http://x/s", pred="http://x/p3", obj="1941-12-23",
                obj_type="literal", lang=None,
                datatype="http://www.w3.org/2001/XMLSchema#date", graph_kind="t"),
        ],
        TRIPLE,
    )
    path = str(tmp_path / "g_nt")
    write_ttl(g, path)
    back = read_ntriples(spark, path)
    want = {tuple(r) for r in g.select("subj", "pred", "obj", "obj_type", "lang", "datatype").collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want


def test_turtle_blocks_reads_reference_shaped_municipalities(spark):
    """S5: the checked-in fixture mirrors input/old_municipalities.ttl's
    block layout (+ the link predicates the reference's link_municipalities
    adds, src/linker.py:94-111); parsing it and pivoting must reproduce
    dim_municipalities row-for-row."""
    from casualty_linking_spark import dims
    from casualty_linking_spark.sources.ttl import read_turtle_blocks

    t = read_turtle_blocks(spark, "tests/fixtures/linked_municipalities.ttl")
    got = {tuple(r) for r in dims.dim_municipalities_from_triples(t).collect()}
    want = {tuple(r) for r in dims.dim_municipalities(spark).collect()}
    assert got == want
    # language tags survive parsing
    labels = t.filter(F.col("pred").endswith("prefLabel"))
    assert labels.filter(F.col("lang") == "fi").count() == labels.count()


def test_turtle_blocks_prefixes_and_comma_lists(spark, tmp_path):
    """schema_base.ttl shape: @prefix expansion, 'a' shorthand, ',' object
    lists, ';' predicate lists."""
    from casualty_linking_spark.sources.ttl import RDF_TYPE, read_turtle_blocks

    ttl = """@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix wsch: <http://ldf.fi/schema/warsa/> .

wsch:Gender
    a skos:Concept ;
    skos:prefLabel "Gender"@en, "Sukupuoli"@fi .
"""
    p = tmp_path / "schema.ttl"
    p.write_text(ttl)
    rows = {(r.subj, r.pred, r.obj, r.obj_type, r.lang) for r in read_turtle_blocks(spark, str(p)).collect()}
    S = "http://ldf.fi/schema/warsa/Gender"
    assert (S, RDF_TYPE, "http://www.w3.org/2004/02/skos/core#Concept", "uri", None) in rows
    assert (S, "http://www.w3.org/2004/02/skos/core#prefLabel", "Gender", "literal", "en") in rows
    assert (S, "http://www.w3.org/2004/02/skos/core#prefLabel", "Sukupuoli", "literal", "fi") in rows
    assert len(rows) == 3
