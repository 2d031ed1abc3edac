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
