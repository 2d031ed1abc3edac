"""Turtle/N-Triples text export AND ingestion of triples DataFrames (S5/S10
— the reference serializes every stage to TTL (src/csv_to_rdf.py:164-180)
and parses Turtle everywhere it loads a graph (src/process.py:128,
src/linker.py:264-265, src/person_generator.py:264-266); here the canonical
store is the partitioned table and the text formats exist for
parity/interchange with the reference's fixture files).

Emission is pure Column work (concat_ws over escaped terms) — the writer
streams partition-parallel text files; no driver-side serialization.

Ingestion is equally distributed: N-Triples is strictly line-oriented (one
regexp pass per line), and the Turtle *subset* the reference's fixtures use
(``input/old_municipalities.ttl``, ``input/cas_additions.ttl``,
``input/schema_base.ttl``: one subject per block, ``;`` predicate lists,
``,`` object lists, ``@prefix`` headers, no blank nodes / collections /
multi-line literals / '.' ';' ',' inside literals) parses as
statement-blocks split by the record separator — no rdflib at executor
level, every term extracted by JVM regexp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _escape_literal(col: F.Column) -> F.Column:
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return out


def triples_to_ntriples(triples: DataFrame) -> DataFrame:
    """One column 'line' of N-Triples text (a strict subset of Turtle —
    every reference TTL is representable)."""
    subj = F.concat(F.lit("<"), F.col("subj"), F.lit(">"))
    pred = F.concat(F.lit("<"), F.col("pred"), F.lit(">"))
    lit = F.concat(F.lit('"'), _escape_literal(F.col("obj")), F.lit('"'))
    lit = F.when(
        F.col("lang").isNotNull(), F.concat(lit, F.lit("@"), F.col("lang"))
    ).when(
        F.col("datatype").isNotNull(),
        F.concat(lit, F.lit("^^<"), F.col("datatype"), F.lit(">")),
    ).otherwise(lit)
    obj = F.when(F.col("obj_type") == "uri", F.concat(F.lit("<"), F.col("obj"), F.lit(">"))).otherwise(lit)
    return triples.select(F.concat_ws(" ", subj, pred, obj, F.lit(".")).alias("line"))


def _unescape_literal(col: F.Column) -> F.Column:
    """Inverse of _escape_literal (same subset caveat: a literal whose
    *source text* contains backslash-escapes round-trips through the escaped
    form, so unescape order matches escape order reversed)."""
    out = F.replace(col, F.lit('\\"'), F.lit('"'))
    out = F.replace(out, F.lit("\\n"), F.lit("\n"))
    out = F.replace(out, F.lit("\\r"), F.lit("\r"))
    return F.replace(out, F.lit("\\\\"), F.lit("\\"))


def _term_cols(term: F.Column) -> list[F.Column]:
    """Parse one RDF object term into (obj, obj_type, lang, datatype)."""
    is_uri = term.startswith("<")
    lit_body = F.regexp_extract(term, r'^"(.*)"', 1)
    lang = F.nullif(F.regexp_extract(term, r'"@([A-Za-z][A-Za-z0-9-]*)$', 1), F.lit(""))
    datatype = F.nullif(F.regexp_extract(term, r'"\^\^<([^>]+)>$', 1), F.lit(""))
    return [
        F.when(is_uri, F.regexp_extract(term, r"^<([^>]*)>", 1))
        .otherwise(_unescape_literal(lit_body))
        .alias("obj"),
        F.when(is_uri, F.lit("uri")).otherwise(F.lit("literal")).alias("obj_type"),
        F.when(is_uri, F.lit(None).cast("string")).otherwise(lang).alias("lang"),
        F.when(is_uri, F.lit(None).cast("string")).otherwise(datatype).alias("datatype"),
    ]


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented N-Triples -> triples DataFrame (subj, pred, obj,
    obj_type, lang, datatype). Strictly one statement per line, so the scan
    is embarrassingly parallel and every term is a JVM regexp_extract —
    the distributed inverse of write_ttl."""
    lines = spark.read.text(path).select(F.trim("value").alias("line")).filter(
        (F.col("line") != "") & ~F.col("line").startswith("#")
    )
    body = F.regexp_replace(F.col("line"), r"\s*\.\s*$", "")
    parsed = lines.select(
        F.regexp_extract(body, r"^<([^>]*)>", 1).alias("subj"),
        F.regexp_extract(body, r"^<[^>]*>\s+<([^>]*)>", 1).alias("pred"),
        F.regexp_replace(body, r"^<[^>]*>\s+<[^>]*>\s+", "").alias("term"),
    )
    return parsed.select("subj", "pred", *_term_cols(F.col("term")))


def _collect_prefixes(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """@prefix map, collected to the driver (a handful of header lines; the
    one legitimately driver-side piece of Turtle state)."""
    rows = (
        spark.read.text(path)
        .filter(F.trim("value").startswith("@prefix"))
        .select(
            F.regexp_extract("value", r"@prefix\s+([A-Za-z][\w-]*)?:", 1).alias("pfx"),
            F.regexp_extract("value", r"<([^>]*)>", 1).alias("iri"),
        )
        .collect()
    )
    return [(r.pfx, r.iri) for r in rows]


def read_turtle_blocks(spark: SparkSession, path: str) -> DataFrame:
    """Turtle-subset reader for the reference's fixture shape (module
    docstring): statement blocks split on the ``ws + '.'`` record separator,
    prefixed names expanded from the collected @prefix map, ``;`` and ``,``
    lists exploded — all parsing is Column work on the executors."""
    prefixes = _collect_prefixes(spark, path)
    blocks = (
        spark.read.option("lineSep", " .").text(path)
        .select(F.trim(F.regexp_replace("value", r"\s+", " ")).alias("b"))
        .filter((F.col("b") != "") & ~F.col("b").startswith("@prefix") & ~F.col("b").startswith("#"))
    )
    b = F.col("b")
    for pfx, iri in prefixes:
        # expand pfx:local -> <iri+local> at term boundaries
        b = F.regexp_replace(b, rf"(^|[\s,;]){pfx}:([A-Za-z0-9_.\-]+)", rf"$1<{iri}$2>")
    b = F.regexp_replace(b, r"(^|[\s;])a(?=\s)", rf"$1<{RDF_TYPE}>")
    blocks = blocks.select(b.alias("b")).filter(F.col("b").startswith("<"))
    entries = blocks.select(
        F.regexp_extract("b", r"^<([^>]*)>", 1).alias("subj"),
        F.explode(F.split(F.regexp_replace("b", r"^<[^>]*>\s*", ""), r"\s;\s")).alias("entry"),
    )
    terms = entries.select(
        "subj",
        F.regexp_extract("entry", r"^\s*<([^>]*)>", 1).alias("pred"),
        F.explode(
            F.split(F.regexp_replace("entry", r"^\s*<[^>]*>\s*", ""), r",\s+(?=[\"<])")
        ).alias("term"),
    )
    return terms.select("subj", "pred", *_term_cols(F.trim(F.col("term"))))


def write_ttl(triples: DataFrame, path: str, single_file: bool = False) -> None:
    """Partition-local sort only: a global orderBy of the whole graph is a
    full-range shuffle at 100 TB for a *text export*; N-Triples semantics are
    line-order-independent, so sortWithinPartitions keeps files deterministic
    per partition without the exchange. ``single_file`` (tiny graphs /
    fixture interchange) coalesces first, making the sort total anyway."""
    df = triples_to_ntriples(triples)
    if single_file:
        df = df.coalesce(1)
    df.sortWithinPartitions("line").write.mode("overwrite").text(path)
