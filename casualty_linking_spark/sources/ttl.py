"""Turtle/N-Triples text export of the triples DataFrame (S10 — the
reference serializes every stage to TTL, src/csv_to_rdf.py:164-180 etc.;
here the canonical store is the partitioned table and the text export
exists for parity/interchange).

Emission is pure Column work (concat_ws over escaped terms) — the writer
streams partition-parallel text files; no driver-side serialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
