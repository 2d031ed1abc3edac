"""Gazetteer mention detection — dictionary n-gram matching in FREE TEXT.

The structured extractor (operators/extract.py) reads planted ``FIELD=value``
mentions; this operator is the other half of the north-star's "batched
mention detection": finding ontology-dictionary labels anywhere inside
unstructured turn text (the reference reaches label text via its ARPA
lexical-match service, src/linker.py:161-214 — here the dictionary is a
broadcast dimension and matching is pure DataFrame algebra).

Shape, built for the 100 TB posture:

* one corpus scan — tokenize (lower, ``\\W+`` split, the same portable
  normalization the dedup shingles use) and emit every full n-token window
  for exactly the n's that occur in the label dictionary (driver-side
  collect of a handful of ints from the DIM, never data);
* candidate generation is a broadcast hash join of windows against the
  normalized label dictionary — no shuffle of the corpus;
* overlap suppression (longest-match-wins) runs on the MATCH table only,
  which is orders of magnitude smaller than the corpus: one self-anti-join
  keyed on the text-unit id.

Suppression rule (deterministic, relational — no sequential scan): a match
is dropped iff an overlapping match in the same text unit is strictly
longer, or equally long with a strictly earlier start. Two matches at the
same (start, length) — an ambiguous mention whose normalized text appears
under several URIs — are BOTH kept: that is candidate generation for the
downstream linker, not a defect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import words_col


def norm_gram(text: Column) -> Column:
    """Whitespace-joined normalized tokens of a label string."""
    return F.array_join(words_col(text), " ")


def gazetteer_mentions(
    texts: DataFrame,
    labels: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    label_col: str = "label",
    uri_col: str = "uri",
) -> DataFrame:
    """(``*id_cols``, start_tok, n_words, mention, uri) — every dictionary
    label found in ``text_col``, longest-match-wins on overlaps.

    ``start_tok`` is the 1-based token position of the match; ``mention`` is
    the normalized matched gram. ``labels`` is a dimension table (small —
    it broadcasts); empty-normalizing labels are ignored.
    """
    labn = (
        labels.select(
            F.col(uri_col).alias("uri"),
            words_col(F.col(label_col)).alias("lw"),
        )
        .filter(F.size("lw") > 0)
        .select("uri", F.array_join("lw", " ").alias("gram"), F.size("lw").alias("n_words"))
        .distinct()
    )
    # the label dictionary's distinct word-lengths: a handful of ints off a
    # broadcast-sized dim (driver-side by design, like centroid collects)
    ns = sorted(r[0] for r in labn.select("n_words").distinct().collect())
    if not ns:
        raise ValueError("label dictionary normalizes to no usable labels")

    tw = texts.select(*id_cols, words_col(F.col(text_col)).alias("w"))

    def windows_for(n: int) -> Column:
        arr = F.transform(
            # greatest(...,1) keeps sequence() ascending; the otherwise-branch
            # empties the array when the text is shorter than n (slice len 0
            # = typed empty array), so no partial window ever escapes
            F.sequence(F.lit(1), F.greatest(F.size("w") - (n - 1), F.lit(1))),
            lambda i: F.struct(
                i.alias("start_tok"),
                F.lit(n).alias("n_words"),
                F.array_join(F.slice("w", i, n), " ").alias("gram"),
            ),
        )
        return F.when(F.size("w") >= n, arr).otherwise(F.slice(arr, 1, 0))

    grams = tw.select(
        *id_cols,
        F.explode(F.flatten(F.array(*[windows_for(n) for n in ns]))).alias("g"),
    ).select(*id_cols, "g.start_tok", "g.n_words", "g.gram")

    matches = grams.join(
        F.broadcast(labn.withColumnRenamed("n_words", "n_lab")),
        "gram",
    ).select(*id_cols, "start_tok", "n_words", F.col("gram").alias("mention"), "uri")

    # longest-match-wins: drop a match iff a strictly-dominating overlapping
    # match exists in the same text unit (self-anti-join on the match table)
    spans = matches.select(
        *[F.col(c).alias(f"o_{c}") for c in id_cols],
        F.col("start_tok").alias("o_start"),
        F.col("n_words").alias("o_n"),
    ).distinct()
    cond = F.lit(True)
    for c in id_cols:
        cond = cond & (F.col(c) == F.col(f"o_{c}"))
    cond = (
        cond
        & (F.col("o_start") <= F.col("start_tok") + F.col("n_words") - 1)
        & (F.col("o_start") + F.col("o_n") - 1 >= F.col("start_tok"))
        & (
            (F.col("o_n") > F.col("n_words"))
            | ((F.col("o_n") == F.col("n_words")) & (F.col("o_start") < F.col("start_tok")))
        )
    )
    return matches.join(spans, cond, "left_anti")
