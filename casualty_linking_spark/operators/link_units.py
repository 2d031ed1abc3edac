"""J1/J2 — military-unit linking, the reference's hardest linker
(src/linker.py:117-208).

Two-phase dataflow with an explicit short-circuit (the cost-based structure
Catalyst can't invent, SURVEY §4.3):

* **Path A** (records with a cover number): broadcast equi-join
  records⋈units ON unit_code = covernumber, score every candidate label
  against the record's unit literal, per-record argmax, accept when
  best >= COVER_NUMBER_SCORE_LIMIT (=20, src/linker.py:129,177).
* **left_anti** — records with no cover number OR a sub-threshold best
  (src/linker.py:188) fall through to
* **Path B**: Winter-War period tagging (death < 1941-06-25 string compare,
  src/linker.py:189-192), abbreviation-expanding preprocessor (P14), word
  n-gram explode (ARPA maxNGrams bound, BASELINE.md), and a normalized-label
  equi-join replicating units.sparql:25
  ``LCASE(REPLACE(label,'[,./\\s]','')) = LCASE(REPLACE(ngram,...))``,
  disambiguated by the war-period validator (prefer candidates whose
  conflict matches the record's period) then longest-ngram/URI tie-break.

Skew note: unit labels are Zipfian; path B joins on the *normalized label*
key against a broadcast dictionary, so the big side never shuffles — skew
materializes only in per-task candidate fan-out, bounded by the n-gram cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import namespaces as NS
from ..functions.dates import date_cmp_str
from ..functions.similarity import ascii_fold, levenshtein_ratio

COVER_NUMBER_SCORE_LIMIT = 20
# the reference's ARPA candidate service allows up to 10-gram queries
# (arpa_services/warsa_casualties_actor_units:21 maxNGrams=10); honoring the
# full bound matters for long unit literals ("2. Komppania / JR 8" only
# produces its full-label candidate at n=5)
MAX_NGRAM = 10
WINTER_WAR_CUTOFF = "1941-06-25"

# Finnish unit-type abbreviation expansions (the role of the
# warsa_linkers.units preprocessor imported at src/linker.py:28 — a
# deterministic regex table; longest-key-first application).
ABBREVIATIONS = [
    (r"Raja\.?JP", "Rajajääkäripataljoona"),
    (r"It\.?Psto", "Ilmatorjuntapatteristo"),
    (r"Kev\.?Os", "Kevyt Osasto"),
    (r"Pion\.?P", "Pioneeripataljoona"),
    (r"Er\.?P", "Erillinen Pataljoona"),
    (r"Tyk\.?KK", "Tykistökoulutuskeskus"),
    (r"Laiv\.?E", "Laivaston Esikunta"),
    (r"RatsuR", "Ratsuväkirykmentti"),
    (r"Le\.?R", "Lentorykmentti"),
    (r"KTR", "Kenttätykistörykmentti"),
    (r"V\.?P", "Viestipataljoona"),
    (r"JR", "Jalkaväkirykmentti"),
    (r"JP", "Jääkäripataljoona"),
]


def preprocess_unit(col: F.Column) -> F.Column:
    """P14 unit-literal preprocessor: expand abbreviations, collapse space."""
    out = col
    for pat, repl in ABBREVIATIONS:
        out = F.regexp_replace(out, r"\b" + pat + r"\b", repl)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def normalize_label(col: F.Column) -> F.Column:
    """units.sparql:25 normalization: strip [,./ \\s], lowercase."""
    return F.lower(F.regexp_replace(col, r"[,./\s]", ""))


def _link_row(subj: F.Column, unit: F.Column) -> list[F.Column]:
    return [
        subj.alias("subj"),
        F.lit(NS.cas("unit")).alias("pred"),
        unit.alias("obj"),
        F.lit("uri").alias("obj_type"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("datatype"),
        F.lit("unit_links").alias("graph_kind"),
    ]


# Memoized Column pieces (pure functions of column names + module constants;
# rebuilding the 13-regexp preprocessor and n-gram lambda trees cost ~1.7 s
# of py4j driver time per link_units call). Lazy: needs a live JVM. The
# label-dictionary frame is memoized per input DataFrame id for the same
# reason (and so its broadcast build is shared across queries).
_RECS_COLS: list | None = None
_NGRAM_COL: F.Column | None = None
_PREP_COL: F.Column | None = None
_DIM_B_MEMO: dict[int, tuple[DataFrame, DataFrame]] = {}


def _prep_col() -> F.Column:
    global _PREP_COL
    if _PREP_COL is None:
        _PREP_COL = preprocess_unit(F.col("unit_literal"))
    return _PREP_COL


# Remaining per-call Column pieces, built once (same rationale as above).
_MISC: dict | None = None


def _misc() -> dict:
    global _MISC
    if _MISC is None:
        _MISC = {
            "score_a": levenshtein_ratio(
                ascii_fold(F.col("label")), ascii_fold(F.col("unit_literal"))
            ),
            "w_a": Window.partitionBy("unit_code", "unit_literal").orderBy(
                F.col("score").desc(), F.col("unit_uri").asc()
            ),
            "period_cols": [
                F.col("record_uri").alias("subj"),
                F.lit(NS.RELATED_PERIOD).alias("pred"),
                F.lit(NS.WINTER_WAR).alias("obj"),
                F.lit("uri").alias("obj_type"),
                F.lit(None).cast("string").alias("lang"),
                F.lit(None).cast("string").alias("datatype"),
                F.lit("unit_links").alias("graph_kind"),
            ],
            "norm_ngram": normalize_label(F.col("ngram")),
            "period_match": (
                F.col("conflict")
                == F.when(
                    F.col("death_cmp") < WINTER_WAR_CUTOFF, F.lit(NS.WINTER_WAR)
                ).otherwise(F.lit(NS.CONTINUATION_WAR))
            ).cast("int"),
            "w_b": Window.partitionBy("record_uri").orderBy(
                F.col("period_match").desc(),
                F.length("norm_ngram").desc(),
                F.col("unit_uri").asc(),
            ),
            "link_row": _link_row(F.col("record_uri"), F.col("unit_uri")),
        }
    return _MISC


def link_units(records: DataFrame, unit_labels: DataFrame) -> tuple[DataFrame, DataFrame]:
    """-> (unit link triples, related-period triples).

    ``unit_labels``: exploded (unit_uri, label, cover_number, conflict).
    """
    global _RECS_COLS
    if _RECS_COLS is None:
        _RECS_COLS = [
            F.col("record_uri"), F.col("unit_code"), F.col("unit_literal"),
            date_cmp_str(F.col("date_of_death"), F.col("date_of_death_str")).alias("death_cmp"),
        ]
    recs = records.select(*_RECS_COLS)

    # ---- Path A: cover-number join + fuzzy argmax ----
    # Scoring runs on DISTINCT (unit_code, unit_literal) pairs — the literal
    # vocabulary is tiny vs the corpus, so the fuzzy pass is O(vocab x labels)
    # and records resolve via a broadcast join (same dataflow shape as the
    # reference's one batched VALUES lookup, src/linker.py:145-147).
    # coalesce(1) after the distinct: the (code, literal) vocabulary is
    # bounded by the unit ontology × dirt classes, not the corpus, so the
    # scoring join + per-pair argmax run as one task instead of a fan of
    # near-empty shuffle-partition tasks (same reasoning as the occupation
    # linker's vocabulary coalesce).
    pairs = (
        recs.filter(F.col("unit_code").isNotNull())
        .select("unit_code", "unit_literal").distinct().coalesce(1)
    )
    cands_a = pairs.join(
        F.broadcast(unit_labels.filter(F.col("cover_number").isNotNull())),
        F.col("unit_code") == F.col("cover_number"),
    )
    # score = edit-distance ratio on accent-folded raw label vs literal
    # (reference: max fuzz.ratio over the unit's labels, src/linker.py:171)
    m = _misc()
    scored_a = cands_a.withColumn("score", m["score_a"])
    per_unit = scored_a.groupBy("unit_code", "unit_literal", "unit_uri").agg(
        F.max("score").alias("score")
    )
    best_pair = per_unit.withColumn("rn", F.row_number().over(m["w_a"])).filter(F.col("rn") == 1)
    # one broadcast join covers every record: null cover keys simply don't
    # match, leaving score null — so both the accepted set and the
    # fall-through set (no cover / unknown cover / sub-threshold,
    # src/linker.py:188) are filters over the same joined stream, with NO
    # shuffle of the record stream anywhere in path A.
    scored_recs = recs.join(
        F.broadcast(best_pair.select("unit_code", "unit_literal", "unit_uri", "score")),
        ["unit_code", "unit_literal"],
        "left",
    )
    links_a = scored_recs.filter(F.col("score") >= COVER_NUMBER_SCORE_LIMIT)
    path_b = scored_recs.filter(
        F.col("unit_code").isNull()
        | F.col("score").isNull()
        | (F.col("score") < COVER_NUMBER_SCORE_LIMIT)
    )

    # Winter-War tagging (string compare on the literal the reference sees)
    period = path_b.filter(F.col("death_cmp") < WINTER_WAR_CUTOFF).select(*m["period_cols"])

    # ---- Path B: n-gram candidates against normalized labels ----
    # guard: sequence(1, 0) would produce a *descending* sequence in Spark,
    # so empty/missing literals must be filtered before n-gram generation
    prep = (
        path_b.filter(F.col("unit_literal").isNotNull() & (F.trim("unit_literal") != ""))
        .withColumn("prep", _prep_col())
        .withColumn("tokens", F.split(F.col("prep"), r"\s+"))
        .filter(F.size("tokens") > 0)
    )
    # contiguous word n-grams, n = 1..MAX_NGRAM
    global _NGRAM_COL
    if _NGRAM_COL is None:
        _NGRAM_COL = F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.least(F.lit(MAX_NGRAM), F.size("tokens"))),
                    lambda n: F.transform(
                        F.sequence(F.lit(0), F.size("tokens") - n),
                        lambda i: F.array_join(F.slice("tokens", i + 1, n), " "),
                    ),
                )
            )
        ).alias("ngram")
    ngrams = prep.select("record_uri", "death_cmp", _NGRAM_COL)
    # Each dictionary label yields TWO normalized keys: the raw form and the
    # abbreviation-EXPANDED form. The record side always expands, so the
    # coverless literal '2./JR 8' becomes '2./Jalkaväkirykmentti 8' and can
    # only hit the expanded key of its label — while the lowercased literal
    # 'jr 8' escapes expansion (case-sensitive \b regex) and needs the raw
    # key. Either key alone measurably loses one dirt class on the planted
    # truth (eval_pr at sf0.01: units recall 0.980 with raw-only, same with
    # expanded-only; 0.991 with both — BENCH/LINK_PR.md). The reference gets
    # this from its
    # Lucene index analyzing several label variants per unit
    # (arpa_services/warsa_casualties_actor_units).
    # the memo entry pins the keyed DataFrame: id() of a garbage-collected
    # object can be reused, so the key object must stay alive for the key
    # to remain unambiguous
    dim_key = id(unit_labels)
    if dim_key not in _DIM_B_MEMO:
        _DIM_B_MEMO[dim_key] = (
            unit_labels,
            F.broadcast(
                unit_labels.select(
                    "unit_uri",
                    "conflict",
                    F.explode(
                        F.array_distinct(
                            F.array(
                                normalize_label(F.col("label")),
                                normalize_label(preprocess_unit(F.col("label"))),
                            )
                        )
                    ).alias("norm_label"),
                )
            ),
        )
    dim_b = _DIM_B_MEMO[dim_key][1]
    cands_b = ngrams.withColumn("norm_ngram", m["norm_ngram"]).join(
        dim_b, F.col("norm_ngram") == F.col("norm_label")
    )
    # war-period validator (Validator(temp_graph) disambiguation,
    # src/linker.py:202-208): candidates whose conflict matches the record's
    # period win; then longest ngram, then URI.
    validated = cands_b.withColumn("period_match", m["period_match"])
    best_b = validated.withColumn("rn", F.row_number().over(m["w_b"])).filter(F.col("rn") == 1)

    links = links_a.select(*m["link_row"]).unionByName(
        best_b.select(*m["link_row"])
    ).dropDuplicates(["subj", "pred", "obj"])
    return links, period
