"""J7/J7a — person record linkage (casualty record ↔ WarSampo person actor)
and connected-components canonicalization.

Reference behavior (link_casualties, src/linker.py:211-239): build an
11-field feature row per DeathRecord (_generate_casualties_dict,
src/linker.py:40-83), then run the dedupe RecordLink model (seeded RNG,
217 training pairs, threshold_ratio=0.85). The active-learning model is
non-relational and non-deterministic-by-construction; per SURVEY §7.3 the
*contract* is the emitted links, so the scorer here is a fixed
logistic-weight model over the same comparison fields — Jaro-Winkler for
the String fields, exact-match for the non-fuzzy DateTime fields,
set-intersection for the Custom fields (intersection_comparator), relative
difference for rank_level (Price) — thresholded at 0.85 like the
reference's threshold_ratio, followed by mutual-best-match and CC.

Plan shape (SURVEY §2.3 J7): **blocked** candidate join — block key =
(first 3 chars of folded lower family name, death year). Never a cartesian
product. Zipfian family names make the block key skewed: AQE skew-join
splits oversized partitions at runtime, and ``salt_buckets`` > 1 adds
deterministic key salting (records side: hash-mod salt; actors side:
replicate each row to every salt bucket) for clusters AQE can't split.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from .. import namespaces as NS
from ..functions.names import strip_prev_name
from ..functions.similarity import ascii_fold, jaro_winkler

THRESHOLD = 0.85

# Calibrated logistic weights, fitted offline from labelled training pairs
# by scripts/fit_link_weights.py (the deterministic stand-in for dedupe's
# RecordLink training, src/linker.py:233-237) and validated against the
# planted truth at P=1.0000 / R=0.9973 — see link_weights.py for the fit
# provenance. dict() copy so tests/fit can patch WEIGHTS without mutating
# the generated module.
from .link_weights import FITTED_BIAS, FITTED_WEIGHTS

WEIGHTS = dict(FITTED_WEIGHTS)
BIAS = FITTED_BIAS


def casualty_features(records: DataFrame, rank_links: DataFrame, unit_links: DataFrame,
                      ranks_dim: DataFrame, munics_dim: DataFrame) -> DataFrame:
    """J7a — the reference's _generate_casualties_dict as aggregation joins:
    one row per record with given/family/rank/rank_level/birth_place/dates/
    units (src/linker.py:40-83; golden fixture src/tests.py:32-59)."""
    base = records.select(
        "record_uri",
        F.col("given_names").alias("given"),
        # family with '(ent. X)' -> 'X' in place (src/linker.py:70)
        strip_prev_name(F.col("family_name")).alias("family"),
        F.date_format("date_of_birth", "yyyy-MM-dd").alias("birth_iso"),
        F.date_format("date_of_death", "yyyy-MM-dd").alias("death_iso"),
        "municipality_of_birth",
    )
    ranks = rank_links.select(F.col("subj").alias("record_uri"), F.col("obj").alias("rank_uri"))
    units = (
        unit_links.groupBy("subj")
        .agg(F.sort_array(F.collect_set("obj")).alias("units"))
        .withColumnRenamed("subj", "record_uri")
    )
    lvl = ranks_dim.select("rank_uri", F.col("level").alias("rank_level"))
    # birth_place = {current, wartime} municipality of the birth municipality,
    # nulls dropped (src/linker.py:54-56,71)
    mun = munics_dim.select(
        F.col("mun_uri").alias("municipality_of_birth"),
        F.array_compact(
            F.array_distinct(F.array("current_municipality", "wartime_municipality"))
        ).alias("birth_place"),
    )
    return (
        base.join(ranks, "record_uri", "left")
        .join(F.broadcast(lvl), "rank_uri", "left")
        .join(units, "record_uri", "left")
        .join(F.broadcast(mun), "municipality_of_birth", "left")
        .select(
            "record_uri", "given", "family", "birth_iso", "death_iso",
            F.when(F.col("rank_uri").isNotNull(), F.array("rank_uri")).alias("rank"),
            "rank_level",
            F.col("birth_place"),
            "units",
        )
    )


def _block_keys(family: F.Column, death_iso: F.Column, birth_iso: F.Column) -> F.Column:
    """Two blocking keys per row: (folded family prefix, death year) and
    (…, birth year). The union of passes keeps recall when one date is dirty
    (a record whose death date failed conversion still blocks on its birth
    year); '?' placeholders never match the fully-dated actor side."""
    fam3 = F.substring(ascii_fold(F.lower(family)), 1, 3)
    return F.array(
        F.concat_ws("|", fam3, F.concat(F.lit("D"), F.coalesce(F.substring(death_iso, 1, 4), F.lit("?")))),
        F.concat_ws("|", fam3, F.concat(F.lit("B"), F.coalesce(F.substring(birth_iso, 1, 4), F.lit("?")))),
    )


def _eq_feature(a: F.Column, b: F.Column) -> F.Column:
    """1.0 equal, 0.0 differing, 0.5 when either side missing (dedupe's
    'has missing' handling)."""
    return (
        F.when(a.isNull() | b.isNull(), F.lit(0.5))
        .when(a == b, F.lit(1.0))
        .otherwise(F.lit(0.0))
    )


def score_pairs(pairs: DataFrame) -> DataFrame:
    """Feature vector + logistic score per candidate pair. Column contract:
    casualty side (given, family, birth_iso, death_iso, rank, rank_level,
    birth_place, units) vs actor side (a_given, a_family, a_birth, a_death,
    a_rank, a_rank_level, a_place, a_unit)."""
    feats = (
        pairs.withColumn("jw_given", jaro_winkler(F.lower("given"), F.lower("a_given")))
        .withColumn("jw_family", jaro_winkler(F.lower("family"), F.lower("a_family")))
        .withColumn("birth_eq", _eq_feature(F.col("birth_iso"), F.col("a_birth")))
        .withColumn("death_eq", _eq_feature(F.col("death_iso"), F.col("a_death")))
        # empty (non-null) arrays carry no evidence either way — dedupe's
        # missing-value 0.5, same as null (array_compact can yield [] when
        # every variant was null)
        .withColumn(
            "place_eq",
            F.when(
                F.col("birth_place").isNull() | (F.size("birth_place") == 0)
                | F.col("a_place").isNull(),
                F.lit(0.5),
            )
            .when(F.array_contains("birth_place", F.col("a_place")), F.lit(1.0))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "rank_eq",
            F.when(
                F.col("rank").isNull() | (F.size("rank") == 0) | F.col("a_rank").isNull(),
                F.lit(0.5),
            )
            .when(F.array_contains("rank", F.col("a_rank")), F.lit(1.0))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "unit_eq",
            F.when(
                F.col("units").isNull() | (F.size("units") == 0) | F.col("a_unit").isNull(),
                F.lit(0.5),
            )
            .when(F.array_contains("units", F.col("a_unit")), F.lit(1.0))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "level_sim",
            F.when(F.col("rank_level").isNull() | F.col("a_rank_level").isNull(), F.lit(0.5))
            .otherwise(
                1.0
                - F.abs(F.col("rank_level") - F.col("a_rank_level"))
                / F.greatest(F.col("rank_level"), F.col("a_rank_level"), F.lit(1)).cast("double")
            ),
        )
    )
    z = F.lit(BIAS)
    for name, w in WEIGHTS.items():
        z = z + F.lit(w) * F.col(name)
    return feats.withColumn("score", F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def link_persons(
    features: DataFrame,
    actors: DataFrame,
    threshold: float = THRESHOLD,
    salt_buckets: int = 1,
) -> DataFrame:
    """Blocked candidate join + logistic scoring + mutual-best-match.
    -> triples (record_uri, CRM.P70_documents, actor_uri)."""
    left = features.withColumn(
        "bk", F.explode(_block_keys(F.col("family"), F.col("death_iso"), F.col("birth_iso")))
    )
    right = actors.select(
        "actor_uri",
        F.col("given").alias("a_given"),
        F.col("family").alias("a_family"),
        F.col("birth_iso").alias("a_birth"),
        F.col("death_iso").alias("a_death"),
        F.col("rank_uri").alias("a_rank"),
        F.col("rank_level").alias("a_rank_level"),
        F.col("unit_uri").alias("a_unit"),
        F.col("birth_place").alias("a_place"),
    ).withColumn(
        "bk", F.explode(_block_keys(F.col("a_family"), F.col("a_death"), F.col("a_birth")))
    )

    if salt_buckets > 1:
        # deterministic salting for Zipfian blocks: big side takes a
        # hash-derived bucket, dictionary side replicates into every bucket
        left = left.withColumn("salt", F.pmod(F.hash("record_uri"), F.lit(salt_buckets)))
        right = right.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        )
        join_keys = ["bk", "salt"]
    else:
        join_keys = ["bk"]

    pairs = left.join(right, join_keys).dropDuplicates(["record_uri", "actor_uri"])
    scored = score_pairs(pairs).filter(F.col("score") >= threshold)

    # mutual best match, deterministic tie-break on the partner URI
    wl = Window.partitionBy("record_uri").orderBy(F.col("score").desc(), F.col("actor_uri").asc())
    wr = Window.partitionBy("actor_uri").orderBy(F.col("score").desc(), F.col("record_uri").asc())
    mutual = (
        scored.withColumn("rl", F.row_number().over(wl))
        .withColumn("rr", F.row_number().over(wr))
        .filter((F.col("rl") == 1) & (F.col("rr") == 1))
    )
    return mutual.select(
        F.col("record_uri").alias("subj"),
        F.lit(NS.CRM + "P70_documents").alias("pred"),
        F.col("actor_uri").alias("obj"),
        F.lit("uri").alias("obj_type"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("datatype"),
        F.lit("documents_links").alias("graph_kind"),
    )


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Canonicalize sameAs/link closures: iterative min-id label propagation
    (the GraphFrames-free CC of SURVEY §4.3). edges(src, dst) undirected.
    Returns (vertex, component) with component = min vertex id (lexicographic)
    of the connected component.

    Convergence is O(graph diameter) iterations — record-linkage closures are
    shallow (mutual-best-match bounds degree), so the default comfortably
    covers them, and non-convergence at max_iter raises rather than silently
    returning split components (a path graph of > max_iter hops would
    otherwise mislabel). Each iteration is one shuffle + localCheckpoint to
    cut the lineage (a 10^12-scale job would checkpoint to the cluster store;
    large-star/small-star hashing would give O(log n) if diameters grow)."""
    # cut lineage first: without it every iteration's join re-executes the
    # whole upstream linkage chain that produced the edges
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    comp = (
        sym.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    changed = 0
    for _ in range(max_iter):
        # candidate component per vertex: min over neighbors' components
        nbr = (
            sym.join(comp, sym.dst == comp.vertex)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_comp"))
            .withColumnRenamed("src", "vertex")
        )
        new_comp = (
            comp.join(nbr, "vertex", "left")
            .select(
                "vertex",
                F.least(F.col("component"), F.coalesce("nbr_comp", F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        comp = new_comp
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({changed} labels still changing) — graph diameter exceeds "
            f"max_iter; raise max_iter or switch to large-star/small-star"
        )
    return comp
