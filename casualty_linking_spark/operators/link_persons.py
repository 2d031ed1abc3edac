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
from ..functions.similarity import ascii_fold, jaro_winkler, phonetic_key

THRESHOLD = 0.85

# Calibrated logistic weights, fitted offline from labelled training pairs
# by scripts/fit_link_weights.py (the deterministic stand-in for dedupe's
# RecordLink training, src/linker.py:233-237) — see link_weights.py for the
# fit provenance and its measured validation P/R. dict() copy so tests/fit
# can patch WEIGHTS without mutating the generated module.
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


def _block_keys(
    family: F.Column,
    death_iso: F.Column,
    birth_iso: F.Column,
    given: F.Column | None = None,
    name_only_always: bool = False,
) -> F.Column:
    """Four blocking keys per row: (folded family 3-prefix × death|birth
    year) plus (phonetic consonant-skeleton key × death|birth year). The
    year union keeps recall when one date is dirty (a record whose death
    date failed conversion still blocks on its birth year); the phonetic
    pass keeps recall when the family name itself is misspelled inside the
    first three characters — the reference reaches those via Lucene '~1'
    edit-distance fuzzing (SPARQL/arpa_menehtyneet_persons.sparql:20-23),
    which a prefix block alone cannot mirror. '?' placeholders never match
    the fully-dated actor side; the 'P' prefix keeps the two key families
    disjoint.

    When ``given`` is provided, a fifth NAME-ONLY key
    ('N|<phonetic skeleton>|<folded given initial>') covers records where
    BOTH dates failed conversion — otherwise all four year-keys carry '?'
    and such records get zero candidates (measured: the only person-recall
    misses on the planted truth). The reference has no such blind spot
    because its Lucene retrieval is name-first, dates enter only at scoring
    (src/linker.py:235-246). Skew posture at 10^12 rows: the actor side
    emits the key for every row (``name_only_always=True``) but the record
    side probes it only for the both-dates-unparseable sliver of the corpus
    (~0.2% under the reference's documented dirt rates), and the key itself
    is the FULL name skeleton + given initial — far finer than the fam3
    prefix — so per-block fan-out stays bounded."""
    # F.concat (not concat_ws) everywhere: concat is NULL-strict, so a null
    # family/given yields a NULL key, which an equi-join never matches —
    # exactly the DuckDB oracle's NULL-equality semantics. concat_ws would
    # silently DROP the null component and let two null-named rows block
    # together on the year alone, a Spark/oracle divergence on any corpus
    # with missing names.
    fam3 = F.substring(ascii_fold(F.lower(family)), 1, 3)
    phon = phonetic_key(family)
    dy = F.concat(F.lit("D"), F.coalesce(F.substring(death_iso, 1, 4), F.lit("?")))
    by = F.concat(F.lit("B"), F.coalesce(F.substring(birth_iso, 1, 4), F.lit("?")))
    sep = F.lit("|")
    base = F.array(
        F.concat(fam3, sep, dy),
        F.concat(fam3, sep, by),
        F.concat(phon, sep, dy),
        F.concat(phon, sep, by),
    )
    if given is None:
        return base
    # one name key per family TOKEN (full string + first + last, deduped):
    # a previous-name family ('Korhonen Hämäläinen' after the reference's
    # in-place '(ent. X)' substitution) must block against an actor named by
    # EITHER token — the reference's Lucene index is token-analyzed, so a
    # one-token query matches multi-token names for free.
    toks = F.split(family, r"\s+")
    init = F.substring(ascii_fold(F.lower(given)), 1, 1)

    def nk(c: F.Column) -> F.Column:
        return F.concat(F.lit("N|"), phonetic_key(c), sep, init)

    name_keys = F.array_distinct(
        F.array(nk(family), nk(F.element_at(toks, 1)), nk(F.element_at(toks, -1)))
    )
    if name_only_always:
        return F.concat(base, name_keys)
    return F.when(
        death_iso.isNull() & birth_iso.isNull(), F.concat(base, name_keys)
    ).otherwise(base)


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


def _greedy_match(scored: DataFrame, rounds: int = 3) -> DataFrame:
    """Iterated mutual-best over (record_uri, actor_uri, score): each round
    keeps pairs that are their record's AND their actor's best remaining
    option (ties broken by partner URI), then removes both endpoints. The
    union over rounds is a matching (every endpoint appears at most once) —
    the property oracle_connected_components relies on."""
    remaining = scored
    matched = []
    for _ in range(rounds):
        wl = Window.partitionBy("record_uri").orderBy(
            F.col("score").desc(), F.col("actor_uri").asc()
        )
        wr = Window.partitionBy("actor_uri").orderBy(
            F.col("score").desc(), F.col("record_uri").asc()
        )
        # lazy checkpoint per round: each m feeds the result union AND two
        # anti-joins, and remaining(i+1) embeds remaining(i) through them —
        # without the cut the logical plan grows 3^rounds (measured: rounds
        # beyond ~8 hang in the optimizer on a 40-row input). The cut makes
        # growth linear and computes each round's matching once.
        m = (
            remaining.withColumn("rl", F.row_number().over(wl))
            .withColumn("rr", F.row_number().over(wr))
            .filter((F.col("rl") == 1) & (F.col("rr") == 1))
            .select("record_uri", "actor_uri")
            .localCheckpoint(eager=False)
        )
        matched.append(m)
        remaining = remaining.join(
            m.select("record_uri"), "record_uri", "left_anti"
        ).join(m.select("actor_uri"), "actor_uri", "left_anti")
    out = matched[0]
    for m in matched[1:]:
        out = out.unionByName(m)
    return out


def oversized_block_keys(
    left: DataFrame, right: DataFrame, block_cap: int
) -> DataFrame:
    """Block keys whose candidate-pair count |left_bk| × |right_bk| exceeds
    ``block_cap`` — (bk, n_left, n_right, n_pairs) rows. Two map-side-
    combinable aggs + a key-only join; cost is O(distinct keys), not pairs."""
    ln = left.groupBy("bk").agg(F.count(F.lit(1)).alias("n_left"))
    rn = right.groupBy("bk").agg(F.count(F.lit(1)).alias("n_right"))
    return (
        ln.join(rn, "bk")
        .withColumn("n_pairs", F.col("n_left") * F.col("n_right"))
        .filter(F.col("n_pairs") > block_cap)
    )


def link_persons(
    features: DataFrame,
    actors: DataFrame,
    threshold: float = THRESHOLD,
    salt_buckets: int = 1,
    block_cap: int | None = None,
) -> DataFrame:
    """Blocked candidate join + logistic scoring + mutual-best-match.
    -> triples (record_uri, CRM.P70_documents, actor_uri).

    ``block_cap`` (off by default — semantics identical to the uncapped
    operator) drops block keys whose candidate-pair count would exceed the
    cap BEFORE the pair join. This is the explicit guard for the failure
    mode measured in BENCH/LINK_PR.md: a low-cardinality name vocabulary
    makes pair counts quadratic in corpus size (13.2M pairs at 20k synth
    records), and at 10^12 rows one hot surname×year block can dominate a
    stage. The reference has the same guard implicitly — its Lucene
    retrieval returns top-N hits per query, silently truncating hot blocks
    (src/linker.py Lucene-based candidate search); here the truncation is
    explicit, deterministic, and observable via :func:`oversized_block_keys`
    (log it, alert on it, or route dropped blocks to a finer key). A record
    participating in several keys still links through its surviving keys."""
    left = features.withColumn(
        "bk",
        F.explode(
            _block_keys(
                F.col("family"), F.col("death_iso"), F.col("birth_iso"), F.col("given")
            )
        ),
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
        "bk",
        F.explode(
            _block_keys(
                F.col("a_family"),
                F.col("a_death"),
                F.col("a_birth"),
                F.col("a_given"),
                name_only_always=True,
            )
        ),
    )

    if block_cap is not None:
        over = oversized_block_keys(left, right, block_cap).select("bk")
        left = left.join(F.broadcast(over), "bk", "left_anti")
        right = right.join(F.broadcast(over), "bk", "left_anti")

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
    # Lazy lineage cut: every greedy-match round's windows and anti-joins
    # reference `scored`; without the cut each round RE-RUNS the blocked
    # candidate join + vectorized scoring (measured: the 100k-record eval
    # multiplied the linkage cost several times over). Lazy (not eager) so
    # the materialization happens inside the first downstream job rather
    # than blocking the driver here — in the production pipeline the same
    # cut is the scored-pairs table materialization.
    scored = (
        score_pairs(pairs)
        .filter(F.col("score") >= threshold)
        .select("record_uri", "actor_uri", "score")
        .localCheckpoint(eager=False)
    )

    # Iterated mutual-best match (3 rounds), deterministic tie-break on the
    # partner URI. One pass alone under-matches: when record X's top score
    # TIES between its true actor and a look-alike already claimed by its
    # own record, X picks the look-alike (rl=1), the look-alike doesn't
    # reciprocate (rr>1), and X matches nothing even though X's true actor's
    # best IS X. Removing each round's matches and re-running is the
    # distributed equivalent of the reference's greedy one-to-one matching
    # (dedupe matchBlocks: take pairs by descending score, skipping used
    # partners; src/linker.py:246) — a fixed 3 rounds resolves two-deep tie
    # cascades, and residual ambiguity stays conservatively unmatched.
    # Each round is two windows + two anti-joins over the post-threshold
    # pair set (tiny vs the corpus); a production pipeline materializes
    # `scored` once (T-table) so rounds never rescore.
    mutual = _greedy_match(scored, rounds=3)
    return mutual.select(
        F.col("record_uri").alias("subj"),
        F.lit(NS.CRM + "P70_documents").alias("pred"),
        F.col("actor_uri").alias("obj"),
        F.lit("uri").alias("obj_type"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("datatype"),
        F.lit("documents_links").alias("graph_kind"),
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., 'Connected Components in
    MapReduce and Beyond'): every neighbor of u strictly larger than u is
    connected to m = min(Γ(u) ∪ {u}). Input is the bidirectional (u, v)
    pair set; output is an undirected edge set as (a, b) rows."""
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges_ab: DataFrame) -> DataFrame:
    """One small-star round: keying each undirected edge by its larger
    endpoint u, every smaller neighbor (and u itself) is connected to
    m = min of u's smaller neighborhood; self-loops dropped."""
    d = edges_ab.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    )
    mins = (
        d.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    nbrs = d.join(mins, "u").select(F.col("v").alias("a"), F.col("m").alias("b"))
    selfs = mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return nbrs.unionByName(selfs).filter(F.col("a") != F.col("b")).distinct()


def connected_components(
    edges: DataFrame, max_iter: int = 50, algorithm: str = "star"
) -> DataFrame:
    """Canonicalize sameAs/link closures (the GraphFrames-free CC of SURVEY
    §4.3). edges(src, dst) undirected. Returns (vertex, component) with
    component = min vertex id (lexicographic) of the connected component.

    algorithm='star' (default): alternating large-star/small-star rounds
    (Kiveris et al. 2014) — O(log n) rounds on ANY graph shape, so a
    10^12-scale closure with long chains converges without a
    diameter-bounded loop. Each round is two keyed aggregations + joins,
    all map-side combinable; convergence = the undirected edge set reached
    a fixed point (star graphs rooted at component minima).

    algorithm='label': the original iterative min-label propagation —
    O(graph diameter) iterations; kept as the property-test cross-check
    and for shallow mutual-best-match closures where diameter ≈ 2.

    Both raise on non-convergence at max_iter rather than silently
    returning split components. Each iteration localCheckpoints to cut the
    lineage (a cluster job would checkpoint to the cluster store)."""
    if algorithm == "star":
        return _connected_components_star(edges, max_iter)
    if algorithm != "label":
        raise ValueError(f"unknown CC algorithm: {algorithm!r}")
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


def _connected_components_star(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Alternating large-star/small-star fixed point. At convergence the
    edge set is a union of stars (child, root) with root = the component's
    minimum vertex; the vertex table is recovered as children ∪ roots ∪
    isolated input vertices (a degenerate input edge (v, v) yields a
    single-vertex component)."""
    e0 = edges.select("src", "dst").localCheckpoint(eager=True)
    verts = (
        e0.select(F.col("src").alias("vertex"))
        .unionByName(e0.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = (
        e0.filter(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        sym = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        nxt = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        # fixed point: same undirected edge set (both sides are canonical
        # (child > root) pairs after small-star, so set equality is exact)
        if nxt.count() == cur.count() and nxt.exceptAll(cur).count() == 0:
            cur = nxt
            converged = True
            break
        cur = nxt
    if not converged:
        raise RuntimeError(
            f"connected_components(star) did not reach a fixed point in "
            f"{max_iter} rounds — this is O(log n) rounds by construction; "
            f"raise max_iter"
        )
    comp = cur.select(F.col("a").alias("vertex"), F.col("b").alias("component"))
    roots = verts.join(comp, "vertex", "left_anti").select(
        "vertex", F.col("vertex").alias("component")
    )
    return comp.unionByName(roots)
