"""PageRank over the constructed knowledge graph — the graph-analytics step
a KG-construction pipeline runs to surface its most-connected entities
(popular units, municipalities, ranks) for QA and downstream weighting.

Fixed-point integer arithmetic: ranks are BIGINT micro-units (1.0 ==
``SCALE``), every per-edge push is integer division by out-degree and the
damping is ``(85 * x) // 100``. Floating-point PageRank is summation-order
dependent (a parallel engine cannot reproduce another engine's float sums
bit-for-bit); the fixed-point formulation makes the whole iteration
ENGINE-EXACT — the DuckDB oracle unrolls the same recurrence and the value
hash must match to the last unit. The cost is a deterministic rounding-down
bias of < n_iter * outdeg units (~1e-10 of total mass), irrelevant for
ranking and a fair trade for a verifiable contract. Dangling-vertex mass is
dropped, identically on both sides (the standard simplification; production
would redistribute it — one extra aggregate per round, same join shape).

Scale posture: per iteration — one join of edges against the current ranks
on src (both sides hash-partitioned on the same key; at 100 TB the edge
table is bucketed by src at write time so this is shuffle-free), one
aggregation onto dst (map-side combine: integer sums), one left join back
to the vertex set. Lineage is cut per round with a lazy localCheckpoint —
same discipline as the person-linkage greedy rounds and the CC operator
(its 3^rounds plan-growth lesson, commit 40366fb). Iterations are a fixed
count, not convergence-tested: deterministic plans, bounded rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**12
N_ITER = 6
DAMPING_PCT = 85


def pagerank_fixed_point(
    edges: DataFrame,
    n_iter: int = N_ITER,
    damping_pct: int = DAMPING_PCT,
    scale: int = SCALE,
) -> DataFrame:
    """(vertex, pr) — ``n_iter`` rounds of fixed-point PageRank over the
    DISTINCT directed edge set (src, dst).

    Recurrence (all integer ops)::

        r0(v)     = scale // N
        r_{k+1}(v) = ((100 - d) * (scale // N)) // 100
                     + (d * Σ_{u→v} (r_k(u) // outdeg(u))) // 100
    """
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_row = verts.agg(F.count("*").alias("n"))

    base = F.expr(f"(({100 - damping_pct}) * ({scale} div n)) div 100")
    ranks = verts.crossJoin(F.broadcast(n_row)).select(
        "vertex", F.expr(f"{scale} div n").alias("pr")
    )
    for _ in range(n_iter):
        pushes = (
            e.join(ranks.withColumnRenamed("vertex", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("pr div outdeg").alias("c"))
        )
        sums = pushes.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            verts.crossJoin(F.broadcast(n_row))
            .join(sums.withColumnRenamed("dst", "vertex"), "vertex", "left")
            .select(
                "vertex",
                (base + F.expr(f"({damping_pct} * coalesce(s, CAST(0 AS BIGINT))) div 100"))
                .cast("long")
                .alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def k_hop(edges: DataFrame, seeds: DataFrame, k: int) -> DataFrame:
    """(vertex, dist) — every vertex within ``k`` UNDIRECTED hops of a seed,
    with its minimum hop distance (seeds themselves at dist 0). The KG
    neighborhood-expansion query (context assembly around an entity, blast-
    radius analysis for a correction batch): SPARQL writes it as a bounded
    property path ``seed (:p|^:p){0,k} ?v``.

    BFS as k rounds of frontier expansion, not a transitive closure: each
    round is one equi-join of the CURRENT frontier against the edge table on
    src (shuffle partitioned on the join key; at 100 TB the edge table is
    bucketed by src so the big side never reshuffles per round), a distinct
    on the (small) frontier output, and an anti-join against the visited set
    — so per-round work is proportional to the frontier, never to the full
    reachability set, and vertices re-reached at a later round are dropped
    rather than relabeled (first reach IS the min distance, the BFS
    invariant). Rounds are a fixed count with eager localCheckpoints cutting
    lineage (the CC/pagerank plan-growth discipline); the visited set is a
    k-deep union of checkpointed frontiers, which stays shallow.
    """
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = (
        seeds.select("vertex").distinct()
        .select("vertex", F.lit(0).cast("int").alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("vertex")
    for i in range(1, k + 1):
        nxt = (
            und.join(frontier.withColumnRenamed("vertex", "src"), "src")
            .select(F.col("dst").alias("vertex"))
            .distinct()
            .join(visited.select("vertex"), "vertex", "left_anti")
            .select("vertex", F.lit(i).cast("int").alias("dist"))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt)
        frontier = nxt.select("vertex")
    return visited


def entity_degrees(edges: DataFrame) -> DataFrame:
    """(vertex, out_degree, in_degree) over the distinct edge set — the
    cheap companion profile (no iteration)."""
    e = edges.select("src", "dst").distinct()
    od = e.groupBy(F.col("src").alias("vertex")).agg(F.count("*").alias("out_degree"))
    ind = e.groupBy(F.col("dst").alias("vertex")).agg(F.count("*").alias("in_degree"))
    return (
        od.join(ind, "vertex", "full")
        .select(
            "vertex",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )
