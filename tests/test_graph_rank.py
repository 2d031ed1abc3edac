"""Semantics tests for fixed-point PageRank + degree profile
(operators/graph_rank.py): hand-computed recurrence on a tiny graph,
integer-mass invariants on the real KG edge set, degree profile fold."""

from pyspark.sql import functions as F

from casualty_linking_spark.operators.graph_rank import (
    DAMPING_PCT, N_ITER, SCALE, entity_degrees, pagerank_fixed_point,
)


def _hand_pagerank(edges, n_iter=N_ITER, d=DAMPING_PCT, scale=SCALE):
    """Reference implementation of the exact integer recurrence."""
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    outdeg = {}
    for s, _ in set(edges):
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: scale // n for v in verts}
    base = ((100 - d) * (scale // n)) // 100
    for _ in range(n_iter):
        push = {v: 0 for v in verts}
        for s, t in set(edges):
            push[t] += r[s] // outdeg[s]
        r = {v: base + (d * push[v]) // 100 for v in verts}
    return r


def test_pagerank_matches_hand_recurrence(spark):
    edges = [("a", "b"), ("b", "a"), ("c", "b"), ("c", "a"), ("d", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.vertex: r.pr for r in pagerank_fixed_point(df).collect()}
    assert got == _hand_pagerank(edges)
    # sink-heavy vertices outrank the dangling-ish tail
    assert got["b"] > got["c"] > got["d"]


def test_pagerank_duplicate_edges_collapse(spark):
    """Multi-edges must not double-push (DISTINCT edge set contract)."""
    once = [("a", "b"), ("b", "a")]
    dup = once + [("a", "b")] * 3
    d1 = spark.createDataFrame(once, "src string, dst string")
    d2 = spark.createDataFrame(dup, "src string, dst string")
    assert (
        {r.vertex: r.pr for r in pagerank_fixed_point(d1).collect()}
        == {r.vertex: r.pr for r in pagerank_fixed_point(d2).collect()}
    )


def test_pagerank_mass_bounded_on_kg_edges(spark):
    """On the real constructed-KG edge set: one row per vertex, positive
    ranks, and total fixed-point mass never exceeds SCALE (floor division
    and dropped dangling mass only ever lose units, never mint them)."""
    from casualty_linking_spark import dims
    from casualty_linking_spark.operators.triples import records_to_triples
    from casualty_linking_spark.queries import build_silver

    rec = build_silver(spark, "/root/testdata/sf0.001")
    g = records_to_triples(rec, dims.dim_cemeteries(spark))
    edges = g.filter(F.col("obj_type") == "uri").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    pr = pagerank_fixed_point(edges)
    rows = pr.collect()
    assert len(rows) == len({r.vertex for r in rows})
    assert all(r.pr > 0 for r in rows)
    assert sum(r.pr for r in rows) <= SCALE


def test_entity_degrees(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "b")], "src string, dst string"
    )
    got = {r.vertex: (r.out_degree, r.in_degree) for r in entity_degrees(df).collect()}
    assert got == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


def test_k_hop_min_distance_on_chain(spark):
    """BFS on the chain a-b-c-d-e (directed a->b etc., traversal undirected):
    seeds {c}, k=2 reaches the whole chain with exact min distances; k=1
    stops at the neighbors."""
    from casualty_linking_spark.operators.graph_rank import k_hop

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("c",)], "vertex string")
    got = {r.vertex: r.dist for r in k_hop(edges, seeds, k=2).collect()}
    assert got == {"c": 0, "b": 1, "d": 1, "a": 2, "e": 2}
    got1 = {r.vertex: r.dist for r in k_hop(edges, seeds, k=1).collect()}
    assert got1 == {"c": 0, "b": 1, "d": 1}


def test_k_hop_shorter_path_wins(spark):
    """A vertex reachable along two paths gets the SHORTER distance, and a
    revisit through a longer path never relabels it (BFS invariant). Here f
    is 1 hop from seed a directly and 3 hops via b-c; multi-edges and
    reverse edges must not duplicate output rows."""
    from casualty_linking_spark.operators.graph_rank import k_hop

    edges = spark.createDataFrame(
        [("a", "f"), ("a", "b"), ("b", "c"), ("c", "f"), ("f", "a"), ("a", "f")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "vertex string")
    rows = k_hop(edges, seeds, k=3).collect()
    assert len(rows) == len({r.vertex for r in rows})  # one row per vertex
    got = {r.vertex: r.dist for r in rows}
    assert got == {"a": 0, "f": 1, "b": 1, "c": 2}


def test_k_hop_disconnected_untouched(spark):
    """Vertices in another component never appear, seeds with no edges stay
    at dist 0."""
    from casualty_linking_spark.operators.graph_rank import k_hop

    edges = spark.createDataFrame([("x", "y")], "src string, dst string")
    seeds = spark.createDataFrame([("lonely",)], "vertex string")
    got = {r.vertex: r.dist for r in k_hop(edges, seeds, k=3).collect()}
    assert got == {"lonely": 0}


def _uedges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src string, dst string")


def test_triangles_k4_enumerates_all_four(spark):
    from casualty_linking_spark.operators.graph_rank import triangles

    vs = ["a", "b", "c", "d"]
    pairs = [(x, y) for i, x in enumerate(vs) for y in vs[i + 1:]]
    out = sorted(tuple(r) for r in triangles(_uedges(spark, pairs)).collect())
    assert out == [
        ("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"), ("b", "c", "d"),
    ]


def test_triangles_square_has_none(spark):
    from casualty_linking_spark.operators.graph_rank import triangles

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    assert triangles(_uedges(spark, pairs)).count() == 0


def test_triangles_hub_star_exactly_once(spark):
    """A high-degree hub with one closing leaf-leaf edge: exactly one
    triangle, found once — degree orientation must not duplicate it via
    the hub's many wedges."""
    from casualty_linking_spark.operators.graph_rank import triangles

    pairs = [tuple(sorted(("h", f"l{i}"))) for i in range(6)] + [("l0", "l1")]
    out = [tuple(r) for r in triangles(_uedges(spark, pairs)).collect()]
    assert out == [("h", "l0", "l1")]


def test_triangles_direction_and_duplicate_insensitive(spark):
    """Mixed-direction duplicates and a self-loop collapse during
    canonicalization instead of inflating degrees or double-counting."""
    from casualty_linking_spark.operators.graph_rank import triangles

    pairs = [("b", "a"), ("a", "b"), ("b", "c"), ("a", "c"), ("c", "c")]
    out = [tuple(r) for r in triangles(_uedges(spark, pairs)).collect()]
    assert out == [("a", "b", "c")]


def test_clustering_coefficient_hand_graph(spark):
    """Triangle + pendant: coefficient 1.0 on the 2-degree corners, 1/3 on
    the corner that also carries the pendant, 0.0 on the degree-1 leaf."""
    from casualty_linking_spark.operators.graph_rank import clustering_coefficient

    e = _uedges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    out = {r.vertex: (r.degree, r.n_triangles, r.coeff)
           for r in clustering_coefficient(e).collect()}
    assert out == {
        "a": (2, 1, 1.0),
        "b": (2, 1, 1.0),
        "c": (3, 1, 0.333333),
        "d": (1, 0, 0.0),
    }


def _wedges(spark, rows):
    return spark.createDataFrame(rows, "uri_a string, uri_b string, weight long")


def test_label_propagation_two_cliques_weak_bridge(spark):
    """Two weight-3 triangles joined by one weight-1 bridge: after 3
    synchronous rounds each triangle converges to its min member label and
    the bridge does NOT merge the communities (hand-unrolled recurrence)."""
    from casualty_linking_spark.operators.graph_rank import label_propagation

    e = _wedges(spark, [
        ("a", "b", 3), ("a", "c", 3), ("b", "c", 3),
        ("x", "y", 3), ("x", "z", 3), ("y", "z", 3),
        ("c", "x", 1),
    ])
    out = {r.uri: r.label for r in label_propagation(e, rounds=3).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_label_propagation_synchronous_tiebreak_deterministic(spark):
    """Path a-b-c with equal weights 2-cycles under SYNCHRONOUS updates
    (the documented bipartite oscillation) — the fixed 3-round horizon
    lands on the hand-unrolled state, identically on every run."""
    from casualty_linking_spark.operators.graph_rank import label_propagation

    e = _wedges(spark, [("a", "b", 1), ("b", "c", 1)])
    # r1: a<-{b}='b'; b<-{a,c} tie->'a'; c<-{b}='b'
    # r2: a<-{b:'a'}='a'; b<-{a:'b', c:'b'}='b'; c<-{b:'a'}='a'
    # r3: a<-'b'; b<-{'a','a'}='a'; c<-'b'
    expect = {"a": "b", "b": "a", "c": "b"}
    for _ in range(2):
        out = {r.uri: r.label for r in label_propagation(e, rounds=3).collect()}
        assert out == expect
