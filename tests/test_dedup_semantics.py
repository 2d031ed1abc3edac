"""Dedup-family semantics on planted duplicates (the driver's documents
table is all-distinct, so these plant their own)."""

import pytest
from pyspark.sql import functions as F


def _docs_with_dups(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    # exact dup: copy doc 0-9 under new ids; near dup: doc 10-19 with one
    # appended token
    exact = docs.filter("doc_id < 10").withColumn("doc_id", F.col("doc_id") + 1000)
    near = (
        docs.filter("doc_id >= 10 and doc_id < 20")
        .withColumn("doc_id", F.col("doc_id") + 2000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extra")))
    )
    return docs.unionByName(exact).unionByName(near)


def test_exact_dedup_groups(spark):
    from casualty_linking_spark.operators.dedup import exact_duplicates

    d = _docs_with_dups(spark)
    out = exact_duplicates(d)
    dup_groups = out.filter("group_size > 1")
    assert dup_groups.count() == 20  # 10 pairs
    # canonical is the min id of each pair
    assert dup_groups.filter("doc_id >= 1000").filter("canonical_id >= 1000").count() == 0


def test_minhash_finds_exact_and_near(spark):
    from casualty_linking_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    d = _docs_with_dups(spark)
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(d).collect()}
    # all 10 exact pairs must be candidates (identical signatures)
    for i in range(10):
        assert (i, i + 1000) in pairs, f"exact dup pair {i} missing"
    # near dups share most shingles -> most pairs surface
    near_hits = sum(1 for i in range(10, 20) if (i, i + 2000) in pairs)
    assert near_hits >= 7, near_hits

    verified = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(d, threshold=0.5).collect()}
    for i in range(10):
        assert verified.get((i, i + 1000)) == 1.0


def test_simhash_equal_for_exact_dups(spark):
    from casualty_linking_spark.operators.dedup import simhash_buckets

    d = _docs_with_dups(spark)
    out = simhash_buckets(d)
    sh = {r.doc_id: r.simhash for r in out.collect()}
    for i in range(10):
        assert sh[i] == sh[i + 1000]
        assert len(sh[i]) == 16 and set(sh[i]) <= set("0123456789abcdef")


def test_simhash_near_dup_pairs_surface_planted_dups(spark):
    from casualty_linking_spark.operators.dedup import simhash_near_dup_pairs

    d = _docs_with_dups(spark)
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_dup_pairs(d, max_hamming=3).collect()}
    # exact dups: identical fingerprints -> hamming 0, always surfaced
    for i in range(10):
        assert pairs.get((i, i + 1000)) == 0, f"exact dup pair {i} missing"


def test_simhash_near_dup_on_long_docs(spark):
    """Simhash's near-dup regime: documents long enough that a one-word edit
    moves few majority votes (the 40-word corpus docs flip 4-8 bits per extra
    token — simhash is a long-document fingerprint, minhash covers shorts)."""
    from casualty_linking_spark.operators.dedup import simhash_near_dup_pairs

    words = [f"tok{i}" for i in range(400)]
    rows = [
        (1, " ".join(words)),
        (2, " ".join(words[:-1] + ["changedtoken"])),  # one word replaced
        (3, " ".join(f"other{i}" for i in range(400))),  # unrelated
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_dup_pairs(d).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3, pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_hamming_bound_respected(spark):
    from casualty_linking_spark.operators.dedup import simhash_near_dup_pairs

    d = _docs_with_dups(spark)
    assert simhash_near_dup_pairs(d, max_hamming=3).filter("hamming > 3").count() == 0


def test_ann_self_is_top1(spark):
    from casualty_linking_spark.operators.similarity_search import brute_force_topk, lsh_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter("vec_id < 3").select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    top = brute_force_topk(e, q, k=3)
    firsts = {r.query_id: r.vec_id for r in top.filter("rank = 1").collect()}
    assert firsts == {0: 0, 1: 1, 2: 2}

    # LSH candidates always contain the vector itself (same bucket) -> top1 = self
    ltop = lsh_topk(e, q, dim=64, k=3)
    lfirsts = {r.query_id: r.vec_id for r in ltop.filter("rank = 1").collect()}
    assert lfirsts == {0: 0, 1: 1, 2: 2}


def test_ivf_full_probe_equals_brute(spark):
    """Probing every cell makes IVF exact: candidates = whole corpus, so the
    result must be identical to brute force (the IVF plumbing adds nothing
    but the cell routing)."""
    from casualty_linking_spark.operators.similarity_search import (
        N_IVF_CELLS,
        brute_force_topk,
        ivf_topk,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter("vec_id < 3").select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    brute = {(r.query_id, r.rank, r.vec_id) for r in brute_force_topk(e, q, k=5).collect()}
    full = {(r.query_id, r.rank, r.vec_id) for r in ivf_topk(e, q, k=5, n_probe=N_IVF_CELLS).collect()}
    assert full == brute


def test_multiprobe_superset_of_plain_lsh(spark):
    """probe_bits=1 candidates strictly contain the probe_bits=0 candidates,
    so recall can only go up: every plain-LSH hit must also be found (with
    rank possibly improved, never lost below k with a larger pool)."""
    from casualty_linking_spark.operators.similarity_search import lsh_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter("vec_id < 3").select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    plain = lsh_topk(e, q, dim=64, k=1000, probe_bits=0)
    multi = lsh_topk(e, q, dim=64, k=1000, probe_bits=1)
    plain_set = {(r.query_id, r.vec_id) for r in plain.collect()}
    multi_set = {(r.query_id, r.vec_id) for r in multi.collect()}
    assert plain_set <= multi_set
    # self is always in its own (unflipped) bucket
    assert {(r.query_id, r.vec_id) for r in multi.filter("rank = 1").collect()} == {
        (0, 0), (1, 1), (2, 2)}


def test_ivf_kmeans_centroids_full_probe_equals_brute(spark):
    """The full-probe==brute-force invariant holds for ANY centroid set —
    including trained k-means centers (the production quantizer). Also
    checks the kmeans helper emits the (cell_id, cv) contract shape."""
    pytest.importorskip("pyspark.ml")
    from casualty_linking_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter("vec_id < 3").select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    cents = kmeans_centroids(e, n_cells=4, seed=1)
    assert set(cents.columns) == {"cell_id", "cv"} and cents.count() == 4
    brute = {(r.query_id, r.rank, r.vec_id) for r in brute_force_topk(e, q, k=5).collect()}
    full = {
        (r.query_id, r.rank, r.vec_id)
        for r in ivf_topk(e, q, k=5, n_probe=4, centroids=cents).collect()
    }
    assert full == brute


def test_exact_dedup_keeps_null_text_docs(spark):
    """md5(NULL) is NULL; the null-safe join must keep NULL-text docs as one
    group (the DuckDB oracle's PARTITION BY md5(text) groups them too — a
    plain equi-join would silently drop them)."""
    from casualty_linking_spark.operators.dedup import exact_duplicates

    d = _docs_with_dups(spark)
    nulls = d.filter("doc_id < 2").withColumn("doc_id", F.col("doc_id") + 5000).withColumn(
        "text", F.lit(None).cast("string")
    )
    out = exact_duplicates(d.unionByName(nulls))
    null_rows = out.filter("doc_id >= 5000").collect()
    assert len(null_rows) == 2
    assert all(r.text_hash is None for r in null_rows)
    assert all(r.canonical_id == 5000 and r.group_size == 2 for r in null_rows)
    # and NULL-text docs never merge with real-text groups
    assert out.filter("doc_id < 5000").filter("text_hash IS NULL").count() == 0


def test_simhash_null_and_empty_text_fold_to_zero_fingerprint(spark):
    from casualty_linking_spark.operators.dedup import simhash_buckets

    d = _docs_with_dups(spark).limit(5)
    extra = spark.createDataFrame(
        [(9001, None), (9002, "")], "doc_id bigint, text string"
    )
    out = simhash_buckets(d.select("doc_id", "text").unionByName(extra))
    zeros = {r.doc_id: r.simhash for r in out.filter("doc_id >= 9000").collect()}
    assert zeros == {9001: "0" * 16, 9002: "0" * 16}


def test_lsh_probe_bits_validated(spark):
    """probe_bits outside [0, 2] must raise, not silently cap (silent capping
    under-reports the recall the caller thinks they measured)."""
    from casualty_linking_spark.operators.similarity_search import lsh_probe_keys, lsh_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter("vec_id < 1").select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    for bad in (3, -1):
        with pytest.raises(ValueError, match="probe_bits"):
            lsh_probe_keys(F.col("qv"), 64, 0, probe_bits=bad)
        with pytest.raises(ValueError, match="probe_bits"):
            lsh_topk(e, q, dim=64, probe_bits=bad)


def test_ivf_kmeans_beats_uniform_floor_on_clustered_corpus(spark):
    """On a corpus with real cluster structure, the trained-KMeans quantizer
    recovers (nearly) all true neighbors at a small probe count — the
    measured claim behind kmeans_centroids' docstring (full curve:
    BENCH/ann_recall.py --clustered, committed in BENCH/ANN_RECALL.md)."""
    pytest.importorskip("pyspark.ml")
    import numpy as np

    from casualty_linking_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(7)
    n_clusters, per_cluster, dim = 8, 60, 16
    centers = rng.normal(0.0, 1.0, (n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    corpus, queries = [], []
    vid = 0
    for c in range(n_clusters):
        for p in centers[c] + rng.normal(0.0, 0.15, (per_cluster, dim)):
            corpus.append((vid, [float(x) for x in p]))
            vid += 1
        qp = centers[c] + rng.normal(0.0, 0.15, dim)
        queries.append((c, [float(x) for x in qp]))
    emb = spark.createDataFrame(corpus, "vec_id bigint, embedding array<double>")
    q = spark.createDataFrame(queries, "query_id bigint, qv array<double>")

    truth = {(r.query_id, r.vec_id) for r in brute_force_topk(emb, q, k=5).collect()}
    cents = kmeans_centroids(emb, n_cells=n_clusters, seed=1)
    got = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, q, k=5, n_probe=2, centroids=cents).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"clustered-corpus recall@5 at n_probe=2 was {recall}"


def test_near_dup_clusters_transitive(spark):
    """A~B and B~C must land in ONE cluster even if A~C never surfaced as an
    LSH pair; untouched docs stay singleton components of themselves."""
    from casualty_linking_spark.operators.dedup import near_dup_clusters

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    chain_b = base.filter("doc_id = 0").withColumn("doc_id", F.lit(3000)).withColumn(
        "text", F.concat(F.col("text"), F.lit(" b"))
    )
    chain_c = base.filter("doc_id = 0").withColumn("doc_id", F.lit(3001)).withColumn(
        "text", F.concat(F.col("text"), F.lit(" b c"))
    )
    d = base.unionByName(chain_b).unionByName(chain_c)
    comp = {r.doc_id: r.component for r in near_dup_clusters(d).collect()}
    assert len(comp) == 22
    assert comp[0] == comp[3000] == comp[3001] == 0
    # docs 8 and 12 are organically near-dup in the sf0.001 corpus (their
    # LSH pair also appears in dedup_minhash_lsh's oracle-checked output)
    assert comp[12] == comp[8] == 8
    untouched = [i for i in comp if i not in (0, 3000, 3001, 8, 12)]
    assert all(comp[i] == i for i in untouched)


def test_incremental_dedup_tiers_and_precedence(spark):
    """Planted batch-vs-corpus ingest: the exact tier (md5, null-safe), the
    near tier (band candidates + exact-Jaccard argmax), 'exact' precedence
    when both fire, and 'unique' for unmatched docs. The contract query
    exercises the cross-split tiers that occur organically (sf0.1 has all
    three verdicts); this pins the ones sparse at small SF."""
    from casualty_linking_spark.operators.dedup import incremental_dedup

    long_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    long_a_near = long_a.replace("alpha3", "ALTERED", 1)
    corpus = spark.createDataFrame(
        [
            (10, long_a),
            (11, long_a),            # duplicate group in the corpus itself
            (12, "totally different words entirely"),
            (13, None),              # NULL-text corpus doc
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, long_a),           # exact dup (and trivially near) -> 'exact', min id 10
            (101, long_a_near),      # near dup of 10/11 -> argmax jaccard, tie -> min id
            (102, "completely unrelated content here"),  # unique
            (103, None),             # NULL text matches corpus NULL -> exact 13
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in incremental_dedup(corpus, batch).collect()}
    assert len(out) == 4

    assert out[100].verdict == "exact" and out[100].exact_dup_of == 10
    assert out[101].verdict == "near" and out[101].exact_dup_of is None
    assert out[101].near_dup_of == 10 and 0.5 <= out[101].near_jaccard < 1.0
    assert out[102].verdict == "unique"
    assert out[102].exact_dup_of is None and out[102].near_dup_of is None
    assert out[103].verdict == "exact" and out[103].exact_dup_of == 13


def test_incremental_dedup_batch_never_pairs_with_itself(spark):
    """Two identical docs arriving in the SAME batch are both 'unique' when
    the corpus holds no copy — intra-batch dedup is the following round's
    corpus-vs-batch job, not this operator's (it must not silently collapse
    a batch internally)."""
    from casualty_linking_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "some corpus text that matches nothing")], "doc_id long, text string"
    )
    twin = " ".join(f"tok{i}" for i in range(30))
    batch = spark.createDataFrame(
        [(200, twin), (201, twin)], "doc_id long, text string"
    )
    out = {r.doc_id: r.verdict for r in incremental_dedup(corpus, batch).collect()}
    assert out == {200: "unique", 201: "unique"}


def test_incremental_dedup_intra_batch_tiers(spark):
    """intra_batch=True: sequential-ingest semantics. A batch doc also dedups
    against EARLIER batch docs (smaller doc_id); the exact canonical is the
    min over corpus copies (any id) and earlier batch copies; earlier batch
    docs never point at later ones; NULL texts group null-safely intra-batch
    too."""
    from casualty_linking_spark.operators.dedup import incremental_dedup

    long_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    long_a_near = long_a.replace("alpha3", "ALTERED", 1)
    twin = " ".join(f"tok{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(50, long_a), (51, "totally different corpus words entirely")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (5, long_a),        # matches corpus 50 AND is earliest batch copy
            (200, twin),        # first twin -> unique
            (201, twin),        # second twin -> exact dup of 200 (intra)
            (202, long_a),      # copies at corpus 50 and batch 5 -> min = 5
            (203, long_a_near), # near dup: candidates 50 (corpus), 5/202
                                # (batch, equal jaccard) -> tie to min id 5
            (204, None),        # first NULL -> unique (no NULL in corpus)
            (205, None),        # second NULL -> exact dup of 204
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in incremental_dedup(corpus, batch, intra_batch=True).collect()
    }
    assert len(out) == 7
    assert out[5].verdict == "exact" and out[5].exact_dup_of == 50
    assert out[200].verdict == "unique"
    assert out[201].verdict == "exact" and out[201].exact_dup_of == 200
    assert out[202].verdict == "exact" and out[202].exact_dup_of == 5
    assert out[203].verdict == "near" and out[203].exact_dup_of is None
    assert out[203].near_dup_of == 5 and 0.5 <= out[203].near_jaccard < 1.0
    assert out[204].verdict == "unique"
    assert out[205].verdict == "exact" and out[205].exact_dup_of == 204

    # default stays corpus-only: same input without the flag leaves the
    # intra-only dups untouched
    dflt = {r.doc_id: r.verdict for r in incremental_dedup(corpus, batch).collect()}
    assert dflt[201] == "unique" and dflt[205] == "unique"


def _convs(spark, convs):
    """convs: dict conv_id -> list of turn texts."""
    import datetime as dt

    rows = []
    ts = dt.datetime(2024, 1, 1)
    for cid, turns in convs.items():
        for i, t in enumerate(turns):
            rows.append((cid, i, "user" if i % 2 == 0 else "assistant", t, None, ts))
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_conversation_near_dup_spread_across_turns(spark):
    """A re-rolled conversation that shares every turn but one is invisible
    to per-document dedup (each turn differs from every other doc) but must
    surface at the conversation granularity."""
    from casualty_linking_spark.operators.dedup import conversation_jaccard_pairs

    base = [
        "please summarize the quarterly report for the finance team today",
        "the quarterly report shows revenue growth across all finance segments",
        "now draft an email to the finance team about the revenue growth",
        "subject quarterly results body revenue grew across all segments this quarter",
    ]
    # one changed word -> shingle jaccard 0.833, which deterministically
    # shares an LSH band under the fixed md5 seeds (verified offline); a
    # lower-overlap reroll may legitimately miss the 4x3 s-curve (~0.63)
    rerolled = list(base)
    rerolled[3] = "subject quarterly results body revenue grew across all regions this quarter"
    t = _convs(spark, {"orig": base, "reroll": rerolled, "other": [
        "completely different topic about gardening and soil preparation in spring",
        "tomatoes need full sun and regular watering to thrive in summer",
    ]})
    out = {(r.conv_a, r.conv_b): r.jaccard for r in conversation_jaccard_pairs(t, 0.5).collect()}
    assert ("orig", "reroll") in out
    assert 0.5 <= out[("orig", "reroll")] < 1.0
    assert all("other" not in k for k in out)


def test_conversation_identical_sets_jaccard_one(spark):
    """Same turn texts in a different turn order: the shingle SET union is
    identical, so jaccard == 1.0 (near-dup is order-insensitive by design)."""
    from casualty_linking_spark.operators.dedup import conversation_jaccard_pairs

    turns = [
        "alpha beta gamma delta epsilon zeta",
        "eta theta iota kappa lambda mu",
    ]
    t = _convs(spark, {"a": turns, "b": list(reversed(turns))})
    out = conversation_jaccard_pairs(t, 0.5).collect()
    assert len(out) == 1 and out[0].jaccard == 1.0


def test_conversation_null_text_turns_ignored(spark):
    """NULL-text turns (pure tool calls) contribute no shingles and don't
    break the pair."""
    from casualty_linking_spark.operators.dedup import conversation_jaccard_pairs

    turns = ["run the numbers for quarter four please now", None,
             "the totals are ready in the shared sheet now"]
    t = _convs(spark, {"a": turns, "b": turns})
    out = conversation_jaccard_pairs(t, 0.5).collect()
    assert len(out) == 1 and out[0].jaccard == 1.0
