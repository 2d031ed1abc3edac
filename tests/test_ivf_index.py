"""On-disk IVF index: write-time cell partitioning + partition-pruned reads.

The in-memory operator (``ivf_topk``) proves the algorithm; these tests
prove the 100 TB storage claim — cells are PHYSICAL parquet partitions and
a query's scan touches only the probed directories.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from casualty_linking_spark.operators.similarity_search import (
    N_IVF_PROBE,
    ivf_seed_centroids,
    ivf_topk,
    ivf_topk_indexed,
    ivf_write,
    kmeans_centroids,
)

SF = "/root/testdata/sf0.001"


def _embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _queries(spark, n=5):
    return (
        _embs(spark)
        .filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    )


def _rows(df):
    return sorted((r.query_id, r.rank, r.vec_id, r.cosine) for r in df.collect())


def test_indexed_equals_in_memory(spark, tmp_path):
    """ivf_topk_indexed over the written index == ivf_topk with the same
    (deterministic) centroids — materialization must not change results."""
    emb, q = _embs(spark), _queries(spark)
    ivf_write(emb, str(tmp_path))
    got = _rows(ivf_topk_indexed(spark, str(tmp_path), q, k=5))
    want = _rows(ivf_topk(emb, q, k=5))
    assert got == want and len(got) > 0


def test_indexed_equals_in_memory_kmeans(spark, tmp_path):
    """Same invariant under the trained-KMeans quantizer (the production
    centroid path)."""
    pytest.importorskip("pyspark.ml")
    emb, q = _embs(spark), _queries(spark, n=3)
    cents = kmeans_centroids(emb, n_cells=8, seed=1).localCheckpoint(eager=True)
    ivf_write(emb, str(tmp_path), centroids=cents)
    got = _rows(ivf_topk_indexed(spark, str(tmp_path), q, k=5, n_probe=2))
    want = _rows(ivf_topk(emb, q, k=5, n_probe=2, centroids=cents))
    assert got == want and len(got) > 0


def _scan_file_listing(df):
    """The parquet scan leaf's post-pruning file listing (partitionCount /
    totalNumberOfFiles) — what the scan will actually read from disk, after
    partition pruning, before any execution."""
    plan = df._jdf.queryExecution().sparkPlan()

    def walk(n):
        yield n
        ch = n.children()
        for i in range(ch.length()):
            yield from walk(ch.apply(i))

    for n in walk(plan):
        if "Scan" in n.nodeName():
            return n.selectedPartitions()
    raise AssertionError("no parquet scan in plan")


def test_scan_is_partition_pruned(spark, tmp_path):
    """The probed-cells filter must reach the parquet source as a partition
    filter: the scan's selected file listing shrinks to the probed
    directories (directory pruning before execution), and the plan carries
    it as PartitionFilters, not a post-scan Filter over all cells."""
    emb = _embs(spark)
    ivf_write(emb, str(tmp_path))
    cells = spark.read.parquet(f"{tmp_path}/cells")
    all_ids = sorted(r["cell_id"] for r in cells.select("cell_id").distinct().collect())
    assert len(all_ids) > 2  # fixture sanity: pruning must have something to prune
    pruned = cells.filter(F.col("cell_id").isin(all_ids[:2]))
    full, sel = _scan_file_listing(cells), _scan_file_listing(pruned)
    assert sel.partitionCount() == 2
    assert full.partitionCount() == len(all_ids)
    assert 0 < sel.totalNumberOfFiles() < full.totalNumberOfFiles()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_id" in plan.split("PartitionFilters", 1)[1][:200]


def test_every_corpus_vector_in_exactly_one_cell(spark, tmp_path):
    emb = _embs(spark)
    ivf_write(emb, str(tmp_path))
    cells = spark.read.parquet(f"{tmp_path}/cells")
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()


def test_full_probe_indexed_equals_brute(spark, tmp_path):
    """Probing every cell of the on-disk index is exactly brute force —
    the index never loses a vector."""
    from casualty_linking_spark.operators.similarity_search import brute_force_topk

    emb, q = _embs(spark), _queries(spark, n=3)
    cents = ivf_seed_centroids(emb, n_cells=4).localCheckpoint(eager=True)
    ivf_write(emb, str(tmp_path), centroids=cents)
    got = _rows(ivf_topk_indexed(spark, str(tmp_path), q, k=5, n_probe=4))
    want = _rows(
        brute_force_topk(
            emb, q.select("query_id", F.col("qv")), k=5
        )
    )
    assert got == want


def test_cell_assignment_is_shuffle_free(spark):
    """Corpus→cell assignment must be a per-row expression, not a
    join+window: no Exchange anywhere in its physical plan (the old shape
    multiplied the corpus ×n_cells and shuffled it by vec_id — a full
    corpus shuffle per index build at 100 TB)."""
    from casualty_linking_spark.operators.similarity_search import (
        _as_double,
        _assign_cells,
    )

    emb = _embs(spark)
    corpus = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    cents = ivf_seed_centroids(emb, n_cells=4)
    assigned = _assign_cells(corpus, "vec_id", "v", cents, n_keep=1)
    plan = assigned._jdf.queryExecution().sparkPlan().toString()
    assert "Exchange" not in plan, plan


def test_literal_and_join_assignment_agree(spark):
    """The literal-expression path and the large-centroid-set join+window
    fallback must produce identical (id, cell) assignments, including the
    score-then-cell_id tie-break."""
    from casualty_linking_spark.operators.similarity_search import (
        _as_double,
        _assign_cells,
        _assign_cells_join,
    )

    emb = _embs(spark)
    corpus = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    cents = ivf_seed_centroids(emb, n_cells=8).localCheckpoint(eager=True)
    for n_keep in (1, 3):
        lit = sorted(
            (r.vec_id, r.cell_id)
            for r in _assign_cells(corpus, "vec_id", "v", cents, n_keep).collect()
        )
        join = sorted(
            (r.vec_id, r.cell_id)
            for r in _assign_cells_join(corpus, "vec_id", "v", cents, n_keep).collect()
        )
        assert lit == join and len(lit) > 0


def test_contract_query_matches_plain_ivf(spark):
    """The ann_ivf_indexed contract entry returns the same rows as
    ann_ivf_topk (they share one oracle)."""
    from casualty_linking_spark.queries import q_ann_ivf_indexed, q_ann_ivf_topk

    got = _rows(q_ann_ivf_indexed(spark, SF))
    want = _rows(q_ann_ivf_topk(spark, SF))
    assert got == want and len(got) > 0


def test_ivf_append_equals_rebuild(spark, tmp_path):
    """Incremental maintenance: write half the corpus, append the rest
    against the index's persisted quantizer — queries over the appended
    index match a one-shot build with the same centroids exactly."""
    from casualty_linking_spark.operators.similarity_search import ivf_append

    embs = _embs(spark)
    cents = ivf_seed_centroids(embs)
    half_a = embs.filter(F.col("vec_id") % 2 == 0)
    half_b = embs.filter(F.col("vec_id") % 2 == 1)

    full_path = str(tmp_path / "full")
    incr_path = str(tmp_path / "incr")
    ivf_write(embs, full_path, centroids=cents)
    ivf_write(half_a, incr_path, centroids=cents)
    ivf_append(half_b, incr_path)

    q = _queries(spark)
    assert _rows(ivf_topk_indexed(spark, incr_path, q)) == _rows(
        ivf_topk_indexed(spark, full_path, q)
    )
