"""Approximate-nearest-neighbor search over the ``embeddings`` table.

* ``brute_force_topk`` — exact cosine top-k: broadcast the query set, one
  pass over the corpus, per-query window top-k. The correctness baseline.
* ``lsh_topk`` — random-hyperplane LSH: sign-bit bucket key from fixed
  deterministic hyperplanes, candidates share a bucket (multi-probe via
  several tables), then exact re-rank. The 100 TB path: the corpus is
  bucketed once (write-time partitioning in production) and each query
  touches only its buckets instead of the full scan.

All vector math is JVM-side (zip_with/aggregate over array<double>) —
vectorized codegen, no Python. Scores are computed in float64 with a fixed
left-fold order so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

N_PLANES = 8  # bits per LSH table
N_TABLES = 2


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """queries(query_id, qv array<float>) x corpus -> (query_id, rank,
    vec_id, cosine). Query side is broadcast; corpus never shuffles until
    the tiny top-k aggregation."""
    corpus = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    q = queries.select("query_id", _as_double(F.col("qv")).alias("qv"))
    scored = corpus.join(F.broadcast(q)).withColumn("cosine", cosine(F.col("qv"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def _hyperplane(dim: int, plane: int, table: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: value[i] = ±1 from a hash of
    (table, plane, i) — reproducible in any engine, no RNG state."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(f"{table}:{plane}:{i}".encode()).digest()[0]
        out.append(1.0 if h % 2 == 0 else -1.0)
    return out


def _bucket_bits(v: Column, dim: int, table: int, n_planes: int = N_PLANES) -> list[Column]:
    """Sign-bit columns ('1'/'0') for one LSH table's hyperplanes."""
    bits = []
    for p in range(n_planes):
        plane = _hyperplane(dim, p, table)
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in plane]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return bits


def lsh_bucket_key(v: Column, dim: int, table: int, n_planes: int = N_PLANES) -> Column:
    """Sign-bit bucket key for one LSH table."""
    return F.concat(F.lit(f"t{table}:"), *_bucket_bits(v, dim, table, n_planes))


def lsh_probe_keys(
    v: Column, dim: int, table: int, n_planes: int = N_PLANES, probe_bits: int = 1
) -> Column:
    """Multi-probe bucket keys for the QUERY side: the exact bucket plus all
    buckets within Hamming distance ``probe_bits`` of it (probe_bits<=2
    supported — 1+P+P(P-1)/2 keys). Probing neighbor buckets recovers the
    near neighbors that landed one sign-flip away, the standard multi-probe
    LSH trick (Lv et al., VLDB'07) — recall of several extra tables for the
    memory cost of one.
    """
    if not 0 <= probe_bits <= 2:
        raise ValueError(
            f"probe_bits must be 0, 1 or 2 (got {probe_bits}): Hamming>2 probe "
            "expansion is unimplemented and silently capping would under-report recall"
        )
    bits = _bucket_bits(v, dim, table, n_planes)

    def key(flip: tuple[int, ...]) -> Column:
        parts = [
            F.when(b == "1", F.lit("0")).otherwise(F.lit("1")) if i in flip else b
            for i, b in enumerate(bits)
        ]
        return F.concat(F.lit(f"t{table}:"), *parts)

    keys = [key(())]
    if probe_bits >= 1:
        keys += [key((i,)) for i in range(n_planes)]
    if probe_bits >= 2:
        keys += [key((i, j)) for i in range(n_planes) for j in range(i + 1, n_planes)]
    return F.array(*keys)


def lsh_topk(
    embeddings: DataFrame, queries: DataFrame, dim: int, k: int = 5,
    n_tables: int = N_TABLES, n_planes: int = N_PLANES, probe_bits: int = 0,
) -> DataFrame:
    """Bucketed ANN: candidates share an LSH bucket in any table; exact
    cosine re-rank inside the candidate set. ``n_tables`` / ``n_planes`` /
    ``probe_bits`` are the recall/cost knobs — measured recall@10 and
    candidate fraction vs the brute-force ground truth live in
    BENCH/ANN_RECALL.md. Multi-probe expands only the (tiny, broadcast)
    query side; the corpus is still keyed exactly once per table."""
    if not 0 <= probe_bits <= 2:
        raise ValueError(f"probe_bits must be 0, 1 or 2 (got {probe_bits})")
    corpus = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    q = queries.select("query_id", _as_double(F.col("qv")).alias("qv"))
    # ONE corpus scan for all tables: explode the per-table key array (keys
    # are "t{table}:"-prefixed, so the keyed-row multiset is identical to
    # the previous per-table union, which re-read the corpus n_tables times)
    c_all = corpus.select(
        "vec_id", "v",
        F.explode(
            F.array(*[lsh_bucket_key(F.col("v"), dim, t, n_planes) for t in range(n_tables)])
        ).alias("bucket"),
    )
    # query side likewise: one scan, per-table key arrays concatenated then
    # exploded (probe expansion stays query-side only)
    if probe_bits > 0:
        key_arrays = [
            lsh_probe_keys(F.col("qv"), dim, t, n_planes, probe_bits) for t in range(n_tables)
        ]
    else:
        key_arrays = [
            F.array(lsh_bucket_key(F.col("qv"), dim, t, n_planes)) for t in range(n_tables)
        ]
    q_all = q.select(
        "query_id", "qv", F.explode(F.concat(*key_arrays)).alias("bucket")
    )

    cands = c_all.join(F.broadcast(q_all.select("query_id", "qv", "bucket")), "bucket").dropDuplicates(
        ["query_id", "vec_id"]
    )
    scored = cands.withColumn("cosine", cosine(F.col("qv"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


N_IVF_CELLS = 16
N_IVF_PROBE = 4


def ivf_seed_centroids(embeddings: DataFrame, n_cells: int = N_IVF_CELLS) -> DataFrame:
    """Deterministic coarse quantizer for :func:`ivf_topk`: the ``n_cells``
    corpus vectors with the smallest ``md5(vec_id)`` (a deterministic random
    sample — reproducible in any engine, no k-means RNG state, so the DuckDB
    oracle can rebuild the identical index). The production path swaps in
    trained k-means centroids (``pyspark.ml.clustering.KMeans``) via the
    ``centroids`` argument of ``ivf_topk`` — everything downstream is
    centroid-agnostic."""
    return (
        embeddings.select("vec_id", _as_double(F.col("embedding")).alias("cv"))
        .orderBy(F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc())
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell_id"), "cv")
    )


def kmeans_centroids(embeddings: DataFrame, n_cells: int = N_IVF_CELLS, seed: int = 1) -> DataFrame:
    """Production coarse quantizer for :func:`ivf_topk`: k-means cluster
    centers trained with ``pyspark.ml.clustering.KMeans`` (seeded). Returns
    the same (cell_id, cv) shape as :func:`ivf_seed_centroids`, so it drops
    straight into ``ivf_topk(centroids=...)``. On clustered corpora this
    moves the recall/candidate-fraction curve well above the uniform-data
    floor documented in BENCH/ANN_RECALL.md. Not oracle-checked (k-means is
    engine-specific); the full-probe==brute-force invariant is tested for
    arbitrary centroid sets instead."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = embeddings.sparkSession
    feats = embeddings.select(
        array_to_vector(_as_double(F.col("embedding"))).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(feats)
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell_id int, cv array<double>",
    )
    return centers


# Above this many (cell, dim) literals the per-row expression tree gets big
# enough to slow planning; fall back to the join+window shape, which AQE
# handles fine at moderate centroid counts.
_LITERAL_CENTROID_BUDGET = 64 * 1024


def _assign_cells(side: DataFrame, id_col: str, v_col: str, centroids: DataFrame, n_keep: int) -> DataFrame:
    """Rank centroids by cosine for each vector, keep the top ``n_keep``
    cells.

    Centroids are collected to a LITERAL array (bounded by index geometry —
    ≤ n_cells entries, never data-sized) and the top cells are computed as
    one per-row JVM expression: transform → array_sort (score desc, cell_id
    asc — the same tie-break the oracle's row_number uses) → slice. For the
    corpus side this is the difference that matters at 100 TB: the previous
    broadcast-join + ``Window.partitionBy(vec_id)`` shape multiplied the
    corpus ×n_cells and then SHUFFLED it by vec_id just to pick each row's
    argmax; this shape is shuffle-free and stays inside whole-stage codegen
    (asserted in tests/test_ivf_index.py::test_cell_assignment_is_shuffle_free).
    Very large centroid sets (beyond ``_LITERAL_CENTROID_BUDGET`` literals)
    take the old join+window path instead of inflating the plan.

    Ranking is NaN-normalized in BOTH paths (``nanvl(cos, -2.0)`` — below
    any real cosine): a zero-norm vector yields a NaN cosine, and Spark's
    comparator ``F.when`` branches vs a Window ``orderBy`` would otherwise
    rank NaN differently, letting the two paths pick different cells for
    the same row."""
    # budget peek BEFORE any collect: when the literal path can't plan well,
    # never pull the (large) centroid set onto the driver at all.
    first = centroids.select(F.size("cv").alias("d")).first()
    dim = int(first["d"]) if first else 0
    if dim and centroids.count() * dim > _LITERAL_CENTROID_BUDGET:
        return _assign_cells_join(side, id_col, v_col, centroids, n_keep)
    cents = sorted((r["cell_id"], [float(x) for x in r["cv"]]) for r in centroids.collect())
    cent_arr = F.array(*[
        F.struct(
            F.lit(cid).alias("cell_id"),
            F.array(*[F.lit(x) for x in cv]).alias("cv"),
        )
        for cid, cv in cents
    ])
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.nanvl(cosine(F.col(v_col), c["cv"]), F.lit(-2.0)).alias("s"),
            c["cell_id"].alias("cell_id"),
        ),
    )
    ranked = F.array_sort(
        scored,
        lambda l, r: F.when(l["s"] > r["s"], -1)
        .when(l["s"] < r["s"], 1)
        .when(l["cell_id"] < r["cell_id"], -1)
        .when(l["cell_id"] > r["cell_id"], 1)
        .otherwise(0),
    )
    return (
        side.select(id_col, v_col, F.explode(F.slice(ranked, 1, n_keep)).alias("_cell"))
        .select(id_col, v_col, F.col("_cell.cell_id").alias("cell_id"))
    )


def _assign_cells_join(side: DataFrame, id_col: str, v_col: str, centroids: DataFrame, n_keep: int) -> DataFrame:
    """Join+window fallback for very large centroid sets (the big side is
    multiplied ×n_cells and shuffled by its id for the per-row argmax —
    only acceptable when the literal-expression path would not plan well)."""
    scored = side.join(F.broadcast(centroids)).withColumn(
        "cell_cos", F.nanvl(cosine(F.col(v_col), F.col("cv")), F.lit(-2.0))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cell_cos").desc(), F.col("cell_id").asc())
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= n_keep)
        .drop("cv", "cell_cos", "cell_rank")
    )


def ivf_write(
    embeddings: DataFrame, path: str,
    n_cells: int = N_IVF_CELLS, centroids: DataFrame | None = None,
) -> None:
    """Materialize the IVF index ON DISK: corpus vectors assigned to their
    nearest cell, written as parquet ``partitionBy(cell_id)`` — one
    directory per Voronoi cell — plus the quantizer itself under
    ``<path>/centroids`` so any reader rebuilds the identical index.

    This is the write half of the 100 TB design :func:`ivf_topk`'s
    docstring describes: with cells as *physical* partitions, a query
    touches ``n_probe/n_cells`` of the corpus at the parquet-scan level
    (partition pruning — see :func:`ivf_topk_indexed`), not merely in
    memory after a full read. Rebuilding the index is a single corpus pass
    (broadcast centroid join + per-row argmax + partitioned write); the
    reference has no ANN operator — the IVF pattern follows FAISS
    (Johnson et al. 2017) re-expressed as parquet partitioning."""
    corpus = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    cents = centroids if centroids is not None else ivf_seed_centroids(embeddings, n_cells)
    assigned = _assign_cells(corpus, "vec_id", "v", cents, n_keep=1)
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(f"{path}/cells")
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_append(embeddings: DataFrame, path: str) -> None:
    """Incrementally add vectors to an existing on-disk IVF index: assign
    against the index's OWN persisted quantizer (never a recomputed one —
    cell geometry must stay frozen or old cells silently mean something
    else) and append into the matching cell directories with dynamic
    partition overwrite semantics turned OFF (mode=append touches only the
    new files). A 100 TB ingest runs this per arriving batch; queries see
    the union immediately because :func:`ivf_topk_indexed` reads whatever
    the probed directories contain. Rebalancing (centroid drift after many
    appends) is an explicit :func:`ivf_write` rebuild, not an implicit
    side effect."""
    spark = embeddings.sparkSession
    cents = spark.read.parquet(f"{path}/centroids")
    corpus = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    assigned = _assign_cells(corpus, "vec_id", "v", cents, n_keep=1)
    assigned.write.mode("append").partitionBy("cell_id").parquet(f"{path}/cells")


def ivf_topk_indexed(
    spark, path: str, queries: DataFrame, k: int = 5, n_probe: int = N_IVF_PROBE,
) -> DataFrame:
    """Top-k over the on-disk IVF index written by :func:`ivf_write`.

    The probed cell ids become a static ``IN`` filter on the partition
    column, so the scan prunes to the probed directories — visible as
    ``PartitionFilters: [cell_id IN (...)]`` in ``.explain`` and as a
    shrunken scan file listing (both asserted in
    tests/test_ivf_index.py). The driver-side ``collect`` here is of cell
    ids only, bounded by index *geometry* (≤ n_cells ints, typically
    16–65536), never by data size. Results are identical to
    :func:`ivf_topk` with the same centroids (oracle-checked as
    ``ann_ivf_indexed``)."""
    cents = spark.read.parquet(f"{path}/centroids")
    q = queries.select("query_id", _as_double(F.col("qv")).alias("qv"))
    q_cells = _assign_cells(q, "query_id", "qv", cents, n_keep=n_probe)
    probe_ids = sorted(r["cell_id"] for r in q_cells.select("cell_id").distinct().collect())
    corpus = spark.read.parquet(f"{path}/cells").filter(F.col("cell_id").isin(probe_ids))
    cands = corpus.join(F.broadcast(q_cells), "cell_id")
    scored = cands.withColumn("cosine", cosine(F.col("qv"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    n_cells: int = N_IVF_CELLS, n_probe: int = N_IVF_PROBE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat ANN: the corpus is partitioned into ``n_cells`` Voronoi
    cells of a coarse quantizer (assignment = one broadcast join, argmax
    cosine); each query probes its ``n_probe`` nearest cells and re-ranks
    exactly inside them. At 100 TB the cell id is the write-time partition
    key, so a query reads ``n_probe/n_cells`` of the corpus — scan cost and
    recall both scale with ``n_probe`` (measured in BENCH/ANN_RECALL.md)."""
    corpus = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    q = queries.select("query_id", _as_double(F.col("qv")).alias("qv"))
    cents = centroids if centroids is not None else ivf_seed_centroids(embeddings, n_cells)
    c_cells = _assign_cells(corpus, "vec_id", "v", cents, n_keep=1)
    q_cells = _assign_cells(q, "query_id", "qv", cents, n_keep=n_probe)
    cands = c_cells.join(F.broadcast(q_cells), "cell_id")
    scored = cands.withColumn("cosine", cosine(F.col("qv"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )
