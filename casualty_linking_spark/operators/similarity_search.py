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


def lsh_bucket_key(v: Column, dim: int, table: int, n_planes: int = N_PLANES) -> Column:
    """Sign-bit bucket key for one LSH table."""
    bits = []
    for p in range(n_planes):
        plane = _hyperplane(dim, p, table)
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in plane]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(F.lit(f"t{table}:"), *bits)


def lsh_topk(
    embeddings: DataFrame, queries: DataFrame, dim: int, k: int = 5,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """Bucketed ANN: candidates share an LSH bucket in any table; exact
    cosine re-rank inside the candidate set. ``n_tables`` is the
    recall/cost knob — measured recall@10 vs the brute-force ground truth
    lives in BENCH/ANN_RECALL.md."""
    corpus = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    q = queries.select("query_id", _as_double(F.col("qv")).alias("qv"))
    c_parts, q_parts = [], []
    for t in range(n_tables):
        c_parts.append(corpus.select("vec_id", "v", lsh_bucket_key(F.col("v"), dim, t).alias("bucket")))
        q_parts.append(q.select("query_id", "qv", lsh_bucket_key(F.col("qv"), dim, t).alias("bucket")))
    c_all = c_parts[0]
    for p in c_parts[1:]:
        c_all = c_all.unionByName(p)
    q_all = q_parts[0]
    for p in q_parts[1:]:
        q_all = q_all.unionByName(p)

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
