#!/usr/bin/env python3
"""ANN recall study: recall@k of the hyperplane-LSH top-k vs the exact
brute-force ground truth, as a function of the N_TABLES knob
(operators/similarity_search.py). Results are committed to
BENCH/ANN_RECALL.md — the evidence behind the default table count.

Run: python BENCH/ann_recall.py [sf_dir] [k] (defaults /root/testdata/sf0.1, 10)
     python BENCH/ann_recall.py --clustered   (planted-Gaussian-cluster fixture:
         trained-KMeans IVF vs seed-sample IVF vs brute force — the evidence
         that kmeans_centroids moves the curve above the uniform-data floor)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def clustered_main() -> None:
    """Recall study on a corpus with REAL cluster structure (the sf
    embeddings are near-uniform — the worst case for any partitioning ANN,
    by construction). Plants n_clusters Gaussian blobs on the unit sphere
    (seeded, deterministic), holds out 3 query points per cluster, and
    measures recall@10 + candidate fraction for IVF with the trained
    k-means quantizer vs the md5-seed-sample quantizer at the same probe
    counts."""
    import numpy as np

    from casualty_linking_spark.operators.similarity_search import (
        _as_double,
        _assign_cells,
        brute_force_topk,
        ivf_seed_centroids,
        ivf_topk,
        kmeans_centroids,
    )
    from casualty_linking_spark.session import get_spark

    n_clusters, per_cluster, dim, k = 16, 300, 64, 10
    rng = np.random.default_rng(7)
    centers = rng.normal(0.0, 1.0, (n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    corpus_rows, query_rows = [], []
    vid = 0
    for c in range(n_clusters):
        for p in centers[c] + rng.normal(0.0, 0.15, (per_cluster, dim)):
            corpus_rows.append((vid, [float(x) for x in p]))
            vid += 1
        for p in centers[c] + rng.normal(0.0, 0.15, (3, dim)):
            query_rows.append((c * 3 + len(query_rows) % 3, [float(x) for x in p]))

    spark = get_spark(app_name="ann_recall_clustered")
    emb = spark.createDataFrame(corpus_rows, "vec_id bigint, embedding array<double>")
    queries = spark.createDataFrame(query_rows, "query_id bigint, qv array<double>")
    n_corpus, n_queries = len(corpus_rows), len(query_rows)

    truth = {(r.query_id, r.vec_id) for r in brute_force_topk(emb, queries, k=k).collect()}

    def measure(tag: str, cents, n_probe: int) -> dict:
        t0 = time.perf_counter()
        got = {
            (r.query_id, r.vec_id)
            for r in ivf_topk(emb, queries, k=k, n_probe=n_probe, centroids=cents).collect()
        }
        wall = time.perf_counter() - t0
        corpus_d = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        q_d = queries.select("query_id", _as_double(F.col("qv")).alias("qv"))
        n_cand = (
            _assign_cells(corpus_d, "vec_id", "v", cents, 1)
            .join(_assign_cells(q_d, "query_id", "qv", cents, n_probe).select("query_id", "cell_id"), "cell_id")
            .count()
        )
        return {
            "config": f"{tag} probe={n_probe}",
            f"recall@{k}": round(len(got & truth) / len(truth), 4),
            "cand_fraction": round(n_cand / (n_corpus * n_queries), 4),
            "wall_sec": round(wall, 2),
        }

    rows = []
    kc = kmeans_centroids(emb, n_cells=n_clusters, seed=1).cache()
    kc.count()
    sc = ivf_seed_centroids(emb, n_cells=n_clusters).cache()
    sc.count()
    for n_probe in (1, 2, 4):
        rows.append(measure("ivf-kmeans cells=16", kc, n_probe))
        print(json.dumps(rows[-1]))
        rows.append(measure("ivf-seed cells=16", sc, n_probe))
        print(json.dumps(rows[-1]))
    print(json.dumps({
        "fixture": f"{n_clusters} Gaussian clusters x {per_cluster}, sigma=0.15, dim={dim}, seed=7",
        "corpus": n_corpus, "queries": n_queries, "k": k, "rows": rows,
    }))
    spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = 50

    from casualty_linking_spark.operators.similarity_search import (
        brute_force_topk,
        lsh_topk,
    )
    from casualty_linking_spark.queries import EMB_DIM
    from casualty_linking_spark.session import get_spark

    spark = get_spark(app_name="ann_recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    n_corpus = emb.count()

    truth = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=k).collect()
    }

    def measure(tag: str, df, cand_df) -> dict:
        """recall@k + candidate fraction (rows of the corpus each query
        actually scores, relative to brute force) — the real cost axis; wall
        clock on this shared host is noise."""
        t0 = time.perf_counter()
        got = {(r.query_id, r.vec_id) for r in df.collect()}
        wall = time.perf_counter() - t0
        n_cand = cand_df.count()
        return {
            "config": tag,
            f"recall@{k}": round(len(got & truth) / len(truth), 4),
            "cand_fraction": round(n_cand / (n_corpus * n_queries), 4),
            "wall_sec": round(wall, 2),
        }

    from casualty_linking_spark.operators.similarity_search import (
        _as_double,
        _assign_cells,
        ivf_seed_centroids,
        lsh_bucket_key,
        lsh_probe_keys,
    )

    def lsh_cands(n_tables: int, probe_bits: int):
        corpus = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        q = queries.select("query_id", _as_double(F.col("qv")).alias("qv"))
        c_parts, q_parts = [], []
        for t in range(n_tables):
            c_parts.append(corpus.select("vec_id", lsh_bucket_key(F.col("v"), EMB_DIM, t).alias("bucket")))
            if probe_bits > 0:
                q_parts.append(q.select(
                    "query_id",
                    F.explode(lsh_probe_keys(F.col("qv"), EMB_DIM, t, probe_bits=probe_bits)).alias("bucket")))
            else:
                q_parts.append(q.select("query_id", lsh_bucket_key(F.col("qv"), EMB_DIM, t).alias("bucket")))
        c_all, q_all = c_parts[0], q_parts[0]
        for p in c_parts[1:]:
            c_all = c_all.unionByName(p)
        for p in q_parts[1:]:
            q_all = q_all.unionByName(p)
        return c_all.join(F.broadcast(q_all), "bucket").select("query_id", "vec_id").distinct()

    rows = []
    for n_tables, probe_bits in ((1, 0), (2, 0), (4, 0), (8, 0), (2, 1), (4, 1), (8, 1), (4, 2), (8, 2)):
        rows.append(measure(
            f"lsh tables={n_tables} probe={probe_bits}",
            lsh_topk(emb, queries, dim=EMB_DIM, k=k, n_tables=n_tables, probe_bits=probe_bits),
            lsh_cands(n_tables, probe_bits),
        ))
        print(json.dumps(rows[-1]))

    from casualty_linking_spark.operators.similarity_search import ivf_topk

    for n_probe in (1, 2, 4, 8):
        cents = ivf_seed_centroids(emb)
        corpus = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        q = queries.select("query_id", _as_double(F.col("qv")).alias("qv"))
        cand = _assign_cells(corpus, "vec_id", "v", cents, 1).join(
            _assign_cells(q, "query_id", "qv", cents, n_probe).select("query_id", "cell_id"),
            "cell_id",
        ).select("query_id", "vec_id")
        rows.append(measure(
            f"ivf cells=16 probe={n_probe}",
            ivf_topk(emb, queries, k=k, n_probe=n_probe),
            cand,
        ))
        print(json.dumps(rows[-1]))

    print(json.dumps({"corpus": n_corpus, "queries": n_queries, "k": k, "sf_dir": sf_dir, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    if "--clustered" in sys.argv:
        clustered_main()
    else:
        main()
