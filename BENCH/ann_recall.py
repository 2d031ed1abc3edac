#!/usr/bin/env python3
"""ANN recall study: recall@k of the hyperplane-LSH top-k vs the exact
brute-force ground truth, as a function of the N_TABLES knob
(operators/similarity_search.py). Results are committed to
BENCH/ANN_RECALL.md — the evidence behind the default table count.

Run: python BENCH/ann_recall.py [sf_dir] [k] (defaults /root/testdata/sf0.1, 10)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


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

    rows = []
    for n_tables in (1, 2, 4, 8):
        t0 = time.perf_counter()
        got = {
            (r.query_id, r.vec_id)
            for r in lsh_topk(emb, queries, dim=EMB_DIM, k=k, n_tables=n_tables).collect()
        }
        wall = time.perf_counter() - t0
        recall = len(got & truth) / len(truth)
        rows.append(
            {
                "n_tables": n_tables,
                f"recall@{k}": round(recall, 4),
                "wall_sec": round(wall, 2),
            }
        )
        print(json.dumps(rows[-1]))

    print(json.dumps({"corpus": n_corpus, "queries": n_queries, "k": k, "sf_dir": sf_dir, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
