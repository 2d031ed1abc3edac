#!/usr/bin/env python3
"""Headline benchmark: full KG pipeline + training-data ops at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "turns_per_sec": ...}

Scaling evidence (north rule): run `python bench.py --scaling` to execute the
same pipeline at local[8] and local[32] and report throughput at both plus
efficiency (see BENCH/SCALING.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_label(sf_dir: str) -> float:
    try:
        return float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        return -1.0


def run_suite(cores: int | None = None, sf_dir: str = SF_DIR) -> dict:
    from casualty_linking_spark.session import get_spark
    from casualty_linking_spark import queries as Q
    from casualty_linking_spark import synth

    spark = get_spark(app_name="bench", cores=cores)
    timings: dict[str, float] = {}
    t_all = time.perf_counter()

    # flagship: transcripts -> silver -> all linkers -> triples
    t0 = time.perf_counter()
    n_triples = Q.flagship(spark, sf_dir).count()
    timings["kg_pipeline"] = round(time.perf_counter() - t0, 3)

    n_turns = synth.transcripts_from_sf(spark, sf_dir).count()

    bench_queries = [
        "dedup_minhash_lsh", "dedup_simhash", "text_profile",
        "ann_brute_topk", "dedup_exact",
    ]
    for name in bench_queries:
        fn, _ = Q.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(time.perf_counter() - t_all, 3)
    tps = round(n_turns / timings["kg_pipeline"], 1)
    out = {
        "metric": "kg_pipeline_plus_dataops_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(sf_dir),
        "turns": n_turns,
        "triples": n_triples,
        "turns_per_sec": tps,
        "cores": cores or os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }
    spark.stop()
    return out


def run_scaling(sf_dir: str = SF_DIR) -> dict:
    """Same job at two parallelism levels (N=8 vs 4N=32 cores) on identical
    input; scaling efficiency = (T_8 / T_32) / 4."""
    res = {}
    for cores in (8, 32):
        r = run_suite(cores=cores, sf_dir=sf_dir)
        res[f"local[{cores}]"] = r
    t8 = res["local[8]"]["queries"]["kg_pipeline"]
    t32 = res["local[32]"]["queries"]["kg_pipeline"]
    eff = (t8 / t32) / 4.0
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "turns_per_sec_8": res["local[8]"]["turns_per_sec"],
        "turns_per_sec_32": res["local[32]"]["turns_per_sec"],
        "wall_8": t8,
        "wall_32": t32,
        "sf": _sf_label(sf_dir),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_suite()))
