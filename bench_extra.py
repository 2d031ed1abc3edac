#!/usr/bin/env python3
"""Round-6 optimization instrumentation (guide §1): per-stage flagship
breakdown + noop-sink isolation per bench query. NOT the frozen bench.py —
numbers here are for OPTIMIZATION_r06.md evidence only.

Usage:
  python bench_extra.py --stages          # flagship per-stage breakdown
  python bench_extra.py --queries         # noop-isolated bench queries
  python bench_extra.py --explain NAME    # .explain('formatted') for a query
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label: str, thunk) -> float:
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    thunk()
    dt = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    return dt


def stage_breakdown(sf_dir: str = SF_DIR) -> dict:
    """Flagship pipeline, stage by stage, after the same two-tier warmup
    bench.py uses (codegen at sf0.001 + one warm pass at target SF)."""
    from casualty_linking_spark import dims
    from casualty_linking_spark import queries as Q
    from casualty_linking_spark import synth
    from casualty_linking_spark.operators import extract, records as REC
    from casualty_linking_spark.operators.link_occupations import link_occupations
    from casualty_linking_spark.operators.link_ranks import link_ranks
    from casualty_linking_spark.operators.link_units import link_units
    from casualty_linking_spark.operators.triples import records_to_triples, union_graphs
    from casualty_linking_spark.session import get_spark

    spark = get_spark(app_name="bench_extra_stages")

    # warmup: codegen at sf0.001, then one full warm pass at target
    Q.flagship(spark, WARMUP_DIR).count()
    Q.flagship(spark, sf_dir).count()
    Q._SILVER_CACHE.clear()

    t: dict[str, float] = {}
    t_all0 = time.perf_counter()

    holder: dict = {}

    def s1():
        holder["t"] = synth.transcripts_from_sf(spark, sf_dir).localCheckpoint(eager=True)

    t["t0_transcripts_ckpt"] = _timed(spark, "s1: transcripts ckpt", s1)

    def s2():
        rec = REC.build_records(
            extract.mentions_to_raw_records(extract.extract_mentions(holder["t"]))
        )
        holder["rec"] = rec.localCheckpoint(eager=True)

    t["t2_silver_ckpt"] = _timed(spark, "s2: silver ckpt", s2)

    rec = holder["rec"]
    d = dims.broadcast_dims(spark)

    t["dims_cemeteries"] = _timed(spark, "dims", lambda: dims.dim_cemeteries(spark).count())
    cas = records_to_triples(rec, dims.dim_cemeteries(spark))
    t["records_to_triples"] = _timed(spark, "cas noop", lambda: _noop(cas))
    rl = link_ranks(rec, d["rank_labels"])
    t["link_ranks"] = _timed(spark, "ranks noop", lambda: _noop(rl))
    ol = link_occupations(rec, d["occupations"])
    t["link_occupations"] = _timed(spark, "occ noop", lambda: _noop(ol))
    ul, period = link_units(rec, d["unit_labels"])
    t["link_units"] = _timed(spark, "units noop", lambda: _noop(ul))
    t["period"] = _timed(spark, "period noop", lambda: _noop(period))
    uni = union_graphs(cas, rl, ol, ul, period)
    t["union_count_after_parts"] = _timed(spark, "union count", lambda: uni.count())

    t["sum_stages"] = round(sum(v for k, v in t.items()), 3)
    t["wall_total"] = round(time.perf_counter() - t_all0, 3)

    # reference: one uninstrumented timed flagship run (bench.py conditions)
    Q._SILVER_CACHE.clear()
    t0 = time.perf_counter()
    Q.flagship(spark, sf_dir).count()
    t["flagship_one_shot"] = round(time.perf_counter() - t0, 3)

    spark.stop()
    return {"metric": "flagship_stage_breakdown", "sf_dir": sf_dir, "stages": t}


def query_isolation(sf_dir: str = SF_DIR, repeats: int = 3) -> dict:
    """noop-sink timing per bench query (computation only, no .count prune)."""
    from casualty_linking_spark import queries as Q
    from casualty_linking_spark.session import get_spark

    spark = get_spark(app_name="bench_extra_queries")
    names = ["dedup_minhash_lsh", "dedup_simhash", "text_profile",
             "ann_brute_topk", "dedup_exact"]
    # codegen warmup at the small sf, then one warm pass at target
    for n in names:
        Q.QUERIES[n][0](spark, WARMUP_DIR).count()
    for n in names:
        _noop(Q.QUERIES[n][0](spark, sf_dir))

    out: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for n in names:
            out[n].append(
                _timed(spark, f"noop:{n}", lambda n=n: _noop(Q.QUERIES[n][0](spark, sf_dir)))
            )
    spark.stop()
    return {
        "metric": "noop_query_isolation", "sf_dir": sf_dir,
        "samples": out,
        "min": {n: min(v) for n, v in out.items()},
        "median": {n: sorted(v)[len(v) // 2] for n, v in out.items()},
    }


def explain_query(name: str, sf_dir: str = SF_DIR) -> str:
    from casualty_linking_spark import queries as Q
    from casualty_linking_spark.session import get_spark

    spark = get_spark(app_name="bench_extra_explain")
    if name == "kg_pipeline":
        df = Q.flagship(spark, sf_dir)
    else:
        df = Q.QUERIES[name][0](spark, sf_dir)
    out = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    spark.stop()
    return out


if __name__ == "__main__":
    if "--stages" in sys.argv:
        print(json.dumps(stage_breakdown()))
    elif "--queries" in sys.argv:
        print(json.dumps(query_isolation()))
    elif "--explain" in sys.argv:
        i = sys.argv.index("--explain")
        print(explain_query(sys.argv[i + 1]))
    else:
        print(json.dumps(stage_breakdown()))
