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


def _host_health(spin_seconds: float = 1.0) -> dict:
    """Spin canary + load average, embedded in every bench JSON so each
    BENCH_r*.json is self-describing about host state (the r2->r3 driver
    numbers moved 1.7x on host pressure alone, BENCH/SCALING.md). The canary
    is a single-thread pure-Python loop — its Mops/s tracks the deliverable
    per-core compute of the shared box at measurement time."""
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < spin_seconds:
        for _ in range(100000):
            pass
        n += 100000
    mops = n / (time.perf_counter() - t0) / 1e6
    try:
        load1, load5, load15 = os.getloadavg()
    except OSError:
        load1 = load5 = load15 = -1.0
    return {
        "canary_mops": round(mops, 1),
        "loadavg": [round(load1, 2), round(load5, 2), round(load15, 2)],
    }


def _sf_label(sf_dir: str) -> float:
    try:
        return float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        return -1.0


def run_suite(cores: int | None = None, sf_dir: str = SF_DIR) -> dict:
    from casualty_linking_spark.session import get_spark
    from casualty_linking_spark import queries as Q
    from casualty_linking_spark import synth

    health_before = _host_health()
    spark = get_spark(app_name="bench", cores=cores)
    timings: dict[str, float] = {}

    bench_queries = [
        "dedup_minhash_lsh", "dedup_simhash", "text_profile",
        "ann_brute_topk", "dedup_exact",
    ]

    # Two-tier warm-up, both disclosed in the output:
    #  1. Base codegen at the smallest SF ("codegen_warmup_sec"): Janino
    #     compilation of the wide-agg plans is a per-JVM fixed cost (~14 s
    #     for the 65-agg simhash plan).
    #  2. ONE warm pass of each timed query at the TARGET sf_dir
    #     ("cold_run_sec" per query): AQE re-plans from runtime statistics,
    #     so the physical plan — and therefore the generated code — at
    #     sf0.1 differs from the sf0.001-compiled one (measured: flagship
    #     17.7 s first sf0.1 run vs ~6 s every run after; simhash 18 s vs
    #     5.5 s). The timed section is the NEXT run: steady-state data work,
    #     which is the quantity that extrapolates to the 100 TB posture
    #     (plan compilation is a fixed cost amortized over the job, not a
    #     per-byte cost). Both tiers' walls are reported, so the cold
    #     first-run number is never hidden.
    warmup_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    t0 = time.perf_counter()
    if os.path.isdir(warmup_dir) and warmup_dir != sf_dir:
        Q.flagship(spark, warmup_dir).count()
        for name in bench_queries:
            Q.QUERIES[name][0](spark, warmup_dir).count()
    warmup_wall = round(time.perf_counter() - t0, 3)

    cold: dict[str, float] = {}
    t0 = time.perf_counter()
    Q.flagship(spark, sf_dir).count()
    cold["kg_pipeline"] = round(time.perf_counter() - t0, 3)
    for name in bench_queries:
        t0 = time.perf_counter()
        Q.QUERIES[name][0](spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)

    # The timed flagship run must rebuild silver: build_silver memoizes per
    # (session, sf_dir), so without this the warm pass would hand the timed
    # pass a cached T2 checkpoint and "kg_pipeline" would only measure the
    # linkers + union. Only plan/codegen stays warm — that's the point.
    Q._SILVER_CACHE.clear()

    t_all = time.perf_counter()

    # flagship: transcripts -> silver -> all linkers -> triples
    t0 = time.perf_counter()
    n_triples = Q.flagship(spark, sf_dir).count()
    timings["kg_pipeline"] = round(time.perf_counter() - t0, 3)

    n_turns = Q.build_silver(spark, sf_dir).count() * synth.TURNS_PER_CONV

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
        "codegen_warmup_sf": _sf_label(warmup_dir),
        "codegen_warmup_sec": warmup_wall,
        "cold_run_sec": cold,
        "host_before": health_before,
        "host_after": _host_health(),
    }
    spark.stop()
    return out


SCALE_RECORDS = int(os.environ.get("SPARK_GRAFT_SCALE_RECORDS", "300000"))


def run_scale_job(cores: int, n_records: int) -> dict:
    """One parallelism level of the scaling evidence (north rule: same job at
    N and 4N workers on identical input). Input is range-synthesized
    transcripts (no driver files — generation itself is parallel), the job is
    the full KG pipeline (silver + all linkers + triple union). A small
    warm-up run first so codegen/plan compilation (identical fixed cost at
    both levels) is excluded from the timed section."""
    import time as _t

    from casualty_linking_spark import dims, synth
    from casualty_linking_spark.operators import extract, records as REC
    from casualty_linking_spark.operators.link_occupations import link_occupations
    from casualty_linking_spark.operators.link_ranks import link_ranks
    from casualty_linking_spark.operators.link_units import link_units
    from casualty_linking_spark.operators.triples import records_to_triples, union_graphs
    from casualty_linking_spark.session import get_spark

    spark = get_spark(app_name=f"scale_{cores}", cores=cores)
    d = dims.broadcast_dims(spark)  # built once — broadcast reuse across runs

    def job(n: int) -> int:
        t = synth.transcripts_range(spark, n)
        rec = REC.build_records(
            extract.mentions_to_raw_records(extract.extract_mentions(t))
        ).localCheckpoint(eager=True)
        cas = records_to_triples(rec, d["cemeteries"])
        rl = link_ranks(rec, d["rank_labels"])
        ol = link_occupations(rec, d["occupations"])
        ul, period = link_units(rec, d["unit_labels"])
        return union_graphs(cas, rl, ol, ul, period).count()

    health_before = _host_health()
    job(2000)  # warm-up: codegen + plan compile
    walls = []
    n_triples = 0
    n_trials = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "2"))
    for _ in range(n_trials):  # min-of-N: damp background-load noise in the sandbox
        t0 = _t.perf_counter()
        n_triples = job(n_records)
        walls.append(_t.perf_counter() - t0)
    wall = min(walls)
    n_turns = n_records * 5
    spark.stop()
    return {
        "cores": cores,
        "turns": n_turns,
        "triples": n_triples,
        "wall": round(wall, 2),
        "walls": [round(w, 2) for w in walls],
        "turns_per_sec": round(n_turns / wall, 1),
        "host_before": health_before,
        "host_after": _host_health(),
    }


def run_scaling(n_records: int = SCALE_RECORDS, n_lo: int = 8, n_hi: int = 32, trials: int = 2) -> dict:
    """Each trial in its own subprocess (clean JVM — reusing one JVM for two
    SparkContexts skews the second run), levels interleaved and min-taken so
    background-load drift in the shared sandbox cancels out."""
    import subprocess

    res: dict[int, dict] = {}
    for _ in range(trials):
        for cores in (n_lo, n_hi):
            out = subprocess.run(
                [sys.executable, __file__, "--scale-one", str(cores), str(n_records)],
                capture_output=True, text=True,
                timeout=int(os.environ.get("SPARK_GRAFT_SCALE_TIMEOUT", "7200")),
            )
            line = out.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            if cores not in res or r["wall"] < res[cores]["wall"]:
                res[cores] = r
    factor = n_hi / n_lo
    eff = (res[n_lo]["wall"] / res[n_hi]["wall"]) / factor
    return {
        "metric": f"scaling_efficiency_{n_lo}_to_{n_hi}",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_records": n_records,
        f"local[{n_lo}]": res[n_lo],
        f"local[{n_hi}]": res[n_hi],
    }


def run_contract_timings(sf_dir: str = "/root/testdata/sf0.01", cores: int = 8) -> dict:
    """Diagnostic: wall per contract query at the driver's correctness SF —
    catches a pathological query/oracle before the driver's gate does."""
    from casualty_linking_spark.queries import QUERIES
    from casualty_linking_spark.session import get_spark

    spark = get_spark(app_name="contract_timing", cores=cores, shuffle_partitions=cores)
    times: dict[str, float] = {}
    for name, (fn, _oracle) in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 1)
    spark.stop()
    return {
        "metric": "contract_query_walls",
        "unit": "sec",
        "value": round(sum(times.values()), 1),
        "queries": dict(sorted(times.items(), key=lambda kv: -kv[1])),
        "host_before": _host_health(),
    }


def run_shuffle_audit(sf_dir: str = SF_DIR, cores: int = 8) -> dict:
    """Measured shuffle bytes per headline query (UI REST store): the
    quantitative form of the 'broadcast-only linking, minimal shuffle'
    claim. A 100 TB plan lives or dies on shuffle-to-input ratio."""
    import urllib.request

    from casualty_linking_spark import queries as Q
    from casualty_linking_spark.session import get_spark

    spark = get_spark(
        app_name="shuffle_audit", cores=cores, shuffle_partitions=cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def snap() -> tuple[int, int, int]:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            ss = json.load(r)
        return (
            sum(s.get("shuffleWriteBytes", 0) for s in ss),
            sum(s.get("shuffleReadBytes", 0) for s in ss),
            sum(s.get("inputBytes", 0) for s in ss),
        )

    audit: dict[str, dict] = {}
    prev = (0, 0, 0)
    names = ["dedup_minhash_lsh", "dedup_simhash", "kg_link_persons", "dedup_exact"]
    jobs = [("kg_pipeline", lambda: Q.flagship(spark, sf_dir))] + [
        (n, (lambda n=n: Q.QUERIES[n][0](spark, sf_dir))) for n in names
    ]
    for name, fn in jobs:
        fn().count()
        time.sleep(2)  # let the status store settle
        cur = snap()
        d = tuple(c - p for c, p in zip(cur, prev))
        prev = cur
        audit[name] = {
            "shuffle_write_mb": round(d[0] / 1e6, 2),
            "shuffle_read_mb": round(d[1] / 1e6, 2),
            "input_mb": round(d[2] / 1e6, 2),
        }
    spark.stop()
    return {"metric": "shuffle_bytes_per_query", "sf": _sf_label(sf_dir), "queries": audit}


if __name__ == "__main__":
    if "--shuffle-audit" in sys.argv:
        print(json.dumps(run_shuffle_audit()))
    elif "--contract" in sys.argv:
        print(json.dumps(run_contract_timings()))
    elif "--scale-one" in sys.argv:
        i = sys.argv.index("--scale-one")
        print(json.dumps(run_scale_job(int(sys.argv[i + 1]), int(sys.argv[i + 2]))))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_suite()))
