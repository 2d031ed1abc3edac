#!/usr/bin/env python3
"""Per-stage wall breakdown of the scale job at one parallelism level —
the diagnostic behind BENCH/SCALING.md's Amdahl decomposition. Each stage
is forced with a count() so its wall is attributable (the production job
fuses them; total here is therefore an overestimate of the fused wall).

Run: python BENCH/scale_diag.py <cores> <n_records>
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    cores = int(sys.argv[1])
    n = int(sys.argv[2])

    from casualty_linking_spark import dims, synth
    from casualty_linking_spark.operators import extract, records as REC
    from casualty_linking_spark.operators.link_occupations import link_occupations
    from casualty_linking_spark.operators.link_ranks import link_ranks
    from casualty_linking_spark.operators.link_units import link_units
    from casualty_linking_spark.operators.triples import records_to_triples, union_graphs
    from casualty_linking_spark.session import get_spark

    spark = get_spark(app_name=f"scale_diag_{cores}", cores=cores)
    d = dims.broadcast_dims(spark)
    stages: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        stages[name] = round(time.perf_counter() - t0, 2)
        return out

    # warm-up (codegen/plan compile)
    t = synth.transcripts_range(spark, 2000)
    rec_w = REC.build_records(extract.mentions_to_raw_records(extract.extract_mentions(t)))
    union_graphs(
        records_to_triples(rec_w, d["cemeteries"]),
        link_ranks(rec_w, d["rank_labels"]),
        link_occupations(rec_w, d["occupations"]),
        *link_units(rec_w, d["unit_labels"]),
    ).count()

    t = synth.transcripts_range(spark, n)
    rec = timed("silver_build_checkpoint", lambda: REC.build_records(
        extract.mentions_to_raw_records(extract.extract_mentions(t))
    ).localCheckpoint(eager=True))
    cas = timed("cas_triples_count", lambda: records_to_triples(rec, d["cemeteries"]))
    timed("cas_count", lambda: cas.count())
    rl = link_ranks(rec, d["rank_labels"])
    timed("rank_links_count", lambda: rl.count())
    ol = link_occupations(rec, d["occupations"])
    timed("occ_links_count", lambda: ol.count())
    ul, period = link_units(rec, d["unit_labels"])
    timed("unit_links_count", lambda: ul.count())
    n_triples = timed("union_dedup_count", lambda: union_graphs(cas, rl, ol, ul, period).count())

    print(json.dumps({
        "cores": cores, "n_records": n, "triples": n_triples,
        "stages": stages, "total": round(sum(stages.values()), 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
