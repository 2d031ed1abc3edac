#!/usr/bin/env python3
"""spark-submit entrypoint for the KG-construction pipeline.

Cluster usage (the north rule's multi-executor posture):

    zip -r casualty_linking_spark.zip casualty_linking_spark/
    spark-submit \
        --py-files casualty_linking_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        run_pipeline.py --root /data/kg --records 100000

Local sandbox: python run_pipeline.py --root /tmp/kg --records 1000
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="output table root (parquet/Iceberg warehouse)")
    ap.add_argument("--sf-dir", default=None, help="derive transcripts from a testdata sf dir")
    ap.add_argument("--records", type=int, default=10000,
                    help="synthesize N conversations (ignored with --sf-dir)")
    ap.add_argument("--with-persons", action="store_true", help="run person RL + generation stages")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from casualty_linking_spark import synth
    from casualty_linking_spark.plans.pipeline import Pipeline

    # On a cluster spark-submit provides the session; standalone we build one.
    try:
        spark = SparkSession.getActiveSession() or None
    except Exception:
        spark = None
    if spark is None:
        from casualty_linking_spark.session import get_spark

        spark = get_spark(app_name="kg_pipeline")

    if args.sf_dir:
        transcripts = synth.transcripts_from_sf(spark, args.sf_dir)
        actors = synth.actors_from_sf(spark, args.sf_dir) if args.with_persons else None
    else:
        transcripts = synth.transcripts_range(spark, args.records)
        actors = synth.actors_range(spark, args.records) if args.with_persons else None

    triples = Pipeline(spark, args.root, transcripts, actors=actors).run()
    counts = {r["graph_kind"]: r["count"] for r in triples.groupBy("graph_kind").count().collect()}
    print({"triples_by_graph": counts, "total": sum(counts.values())})


if __name__ == "__main__":
    main()
