#!/usr/bin/env python
"""Measure linker precision/recall against the synth's planted ground truth.

Usage: python BENCH/link_pr.py [--sf-dir /root/testdata/sf0.01] [--cores 8]

Prints one JSON line per run (the numbers behind BENCH/LINK_PR.md).
See casualty_linking_spark/eval_pr.py for truth-definition details.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--records", type=int, default=None,
                    help="range-generated input size (10^12-turn posture) instead of --sf-dir")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from casualty_linking_spark.session import get_spark
    from casualty_linking_spark import eval_pr

    spark = get_spark(app_name="link_pr", cores=args.cores, shuffle_partitions=args.cores)
    if args.records:
        result = eval_pr.evaluate_range(spark, args.records)
        print(json.dumps({"records": args.records, **result}))
    else:
        result = eval_pr.evaluate(spark, args.sf_dir)
        print(json.dumps({"sf_dir": args.sf_dir, **result}))


if __name__ == "__main__":
    main()
