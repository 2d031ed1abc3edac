#!/usr/bin/env python3
"""Run any registered contract query from the command line.

    python run_query.py --list
    python run_query.py dedup_minhash_lsh                  # show 20 rows
    python run_query.py events_rollup --sf-dir /root/testdata/sf0.1 \
        --out /tmp/rollup.parquet --cores 16

The registry is casualty_linking_spark.queries.QUERIES — the same callables
the driver's oracle gate runs, so anything runnable here is hash-verified
against DuckDB at sf0.01.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--out", help="write result parquet here instead of showing")
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    args = ap.parse_args()

    from casualty_linking_spark.queries import QUERIES

    if args.list or not args.name:
        for name in sorted(QUERIES):
            print(name)
        return 0
    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; use --list", file=sys.stderr)
        return 2

    from casualty_linking_spark.session import get_spark

    spark = get_spark(app_name=f"run_{args.name}", cores=args.cores)
    t0 = time.perf_counter()
    df = QUERIES[args.name][0](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"{args.name}: {n} rows -> {args.out} in {time.perf_counter() - t0:.2f}s")
    else:
        df.show(args.limit, truncate=False)
        print(f"{args.name}: shown in {time.perf_counter() - t0:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
