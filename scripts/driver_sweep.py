"""Driver-condition parity sweep.

Runs every (or a selected subset of) contract query from ``__spark_entry__``
at the DRIVER's execution profile — local[32], sf0.01 — and compares against
the DuckDB oracle with the dtype-class-strict comparator from
``tests/conftest.py``. This is the exact profile where the round-4 reds
surfaced (the 8-core sf0.001 test mirror stayed green), so nothing gets
claimed as done without a green row here.

Usage:
    python scripts/driver_sweep.py                      # full sweep
    python scripts/driver_sweep.py --only q1 q2 ...     # subset
    python scripts/driver_sweep.py --cores 8            # other profile
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from casualty_linking_spark.session import get_spark  # noqa: E402
from tests.conftest import TABLES, compare_frames  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    spark = get_spark(
        app_name="driver_sweep",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results: dict[str, dict] = {}
    failed = []
    for name, fn in qs.items():
        if args.only and name not in args.only:
            continue
        t0 = time.time()
        rec: dict = {}
        try:
            sdf = fn(spark, args.sf_dir)
            if name in oracles:
                ddf = con.execute(oracles[name]).df()
                compare_frames(sdf, ddf)
                rec = {"ok": True, "oracle_rows": len(ddf)}
            else:
                n = sdf.count()
                rec = {"ok": True, "rows_only": n}
        except AssertionError as e:
            rec = {"ok": False, "err": f"MISMATCH: {e}"}
        except Exception as e:  # noqa: BLE001 — sweep must not die mid-list
            rec = {"ok": False, "err": f"{type(e).__name__}: {e}",
                   "trace": traceback.format_exc()[-1500:]}
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        if not rec["ok"]:
            failed.append(name)
        status = "ok" if rec["ok"] else "FAIL"
        print(f"{name:32s} {status:4s} {rec['sec']:7.1f}s", flush=True)

    n_ok = sum(1 for r in results.values() if r["ok"])
    print(f"\n{n_ok}/{len(results)} green at cores={args.cores} "
          f"sf_dir={args.sf_dir}")
    for name in failed:
        print(f"  FAIL {name}: {results[name]['err'][:300]}")
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
