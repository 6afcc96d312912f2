#!/usr/bin/env python
"""Driver-style oracle parity sweep at an arbitrary scale factor.

Mimics the round driver's CORRECTNESS check (row-count + schema +
order-insensitive exact value compare) for every registered query that
carries a DuckDB oracle, at $SPARK_GRAFT_TEST_SF_DIR (default sf0.01 —
the driver's actual correctness SF, one notch above the pytest SF).

Usage:
    python scripts/parity_check.py [--window N] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR_MED", "/root/testdata/sf0.01"))
    ap.add_argument("--window", type=int, default=0,
                    help="check only the first N registry entries (driver window)")
    ap.add_argument("--only", default="", help="comma-separated query names")
    ap.add_argument("--rows-only", action="store_true",
                    help="also run no-oracle queries for a rows-only smoke check")
    args = ap.parse_args()

    import duckdb

    from covid_weather_etl_spark.queries.registry import all_queries
    from covid_weather_etl_spark.session import get_spark
    from covid_weather_etl_spark.sources.catalog import TABLES
    from tests.conftest import assert_parity

    spark = get_spark("cwes-parity", cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"),
                      shuffle_partitions=16)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                     f"read_parquet('{args.sf_dir}/{t}.parquet')")

    qs = all_queries()
    names = list(qs)
    if args.window:
        names = names[:args.window]
    if args.only:
        names = [n for n in args.only.split(",") if n]

    results, failed = {}, []
    for name in names:
        q = qs[name]
        # sf0.01-pinned oracles (persisted-artifact replays) are only
        # meaningful at the driver's correctness SF
        if ("oracle-at-sf0.01" in q.tags
                and not args.sf_dir.rstrip("/").endswith("sf0.01")):
            results[name] = {"ok": True, "mode": "skipped-sf-pinned",
                             "sec": 0.0}
            print(f"SKIP {name} (oracle pinned to sf0.01)", flush=True)
            continue
        t0 = time.time()
        try:
            if q.oracle:
                assert_parity(spark, duck, q, sf_dir=args.sf_dir)
                results[name] = {"ok": True, "mode": "oracle",
                                 "sec": round(time.time() - t0, 2)}
            elif args.rows_only:
                n = q.fn(spark, args.sf_dir).count()
                results[name] = {"ok": True, "mode": "rows_only", "rows": n,
                                 "sec": round(time.time() - t0, 2)}
            else:
                continue
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            results[name] = {"ok": False, "err": str(e)[:500],
                             "sec": round(time.time() - t0, 2)}
            traceback.print_exc(limit=3)
        print(f"{'PASS' if results[name]['ok'] else 'FAIL'} {name} "
              f"({results[name]['sec']}s)", flush=True)

    print(json.dumps({"sf_dir": args.sf_dir, "checked": len(results),
                      "failed": failed}))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
