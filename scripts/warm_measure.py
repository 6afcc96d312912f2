#!/usr/bin/env python
"""§8 warm-measurement protocol (SCALE.md): run named queries N times
in ONE bench-warmed session at sf0.1 and report per-repeat times +
the warm minimum. The warm minimum is the code-attributable cost; the
spread across repeats is the host-interference band. Used for verdict
directives of the form "re-measure X warm; flag if > 1.25x historic
warm best".

Usage: python scripts/warm_measure.py [-n 3] [--sf-dir D] q1 q2 ...
Prints one JSON line: {"sf_dir": ..., "repeats": N,
                       "queries": {name: {"times": [...], "warm_min": t}}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", "--repeats", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from bench import warm_session
    from covid_weather_etl_spark.queries.registry import all_queries
    from covid_weather_etl_spark.session import get_spark

    spark = get_spark("cwes-warm-measure", cpus=cpus)
    qs = all_queries()
    unknown = [n for n in args.queries if n not in qs]
    if unknown:
        ap.error(f"unknown queries: {unknown}")
    warm_session(spark, args.sf_dir, cpus)

    out = {}
    for name in args.queries:
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            qs[name].fn(spark, args.sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
            print(f"{name}: {times[-1]}s", file=sys.stderr)
        out[name] = {"times": times, "warm_min": min(times)}
    print(json.dumps({"sf_dir": args.sf_dir, "repeats": args.repeats,
                      "queries": out}))


if __name__ == "__main__":
    main()
