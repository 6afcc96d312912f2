#!/usr/bin/env python
"""§13 host-regime probe: measure the per-job scheduler tax that
dominates iterative-query wall clock on a busy host (SCALE.md §13).

Runs N empty single-task jobs (spark.range(1).count() on a warmed
session) and reports min/median/p90 — the mechanical floor every
scheduled job pays before any work happens. Record this NEXT TO any
bench total so a 473-vs-630s host lottery is attributable: at ~0.2 s
median tax and several jobs per query, ~0.5 s/q of a full-pass total
is scheduler, not plan.

Usage: python scripts/host_probe.py [-n 40]
Prints one JSON line: {"n": N, "empty_job_sec": {"min":..,
 "median":.., "p90":..}, "loadavg": [...], "single_core_ms": ..}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=40)
    args = ap.parse_args()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from covid_weather_etl_spark.session import get_spark
    spark = get_spark("cwes-host-probe", cpus=cpus)
    for _ in range(5):  # warm scheduler + codegen paths off the record
        spark.range(1).count()

    times = []
    for _ in range(args.n):
        t0 = time.perf_counter()
        spark.range(1).count()
        times.append(time.perf_counter() - t0)
    times.sort()

    # single-core Python speed sanity (distinguishes CPU steal from
    # scheduler contention): a fixed arithmetic loop, best of 3
    def spin() -> float:
        t0 = time.perf_counter()
        s = 0
        for i in range(2_000_000):
            s += i * i
        return time.perf_counter() - t0
    single = min(spin() for _ in range(3))

    print(json.dumps({
        "n": args.n,
        "empty_job_sec": {
            "min": round(times[0], 4),
            "median": round(statistics.median(times), 4),
            "p90": round(times[int(len(times) * 0.9)], 4),
        },
        "loadavg": list(os.getloadavg()),
        "single_core_ms": round(single * 1000, 1),
    }))


if __name__ == "__main__":
    main()
