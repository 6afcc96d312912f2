#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = queries tagged bench=True in the registry (the flagship
multi-join rollups + the LLM-pipeline heavies) plus every other
registered query once — total wall time is the headline metric.
"""

from __future__ import annotations

import json
import os
import sys
import time


def warm_session(spark, sf_dir: str, cpus: str) -> None:
    """One-time cluster warmups (classloading, codegen, Arrow worker
    pool) so first-use costs don't land on whichever query runs first.
    Shared by the bench harness and scripts/warm_measure.py (§8 warm
    protocol) so 'warm' means the same thing in both."""
    # warm the JVM + parquet footers with one cheap action
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    # warm Spark ML too (pipeline/tree-ensemble classloading + codegen
    # is a one-time cluster cost, not a per-query cost — without this
    # it all lands on whichever ML query happens to run first and
    # distorts its per-query timing)
    from pyspark.ml.classification import GBTClassifier, LogisticRegression
    from pyspark.ml.fpm import FPGrowth
    from pyspark.ml.linalg import Vectors
    warm = spark.createDataFrame(
        [(0.0, Vectors.dense([0.0])), (1.0, Vectors.dense([1.0]))],
        ["label", "features"])
    LogisticRegression(maxIter=1).fit(warm)
    GBTClassifier(maxIter=1, maxDepth=1).fit(warm)
    FPGrowth(itemsCol="items", minSupport=0.5).fit(
        spark.createDataFrame([(["a"],), (["a"],)], ["items"]))
    # warm the remaining one-time machinery the same way (each class
    # loads + codegens on first use and would otherwise distort the
    # first query that touches it): exact percentile buffers, window
    # exec, Python-worker pool (applyInPandas), localCheckpoint path,
    # and the broadcast-exchange machinery — all on the 25-row nation.
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nat.agg(_F.percentile("n_nationkey", _F.lit(0.5))).count()
    nat.select(_F.row_number().over(
        _W.partitionBy("n_regionkey").orderBy("n_nationkey"))).count()
    nat.join(_F.broadcast(nat.select(
        _F.col("n_nationkey").alias("k"))),
        _F.col("n_nationkey") == _F.col("k")).count()
    nat.localCheckpoint(eager=True).count()
    nat.groupBy("n_regionkey").applyInPandas(
        lambda pdf: pdf[["n_nationkey"]],
        "n_nationkey long").count()
    # scalar pandas_udf (Arrow batch serializer) loads a DIFFERENT
    # eval path than applyInPandas — without this the first
    # vectorized-kernel query (rp_lsh/pq encode) absorbs the Arrow
    # first-use cost (measured: 7.95 s cold vs 1.6 s warm at sf0.1)
    _pd_warm = _F.pandas_udf("long")(lambda s: s + 1)
    # run the Arrow warmers on a WIDE frame: Python workers spin up
    # lazily per core, so a 25-row warm only starts a few — the first
    # heavy vectorized query then pays worker startup on the rest
    wide = spark.range(int(cpus) * 1000).repartition(int(cpus))
    wide.select(_pd_warm(_F.col("id"))).count()
    # mapInPandas is a third distinct path (iterator protocol)
    wide.mapInPandas(lambda it: it, wide.schema).count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from covid_weather_etl_spark.queries.registry import all_queries
    from covid_weather_etl_spark.session import get_spark

    spark = get_spark("cwes-bench", cpus=cpus)
    qs = all_queries()
    warm_session(spark, sf_dir, cpus)

    timings: dict[str, float] = {}
    t_total = time.perf_counter()
    for name in sorted(qs, key=lambda n: (not qs[n].bench, n)):
        q = qs[name]
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            n = df.count()  # force full execution without driver collect
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {ex}", file=sys.stderr)
    total = round(time.perf_counter() - t_total, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full per-query timings go to a sidecar file + stderr; the single
    # stdout line stays compact (headline bench=True set only) so a
    # tail-truncating capture can still parse it.  (Round-1 lesson:
    # one 80-entry JSON line was truncated from the front and the
    # driver recorded "parsed": null.)
    #
    # Every pass writes BENCH_FULL_LAST.json (gitignored scratch).  The
    # committed BENCH_FULL.json is only rewritten when the close
    # protocol sets SPARK_GRAFT_BENCH_PIN=1 — so ad-hoc and driver
    # passes no longer clobber the committed artifact between closes
    # (r11 VERDICT directive #6).
    full = {"metric": "total_query_wall_seconds", "value": total,
            "unit": "sec", "queries": timings, "sf": sf_val}
    pin = os.environ.get("SPARK_GRAFT_BENCH_PIN") == "1"
    out_name = "BENCH_FULL.json" if pin else "BENCH_FULL_LAST.json"
    try:
        with open(out_name, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
    except OSError as ex:
        print(f"bench: could not write {out_name}: {ex}", file=sys.stderr)
    print(json.dumps(full["queries"], sort_keys=True), file=sys.stderr)

    headline = {n: timings[n] for n in timings if qs[n].bench}
    print(json.dumps({
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": headline,
        "sf": sf_val,
        "n_queries": len(timings),
        "full": out_name,
    }))


if __name__ == "__main__":
    main()
