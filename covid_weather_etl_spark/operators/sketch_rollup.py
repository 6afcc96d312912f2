"""Mergeable-sketch rollups: incremental COUNT(DISTINCT) via HLL union.

The 100 TB pattern for distinct counts over time: you cannot afford to
re-scan a year of raw events to refresh a monthly distinct-users
number, and exact distinct state (a set per group) does not merge.
HyperLogLog sketches DO: daily register states union losslessly into
monthly/yearly states, so each day is scanned ONCE ever and every
coarser rollup is sketch algebra over tiny payloads (the Dataflow /
druid / BigQuery "sketch rollup" architecture). Spark 3.5+ exposes
this natively: `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate` — JVM-side Apache DataSketches, no UDFs.

The query materializes the daily sketch layer, unions it to months,
and reports approx vs exact side by side. Rows-only driver check
(estimates are approximate by nature); tests pin the ≤5 % error
envelope AND the lossless-merge property (union-of-dailies estimate
== one-shot monthly sketch estimate, register-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables

LG_K = 12  # 4096 registers → ~1.6 % standard error


def daily_user_sketches(ev: DataFrame) -> DataFrame:
    """The persisted layer: one HLL register state per day. At scale
    this is the only pass over raw events; everything coarser unions
    these states."""
    return (ev.groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sk"),
                 F.count("*").alias("n_events")))


@register("hll_monthly_rollup", survey="ext-sketch,A2,A7")
def hll_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly distinct users three ways: sketch-union of the daily
    layer (the incremental path — touches only day-level register
    states), a one-shot monthly sketch (what a full re-scan would
    build), and the exact COUNT(DISTINCT) ground truth, with the
    relative error. Union vs one-shot must agree exactly (HLL merge is
    lossless on register states); both sit within the lg_k=12 error
    envelope of exact."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    daily = daily_user_sketches(ev)
    merged = (daily.groupBy(F.date_trunc("month", "day").alias("month"))
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("approx_users_merged"),
                   F.sum("n_events").alias("n_events")))
    oneshot = (ev.groupBy(F.date_trunc("month", "ts").alias("month"))
               .agg(F.hll_sketch_estimate(
                        F.hll_sketch_agg("user_id", F.lit(LG_K)))
                    .alias("approx_users_oneshot"),
                    F.countDistinct("user_id").alias("exact_users")))
    err = (F.abs(F.col("approx_users_merged") - F.col("exact_users"))
           / F.col("exact_users"))
    return (merged.join(oneshot, "month")
            .select("month", "n_events", "approx_users_merged",
                    "approx_users_oneshot", "exact_users",
                    F.round(err, 6).alias("rel_err")))
