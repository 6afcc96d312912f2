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


#: audience-overlap pair: the two behavioral cohorts to intersect.
OVERLAP_TYPES = ("signup", "purchase")


@register("hll_audience_overlap", survey="ext-sketch,A2,J7")
def hll_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA on top of the HLL layer: estimated overlap
    of the signup and purchase audiences via inclusion-exclusion
    (|A∩B| ≈ est(A) + est(B) − est(A∪B)) — the question ("how many
    users did BOTH?") that plain per-cohort distinct counts cannot
    answer and exact answers need a user-level join for. The union
    estimate comes from hll_union_agg over the two per-cohort register
    states — NO re-scan of events: at 100 TB the cohort sketches are
    the persisted layer (daily_user_sketches pattern) and this whole
    query is algebra over kilobyte payloads.

    Reports approx A/B/union/overlap next to the exact ground truth
    (count-distinct + a semi-join-counted intersection) and the
    absolute overlap error. Rows-only driver check (estimates are
    approximate; DataSketches HLL is deterministic for fixed input
    VALUES, but not expressible in DuckDB); tests pin the
    inclusion-exclusion identity exactly and an error envelope vs
    exact. The overlap estimate inherits ~3× the union's relative
    error when the intersection is small — a documented property of
    inclusion-exclusion on HLL, which is why theta sketches exist;
    the envelope test bounds it for this cohort geometry."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].filter(F.col("event_type").isin(*OVERLAP_TYPES))
    sks = (ev.groupBy("event_type")
           .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sk"),
                F.countDistinct("user_id").alias("exact"))
           .localCheckpoint(eager=True))  # 2 rows; reused 3x
    a, b = OVERLAP_TYPES
    est = {k: sks.filter(F.col("event_type") == k)
           .select(F.hll_sketch_estimate("sk").alias("e"), "exact")
           for k in (a, b)}
    union = sks.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e_union"))
    users = ev.select("event_type", "user_id").distinct()
    exact_both = (users.filter(F.col("event_type") == a)
                  .select("user_id")
                  .join(users.filter(F.col("event_type") == b)
                        .select("user_id"), "user_id", "semi")
                  .agg(F.count("*").alias("exact_overlap")))
    ea = est[a].select(F.col("e").alias("approx_signup"),
                       F.col("exact").alias("exact_signup"))
    eb = est[b].select(F.col("e").alias("approx_purchase"),
                       F.col("exact").alias("exact_purchase"))
    out = (ea.crossJoin(F.broadcast(eb))
           .crossJoin(F.broadcast(union))
           .crossJoin(F.broadcast(exact_both)))
    overlap = (F.col("approx_signup") + F.col("approx_purchase")
               - F.col("e_union"))
    return out.select(
        "approx_signup", "approx_purchase",
        F.col("e_union").alias("approx_union"),
        overlap.alias("approx_overlap"),
        "exact_signup", "exact_purchase", "exact_overlap",
        (overlap - F.col("exact_overlap")).alias("overlap_err"))
