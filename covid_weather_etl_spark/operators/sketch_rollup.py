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


#: bitmap bucket width: 62 id-bits per signed BIGINT word keeps
#: 1<<bit away from the sign bit on BOTH engines (DuckDB raises on
#: 1::BIGINT << 63).
BITMAP_BITS = 62


@register(
    "bitmap_audience_intersection",
    survey="ext-sketch,A2,J1,F10",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT event_type, user_id FROM events
        WHERE event_type IN ('signup', 'purchase')
    ), bm AS (
        SELECT event_type, user_id // {BITMAP_BITS} AS bucket,
               bit_or(1::BIGINT << CAST(user_id % {BITMAP_BITS} AS INT))
                 AS words
        FROM du GROUP BY 1, 2
    ), a AS (SELECT bucket, words FROM bm WHERE event_type = 'signup'),
       b AS (SELECT bucket, words FROM bm WHERE event_type = 'purchase'),
    sizes AS (
        SELECT CAST(SUM(CASE WHEN event_type = 'signup'
                             THEN bit_count(words) ELSE 0 END) AS BIGINT)
                 AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN bit_count(words) ELSE 0 END) AS BIGINT)
                 AS n_purchase
        FROM bm
    ), inter AS (
        SELECT CAST(COALESCE(SUM(bit_count(a.words & b.words)), 0)
                    AS BIGINT) AS n_both
        FROM a JOIN b USING (bucket)
    )
    SELECT n_signup, n_purchase, n_both,
           ROUND(n_both * 1.0 / (n_signup + n_purchase - n_both), 6)
             AS jaccard
    FROM sizes CROSS JOIN inter
    """,
)
def bitmap_audience_intersection(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """EXACT audience intersection via BITMAP indexes — the roaring-
    bitmap pattern (Druid / ClickHouse / Pinot segment bitmaps) as
    pure column algebra, and the exact counterpart of
    `hll_audience_overlap`'s estimate: pack each cohort's user-id set
    into 62-bit words (bucket = id div 62, one bit_or aggregate per
    (cohort, bucket)), then |A∩B| is a popcount over the bitwise AND
    of aligned words. Every set operation becomes integer algebra —
    union/difference/xor are the same one-line joins — and the
    intermediate state is |universe|/62 words per cohort, mergeable
    and FAR smaller than the id sets whenever ids are dense (the
    design reason warehouses keep dictionary-encoded dense ids).

    Exact and deterministic by construction (integer-only: no floats
    anywhere until the final jaccard, a single rounded division).
    Scale: one distinct-project of the fact (map-combinable), one
    shuffle on (cohort, bucket), one bucket-aligned equi-join of two
    word tables. Skew-free: the bucket key is uniformly dense by
    construction. Sparse-id universes want roaring's RLE containers —
    same plan, different word encoding."""
    t = load_tables(spark, sf_dir, ("events",))
    du = (t["events"]
          .filter(F.col("event_type").isin("signup", "purchase"))
          .select("event_type", "user_id").distinct())
    # F.shiftleft only takes a literal shift amount — column shifts
    # need the SQL expression form
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {BITMAP_BITS} AS INT))")
    bm = (du.select("event_type",
                    F.expr(f"user_id div {BITMAP_BITS}").alias("bucket"),
                    mask.alias("m"))
          .groupBy("event_type", "bucket")
          .agg(F.bit_or("m").alias("words"))
          .localCheckpoint(eager=True))    # reused: sizes + both sides
    sizes = bm.agg(
        F.sum(F.when(F.col("event_type") == "signup",
                     F.bit_count("words")).otherwise(0)).alias("n_signup"),
        F.sum(F.when(F.col("event_type") == "purchase",
                     F.bit_count("words")).otherwise(0))
        .alias("n_purchase"))
    a = (bm.filter(F.col("event_type") == "signup")
         .select("bucket", F.col("words").alias("wa")))
    b = (bm.filter(F.col("event_type") == "purchase")
         .select("bucket", F.col("words").alias("wb")))
    inter = (a.join(b, "bucket")
             .agg(F.coalesce(F.sum(F.bit_count(
                 F.col("wa").bitwiseAND(F.col("wb")))), F.lit(0))
                 .alias("n_both")))
    jac = (F.col("n_both") * 1.0
           / (F.col("n_signup") + F.col("n_purchase") - F.col("n_both")))
    return (sizes.crossJoin(F.broadcast(inter))
            .select("n_signup", "n_purchase", "n_both",
                    F.round(jac, 6).alias("jaccard")))
