"""Deduplication / set operators (SURVEY.md §2.7) + exact-dup for documents.

The reference deduplicates twice: file-path dedup during load
(`etl/loader.py:79-90`) and record-level natural-key probes
(`database/operations.py:175-206`); backfill re-runs are latest-wins
updates (`etl/extractor.py:52-77`). All become set-based one-pass
operators here. The `documents` table gets the LLM-pipeline exact-dedup
treatment: content-hash groupBy — the O(n) first stage of any 100 TB
dedup stack (near-dup stages live in `minhash.py` / `similarity.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables


@register(
    "union_append",
    survey="D3",
    oracle="""
    SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT 'covid' AS src, o_orderkey FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT 'weather' AS src, o_orderkey FROM orders WHERE o_orderstatus <> 'F'
    ) GROUP BY src
    """,
)
def union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName append (reference per-API result-list extension,
    `etl/extractor.py:135-140` — COVID then WEATHER batches): two
    branches of the same scan unioned; Catalyst collapses to one scan."""
    t = load_tables(spark, sf_dir, ("orders",))
    fin = (t["orders"].filter(F.col("o_orderstatus") == "F")
           .select(F.lit("covid").alias("src"), "o_orderkey"))
    rest = (t["orders"].filter(F.col("o_orderstatus") != "F")
            .select(F.lit("weather").alias("src"), "o_orderkey"))
    return fin.unionByName(rest).groupBy("src").agg(F.count("*").alias("n"))


@register(
    "docs_exact_dedup",
    survey="D2,LLM-dedup",
    bench=True,
    oracle="""
    SELECT content_hash,
           CAST(COUNT(*) AS BIGINT)  AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id
    FROM (SELECT doc_id, md5(text) AS content_hash FROM documents)
    GROUP BY content_hash
    HAVING COUNT(*) > 1
    """,
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-zero-cost dedup over documents: md5 content hash →
    groupBy hash → keep min doc_id as canonical. At 100 TB the hash
    (16 bytes) shuffles instead of the text (KBs) — this is why the
    hash-first pattern matters."""
    t = load_tables(spark, sf_dir, ("documents",))
    return (
        t["documents"]
        .select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"),
             F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_copies") > 1)
    )


def dedup_on_load(new: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Reusable anti-join load dedup (reference loader existence probe,
    `etl/loader.py:36-57`): drop in-batch duplicates on the natural key,
    then anti-join against the target table. Returns only rows safe to
    append. Used by `etl.pipeline`."""
    return (
        new.dropDuplicates(keys)
        .join(existing.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
    )


@register("approx_distinct_profile", survey="A2-scale,A1")
def approx_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality profile — the 100 TB scale-up of the
    dashboard's COUNT(DISTINCT) (SURVEY.md §2.4 note): approximate
    distinct counts are map-side mergeable sketches, so the profile
    costs ONE pass and one tiny shuffle regardless of key cardinality,
    where exact distinct counting shuffles every distinct value.
    Rows-only driver check (sketch estimates are engine-specific);
    tests/test_sketches.py pins estimates within 5% of exact."""
    t = load_tables(spark, sf_dir, ("events",))
    e = t["events"]
    return e.agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.approx_count_distinct("event_type").alias("approx_types"),
        F.approx_count_distinct("event_id").alias("approx_events"),
        F.expr("approx_count_distinct(concat(user_id, '|', event_type))")
         .alias("approx_user_type_pairs"),
    )


@register("approx_quantile_profile", survey="A11-scale,A16")
def approx_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-error-bounded quantile sketch — the 100 TB scale-up of the
    exact `percentile` used by summary_stats / monthly_boxplot_stats
    (reference `df.describe()` / boxplots, SURVEY.md §2.4 A11/A16).
    Exact percentiles need all values of a group collected to one
    reducer; `percentile_approx` (Greenwald-Khanna sketch) is map-side
    mergeable, so the profile is one pass + a tiny shuffle of fixed-size
    sketches regardless of group size. accuracy=10000 bounds rank error
    to n/10000 per group. Rows-only driver check (sketch picks are
    engine-specific); tests/test_sketches.py pins each estimate inside
    the exact [p-eps, p+eps] quantile envelope."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.percentile_approx(
                "l_extendedprice", [0.25, 0.5, 0.75, 0.95], 10000
            ).alias("q"),
        )
        .select(
            "l_returnflag", "n_rows",
            F.col("q")[0].alias("p25"), F.col("q")[1].alias("p50"),
            F.col("q")[2].alias("p75"), F.col("q")[3].alias("p95"),
        )
    )


@register(
    "latest_event_per_user",
    survey="D4,J9",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM (
        SELECT event_id, user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins dedup (the append-only replacement for the
    reference's keyed UPDATE upserts, `database/operations.py:157-172`):
    row_number over (key ORDER BY ts DESC) = 1. One shuffle on the key;
    at scale this is the standard CDC-compaction pattern."""
    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "distinct_pairs",
    survey="D1,A13",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-level dedup (reference file-path dedup,
    `etl/loader.py:79-90`): DISTINCT on the natural key — map-side
    partial dedup then one shuffle."""
    t = load_tables(spark, sf_dir, ("events",))
    return t["events"].select("user_id", "event_type").distinct()


#: burst-suppression gap: an event within this many seconds of the
#: previous same-(user, type) event is treated as a redelivery/bounce.
DEBOUNCE_SECONDS = 300


@register(
    "debounce_events",
    survey="D2,W2,P7",
    oracle=f"""
    WITH landed AS (
        SELECT event_id, user_id, event_type, ts FROM events
        UNION ALL
        SELECT -event_id - 1, user_id, event_type,
               ts + INTERVAL 30 SECOND
        FROM events WHERE event_id % 10 = 0
    ), seq AS (
        SELECT event_id, user_id, event_type, ts,
               lag(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts
        FROM landed
    )
    SELECT event_id, user_id, event_type, ts
    FROM seq
    WHERE prev_ts IS NULL
       OR ts - prev_ts > INTERVAL {DEBOUNCE_SECONDS} SECOND
    """,
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst suppression (debounce): within each (user, event-type)
    stream keep only events more than {DEBOUNCE_SECONDS}s after their
    predecessor — double-clicks, retry storms, and duplicate webhook
    deliveries collapse to the burst's first event. Equivalent to
    keeping the FIRST event of every `session_window`-style chain with
    the same gap (an event opens a new chain iff its gap from the
    previous event exceeds the threshold), so the batch result matches
    what a streaming session-window head would emit.

    One lag window partitioned by (user, type) — never global, skew
    bounded by a single user's single-type history; the filter is a
    narrow map. The time-based rule complements the key-equality dedup
    family (D2): exact dedup removes identical rows, this removes
    near-in-time repeats with distinct ids."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select("event_id", "user_id", "event_type", "ts")
    # the stream is augmented with deterministic redeliveries (every
    # 10th event re-lands 30s later under fresh negative id −k−1, the
    # planted-fixture convention of pii_redaction / snapshot_diff) so
    # the operator provably fires: the natural stream's same-key gaps
    # are days at every SF
    redelivered = (ev.filter(F.col("event_id") % 10 == 0)
                   .select((-F.col("event_id") - 1).alias("event_id"),
                           "user_id", "event_type",
                           (F.col("ts")
                            + F.expr("INTERVAL 30 SECONDS")).alias("ts")))
    landed = ev.unionByName(redelivered)
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (landed
            .select("event_id", "user_id", "event_type", "ts",
                    F.lag("ts").over(w).alias("prev_ts"))
            # microsecond-exact gap: the event timestamps carry real
            # sub-second components, and a seconds-truncating cast
            # would silently disagree with the oracle's INTERVAL
            # comparison for gaps inside (300, 301)s
            .filter(F.col("prev_ts").isNull()
                    | (F.unix_micros("ts") - F.unix_micros("prev_ts")
                       > DEBOUNCE_SECONDS * 1_000_000))
            .drop("prev_ts"))
