"""Structured Streaming surface + time-window operators.

The reference is batch-only; its incrementality is a persisted cursor
(Airflow Variable advanced 30 days per run, reference
`dags/etl_dag.py:31-46`) and its late-data story is the backfill
update path (SURVEY.md §2.8). Spark-first, both collapse into
Structured Streaming primitives:

- **file-source ingest** (`read_event_stream` → `ingest_bronze`):
  `readStream` over a landing directory replaces the cursor — the
  checkpoint IS the cursor, exactly-once per file, no bookkeeping
  tables. `Trigger.AvailableNow` gives the reference's batch windows;
  removing the trigger gives continuous ingest with zero code change.
- **watermarked tumbling/sliding/session windows**: the standard
  streaming aggregation shapes. The SAME `F.window`/`session_window`
  expressions run in batch, so each is registered as an oracle-checked
  batch query below — the driver verifies window semantics against
  DuckDB, and tests/test_streaming.py verifies stream == batch on the
  same data (the property Structured Streaming guarantees).
- **custom stateful operator** (`running_totals_stream`):
  `applyInPandasWithState` keeping per-user running count/sum across
  micro-batches — the pattern for operators with cross-batch state
  (the reference's nearest analog: its dedup-on-load existence probe,
  `database/operations.py:175-206`, which must remember what it has
  seen). Spark 4's successor API (`transformWithStateInPandas`,
  typed ValueState/ListState/MapState + timers) was evaluated and is
  unusable in this environment: its driver worker imports
  google.protobuf (absent, no network to install), crashing at query
  start — measured, not assumed. The applyInPandasWithState form
  carries the same per-key-state semantics.

Scale notes: windowed aggs shuffle on (key, window) — at 100 TB the
watermark bounds state size; session windows merge per key so skewed
users are the hot spot (AQE skew handling applies to the shuffle, the
state store partitions by key count). File-source ingest lists the
directory incrementally; at large file counts use
`maxFilesPerTrigger` to bound micro-batch size.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.errors import AnalysisException

from covid_weather_etl_spark.functions.numeric import dsum, dsum_sql
from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables

#: event schema as landed by the ingest stream (ts in microseconds —
#: the nanos quirk of the driver parquet is batch-read-specific).
EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

GAP = "30 minutes"
WATERMARK = "2 hours"


# ---------------------------------------------------------------------------
# streaming API
# ---------------------------------------------------------------------------

def read_event_stream(spark: SparkSession, landing_dir: str,
                      fmt: str = "parquet",
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a landing directory (S3/raw analog)."""
    reader = spark.readStream.format(fmt).schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(landing_dir)


def ingest_bronze(stream: DataFrame, bronze_dir: str, checkpoint_dir: str):
    """Exactly-once append of the landing stream into the bronze zone.

    The checkpoint replaces the reference's cursor Variable; re-runs
    resume after the last committed file, duplicates impossible.
    """
    return (stream
            .withColumn("ingest_batch", F.lit(None).cast("long"))
            .writeStream
            .format("parquet")
            .option("path", bronze_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
            .start())


def tumbling_counts_stream(events: DataFrame,
                           window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts — late events beyond the
    watermark are dropped (the streaming analog of the reference's
    'backfill updates the old row' late-data policy)."""
    return (events
            .withWatermark("ts", WATERMARK)
            .groupBy(F.window("ts", window), "event_type")
            .agg(F.count("*").alias("n_events"),
                 dsum("value", "sum_value"))
            .select(F.col("window.start").alias("w_start"),
                    F.col("window.end").alias("w_end"),
                    "event_type", "n_events", "sum_value"))


def session_windows_stream(events: DataFrame, gap: str = GAP) -> DataFrame:
    """Watermarked session windows per user (gap-merged)."""
    return (events
            .withWatermark("ts", WATERMARK)
            .groupBy(F.session_window("ts", gap), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.col("session_window.start").alias("s_start"),
                    F.col("session_window.end").alias("s_end"),
                    "n_events"))


def dedup_ingest_stream(events: DataFrame,
                        keys: tuple[str, ...] = ("event_id",),
                        watermark: str = WATERMARK) -> DataFrame:
    """Streaming arm of the natural-key dedup-on-load (D2 — reference
    loader existence probe, `etl/loader.py:36-57`; batch arm:
    operators/dedup.py::dedup_on_load): `dropDuplicatesWithinWatermark`
    emits the first arrival of each key and drops re-deliveries that
    arrive within the watermark horizon — exactly the at-least-once →
    effectively-once ingest guard an LLM-corpus landing stream needs.
    State is bounded: key state expires once the event-time watermark
    passes it (size ∝ watermark horizon × arrival rate, NOT stream
    length — the reason this beats unbounded `dropDuplicates` at
    100 TB/day). Events older than the watermark are dropped as late
    data, so they cannot re-introduce duplicates either — which also
    means the source must deliver roughly in event-time order: rows
    more than `watermark` behind the max seen event time are NOT
    emitted even if never seen before (size the watermark to the
    source's real out-of-orderness). Both properties are pinned in
    tests/test_streaming.py: stream==batch equality on time-ordered
    chunks with in-horizon redeliveries, and zero output for
    behind-the-watermark arrivals."""
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(list(keys)))


def enrich_stream(events: DataFrame, customer_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: tag each streaming event with the
    market segment of its user from the static customer dim (the
    streaming analog of the reference's dashboard joins against dim
    tables, `streamlit/etl_logs.py:188-204`). Stream-static joins are
    STATELESS — no watermark, no join state to grow — and Spark re-reads
    the static side each micro-batch, so dim updates land on the next
    trigger without a restart. The explicit `broadcast()` keeps the
    stream side un-shuffled: at 100 TB/day of events the dim (MBs) ships
    to executors; the firehose never repartitions. Left join keeps
    events whose user has no dim row (NULL segment → quarantine lane)."""
    dim = F.broadcast(
        customer_dim.select(F.col("c_custkey").alias("user_id"),
                            F.col("c_mktsegment").alias("segment")))
    return events.join(dim, "user_id", "left")


#: attribution lookback for the stream-stream join
ATTRIB_WINDOW = "1 hour"


def attribution_join_stream(events: DataFrame) -> DataFrame:
    """Watermarked stream-stream self-join: every purchase event joined
    to the same user's click events within the preceding hour. Both
    sides carry watermarks and the join condition bounds click_ts to a
    window around purchase_ts, so Spark can expire join state — the
    canonical stream-stream pattern (state size ∝ watermark horizon ×
    arrival rate, independent of stream length). Inner joins emit
    eagerly on match, so append output equals the batch join exactly
    (pinned in tests/test_streaming.py); the batch twin
    `click_attribution_window` is oracle-checked."""
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"))
              .withWatermark("click_ts", WATERMARK))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id",
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"))
                 .withWatermark("purchase_ts", WATERMARK))
    return (purchases.join(
        clicks,
        F.expr(f"""c_user = user_id AND
                   click_ts BETWEEN purchase_ts - INTERVAL {ATTRIB_WINDOW}
                                AND purchase_ts"""))
        .select("purchase_id", "user_id", "click_id",
                ((F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
                 / F.lit(1_000_000.0)).alias("secs_before")))


def unattributed_purchases_stream(events: DataFrame) -> DataFrame:
    """LEFT-OUTER watermarked stream-stream join — the semantics the
    inner attribution join cannot express: purchases with NO click in
    the preceding hour. Outer rows are held in state until the
    watermark proves no matching click can still arrive, THEN emitted
    with nulls — the state-expiry contract unique to outer
    stream-stream joins (an inner join emits eagerly; a left-outer
    must wait out the horizon). Downstream filters to the null-match
    rows, yielding the streaming anti-join. Stream==batch equality
    (after a watermark-advancing flush) is pinned in
    tests/test_streaming.py against `unattributed_purchases`."""
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"))
              .withWatermark("click_ts", WATERMARK))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id",
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"))
                 .withWatermark("purchase_ts", WATERMARK))
    joined = purchases.join(
        clicks,
        F.expr(f"""c_user = user_id AND
                   click_ts BETWEEN purchase_ts - INTERVAL {ATTRIB_WINDOW}
                                AND purchase_ts"""),
        "left_outer")
    return (joined.filter(F.col("click_id").isNull())
            .select("purchase_id", "user_id", "purchase_ts"))


@register(
    "unattributed_purchases",
    survey="streaming,J7,ext-range",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts
    FROM events p
    WHERE p.event_type = 'purchase'
      AND NOT EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click'
          AND c.user_id = p.user_id
          AND c.ts BETWEEN p.ts - INTERVAL '1 hour' AND p.ts
      )
    """,
)
def unattributed_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of unattributed_purchases_stream: purchases with no
    same-user click in the preceding hour — the interval ANTI-join
    (the attribution join's complement, and the question a marketing
    funnel asks about its dark traffic). Planned as a left join on
    the user key with the time-range residual, filtered to the
    null-match rows — Catalyst keeps it a single shuffled hash join;
    the NOT-EXISTS oracle states the same set."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"))
    return (purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & F.col("click_ts").between(
            F.col("purchase_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW}"),
            F.col("purchase_ts")),
        "left_outer")
        .filter(F.col("click_id").isNull())
        .select("purchase_id", "user_id", "purchase_ts"))


@register(
    "click_attribution_window",
    survey="streaming,ext-range,J1",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           c.event_id AS click_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0 AS secs_before
    FROM events p
    JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL '1 hour' AND p.ts
    """,
)
def click_attribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of attribution_join_stream: ALL clicks within the
    hour before each purchase (vs asof_join_attribution's latest-only).
    Equi-join on user_id with the time-range residual — Catalyst plans
    a shuffled hash join on the user key; the binned interval-join form
    (operators/temporal.py) is the drop-in when per-user event counts
    explode."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"))
    return (purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & F.col("click_ts").between(
            F.col("purchase_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW}"),
            F.col("purchase_ts")))
        .select("purchase_id", "user_id", "click_id",
                ((F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
                 / F.lit(1_000_000.0)).alias("secs_before")))


_STATE_SCHEMA = T.StructType([
    T.StructField("n_seen", T.LongType()),
    T.StructField("total", T.DoubleType()),
])
_RUNNING_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_seen", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _update_running(key, pdfs: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterable[pd.DataFrame]:
    """Stateful per-user accumulator: count/sum across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_seen": [n],
                        "total": [total]})


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via `applyInPandasWithState`: per-user
    running (count, sum) that survives micro-batch boundaries — state
    lives in the state store, partitioned by user, no driver memory."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_running,
                outputStructType=_RUNNING_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# the same window semantics as oracle-checked batch queries
# ---------------------------------------------------------------------------

@register(
    "tumbling_window_counts",
    survey="streaming,A6,A7",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS w_end,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql("value")} AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows over the event stream — identical
    expression runs under `readStream` in tumbling_counts_stream;
    stream==batch equivalence is tested in tests/test_streaming.py."""
    t = load_tables(spark, sf_dir, ("events",))
    return (t["events"]
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 dsum("value", "sum_value"))
            .select(F.col("window.start").alias("w_start"),
                    F.col("window.end").alias("w_end"),
                    "event_type", "n_events", "sum_value"))


@register(
    "sliding_window_avg",
    survey="streaming,A4,A9",
    oracle=f"""
    WITH buckets AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS b, value FROM events
    ),
    assigned AS (
        SELECT b AS w_start, value FROM buckets
        UNION ALL
        SELECT b - INTERVAL '1 hour' AS w_start, value FROM buckets
    )
    SELECT w_start, w_start + INTERVAL '2 hours' AS w_end,
           COUNT(*) AS n_events,
           {dsum_sql("value")} / COUNT(*) AS avg_value
    FROM assigned GROUP BY 1, 2
    """,
)
def sliding_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide): every event lands in two
    windows — Spark materializes the assignment inside `window()`; the
    oracle unions the two bucket starts explicitly."""
    t = load_tables(spark, sf_dir, ("events",))
    return (t["events"]
            .groupBy(F.window("ts", "2 hours", "1 hour"))
            .agg(F.count("*").alias("n_events"),
                 (dsum("value") / F.count("*")).alias("avg_value"))
            .select(F.col("window.start").alias("w_start"),
                    F.col("window.end").alias("w_end"),
                    "n_events", "avg_value"))


@register(
    "session_windows",
    survey="streaming,W-sessionize",
    bench=True,
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN ts > lag(ts) OVER w + INTERVAL '{GAP}' THEN 1
                    ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        -- the cumulative window MUST share the is_new window's total
        -- order (ts, event_id): with ts ties at a session boundary a
        -- different tiebreaker can place an unflagged tied row before
        -- the flagged one and assign it to the previous session.
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS s_start,
           MAX(ts) + INTERVAL '{GAP}' AS s_end,
           COUNT(*) AS n_events,
           {dsum_sql("value")} AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (30-min gap) via the native
    `session_window` expression — sessions merge while events arrive
    within the gap; window end = last event + gap. The oracle derives
    the identical sessions with a gaps-and-islands lag/cumsum (Spark's
    session merge condition is INCLUSIVE — an event landing exactly at
    prev_ts + gap still merges, empirically pinned in
    tests/test_eventstats.py — so a new session
    starts only at diff > gap — mirrored exactly)."""
    t = load_tables(spark, sf_dir, ("events",))
    return (t["events"]
            .groupBy(F.session_window("ts", GAP), "user_id")
            .agg(F.count("*").alias("n_events"),
                 dsum("value", "sum_value"))
            .select("user_id",
                    F.col("session_window.start").alias("s_start"),
                    F.col("session_window.end").alias("s_end"),
                    "n_events", "sum_value"))


def upsert_gold_stream(stream: DataFrame, gold_dir: str,
                       checkpoint_dir: str,
                       key_cols: tuple[str, ...] = ("event_id",)):
    """Streaming gold-zone upsert via `foreachBatch`: each micro-batch
    is deduped in-batch on the natural key, anti-joined against the
    gold directory, and bulk-appended — the streaming version of the
    ETL load stage (etl/pipeline.py `load`, itself the set-based
    replacement for the reference's per-row existence probe,
    `database/operations.py:175-206`). The checkpoint makes each
    source file processed once; the anti-join makes REPROCESSING
    harmless (a wiped checkpoint or an at-least-once source cannot
    create duplicates) — the two layers of exactly-once the reference
    gets from its cursor + per-row probes. At 100 TB the anti-join
    probes only the key columns of gold (column-pruned scan); with
    gold partitioned by the key's natural prefix the probe prunes to
    the partitions the batch touches."""
    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates(list(key_cols))
        try:
            existing = (spark.read.parquet(gold_dir)
                        .select(*key_cols).dropDuplicates(list(key_cols)))
            # Materialize the anti-join BEFORE the append job: the gold
            # read and the gold append must not share one job, or the
            # scan's file listing could race the write. localCheckpoint
            # is batch-sized (not gold-sized), so it is scale-safe.
            batch = (batch.join(existing, list(key_cols), "left_anti")
                     .localCheckpoint(eager=True))
        except AnalysisException as exc:
            # Only "path does not exist" means first batch; any other
            # failure (corrupt footer, schema drift, IO error) must
            # fail the batch rather than silently append duplicates.
            if (exc.getCondition() or "") != "PATH_NOT_FOUND":
                raise
        batch.write.mode("append").parquet(gold_dir)

    return (stream.writeStream
            .foreachBatch(upsert)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


# ---------------------------------------------------------------------------
# streaming incremental rollup maintenance (the MV-refresh twin)
# ---------------------------------------------------------------------------

#: exact accumulator for the maintained rollup state — DECIMAL survives
#: any number of partial merges bit-identically (see functions/numeric).
_ROLLUP_DEC = "decimal(25,6)"


def rollup_refresh_stream(stream: DataFrame, rollup_dir: str,
                          checkpoint_dir: str):
    """Streaming materialized-view maintenance via `foreachBatch`: each
    micro-batch folds its partial (day, event_type) aggregate into the
    persisted rollup — the Structured-Streaming twin of the batch
    `incremental_agg_maintenance` operator (operators/warehouse.py),
    maintaining merge(state, partial(batch)) == one-shot(all data),
    which the stream==batch pytest asserts.

    Exactly-once layers: the checkpoint feeds each source file once;
    on top, a batch-id high-watermark stored WITH the state makes the
    merge idempotent under foreachBatch's at-least-once replay (a
    failed-then-retried batch id folds in only once) — without the
    guard, a replayed micro-batch would silently double-count, the
    classic streaming-MV bug. COUNT merges by +, SUM by exact DECIMAL +,
    so the state never drifts from the one-shot truth at any merge
    depth. At 100 TB the state table is rewritten per refresh only at
    the touched keys' partitions (partition the state by day)."""
    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = (batch_df
                .groupBy(F.to_date("ts").alias("day"), "event_type")
                .agg(F.count("*").alias("n_events"),
                     F.sum(F.col("value").cast(_ROLLUP_DEC))
                      .alias("sum_dec")))
        old = None
        try:
            old = spark.read.parquet(rollup_dir)
            if old.agg(F.max("batch_hwm")).first()[0] >= batch_id:
                return  # replayed batch — already folded in
        except AnalysisException as exc:
            if (exc.getCondition() or "") != "PATH_NOT_FOUND":
                raise
        if old is not None:
            b, d = old.alias("b"), part.alias("d")
            zero = F.lit(0).cast(_ROLLUP_DEC)
            part = (b.join(d, ["day", "event_type"], "full_outer")
                    .select(
                        "day", "event_type",
                        (F.coalesce(F.col("b.n_events"), F.lit(0))
                         + F.coalesce(F.col("d.n_events"), F.lit(0)))
                        .alias("n_events"),
                        (F.coalesce(F.col("b.sum_dec"), zero)
                         + F.coalesce(F.col("d.sum_dec"), zero))
                        .alias("sum_dec")))
        # materialize BEFORE the overwrite: the merged frame's lineage
        # reads the same files the write replaces
        merged = (part.withColumn("batch_hwm", F.lit(batch_id))
                  .localCheckpoint(eager=True))
        merged.write.mode("overwrite").parquet(rollup_dir)

    return (stream.writeStream
            .foreachBatch(refresh)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """The maintained rollup, exact decimal state exposed as DOUBLE."""
    return (spark.read.parquet(rollup_dir)
            .select("day", "event_type", "n_events",
                    F.col("sum_dec").cast("double").alias("sum_value")))


# ---------------------------------------------------------------------------
# streaming incremental near-dup dedup (the persisted-index fold twin)
# ---------------------------------------------------------------------------

#: exact-Jaccard acceptance threshold — MUST match the batch family's
#: (ngram_jaccard_near_dup / incremental_dedup_clusters, J >= 0.2 over
#: distinct 3-gram word shingles), or stream != batch by construction.
DEDUP_FOLD_TAU = 0.2

#: document-stream schema as landed for the dedup fold.
DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _fold_part(state_dir: str, table: str, batch_id: int) -> str:
    import os
    return os.path.join(state_dir, table, f"fold={batch_id}")


def _read_prior_folds(spark: SparkSession, state_dir: str, table: str,
                      batch_id: int) -> "DataFrame | None":
    """All state partitions written by folds STRICTLY BEFORE this one.
    The `fold < batch_id` filter is a partition-pruned read (fold is
    the hive partition column) and is what makes a retried batch see
    exactly the state its first attempt saw — the fold is a pure
    function of (prior state, batch), so at-least-once redelivery
    rewrites the same partitions with the same bytes."""
    import os
    root = os.path.join(state_dir, table)
    try:
        return spark.read.parquet(root).filter(F.col("fold") < batch_id)
    except AnalysisException as exc:
        if (exc.getCondition() or "") != "PATH_NOT_FOUND":
            raise
        return None


def dedup_fold_batch(batch_df: DataFrame, batch_id: int,
                     state_dir: str) -> None:
    """Fold ONE micro-batch of documents into the persisted near-dup
    dedup state — the kernel `dedup_fold_stream` wires into
    `foreachBatch`, kept module-level so the at-least-once replay
    property is directly testable (call it twice with the same
    batch id; the state is byte-stable).

    State layout under ``state_dir`` (all hive-partitioned by fold):
      docs/fold=N  (doc_id, n)     — batch membership + shingle count
      idx/fold=N   (doc_id, s, n)  — the distinct-shingle inverted
                                     index rows this batch contributed
                                     (n denormalized so the candidate
                                     join never recomputes sizes)
      star/fold=N  (node, lbl)     — label-star DELTA: only nodes
                                     whose component label changed in
                                     this fold are rewritten; readers
                                     resolve latest-fold-wins.

    This is the production write shape at 100 TB: per-ingest cost is
    batch×(collision-bounded candidates) — never old×old — and the
    per-fold star delta is O(touched components), not a corpus-sized
    state rewrite (the batch `incremental_dedup_clusters` /
    `dedup_state_compaction_apply` family proves the same index-reuse
    contract; this operator is its Structured-Streaming twin, as
    `rollup_refresh_stream` is to `incremental_agg_maintenance`).
    Idempotence comes from partition-scoped overwrite rather than a
    high-watermark row: a retried batch id reads `fold < batch_id`
    state only, recomputes deterministically, and overwrites its own
    fold partitions in place — no double-fold, no tombstones. The
    multi-table write is not atomic across tables; on a transactional
    table format (Delta/Iceberg) the three writes become one commit —
    the fold logic is unchanged.
    """
    from covid_weather_etl_spark.functions.textops import shingled_rows
    from covid_weather_etl_spark.operators.corpus import (
        CC_SINGLE_TASK_MAX, cc_single_task, star_components)

    spark = batch_df.sparkSession
    # two exactly-once layers on top of the checkpoint, the
    # upsert_gold_stream pattern: in-batch dedup on the natural key,
    # then first-write-wins against already-ingested membership (an
    # at-least-once SOURCE redelivering a doc in a LATER fold would
    # otherwise append duplicate index rows and double its Jaccard
    # counts). The membership probe is a column-pruned anti-join.
    batch_df = batch_df.dropDuplicates(["doc_id"])
    prior_docs = _read_prior_folds(spark, state_dir, "docs", batch_id)
    if prior_docs is not None:
        batch_df = batch_df.join(prior_docs.select("doc_id"),
                                 "doc_id", "left_anti")
    # batch-sized, consumed 3x (docs write, idx write, candidate join)
    sh_new = (shingled_rows(batch_df.select("doc_id", "text"))
              .groupBy("doc_id")
              .agg(F.collect_list("s").alias("ss"),
                   F.count("*").alias("n"))
              .select("doc_id", F.explode("ss").alias("s"), "n")
              .localCheckpoint(eager=True))
    docs_new = (batch_df.select("doc_id")
                .join(sh_new.groupBy("doc_id").agg(F.max("n").alias("n")),
                      "doc_id", "left")
                .select("doc_id", F.coalesce("n", F.lit(0)).alias("n")))

    prior_idx = _read_prior_folds(spark, state_dir, "idx", batch_id)
    probe = sh_new.select("doc_id", "s", "n", F.lit(False).alias("is_old"))
    if prior_idx is not None:
        probe = probe.unionByName(
            prior_idx.select("doc_id", "s", "n",
                             F.lit(True).alias("is_old")))
    # candidates: new x (old ∪ new), shingle-bucketed (the LSH-free
    # exact form — pair generation proportional to true overlap); the
    # a<b guard dedupes new x new, is_old keeps new x old once
    a, b = sh_new.alias("a"), probe.alias("b")
    pairs = (a.join(b, (F.col("a.s") == F.col("b.s"))
                    & (F.col("a.doc_id") != F.col("b.doc_id")))
             .filter(F.col("b.is_old")
                     | (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.least("a.doc_id", "b.doc_id").alias("d1"),
                      F.greatest("a.doc_id", "b.doc_id").alias("d2"),
                      F.col("a.n").alias("n1"), F.col("b.n").alias("n2"))
             .agg(F.count("*").alias("c")))
    jac = F.col("c") / (F.col("n1") + F.col("n2") - F.col("c"))
    edges = (pairs.filter(jac >= DEDUP_FOLD_TAU)
             .select(F.col("d1").alias("a"), F.col("d2").alias("b"))
             .distinct())

    # resolve current labels (latest fold wins), contract edge
    # endpoints through them, then components over the CONTRACTED
    # graph — bounded by the batch's touched components, so the
    # single-task union-find kernel applies under the same gate as
    # the batch path (distributed star contraction above it)
    prior_star = _read_prior_folds(spark, state_dir, "star", batch_id)
    if prior_star is not None:
        labels = (prior_star.groupBy("node")
                  .agg(F.max_by("lbl", "fold").alias("lbl"))
                  .localCheckpoint(eager=True))
        la = F.coalesce(F.col("la.lbl"), F.col("e.a"))
        lb = F.coalesce(F.col("lb.lbl"), F.col("e.b"))
        contracted = (edges.alias("e")
                      .join(labels.alias("la"),
                            F.col("e.a") == F.col("la.node"), "left")
                      .join(labels.alias("lb"),
                            F.col("e.b") == F.col("lb.node"), "left")
                      .filter(la != lb)
                      .select(F.least(la, lb).alias("a"),
                              F.greatest(la, lb).alias("b"))
                      .distinct())
    else:
        labels = None
        contracted = edges
    contracted = contracted.localCheckpoint(eager=True)
    if contracted.count() <= CC_SINGLE_TASK_MAX:
        relabel = cc_single_task(contracted)
    else:
        relabel = star_components(contracted, op_name="dedup_fold")
    relabel = relabel.localCheckpoint(eager=True)  # consumed twice

    # delta = the merged old-label nodes themselves + every node whose
    # CURRENT label is one of those old labels (nodes in unmerged
    # components are not rewritten — the O(touched) write)
    delta = relabel.select("node", "lbl")
    if labels is not None:
        delta = delta.unionByName(
            labels.alias("s")
            .join(relabel.alias("r"),
                  F.col("s.lbl") == F.col("r.node"))
            .select(F.col("s.node").alias("node"),
                    F.col("r.lbl").alias("lbl")))
    delta = delta.select(F.col("node").cast("long"),
                         F.col("lbl").cast("long"))

    # partition-scoped overwrites make the whole fold idempotent;
    # delta is materialized BEFORE the star write because its lineage
    # reads the star directory the write extends
    delta = delta.localCheckpoint(eager=True)
    (sh_new.write.mode("overwrite")
     .parquet(_fold_part(state_dir, "idx", batch_id)))
    (docs_new.write.mode("overwrite")
     .parquet(_fold_part(state_dir, "docs", batch_id)))
    (delta.write.mode("overwrite")
     .parquet(_fold_part(state_dir, "star", batch_id)))


def dedup_fold_stream(stream: DataFrame, state_dir: str,
                      checkpoint_dir: str):
    """Streaming incremental near-dup dedup via `foreachBatch`: each
    micro-batch of documents folds into the persisted dedup state
    (shingle inverted index + label star), maintaining
    fold(...fold(fold(S0, b1), b2)..., bn) == one-shot(all docs) —
    exactly the batch `dedup_clusters` truth, which the stream==batch
    pytest asserts. Works because pairwise Jaccard is independent of
    the rest of the corpus (every pair is scored when its later doc
    arrives, against the persisted index) and component-min merge is
    associative — so fold order cannot change the fixpoint."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        dedup_fold_batch(batch_df, batch_id, state_dir)

    return (stream.writeStream
            .foreachBatch(fold)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def _ngram_pairs_ctes() -> str:
    """The shared 3-gram-Jaccard pair CTE chain (operators/text.py) —
    imported lazily so the registry's module loader never sees a
    streams→text edge at import time."""
    from covid_weather_etl_spark.operators.text import NGRAM_PAIRS_CTES
    return NGRAM_PAIRS_CTES


#: md5 first-hex-char cut points splitting a corpus into the 3
#: deterministic ingest folds the registered state query replays.
FOLD_CUTS = ("6", "b")

#: fold-state memo: state dirs already ensured this session.
_FOLD_MEMO: set = set()


def ensure_dedup_fold_state(spark: SparkSession, sf_dir: str) -> str:
    """The streaming dedup fold's persisted state for ``sf_dir``,
    built on first touch by replaying the corpus as THREE
    deterministic micro-batches (md5(doc_id) first hex char in
    [0,6) / [6,b) / [b,f]) through `dedup_fold_batch` — exactly what
    the foreachBatch sink does per trigger, minus the query harness —
    and read from the warehouse thereafter (the ensure_dedup_old_state
    precedent: queries over persisted streaming state bench the READ
    path, not a re-ingest). Keyed by corpus fingerprint + the fold
    algorithm constants."""
    import os
    from covid_weather_etl_spark.functions.artifacts import artifact_path
    path = artifact_path(sf_dir, "dedup_fold",
                         f"f3c{''.join(FOLD_CUTS)}j{DEDUP_FOLD_TAU}s3")
    if path not in _FOLD_MEMO and not os.path.isdir(path):
        docs = (load_tables(spark, sf_dir, ("documents",))["documents"]
                .select("doc_id", "text",
                        F.substring(F.md5(F.col("doc_id").cast("string")),
                                    1, 1).alias("h")))
        lo, hi = FOLD_CUTS
        for fold_id, cond in enumerate(
                (F.col("h") < lo,
                 (F.col("h") >= lo) & (F.col("h") < hi),
                 F.col("h") >= hi)):
            dedup_fold_batch(docs.filter(cond).select("doc_id", "text"),
                             fold_id, path)
    _FOLD_MEMO.add(path)
    return path


@register(
    "dedup_fold_state_clusters",
    survey="streaming-fold,LLM-dedup,D2,J1",
    oracle=lambda: f"""
    WITH RECURSIVE {_ngram_pairs_ctes()},
    edges AS (
        SELECT doc_id_1 AS a, doc_id_2 AS b FROM ngram_pairs
        UNION ALL
        SELECT doc_id_2, doc_id_1 FROM ngram_pairs
    ),
    walk(doc_id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.doc_id
    )
    SELECT doc_id,
           MIN(label) AS cluster_id,
           doc_id = MIN(label) AS is_canonical
    FROM walk GROUP BY doc_id
    """,
)
def dedup_fold_state_clusters(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The STREAMING fold's maintained cluster state as a driver-
    verified query: the corpus is replayed through `dedup_fold_batch`
    as three deterministic micro-batch folds into the persisted index
    (first touch only — thereafter this benches the latest-fold-wins
    read path), and the resolved labels are hash-compared against the
    from-scratch recursive-CTE cluster truth. A PASS row therefore
    proves the fold identity cross-engine every round:
    fold(fold(fold(S0,b1),b2),b3) == one-shot(corpus) — pairwise
    Jaccard is corpus-independent and component-min merge is
    associative — which is the correctness contract of
    `dedup_fold_stream` (the foreachBatch sink wiring the same
    kernel; stream==batch also pinned in tests/test_streaming.py).

    Scale: the state read is one max_by aggregate over the star
    deltas + one left join onto membership (both O(non-singleton) /
    O(corpus-keys) narrow frames); the first-touch build cost is the
    fold kernel's own — batch×(collision-bounded candidates) per
    fold, never old×old."""
    state = ensure_dedup_fold_state(spark, sf_dir)
    return read_dedup_fold_state(spark, state)


def read_dedup_fold_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained cluster assignment: every ingested doc with its
    latest-fold-wins component label (own id if singleton) — the same
    (doc_id, cluster_id, is_canonical) contract as the batch
    `dedup_clusters` query. The label resolution is one max_by
    aggregate over the star deltas; at 100 TB the periodic
    `dedup_state_compaction_apply` pass rewrites the deltas into a
    single fold so this read stays O(non-singleton nodes)."""
    import os
    docs = (spark.read.parquet(os.path.join(state_dir, "docs"))
            .select("doc_id").distinct())
    star = spark.read.parquet(os.path.join(state_dir, "star"))
    labels = (star.groupBy("node")
              .agg(F.max_by("lbl", "fold").alias("lbl")))
    return (docs.join(labels, docs["doc_id"] == labels["node"], "left")
            .select("doc_id",
                    F.coalesce("lbl", "doc_id").alias("cluster_id"),
                    (F.coalesce("lbl", "doc_id") == F.col("doc_id"))
                    .alias("is_canonical")))


# ---------------------------------------------------------------------------
# streaming fold-state compaction (maintain -> re-verify)
# ---------------------------------------------------------------------------

def compact_fold_state(spark: SparkSession, src_dir: str,
                       dst_dir: str) -> int:
    """Rewrite a multi-fold dedup state into ONE consolidated fold —
    the maintenance pass that bounds the fold-partition count the
    streaming sink accumulates (one docs/idx/star partition set per
    micro-batch, unbounded over time; the r11 gap this op closes).

    The consolidated fold keeps the HIGHEST committed fold id M, so
    every invariant the fold kernel relies on survives compaction:

    - future batches (id > M) read ``fold < batch_id`` and see exactly
      the pre-compaction state, because compaction is equivalence-
      preserving on everything the kernel consumes — membership is the
      same doc set, the index is the same (doc_id, s, n) posting set
      (first-write-wins already made each doc's rows unique), and the
      star deltas are replaced by their RESOLVED latest-fold-wins
      labels with identity rows (lbl == node, relabel bookkeeping that
      resolves to a no-op) dropped — so `read_dedup_fold_state` and
      the kernel's label-contraction join produce identical frames
      (pinned in tests/test_streaming.py, including a redelivery
      AFTER compaction);
    - the star read collapses from O(delta history) to one row per
      NON-CANONICAL doc — the minimum possible — and stays there;
    - a retried batch id <= M would see truncated state, which is why
      compaction only covers folds the streaming CHECKPOINT has
      committed (a committed availableNow batch is never redelivered;
      the foreachBatch retry window is only the in-flight batch).
      Run it with the stream stopped or on a snapshot, then swap the
      state pointer — same no-transactional-format story as the fold
      itself (on Delta/Iceberg the swap becomes one REPLACE commit).

    Scale: three narrow columnar rewrites (membership, postings,
    resolved labels) + one max_by label resolution — every frame
    O(state), nothing corpus-quadratic, nothing collected but the
    fold-id scalar. Returns M."""
    import os
    docs = spark.read.parquet(os.path.join(src_dir, "docs"))
    m = int(docs.agg(F.max("fold")).first()[0])
    (docs.select("doc_id", "n").write.mode("overwrite")
     .parquet(_fold_part(dst_dir, "docs", m)))
    idx = spark.read.parquet(os.path.join(src_dir, "idx"))
    (idx.select("doc_id", "s", "n").write.mode("overwrite")
     .parquet(_fold_part(dst_dir, "idx", m)))
    star = spark.read.parquet(os.path.join(src_dir, "star"))
    resolved = (star.groupBy("node")
                .agg(F.max_by("lbl", "fold").alias("lbl"))
                .filter(F.col("lbl") != F.col("node")))
    (resolved.select(F.col("node").cast("long"),
                     F.col("lbl").cast("long"))
     .write.mode("overwrite").parquet(_fold_part(dst_dir, "star", m)))
    return m


def ensure_compacted_fold_state(spark: SparkSession, sf_dir: str) -> str:
    """The compacted twin of `ensure_dedup_fold_state`'s 3-fold state,
    built once per corpus fingerprint as a SIBLING artifact (the
    `ensure_dedup_compacted` precedent: the live state stays
    untouched so the registered apply op's before/after accounting is
    deterministic under driver re-runs)."""
    import os
    from covid_weather_etl_spark.functions.artifacts import artifact_path
    path = artifact_path(sf_dir, "dedup_fold_cmp",
                         f"f3c{''.join(FOLD_CUTS)}j{DEDUP_FOLD_TAU}s3")
    if path not in _FOLD_MEMO and not os.path.isdir(path):
        live = ensure_dedup_fold_state(spark, sf_dir)
        compact_fold_state(spark, live, path)
    _FOLD_MEMO.add(path)
    return path


@register(
    "stream_fold_compaction_apply",
    survey="streaming-fold,LLM-dedup,A1,A2,D2,J1",
    oracle=lambda: f"""
    WITH RECURSIVE {_ngram_pairs_ctes()},
    edges AS (
        SELECT doc_id_1 AS a, doc_id_2 AS b FROM ngram_pairs
        UNION ALL
        SELECT doc_id_2, doc_id_1 FROM ngram_pairs
    ),
    walk(doc_id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.doc_id
    ),
    cl AS (SELECT doc_id, MIN(label) AS cluster_id FROM walk GROUP BY doc_id)
    SELECT CAST(3 AS INT) AS folds_before,
           CAST(1 AS INT) AS folds_after,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM sh) AS idx_postings_before,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM sh) AS idx_postings_after,
           (SELECT CAST(COUNT(DISTINCT cluster_id) AS BIGINT) FROM cl)
               AS n_clusters,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cl
            WHERE doc_id <> cluster_id) AS star_rows_after,
           CAST(0 AS BIGINT) AS label_mismatches
    """,
)
def stream_fold_compaction_apply(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """MAINTAIN → RE-VERIFY for the STREAMING dedup seam: EXECUTE the
    fold-state compaction (`compact_fold_state` — rewrite the 3
    hive fold partitions the micro-batch sink accumulated into one
    consolidated fold, star deltas replaced by resolved labels) and
    verify the compacted state against BOTH the live state and the
    from-scratch corpus truth in one all-integer row:

      folds_before/after        3 -> 1 partition-set consolidation
      n_docs                    membership carried (= corpus)
      idx_postings before/after the posting set is carried EXACTLY
                                (first-write-wins made it minimal
                                already — compaction must not lose or
                                duplicate a posting)
      n_clusters/star_rows_after the resolved labels: star collapses
                                to one row per non-canonical doc, so
                                star_rows_after = n_docs - n_clusters
      label_mismatches          docs whose compacted cluster label
                                differs from the live read — the
                                equivalence proof, counted by full
                                outer join, pinned 0 by the oracle

    The DuckDB twin recomputes every data-dependent column from the
    raw corpus (recursive-CTE cluster truth + the shared 3-gram
    posting CTE), so a driver PASS re-proves, cross-engine: the fold
    state's membership and index ARE the corpus's, the compacted
    labels ARE the one-shot truth, and compaction changed nothing a
    reader or a future fold can observe. Completes the streaming
    seam's train → consume → MAINTAIN → re-verify lifecycle
    (the dedup_state_compaction_apply / ivf_rebalance_apply pattern
    applied to the foreachBatch state; r11 verdict directive #4).

    Scale: all comparison frames are state-sized and narrow (two
    membership counts, two posting counts, one full outer join on
    doc_id); the compaction itself is three columnar rewrites —
    per-maintenance cost O(state), amortized across every subsequent
    read and fold, which stop paying O(delta history) per label
    resolution."""
    import os
    live = ensure_dedup_fold_state(spark, sf_dir)
    comp = ensure_compacted_fold_state(spark, sf_dir)
    docs_live = spark.read.parquet(os.path.join(live, "docs"))
    docs_comp = spark.read.parquet(os.path.join(comp, "docs"))
    idx_live = spark.read.parquet(os.path.join(live, "idx"))
    idx_comp = spark.read.parquet(os.path.join(comp, "idx"))
    star_comp = spark.read.parquet(os.path.join(comp, "star"))
    pre = read_dedup_fold_state(spark, live)
    post = read_dedup_fold_state(spark, comp)

    a_before = docs_live.agg(
        F.countDistinct("fold").cast("int").alias("folds_before"))
    a_after = docs_comp.agg(
        F.countDistinct("fold").cast("int").alias("folds_after"),
        F.count("*").cast("long").alias("n_docs"))
    a_ib = idx_live.agg(
        F.count("*").cast("long").alias("idx_postings_before"))
    a_ia = idx_comp.agg(
        F.count("*").cast("long").alias("idx_postings_after"))
    a_cl = post.agg(
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"))
    a_star = star_comp.agg(
        F.count("*").cast("long").alias("star_rows_after"))
    a_mm = (pre.select("doc_id", F.col("cluster_id").alias("c1"))
            .join(post.select("doc_id", F.col("cluster_id").alias("c2")),
                  "doc_id", "full")
            .filter(~F.col("c1").eqNullSafe(F.col("c2")))
            .agg(F.count("*").cast("long").alias("label_mismatches")))
    return (a_before.crossJoin(F.broadcast(a_after))
            .crossJoin(F.broadcast(a_ib))
            .crossJoin(F.broadcast(a_ia))
            .crossJoin(F.broadcast(a_cl))
            .crossJoin(F.broadcast(a_star))
            .crossJoin(F.broadcast(a_mm))
            .select("folds_before", "folds_after", "n_docs",
                    "idx_postings_before", "idx_postings_after",
                    "n_clusters", "star_rows_after", "label_mismatches"))


# ---------------------------------------------------------------------------
# streaming IVF ingest fold (the ANN seam's write-path streaming twin)
# ---------------------------------------------------------------------------

#: embedding-stream schema as landed for the IVF ingest fold.
VEC_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])

#: fold-state memo for the IVF ingest state dirs.
_IVF_FOLD_MEMO: set = set()


def ivf_fold_batch(batch_df: DataFrame, batch_id: int, state_dir: str,
                   codebook_rows: list) -> None:
    """Fold ONE micro-batch of vectors into the persisted IVF
    assignment state — the ANN write path as a foreachBatch kernel,
    completing the streaming symmetry: dedup has batch
    (`incremental_dedup_clusters`) + stream (`dedup_fold_batch`)
    twins; IVF had only the batch side (`ivf_incremental_ingest`,
    operators/similarity.py:2599) until this kernel.

    State layout: ``asg/fold=N (vec_id, c_id)`` — each fold writes
    exactly the vectors it admitted, assigned to the EXISTING trained
    cells by the same literal-codebook argmax the search path uses
    (`assign_cells_literal`: narrow map, no shuffle; the index is NOT
    retrained per batch — retraining is the rebalance seam's job).
    Exactly-once on top of the checkpoint is the dedup-fold recipe:
    in-batch dropDuplicates on vec_id, first-write-wins anti-join
    against prior-fold membership (column-pruned, partition-pruned
    ``fold < batch_id`` read), partition-scoped overwrite keyed by
    batch id. Assignment is per-vector algebra — independent of batch
    composition and order — so fold(...fold(S0,b1)...,bn) equals the
    one-shot assignment BY CONSTRUCTION once membership is
    exactly-once; the driver row (ivf_fold_state_cells) re-proves
    that equality cross-engine against the DuckDB argmax replay.

    100 TB: per-ingest cost is O(batch × k) narrow compute + one
    batch-sized write; the periodic `compact_fold_state`-style
    rewrite of asg/ into one fold bounds partition count (same
    maintenance story as the dedup fold — asg is a single table, so
    the generic kernel applies trivially)."""
    from covid_weather_etl_spark.operators.similarity import (
        _vecs, assign_cells_literal)
    spark = batch_df.sparkSession
    batch_df = batch_df.dropDuplicates(["vec_id"])
    prior = _read_prior_folds(spark, state_dir, "asg", batch_id)
    if prior is not None:
        batch_df = batch_df.join(prior.select("vec_id"),
                                 "vec_id", "left_anti")
    assigned = (assign_cells_literal(_vecs(batch_df), codebook_rows)
                .select("vec_id", F.col("c_id").cast("int")))
    (assigned.write.mode("overwrite")
     .parquet(_fold_part(state_dir, "asg", batch_id)))


def ivf_fold_stream(stream: DataFrame, state_dir: str,
                    checkpoint_dir: str, codebook_rows: list):
    """Structured-Streaming wiring for `ivf_fold_batch` — micro-batch
    ANN index ingest with at-least-once-safe partition-scoped
    overwrite (the dedup_fold_stream shape)."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ivf_fold_batch(batch_df, batch_id, state_dir, codebook_rows)

    return (stream.writeStream
            .foreachBatch(fold)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def ensure_ivf_fold_state(spark: SparkSession, sf_dir: str) -> str:
    """The IVF ingest fold's persisted state for ``sf_dir``: built on
    first touch by replaying the embeddings table as THREE
    deterministic micro-batches (md5(vec_id) first hex char — the
    dedup fold's split), read from the warehouse thereafter. Keyed by
    the embeddings content fingerprint + the fold constants."""
    import os
    from covid_weather_etl_spark.functions.artifacts import artifact_path
    from covid_weather_etl_spark.operators.similarity import (
        ensure_ivf_codebook)
    path = artifact_path(sf_dir, "ivf_fold", f"f3c{''.join(FOLD_CUTS)}",
                         table="embeddings")
    if path not in _IVF_FOLD_MEMO and not os.path.isdir(path):
        rows = ensure_ivf_codebook(spark, sf_dir)
        emb = (load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
               .select("vec_id", "embedding",
                       F.substring(F.md5(F.col("vec_id").cast("string")),
                                   1, 1).alias("h")))
        lo, hi = FOLD_CUTS
        for fold_id, cond in enumerate(
                (F.col("h") < lo,
                 (F.col("h") >= lo) & (F.col("h") < hi),
                 F.col("h") >= hi)):
            ivf_fold_batch(emb.filter(cond).select("vec_id", "embedding"),
                           fold_id, path, rows)
    _IVF_FOLD_MEMO.add(path)
    return path


def _ivf_fold_oracle(sf_dir: str) -> str:
    """DuckDB replay: one-shot argmax assignment of the WHOLE table
    over the persisted codebook (round-6 sims, ties to lowest c_id),
    per-cell totals + snapped shares — the fold state must equal it."""
    from covid_weather_etl_spark.operators.similarity import (
        ivf_codebook_path)
    path = ivf_codebook_path(sf_dir)
    return f"""
    WITH cb AS (
        SELECT c_id, cv FROM read_parquet('{path}/*.parquet')
    ), asg AS (
        SELECT e.vec_id,
               (SELECT c.c_id FROM cb c
                ORDER BY ROUND(list_cosine_similarity(
                             e.embedding::DOUBLE[], c.cv), 6) DESC,
                         c.c_id
                LIMIT 1) AS c_id
        FROM embeddings e
    ), counts AS (
        SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n FROM asg GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts
    )
    SELECT cb.c_id AS cell,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_vectors,
           FLOOR(COALESCE(c.n, 0) * 1e0 / t.t * 1e6 + 5e-1) / 1e6
               AS share
    FROM cb LEFT JOIN counts c ON c.c_id = cb.c_id
    CROSS JOIN tot t
    """


@register(
    "ivf_fold_state_cells",
    survey="streaming-fold,ext-sim,A6,J4",
    oracle=lambda: _ivf_fold_oracle("/root/testdata/sf0.01"),
    tags=("oracle-at-sf0.01",),
)
def ivf_fold_state_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING IVF ingest fold's maintained per-cell state as a
    driver-verified query: the embeddings table is replayed through
    `ivf_fold_batch` as three deterministic micro-batch folds into the
    persisted assignment state (first touch only — thereafter this
    benches the read path), and the per-cell occupancy is
    hash-compared against the one-shot DuckDB argmax replay over the
    persisted codebook. A PASS row proves, cross-engine, that the
    micro-batch ingest path loses nothing, duplicates nothing, and
    assigns exactly as the search path would — the
    dedup_fold_state_clusters contract applied to the ANN seam
    (its oracle-at-sf0.01 convention; per-SF oracle parity closed in
    tests/test_streaming.py against this SF's own artifacts).

    Scale: the read is one groupBy over the narrow (vec_id, c_id)
    state + a codebook-sized left join and a broadcast 1-row total —
    no wide shuffle; the build cost is the fold kernel's O(batch × k)
    per ingest."""
    import os
    from covid_weather_etl_spark.functions.numeric import fround
    from covid_weather_etl_spark.operators.similarity import (
        ensure_ivf_codebook)
    rows = ensure_ivf_codebook(spark, sf_dir)
    state = ensure_ivf_fold_state(spark, sf_dir)
    asg = spark.read.parquet(os.path.join(state, "asg"))
    counts = (asg.groupBy("c_id")
              .agg(F.count("*").cast("long").alias("n_vectors")))
    tot = counts.agg(F.sum("n_vectors").cast("long").alias("t"))
    cells = spark.createDataFrame(
        [(int(r["c_id"]),) for r in rows], "c_id int")
    n = F.coalesce(F.col("n_vectors"), F.lit(0)).cast("long")
    return (cells.join(counts, "c_id", "left")
            .crossJoin(F.broadcast(tot))
            .select(F.col("c_id").alias("cell"),
                    n.alias("n_vectors"),
                    fround(n * F.lit(1.0) / F.col("t")).alias("share")))


# ---------------------------------------------------------------------------
# streaming debounce (gap-based burst suppression)
# ---------------------------------------------------------------------------

_DEBOUNCE_OUT = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])
_DEBOUNCE_STATE = T.StructType([
    T.StructField("last_seen_us", T.LongType()),
])


def debounce_stream(events: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Streaming twin of the batch `debounce_events` rule (operators/
    dedup.py): per (user, event-type) stream, emit only events more
    than `gap_seconds` after their predecessor; the predecessor
    timestamp is per-key state in the state store, so bursts spanning
    micro-batch boundaries are still suppressed (the property a
    per-batch window can't give you). Within a batch events are
    processed in (ts, event_id) order; with an in-event-time-order
    landing pattern the output equals the batch lag-rule exactly
    (stream==batch pytest). Gap compare is µs-exact, matching the
    batch operator's convention.

    State is ONE long per key — bounded by key cardinality, not
    history; at 100 TB the state store partitions by key hash and the
    operator never shuffles more than (key, event) pairs."""
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterable[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            # normalize to µs explicitly: Arrow hands pandas ns-typed
            # datetimes, and a raw int64 view would be off by 1000×
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            keep = []
            for i, t_us in enumerate(ts_us):
                if last is None or t_us - last > gap_us:
                    keep.append(i)
                last = int(t_us)
            out = pdf.iloc[keep][["event_id", "user_id", "event_type",
                                  "ts"]]
            if len(out):
                yield out
        if last is not None:
            state.update((last,))

    return (events
            .groupBy("user_id", "event_type")
            .applyInPandasWithState(
                update,
                outputStructType=_DEBOUNCE_OUT,
                stateStructType=_DEBOUNCE_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# windowed drift monitor (stream twin of the drift pack)
# ---------------------------------------------------------------------------

#: reference/current split for the streaming drift monitor and the
#: z-score alert threshold.
DRIFT_CUTOFF = "2024-01-15"
DRIFT_Z = 3.0


def drift_reference(events: DataFrame) -> DataFrame:
    """Static per-type reference moments from the pre-cutoff slice:
    exact DECIMAL sums on the 2dp value grid (the welch_ttest_ab
    discipline) so mean/sd are partitioning-independent."""
    dec = lambda c: c.cast("decimal(25,6)")  # noqa: E731
    return (events
            .filter(F.col("ts") < F.lit(DRIFT_CUTOFF).cast("timestamp"))
            .filter(F.col("value").isNotNull())
            .groupBy("event_type")
            .agg(F.count("*").alias("ref_n"),
                 F.sum(dec(F.col("value"))).cast("double").alias("sx"),
                 F.sum(dec(F.round(F.col("value") * F.col("value"), 6)))
                 .cast("double").alias("sxx"))
            .select("event_type",
                    "ref_n",
                    (F.col("sx") / F.col("ref_n")).alias("ref_mean"),
                    F.sqrt((F.col("sxx")
                            - F.col("sx") * F.col("sx") / F.col("ref_n"))
                           / (F.col("ref_n") - 1)).alias("ref_sd")))


def _drift_select(win: DataFrame, ref: DataFrame) -> DataFrame:
    """Shared window-vs-reference z-score comparison — the ONE place
    the drift expressions live, so the batch and stream arms cannot
    diverge. ``win`` carries (window, event_type, n_events, wsx)."""
    z = ((F.col("wsx") / F.col("n_events") - F.col("ref_mean"))
         / (F.col("ref_sd") / F.sqrt(F.col("n_events"))))
    return (win.join(F.broadcast(ref), "event_type")
            .select(F.col("window.start").alias("w_start"),
                    F.col("window.end").alias("w_end"),
                    "event_type", "n_events",
                    F.round(F.col("wsx") / F.col("n_events"), 6)
                    .alias("win_mean"),
                    F.round("ref_mean", 6).alias("ref_mean"),
                    F.round(z, 6).alias("z_score"),
                    (F.abs(z) > DRIFT_Z).alias("alert")))


def _drift_windows(cur: DataFrame, ref: DataFrame) -> DataFrame:
    """Shared window-vs-reference comparison (batch and stream arms)."""
    dec = lambda c: c.cast("decimal(25,6)")  # noqa: E731
    win = (cur
           .filter(F.col("ts") >= F.lit(DRIFT_CUTOFF).cast("timestamp"))
           .filter(F.col("value").isNotNull())
           .groupBy(F.window("ts", "1 day"), "event_type")
           .agg(F.count("*").alias("n_events"),
                F.sum(dec(F.col("value"))).cast("double").alias("wsx")))
    return _drift_select(win, ref)


def drift_monitor_stream(events: DataFrame, ref: DataFrame) -> DataFrame:
    """Streaming arm: watermarked 1-day tumbling windows stream-static
    broadcast-joined against the precomputed reference moments — the
    production shape of distribution monitoring (reference frame
    re-read per micro-batch, no join state, the event firehose never
    repartitions beyond the window agg)."""
    return _drift_windows(events.withWatermark("ts", WATERMARK), ref)


@register(
    "drift_monitor_windows",
    survey="streaming,ext-drift,A4,A6",
    oracle=f"""
    WITH ref AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS ref_n,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
                   / COUNT(*) AS ref_mean,
               SQRT((CAST(SUM(CAST(ROUND(value * value, 6)
                                   AS DECIMAL(25,6))) AS DOUBLE)
                     - CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
                       * CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
                       / COUNT(*))
                    / (COUNT(*) - 1)) AS ref_sd
        FROM events
        WHERE ts < TIMESTAMP '{DRIFT_CUTOFF}' AND value IS NOT NULL
        GROUP BY 1
    ), win AS (
        SELECT time_bucket(INTERVAL '1 day', ts) AS w_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS wsx
        FROM events
        WHERE ts >= TIMESTAMP '{DRIFT_CUTOFF}' AND value IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT w.w_start, w.w_start + INTERVAL '1 day' AS w_end,
           w.event_type, w.n_events,
           ROUND(w.wsx / w.n_events, 6) AS win_mean,
           ROUND(r.ref_mean, 6) AS ref_mean,
           ROUND((w.wsx / w.n_events - r.ref_mean)
                 / (r.ref_sd / SQRT(w.n_events)), 6) AS z_score,
           ABS((w.wsx / w.n_events - r.ref_mean)
               / (r.ref_sd / SQRT(w.n_events))) > {DRIFT_Z} AS alert
    FROM win w JOIN ref r ON w.event_type = r.event_type
    """,
)
def drift_monitor_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed distribution-drift monitor: per (1-day tumbling
    window, event_type), the window mean of `value` z-scored against
    reference moments frozen from the pre-2024-01-15 training period;
    |z| > 3 raises the alert flag — the production monitoring loop
    closing over the drift pack (psi/ks give the deep reads, this is
    the always-on cheap read). IDENTICAL expression runs under
    readStream in drift_monitor_stream (stream-static broadcast join);
    stream==batch pinned in tests/test_streaming.py. All sums ride
    the 2dp DECIMAL grid, so window means, z-scores and alert bits
    are partitioning-independent on both engines.

    Plan (r9): ONE events scan. The cutoff is day-aligned (UTC
    session, midnight cutoff), so a single per-(day, type) rollup
    feeds BOTH sides: pre-cutoff rows roll up again (DECIMAL sums
    nest exactly, so the two-level moments are bit-identical to the
    direct per-type aggregate) into the reference; post-cutoff rows
    ARE the windows. At 100 TB this halves the firehose scan — the
    previous shape read events once for the reference and once for
    the windows. The stream arm keeps drift_reference (the reference
    is frozen state there, not recomputed per batch)."""
    t = load_tables(spark, sf_dir, ("events",))
    dec = lambda c: c.cast("decimal(25,6)")  # noqa: E731
    per = (t["events"]
           .filter(F.col("value").isNotNull())
           .groupBy(F.window("ts", "1 day"), "event_type")
           .agg(F.count("*").alias("n_events"),
                F.sum(dec(F.col("value"))).alias("sx_d"),
                F.sum(dec(F.round(F.col("value") * F.col("value"), 6)))
                .alias("sxx_d"))
           .localCheckpoint(eager=True))      # days×types-sized
    cutoff = F.lit(DRIFT_CUTOFF).cast("timestamp")
    ref = (per.filter(F.col("window.start") < cutoff)
           .groupBy("event_type")
           .agg(F.sum("n_events").cast("long").alias("ref_n"),
                F.sum("sx_d").cast("double").alias("sx"),
                F.sum("sxx_d").cast("double").alias("sxx"))
           .select("event_type", "ref_n",
                   (F.col("sx") / F.col("ref_n")).alias("ref_mean"),
                   F.sqrt((F.col("sxx")
                           - F.col("sx") * F.col("sx") / F.col("ref_n"))
                          / (F.col("ref_n") - 1)).alias("ref_sd")))
    win = (per.filter(F.col("window.start") >= cutoff)
           .select("window", "event_type", "n_events",
                   F.col("sx_d").cast("double").alias("wsx")))
    return _drift_select(win, ref)
