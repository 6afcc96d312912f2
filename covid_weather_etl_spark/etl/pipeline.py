"""Bronze→silver→gold ETL pipeline — the reference's flagship restated.

The reference's three imperative stages (`Extractor` → `Transformer` →
`Loader` over `S3/{raw,processed,error}/batch_<ts>/`, SURVEY.md §3.1)
become three declarative DataFrame jobs over a parquet lakehouse:

    bronze    staged raw JSON files, envelope {"data":[entry]}
    silver    validated + imputed entries (reference 'processed' zone)
    quarantine rejected whole files     (reference 'error' zone)
    gold      warehouse fact tables, anti-join-dedup append
    logs      append-only transform/load logs (reference extract.*,
              transform.logs, load.logs), latest-wins semantics

Faithful semantics from the reference:
- entry may be a JSON object or a 1-element array of one
  (`etl/transformer.py:31`) — normalized at parse;
- weather nulls: snow/tsun → 0.0 imputation, any other null rejects
  (`etl/transformer.py:46-57`); covid: ANY null rejects (`:35-40`);
- whole-FILE error granularity: one bad entry poisons its file
  (`etl/transformer.py:40,57-60`);
- load dedup on the natural key with skip-and-count
  (`database/operations.py:175-206`);
- ≥50% file error rate raises the critical alert flag
  (`etl/transformer.py:130-136`);
- incremental 30-day cursor advanced after load (`dags/etl_dag.py:40-46`).

Scale design: files are the unit of validation, so the file-level
verdict is one groupBy on the lineage column (`input_file_name()`), not
a driver loop; gold appends are anti-joins on the natural key — at
100 TB gold would be partitioned by date so the anti-join prunes to the
incoming date range.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from covid_weather_etl_spark import schemas as S


@dataclass(frozen=True)
class Lake:
    """Directory layout of the lakehouse."""
    root: str

    def path(self, zone: str, table: str = "") -> str:
        return os.path.join(self.root, zone, table) if table \
            else os.path.join(self.root, zone)


def _entry_schema(kind: str) -> T.StructType:
    return S.RAW_WEATHER_SCHEMA if kind == "weather" else S.RAW_COVID_SCHEMA


def read_staging(spark: SparkSession, staging_glob: str, kind: str) -> DataFrame:
    """Parse staged raw JSON (bronze) into one row per entry.

    Reads the `{"data": [<entry>]}` envelope with entries kept as raw
    JSON strings, then parses each entry, normalizing the reference's
    dict-vs-[dict] ambiguity (`etl/transformer.py:31`): a leading '['
    means a 1-element array wrapping the object. Carries
    `src_file` (via `input_file_name()`) as the lineage column that
    replaces the reference's import_logs bookkeeping.
    """
    schema = _entry_schema(kind)
    # multiLine: the reference writes indent=2 pretty JSON, one envelope
    # per file (etl/extractor.py:94-95) — not JSON-lines.
    raw = (spark.read.schema(S.ENVELOPE_SCHEMA)
           .option("multiLine", "true").json(staging_glob)
           .withColumn("src_file",
                       F.element_at(F.split(F.input_file_name(), "/"), -1)))
    entry_str = F.col("entry_str")
    parsed = F.when(
        F.ltrim(entry_str).startswith("["),
        F.from_json(entry_str, T.ArrayType(schema)).getItem(0),
    ).otherwise(F.from_json(entry_str, schema))
    return (
        raw.select("src_file", F.explode_outer("data").alias("entry_str"))
        .withColumn("entry", parsed)
        .select("src_file", "entry.*")
        # country from the reference's `<ISO>_<API>_<date>` file naming
        # (etl/extractor.py:48)
        .withColumn("country_code", F.split(F.col("src_file"), "_").getItem(0))
    )


def _invalid_entry(kind: str) -> F.Column:
    """Row-level validation predicate (True = bad entry)."""
    if kind == "weather":
        required = ["date"] + [f for f in S.WEATHER_FIELDS
                               if f not in S.WEATHER_IMPUTED]
    else:
        required = ["date"] + list(S.COVID_INT_FIELDS) + ["fatality_rate"]
    bad = F.lit(False)
    for c in required:
        bad = bad | F.col(c).isNull()
    return bad


def transform(spark: SparkSession, bronze: DataFrame, kind: str,
              batch_ts: int) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Validate + clean bronze entries → (silver, quarantine, transform_log).

    File-granular routing: ONE bad entry sends the whole file to
    quarantine (reference `etl/transformer.py:40,57-60`) — expressed as
    a groupBy on the lineage column, then a broadcast join of the
    verdict back onto the entries. No driver loop, no second read.
    """
    entries = bronze.withColumn("_bad", _invalid_entry(kind))
    verdict = (entries.groupBy("src_file")
               .agg(F.count("*").alias("n_entries"),
                    F.sum(F.col("_bad").cast("long")).alias("n_bad_entries"))
               .withColumn("status",
                           F.when(F.col("n_bad_entries") > 0, "Error")
                            .otherwise("Processed")))
    routed = entries.join(F.broadcast(verdict.select("src_file", "status")),
                          "src_file")
    quarantine = routed.filter(F.col("status") == "Error").drop("status", "_bad")
    good = routed.filter(F.col("status") == "Processed").drop("status", "_bad")

    countries = spark.createDataFrame(S.COUNTRIES, schema=S.COUNTRY_SCHEMA)
    code_to_name = F.broadcast(countries.select(
        F.col("code").alias("country_code"), F.col("name").alias("country")))

    if kind == "weather":
        silver = (
            good
            # snow/tsun null → 0.0 (reference etl/transformer.py:46-51)
            .fillna(0.0, subset=list(S.WEATHER_IMPUTED))
            .join(code_to_name, "country_code", "left")
            .select(
                F.to_timestamp("date").alias("date"),
                *[F.col(f).cast("float").alias(f) for f in S.WEATHER_FIELDS],
                F.coalesce("country", "country_code").alias("country"),
                "src_file",
                F.lit(batch_ts).cast("long").alias("batch_ts"))
        )
    else:
        silver = (
            good
            # drop last_update/region (reference etl/transformer.py:42-43)
            .drop("last_update", "region")
            .join(code_to_name, "country_code", "left")
            .select(
                F.to_date("date").alias("date"),
                *[F.col(f).cast("int").alias(f) for f in S.COVID_INT_FIELDS],
                F.col("fatality_rate").cast("float").alias("fatality_rate"),
                F.coalesce("country", "country_code").alias("country"),
                "src_file",
                F.lit(batch_ts).cast("long").alias("batch_ts"))
        )
    tlog = verdict.select(
        F.lit(batch_ts).cast("long").alias("batch_ts"),
        F.col("src_file").alias("source_file"),
        "status", "n_entries", "n_bad_entries")
    return silver, quarantine, tlog


def load(spark: SparkSession, silver: DataFrame, gold_path: str, kind: str,
         batch_ts: int) -> DataFrame:
    """Anti-join dedup append into gold → load_log.

    Replaces the reference's per-row existence probe
    (`database/operations.py:175-206`) with: in-batch dropDuplicates on
    the natural key, then one left-anti join against gold, then a bulk
    columnar append. Surrogate ids continue from max(gold.id) via
    row_number — the set-based get_or_create.
    """
    key = S.WEATHER_NATURAL_KEY if kind == "weather" else S.COVID_NATURAL_KEY
    try:
        existing = spark.read.parquet(gold_path)
        max_id = existing.agg(F.max("id")).collect()[0][0] or 0
    except Exception:
        existing, max_id = None, 0

    batch = silver.dropDuplicates(key)
    if existing is not None:
        batch = batch.join(existing.select(*key).dropDuplicates(key),
                           on=key, how="left_anti")
    # Dense unique ids WITHOUT a global window (a bare
    # W.orderBy(...) row_number funnels the whole batch through one
    # task — fatal at 100 TB appends). Two-phase, like
    # skew_resilient_running_total: partition-local row_number, then a
    # cumulative offset over the tiny one-row-per-partition count
    # table, broadcast back. Ids stay dense and continue from
    # max(gold.id); which row gets which id follows partition layout
    # (the reference's SERIAL made no ordering promise either).
    from pyspark.sql import Window as W
    w_in = (W.partitionBy("_pid")
            .orderBy(*[F.col(c) for c in ("date", "country")]))
    local = (batch.withColumn("_pid", F.spark_partition_id())
             .withColumn("_rn", F.row_number().over(w_in)))
    w_off = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = (local.groupBy("_pid").agg(F.max("_rn").alias("_cnt"))
               .withColumn("_off", F.coalesce(
                   F.sum("_cnt").over(w_off), F.lit(0)).cast("long"))
               .select("_pid", "_off"))
    to_append = (local
                 .join(F.broadcast(offsets), "_pid")
                 .withColumn("id", (F.col("_rn") + F.col("_off")
                                    + F.lit(max_id)).cast("long"))
                 .select("id", *[f.name for f in
                                 (S.WEATHER_SCHEMA if kind == "weather"
                                  else S.COVID_SCHEMA).fields if f.name != "id"]))
    # Unpartitioned at test scale so an all-quarantined batch still
    # leaves a readable (empty) gold footer; the at-scale layout adds
    # .partitionBy("country") — the reference's dominant filter (P4) —
    # plus a month component (see SCALE.md §1).
    # Count BEFORE the append, from a cached frame: re-executing this
    # lineage after the write would anti-join against a gold directory
    # that now contains the batch itself (and re-run the whole
    # non-deterministic spark_partition_id/row_number assignment).
    to_append = to_append.cache()
    n_loaded = to_append.count()
    to_append.write.mode("append").parquet(gold_path)
    to_append.unpersist()

    n_in = silver.count()
    return spark.createDataFrame(
        [(batch_ts, f"{kind}_batch", "Success", n_loaded, n_in - n_loaded)],
        schema=S.LOAD_LOG_SCHEMA)


@dataclass
class BatchResult:
    kind: str
    batch_ts: int
    n_files: int
    n_error_files: int
    error_rate_pct: float
    high_error_alert: bool   # reference: ≥50% → logger.critical
    n_loaded: int
    n_skipped_duplicates: int


def run_batch(spark: SparkSession, staging_glob: str, lake: Lake, kind: str,
              batch_ts: int) -> BatchResult:
    """One end-to-end batch: bronze → silver/quarantine → gold + logs."""
    import glob as _glob
    if not _glob.glob(staging_glob.removeprefix("file:")):
        # empty work-list: the reference logs and exits cleanly
        # (tests/test_transformer.py:185-192)
        return BatchResult(kind=kind, batch_ts=batch_ts, n_files=0,
                           n_error_files=0, error_rate_pct=0.0,
                           high_error_alert=False, n_loaded=0,
                           n_skipped_duplicates=0)
    bronze = read_staging(spark, staging_glob, kind)
    silver, quarantine, tlog = transform(spark, bronze, kind, batch_ts)

    silver.write.mode("append").parquet(lake.path("silver", kind))
    if quarantine.take(1):
        quarantine.write.mode("append").parquet(lake.path("quarantine", kind))
    tlog.write.mode("append").parquet(lake.path("logs", "transform"))

    # filter the silver zone to THIS batch's rows by the batch_ts lineage
    # column — file names repeat across backfill re-runs (reference D4).
    llog = load(spark, spark.read.parquet(lake.path("silver", kind))
                .filter(F.col("batch_ts") == batch_ts),
                lake.path("gold", kind), kind, batch_ts)
    llog.write.mode("append").parquet(lake.path("logs", "load"))

    stats = tlog.agg(
        F.count("*").alias("n_files"),
        F.sum(F.when(F.col("status") == "Error", 1).otherwise(0)).alias("n_err"),
    ).collect()[0]
    n_files, n_err = stats["n_files"], stats["n_err"] or 0
    rate = 100.0 * n_err / n_files if n_files else 0.0
    lrow = llog.collect()[0]
    return BatchResult(
        kind=kind, batch_ts=batch_ts, n_files=n_files, n_error_files=n_err,
        error_rate_pct=round(rate, 2),
        high_error_alert=rate >= 50.0,
        n_loaded=lrow["n_inserted"],
        n_skipped_duplicates=lrow["n_skipped_duplicates"])


# ---------------------------------------------------------------------------
# Incremental cursor (reference dags/etl_dag.py:31-46): a one-row state
# table instead of an Airflow Variable; the 30-day window arithmetic is
# identical.
# ---------------------------------------------------------------------------

CURSOR_DEFAULT = "2021-04-01"
WINDOW_DAYS = 30


def get_window(spark: SparkSession, lake: Lake) -> tuple[str, str]:
    """Current [start, end] backfill window (end = start + 29 days)."""
    path = lake.path("state", "cursor")
    try:
        start = spark.read.parquet(path).collect()[0]["start_date"]
    except Exception:
        start = CURSOR_DEFAULT
    end = (spark.range(1)
           .select(F.date_add(F.lit(start).cast("date"),
                              WINDOW_DAYS - 1).cast("string"))
           .collect()[0][0])
    return start, end


def advance_cursor(spark: SparkSession, lake: Lake) -> str:
    """Advance the cursor past the current window (reference
    set_start_date after load, `dags/etl_dag.py:44-46,84`)."""
    start, end = get_window(spark, lake)
    new_start = (spark.range(1)
                 .select(F.date_add(F.lit(end).cast("date"), 1).cast("string"))
                 .collect()[0][0])
    (spark.createDataFrame([(new_start,)], "start_date string")
     .write.mode("overwrite").parquet(lake.path("state", "cursor")))
    return new_start
