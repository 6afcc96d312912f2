"""SparkSession factory tuned for this engine.

The reference delegates all planning to Postgres and pandas
(SURVEY.md §4); here the session is configured so Catalyst + AQE do that
job: adaptive execution for runtime re-planning (skew joins, partition
coalescing), UTC session time so parquet timestamps compare bit-for-bit
with the DuckDB oracle, and Arrow enabled for the Pandas-UDF slow path.

At 100 TB these settings change meaning but not shape: shuffle
partitions scale with cluster cores (AQE coalesces down), and
`maxPartitionBytes` keeps scan tasks ~128 MB so a 1000-executor cluster
gets even work distribution.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "covid-weather-etl-spark",
              cpus: int | str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus if str(cpus).isdigit() else 32)))
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to a session we did not build.

    The driver hands `queries()` callables an externally built session; the
    settings that matter for oracle parity (UTC time zone) and for plan
    quality (AQE) are runtime-settable and applied here.
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        # r12: the single-task gates (graph.py, corpus.py) answer their
        # row-count guard from parquet footer statistics when aggregate
        # pushdown is on; the engine session always set this but the
        # driver's vanilla session did not, so gate counts paid a real
        # scan there. Metadata counts are exact — plan-only change.
        ("spark.sql.parquet.aggregatePushdown", "true"),
        # driver testdata events.ts is TIMESTAMP(NANOS); see sources/catalog.py
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - non-settable on some builds
            pass
    return spark
