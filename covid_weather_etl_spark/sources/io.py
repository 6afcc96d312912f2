"""Batch connectors beyond parquet (SURVEY.md S5-S8).

- ORC sink/source: the second columnar interchange format (Hive/Trino
  consumers); footer-schema'd, pushdown-capable, same engine contract
  as parquet.
- CSV sink/source (reference exports forecasts/predictions to CSV,
  `dags/forecasting_dag.py:265-266`): header'd, schema-on-read-back.
- JDBC scan + vectorized append (reference reads `load.weather` via
  SQLAlchemy and inserts row-at-a-time via psycopg2,
  `database/operations.py:63-108`): `spark.read.jdbc` pushes the
  predicate + projection into the database and partitions the scan on
  a numeric column; `df.write.jdbc(mode="append")` batches inserts —
  the vectorized replacement for the reference's per-row INSERT loop.
  Exercised end-to-end against embedded Derby (bundled with Spark's
  distribution) in tests/test_sources.py: append ×2, partitioned
  read-back, and filter/projection pushdown into the database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export with header — one file per partition; coalesce first
    if a single file is required (driver-sized results only)."""
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema-declared CSV read-back (never infer in production paths —
    inference is an extra full scan and type-unstable)."""
    return (spark.read.option("header", "true").schema(schema).csv(path))


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar interchange format warehouses
    (Hive/Trino ecosystems) expect alongside parquet. Same predicate
    pushdown / column pruning / min-max stripe statistics contract as
    the parquet path; ZLIB-by-default stripes. Use when a downstream
    Hive-first consumer can't take parquet; everything else in this
    engine stays parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — schema comes from the ORC footer (self-describing,
    like parquet; no inference scan)."""
    return spark.read.orc(path)


def read_jdbc_table(spark: SparkSession, url: str, table: str,
                    partition_column: str | None = None,
                    num_partitions: int = 8,
                    lower_bound: int | None = None,
                    upper_bound: int | None = None,
                    **properties: str) -> DataFrame:
    """JDBC scan (reference `SELECT * FROM load.weather` → pandas).

    With a numeric `partition_column` + bounds the scan fans out over
    `num_partitions` concurrent connections; Catalyst pushes filters
    and column pruning into the generated SQL.
    """
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table))
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (reader
                  .option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    return reader.load()


def write_jdbc_append(df: DataFrame, url: str, table: str,
                      batch_size: int = 10_000,
                      **properties: str) -> None:
    """Vectorized JDBC append — replaces the reference's per-row
    parameterized INSERT loop with batched executemany per partition."""
    writer = (df.write.format("jdbc").mode("append")
              .option("url", url).option("dbtable", table)
              .option("batchsize", str(batch_size)))
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.save()
