"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``covid_weather_etl_spark``; every operator
registers itself in ``covid_weather_etl_spark.queries.registry`` with
its PySpark implementation and (where SQL-expressible) its DuckDB
oracle twin. This module just adapts the registry to the driver shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the engine's flagship `pipeline_status` query — the reference's
    multi-way LEFT JOIN + countDistinct + SUM(CASE WHEN) + GROUP BY
    monitoring shape (reference streamlit/etl_logs.py:188-204).
    """
    from covid_weather_etl_spark.queries.registry import all_queries
    from covid_weather_etl_spark.session import configure_existing

    configure_existing(spark)
    return all_queries()["pipeline_status"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from covid_weather_etl_spark.queries.registry import all_queries
    from covid_weather_etl_spark.session import configure_existing

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible ops)."""
    from covid_weather_etl_spark.queries.registry import all_queries

    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}
