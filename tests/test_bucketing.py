"""Bucketed co-located join: the fact-fact shuffle eliminator.

Pins the two properties that make bucketing worth its write-time cost:
the join plans with ZERO Exchange nodes, and the results are identical
to the unbucketed join (bucketing is physical layout, not semantics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_weather_etl_spark.operators.bucketing import (
    bucketed_join, ensure_bucketed,
)
from covid_weather_etl_spark.plans import inspect as I
from covid_weather_etl_spark.queries.registry import all_queries
from covid_weather_etl_spark.sources.catalog import load_tables
from tests.conftest import SF_DIR, assert_parity


def test_bucketed_join_has_no_shuffle(spark):
    """Both sides expose HashPartitioning(orderkey, N) from bucketing
    metadata, so the sort-merge join needs no Exchange at all."""
    df = bucketed_join(spark, SF_DIR)
    assert I.count_shuffles(df) == 0, I.physical_plan(df)


def test_unbucketed_join_shuffles(spark):
    """Control: the same join over plain parquet shuffles both sides —
    the cost bucketing removes."""
    t = load_tables(spark, SF_DIR, ("orders", "lineitem"))
    df = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    assert I.count_shuffles(df) >= 1 or I.broadcast_join_count(df) >= 1


def test_bucketed_join_matches_unbucketed(spark):
    """Physical layout must not change results: same row count and the
    same per-status revenue as the plain join."""
    t = load_tables(spark, SF_DIR, ("orders", "lineitem"))
    plain = (t["lineitem"]
             .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_orderstatus").count())
    bucketed = bucketed_join(spark, SF_DIR).groupBy("o_orderstatus").count()
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, bucketed.collect()))


def test_ensure_bucketed_idempotent(spark):
    """Second call must not rewrite: same database name, tables still
    present, one file per bucket from the aligned repartition."""
    db = ensure_bucketed(spark, SF_DIR)
    assert ensure_bucketed(spark, SF_DIR) == db
    assert spark.catalog.tableExists(f"{db}.orders_b")
    assert spark.catalog.tableExists(f"{db}.lineitem_b")


def test_bucketed_query_oracle_parity(spark, duck):
    assert_parity(spark, duck, all_queries()["bucketed_colocated_join"])
