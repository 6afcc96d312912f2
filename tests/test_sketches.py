"""Sketch-based operators: HLL++ estimates must track exact counts."""

from __future__ import annotations

from covid_weather_etl_spark.queries.registry import all_queries
from tests.conftest import SF_DIR


def test_approx_distinct_within_tolerance(spark, duck):
    row = all_queries()["approx_distinct_profile"].fn(spark, SF_DIR).collect()[0]
    exact = duck.execute("""
        SELECT count(*), count(DISTINCT user_id), count(DISTINCT event_type),
               count(DISTINCT event_id),
               count(DISTINCT user_id || '|' || event_type)
        FROM events""").fetchone()
    assert row.n_rows == exact[0]
    for got, want in [(row.approx_users, exact[1]),
                      (row.approx_types, exact[2]),
                      (row.approx_events, exact[3]),
                      (row.approx_user_type_pairs, exact[4])]:
        assert abs(got - want) <= max(1, 0.05 * want), (got, want)
