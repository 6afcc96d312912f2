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


def test_approx_quantiles_within_rank_envelope(spark, duck):
    rows = all_queries()["approx_quantile_profile"].fn(spark, SF_DIR).collect()
    assert rows
    eps = 0.002  # accuracy=10000 → rank error ≤ n/10000; generous envelope
    for r in rows:
        for p, got in [(0.25, r.p25), (0.5, r.p50), (0.75, r.p75), (0.95, r.p95)]:
            lo, hi = duck.execute(
                """
                SELECT quantile_disc(l_extendedprice, ?),
                       quantile_disc(l_extendedprice, ?)
                FROM lineitem WHERE l_returnflag = ?
                """,
                [max(0.0, p - eps), min(1.0, p + eps), r.l_returnflag],
            ).fetchone()
            assert float(lo) <= float(got) <= float(hi), (r.l_returnflag, p, got, lo, hi)
