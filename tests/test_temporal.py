"""Edge-semantics pins for the temporal joins on synthetic frames.

The oracle parity tests (test_oracle_parity) prove these operators on
random data at two SFs; random timestamps almost never land exactly on
a tie or a ±W boundary, so those edges are pinned here deterministically.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from covid_weather_etl_spark.operators.temporal import (
    _HOUR_US, asof_attribution, interval_proximity,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, et, 0.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_asof_tie_no_prior_and_latest_wins(spark):
    ev = _events(spark, [
        (T0, 1, "click"),                            # 0: same instant as purchase 3
        (T0 - timedelta(hours=2), 1, "click"),       # 1: older click
        (T0 + timedelta(seconds=1), 1, "click"),     # 2: AFTER the purchase
        (T0, 1, "purchase"),                         # 3
        (T0, 2, "purchase"),                         # 4: user with no clicks at all
        (T0 - timedelta(seconds=5), 3, "click"),     # 5
        (T0 - timedelta(seconds=1), 3, "click"),     # 6: latest prior
        (T0, 3, "purchase"),                         # 7
    ])
    got = {r.event_id: r for r in asof_attribution(ev).collect()}
    assert set(got) == {3, 4, 7}
    # same-instant click counts as "at-or-before" (ties included)
    assert got[3].last_click_id == 0 and got[3].secs_since_click == 0.0
    # no prior click → NULLs survive (left as-of)
    assert got[4].last_click_id is None and got[4].secs_since_click is None
    # the most recent prior click wins, not just any prior
    assert got[7].last_click_id == 6 and got[7].secs_since_click == 1.0


def test_interval_boundary_and_adjacent_cells(spark):
    ev = _events(spark, [
        (T0, 1, "a"),                                   # 0
        (T0 + timedelta(hours=1), 1, "a"),              # 1: exactly +W from 0 → in
        (T0 + timedelta(hours=2, microseconds=1), 1, "a"),  # 2: W+1µs from 1 → out
        # pair straddling a cell boundary, gap far under W:
        (T0.replace(minute=59, second=59), 1, "b"),     # 3
        (T0.replace(minute=59, second=59) + timedelta(seconds=2), 1, "b"),  # 4
        (T0, 1, "lonely"),                              # 5: no partner type
    ])
    got = {r.event_type: r for r in interval_proximity(ev).collect()}
    # exactly-±W pair is included once; the W+1µs pair is excluded
    assert set(got) == {"a", "b"}
    assert got["a"].n_pairs == 1 and got["a"].avg_abs_delta_secs == 3600.0
    # adjacent-cell pair found exactly once (no double count from explode)
    assert got["b"].n_pairs == 1 and got["b"].avg_abs_delta_secs == 2.0
