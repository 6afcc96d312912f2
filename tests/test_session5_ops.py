"""Behavioral pins for the round-4 close-out cohort — identities and
invariants the DuckDB oracles don't state: spine completeness/LOCF
semantics, TWA's pandas recount, scalar-subquery-max membership,
AM-GM-HM ordering, decay monotonicity, and journey reassembly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from covid_weather_etl_spark.operators.eventstats import (
    DECAY_HALF_LIFE_DAYS, time_decay_engagement,
)
from covid_weather_etl_spark.operators.quality import char_entropy_quality
from covid_weather_etl_spark.operators.relational_ext import (
    order_priority_journey,
)
from covid_weather_etl_spark.operators.stats import pythagorean_means_prices
from covid_weather_etl_spark.operators.temporal import time_weighted_average
from covid_weather_etl_spark.operators.timeseries import date_spine_fill
from covid_weather_etl_spark.operators.tpch_shapes import (
    Q15_HI, Q15_LO, top_supplier_quarter,
)
from tests.conftest import SF_DIR


def test_date_spine_is_complete_and_locf_fills(spark):
    out = date_spine_fill(spark, SF_DIR).toPandas()
    for _, g in out.groupby("n_name"):
        g = g.sort_values("d").reset_index(drop=True)
        days = pd.to_datetime(g.d)
        # complete consecutive calendar: n rows == span in days + 1
        assert len(g) == (days.iloc[-1] - days.iloc[0]).days + 1
        # is_missing <=> y null; y_locf carries the last observation
        assert (g.is_missing == g.y.isna()).all()
        expected = g.y.ffill()
        pd.testing.assert_series_equal(
            g.y_locf, expected, check_names=False)
        # first row of each nation is a real observation (bounds from MIN)
        assert not g.is_missing.iloc[0]


def test_time_weighted_average_matches_pandas(spark):
    out = (time_weighted_average(spark, SF_DIR)
           .toPandas().set_index("user_id").sort_index())
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    ev["ts"] = pd.to_datetime(ev.ts)
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        dt = (g.ts.shift(-1) - g.ts).dt.total_seconds().to_numpy() * 1e6
        v = g.value.to_numpy()
        mask = ~np.isnan(dt)
        if mask.sum() == 0:
            # a single-event user has no LEAD segment: the operator's
            # right-open convention legitimately omits them (advice
            # r4: don't KeyError on a denser/sparser fixture)
            assert uid not in out.index
            continue
        want = float((v[mask] * dt[mask]).sum() / dt[mask].sum())
        got = out.loc[uid]
        assert got.n_segments == mask.sum()
        assert math.isclose(got.twa_value, want, rel_tol=1e-9, abs_tol=2e-6)


def test_top_supplier_is_the_argmax_of_the_quarter(spark):
    out = top_supplier_quarter(spark, SF_DIR).toPandas()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").toPandas()
    li["d"] = pd.to_datetime(li.l_shipdate)
    q = li[(li.d >= Q15_LO) & (li.d < Q15_HI)].copy()
    q["rev"] = q.l_extendedprice * (1 - q.l_discount)
    per = q.groupby("l_suppkey").rev.sum()
    assert set(out.s_suppkey) <= set(per.index)
    top = per.max()
    for _, r in out.iterrows():
        assert math.isclose(r.total_revenue, top, rel_tol=1e-9)
    # nothing above the reported max
    assert (per <= top + 1e-6).all()


def test_pythagorean_means_obey_am_gm_hm(spark):
    out = pythagorean_means_prices(spark, SF_DIR).toPandas()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").toPandas()
    for _, r in out.iterrows():
        assert r.harm_mean <= r.geom_mean <= r.arith_mean
        x = li[li.l_returnflag == r.l_returnflag].l_extendedprice
        assert math.isclose(r.arith_mean, x.mean(), rel_tol=1e-9, abs_tol=1e-5)
        assert math.isclose(r.geom_mean,
                            math.exp(np.log(x).mean()),
                            rel_tol=1e-8, abs_tol=1e-4)
        assert math.isclose(r.harm_mean, len(x) / (1.0 / x).sum(),
                            rel_tol=1e-8, abs_tol=1e-4)


def test_time_decay_matches_pandas_and_decays(spark):
    out = (time_decay_engagement(spark, SF_DIR)
           .toPandas().set_index("user_id").sort_index())
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    ev["ts"] = pd.to_datetime(ev.ts)
    anchor = ev.ts.max()
    age = (anchor - ev.ts).dt.total_seconds() / 86400.0
    ev["term"] = ev.value * np.exp(-math.log(2) / DECAY_HALF_LIFE_DAYS * age)
    want = ev.groupby("user_id").term.sum()
    for uid, got in out.decayed_score.items():
        assert math.isclose(got, want[uid], rel_tol=1e-6, abs_tol=2e-5)
    # a decayed score never exceeds the undecayed value sum
    raw = ev.groupby("user_id").value.sum()
    assert (out.decayed_score <= raw[out.index] + 1e-6).all()


def test_char_entropy_bounds(spark):
    out = char_entropy_quality(spark, SF_DIR).toPandas()
    assert (out.char_entropy_bits >= -1e-9).all()
    # entropy over k symbols is at most log2(k)
    assert (out.char_entropy_bits
            <= np.log2(out.n_distinct_chars) + 1e-6).all()


def test_journey_reassembles_in_date_order(spark):
    out = (order_priority_journey(spark, SF_DIR)
           .toPandas().set_index("o_custkey"))
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").toPandas()
    o = o.sort_values(["o_orderdate", "o_orderkey"])
    want = o.groupby("o_custkey").o_orderpriority.agg(",".join)
    assert len(out) == len(want)
    for cust, j in out.journey.items():
        assert j == want[cust]
        assert j.count(",") + 1 == out.loc[cust].n_orders
