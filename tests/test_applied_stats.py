"""Behavioral pins for the applied-stats trio: difference-in-
differences, split-conformal intervals, and WoE/IV binning —
closed-form identities and guarantees their oracles don't state.
"""

from __future__ import annotations

import pytest

import math

import numpy as np
import pandas as pd

from covid_weather_etl_spark.ml.queries import (
    CONF_ALPHA, conformal_forecast_intervals,
)
from covid_weather_etl_spark.operators.drift import (
    CUPED_SPLIT, DID_TREAT_MOD, did_revenue_uplift,
)
from covid_weather_etl_spark.operators.stats import (
    WOE_BAD_CUT, woe_iv_binning,
)
from tests.conftest import SF_DIR


@pytest.mark.slow
def test_did_matches_pandas_cells(spark):
    out = did_revenue_uplift(spark, SF_DIR).toPandas().iloc[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    ev["ts"] = pd.to_datetime(ev.ts)
    split = pd.Timestamp(CUPED_SPLIT)
    t, p = ev.user_id % DID_TREAT_MOD == 1, ev.ts >= split
    cells = {
        "m_treat_pre": ev.loc[t & ~p, "value"].mean(),
        "m_treat_post": ev.loc[t & p, "value"].mean(),
        "m_ctrl_pre": ev.loc[~t & ~p, "value"].mean(),
        "m_ctrl_post": ev.loc[~t & p, "value"].mean(),
    }
    for k, v in cells.items():
        assert abs(out[k] - v) < 1e-5, k
    did = ((cells["m_treat_post"] - cells["m_treat_pre"])
           - (cells["m_ctrl_post"] - cells["m_ctrl_pre"]))
    assert abs(out.did - did) < 1e-5
    assert (out.n_treat_pre + out.n_treat_post
            + out.n_ctrl_pre + out.n_ctrl_post) == len(ev)


@pytest.mark.slow
def test_conformal_radius_is_exact_order_statistic(spark):
    out = conformal_forecast_intervals(spark, SF_DIR).toPandas()
    assert len(out) > 0
    for _, r in out.iterrows():
        # the conformal rank, clamped to n_cal (advice r4: for
        # n_cal < ceil(1/alpha)-1 the raw rank n_cal+1 matches no
        # order statistic; the clamp keeps the group visible with the
        # max residual as a conservative radius), is a feasible index
        k = min(math.ceil((r.n_cal + 1) * (1 - CONF_ALPHA)), int(r.n_cal))
        assert 1 <= k <= r.n_cal
        assert r.q_alpha >= 0
        assert 0.0 <= r.coverage <= 1.0
        assert r.n_covered <= r.n_test
    # finite-sample guarantee holds in aggregate on exchangeable-ish
    # data: overall coverage should not sit far below 1 - alpha
    overall = out.n_covered.sum() / out.n_test.sum()
    assert overall > 1 - CONF_ALPHA - 0.15


def test_woe_iv_identities(spark):
    out = woe_iv_binning(spark, SF_DIR).toPandas()
    assert len(out) == 4
    b, g = out.n_bad.sum(), out.n_good.sum()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").toPandas()
    assert b == int((li.l_discount > WOE_BAD_CUT).sum())
    assert b + g == len(li)
    # recompute WoE / IV in numpy
    woe = np.log((out.n_bad / b) / (out.n_good / g))
    assert np.allclose(out.woe, woe, atol=1e-5)
    iv = ((out.n_bad / b - out.n_good / g) * woe).sum()
    assert abs(out.iv.iloc[0] - iv) < 1e-4
    assert (out.iv == out.iv.iloc[0]).all()
    # signs line up: a bin with WoE > 0 is bad-heavy relative to base
    base_rate = b / (b + g)
    heavy = out[out.woe > 0]
    assert ((heavy.n_bad / (heavy.n_bad + heavy.n_good))
            > base_rate - 1e-12).all()


def test_theilsen_mannkendall_numpy_parity(spark):
    from covid_weather_etl_spark.operators.timeseries import (
        theilsen_mannkendall_trend,
    )

    out = theilsen_mannkendall_trend(spark, SF_DIR).toPandas()
    assert len(out) > 0
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").toPandas()
    cu = spark.read.parquet(f"{SF_DIR}/customer.parquet").toPandas()
    na = spark.read.parquet(f"{SF_DIR}/nation.parquet").toPandas()
    df = od.merge(cu, left_on="o_custkey", right_on="c_custkey") \
           .merge(na, left_on="c_nationkey", right_on="n_nationkey")
    df["mx"] = ((pd.to_datetime(df.o_orderdate).dt.year - 1995) * 12
                + pd.to_datetime(df.o_orderdate).dt.month)
    monthly = df.groupby(["n_name", "mx"]).o_totalprice.sum()
    for _, r in out.iterrows():
        s = monthly[r.n_name].sort_index()
        x, y = s.index.to_numpy(float), s.to_numpy()
        n = len(y)
        assert r.n_months == n
        assert r.n_pairs == n * (n - 1) // 2
        slopes, sgn = [], 0
        for i in range(n):
            for j in range(i + 1, n):
                slopes.append((y[j] - y[i]) / (x[j] - x[i]))
                sgn += int(np.sign(y[j] - y[i]))
        assert r.s_stat == sgn
        assert abs(r.theil_sen_slope - np.median(slopes)) < 1e-4
        var_s = n * (n - 1) * (2 * n + 5) / 18.0  # no ties expected
        expect_z = ((sgn - 1) / math.sqrt(var_s) if sgn > 0
                    else (sgn + 1) / math.sqrt(var_s) if sgn < 0 else 0.0)
        assert abs(r.mk_z - expect_z) < 1e-4


def test_ips_snips_identities(spark):
    """With empirical-MLE propensities, Σw = N exactly, so SNIPS ==
    IPS; ESS is bounded by N and by the support size of the target
    policy's actions."""
    from covid_weather_etl_spark.operators.drift import (
        OPE_TARGET, ips_offpolicy_eval,
    )

    out = ips_offpolicy_eval(spark, SF_DIR).toPandas().iloc[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    assert out.n_logged == len(ev)
    assert abs(out.ips_value - out.snips_value) < 2e-6
    # numpy recompute
    cnt = ev.event_type.value_counts()
    n = len(ev)
    w = ev.event_type.map(
        lambda a: OPE_TARGET.get(a, 0.0) * n / cnt[a])
    assert abs(out.ips_value - (w * ev.value).mean()) < 1e-4
    ess = w.sum() ** 2 / (w * w).sum()
    assert abs(out.effective_sample_size - ess) < 1e-3
    assert out.effective_sample_size <= n


def test_ridge_normal_equations_matches_numpy(spark):
    from covid_weather_etl_spark.operators.stats import (
        RIDGE_LAMBDA, ridge_normal_equations,
    )

    out = ridge_normal_equations(spark, SF_DIR).toPandas().iloc[0]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").toPandas()
    X = np.column_stack([np.ones(len(li)), li.l_quantity, li.l_discount])
    y = li.l_extendedprice.to_numpy()
    beta = np.linalg.solve(
        X.T @ X + RIDGE_LAMBDA * np.eye(3), X.T @ y)
    assert out.n_rows == len(li)
    # decimal-exact sums vs numpy float sums: agreement to ~1e-6 rel
    for got, want in zip(
            [out.beta_intercept, out.beta_quantity, out.beta_discount],
            beta):
        assert math.isclose(got, want, rel_tol=1e-6, abs_tol=1e-6), \
            (got, want)


def test_blocking_quality_eval_invariants(spark):
    """Reduction/completeness must be consistent: the conjunction
    scheme prunes at least as hard as either component and covers at
    most as many true pairs; first_token blocking must be LOSSLESS on
    this corpus-free truth set only if every true pair shares its
    first token — assert the measured numbers agree with a recount
    from the name table."""
    import math
    from collections import Counter

    import pandas as pd

    from covid_weather_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR

    rows = {r["strategy"]: r for r in
            all_queries()["blocking_quality_eval"].fn(spark, SF_DIR)
            .collect()}
    assert set(rows) == {"first_token", "len_band", "token_and_band"}
    names = sorted(set(pd.read_parquet(f"{SF_DIR}/part.parquet")["p_name"]))
    nv = len(names)
    all_pairs = nv * (nv - 1) // 2
    # candidate counts from block sizes
    for strat, keyf in [
        ("first_token", lambda n: n.split(" ")[0]),
        ("len_band", lambda n: len(n) // 4),
        ("token_and_band", lambda n: (n.split(" ")[0], len(n) // 4)),
    ]:
        c = Counter(keyf(n) for n in names)
        want_cand = sum(v * (v - 1) // 2 for v in c.values())
        r = rows[strat]
        assert r["n_blocks"] == len(c)
        assert r["n_cand"] == want_cand
        assert r["reduction_ratio"] == math.floor(
            (1.0 - want_cand / all_pairs) * 1e6 + 0.5) / 1e6
        assert 0 <= r["n_true_covered"] <= r["n_true"]
    conj, t1, t2 = (rows["token_and_band"], rows["first_token"],
                    rows["len_band"])
    assert conj["n_cand"] <= min(t1["n_cand"], t2["n_cand"])
    assert conj["n_true_covered"] <= min(t1["n_true_covered"],
                                         t2["n_true_covered"])
