"""Behavioral pins for the governance/experimentation cohort: CUPED
variance reduction, the k-anonymity privacy audit, and compaction
bin-packing — the properties their oracles alone don't state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from covid_weather_etl_spark.operators.dq import K_ANON
from covid_weather_etl_spark.operators.drift import cuped_adjusted_metric
from covid_weather_etl_spark.operators.dq import k_anonymity_report
from covid_weather_etl_spark.operators.warehouse import (
    COMPACT_TARGET_BYTES, compaction_plan,
)
from tests.conftest import SF_DIR


def test_cuped_theta_is_ols_slope_and_reduces_variance(spark):
    out = cuped_adjusted_metric(spark, SF_DIR).toPandas()
    x, y = out.pre_mean.to_numpy(), out.post_mean.to_numpy()
    n = len(out)
    assert n >= 3
    theta = ((n * (x * y).sum() - x.sum() * y.sum())
             / (n * (x * x).sum() - x.sum() ** 2))
    assert abs(out.theta.iloc[0] - theta) < 1e-5
    assert (out.theta == out.theta.iloc[0]).all()
    # in-sample, the OLS-theta adjustment can only shrink variance
    v_raw = np.var(y)
    v_adj = np.var(out.post_adj.to_numpy())
    assert v_adj <= v_raw + 1e-12
    # the adjustment is mean-preserving up to rounding: mean(adj) ==
    # mean(y) because sum(x - xbar) == 0
    assert abs(out.post_adj.mean() - y.mean()) < 1e-4


def test_k_anonymity_counts_match_pandas(spark):
    out = k_anonymity_report(spark, SF_DIR).toPandas().iloc[0]
    cu = spark.read.parquet(f"{SF_DIR}/customer.parquet").toPandas()
    qi = cu.assign(band=np.floor(cu.c_acctbal / 1000.0)).groupby(
        ["c_nationkey", "c_mktsegment", "band"]).size()
    assert out.n_groups == len(qi)
    assert out.min_group_size == qi.min()
    assert out.n_violating_groups == int((qi < K_ANON).sum())
    assert out.rows_at_risk == int(qi[qi < K_ANON].sum())
    assert out.n_rows == len(cu)


def test_compaction_bins_respect_partitions_and_target(spark):
    out = (compaction_plan(spark, SF_DIR).toPandas()
           .sort_values(["part_year", "file_month"]))
    # offsets are exact running sums within each year partition
    for _, g in out.groupby("part_year"):
        sizes = g.size_bytes.to_numpy()
        offsets = g.offset_bytes.to_numpy()
        assert offsets[0] == 0
        assert (offsets[1:] == np.cumsum(sizes)[:-1]).all()
        assert (g.bin_id.to_numpy()
                == offsets // COMPACT_TARGET_BYTES).all()
        # bins are monotone — a later file never lands in an earlier bin
        assert (np.diff(g.bin_id.to_numpy()) >= 0).all()
    # every (year, bin) holds at least one file and bins never span years
    pairs = out.groupby(["part_year", "bin_id"]).size()
    assert (pairs >= 1).all()


def test_dp_noisy_counts_mechanism(spark):
    """The Laplace mechanism's algebra: noise = noisy - true follows
    the inverse-CDF of Lap(1/eps) at the md5-derived uniform, and
    |noise| is bounded by (1/eps)·ln(1/u_min) for 8-hex-char grids."""
    import hashlib
    import math

    from covid_weather_etl_spark.operators.dq import (
        DP_EPSILON, dp_noisy_counts,
    )

    out = dp_noisy_counts(spark, SF_DIR).toPandas()
    cu = spark.read.parquet(f"{SF_DIR}/customer.parquet").toPandas()
    true = cu.c_mktsegment.value_counts()
    assert set(out.segment) == set(true.index)
    for _, r in out.iterrows():
        u = (int(hashlib.md5(r.segment.encode()).hexdigest()[:8], 16)
             + 0.5) / 16 ** 8
        lap = -(1 / DP_EPSILON) * math.copysign(1, u - 0.5) \
            * math.log(1 - 2 * abs(u - 0.5))
        assert abs(r.noisy_count - (true[r.segment] + lap)) < 1e-4
        assert r.epsilon == DP_EPSILON
