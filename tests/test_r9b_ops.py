"""Round-9 continuation operator tests: Nelson-Aalen hazard,
l-diversity, ABC classification. Each test recomputes the operator's
semantics independently (pandas replay or invariants the SQL twin
can't fake — e.g. exp(-H) >= S against the Kaplan-Meier sibling)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from covid_weather_etl_spark.queries.registry import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name]


def test_nelson_aalen_pandas_replay_and_km_bound(spark):
    na = (_q("nelson_aalen_hazard").fn(spark, SF_DIR)
          .toPandas().sort_values("day").reset_index(drop=True))
    km = (_q("kaplan_meier_conversion").fn(spark, SF_DIR)
          .toPandas().sort_values("day").reset_index(drop=True))
    # same risk table as the KM sibling, row for row
    assert list(na["day"]) == list(km["day"])
    assert list(na["n_at_risk"]) == list(km["n_at_risk"])
    assert list(na["n_events"]) == list(km["n_events"])
    # H(t) is a non-negative, non-decreasing step function
    assert (na["cum_hazard"] >= 0).all()
    assert na["cum_hazard"].is_monotonic_increasing
    assert na["hazard_var"].is_monotonic_increasing
    # independent replay of H and Var from the returned risk table
    h = v = 0.0
    for _, r in na.iterrows():
        n, d = int(r["n_at_risk"]), int(r["n_events"])
        h += round(d / n, 9)
        v += round(d / (n * n * 1.0), 9)
        assert abs(r["cum_hazard"] - h) < 2e-6
        assert abs(r["hazard_var"] - v) < 2e-6
    # classical inequality: exp(-H(t)) >= S(t), tight early
    m = na.merge(km[["day", "survival"]], on="day")
    keep = m["survival"] > 0
    assert (np.exp(-m.loc[keep, "cum_hazard"])
            >= m.loc[keep, "survival"] - 1e-9).all()


def test_l_diversity_pandas_replay(spark):
    from covid_weather_etl_spark.operators.dq import L_DIV, L_DIV_BAND
    df = (_q("l_diversity_report").fn(spark, SF_DIR)
          .toPandas().sort_values("l").reset_index(drop=True))
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    cust["sens"] = np.floor(cust["c_acctbal"] / L_DIV_BAND).astype(int)
    g = (cust.groupby(["c_nationkey", "c_mktsegment"])
         .agg(l=("sens", "nunique"), n=("sens", "size")))
    exp = g.groupby("l").agg(n_groups=("n", "size"), n_rows=("n", "sum"))
    assert df["n_rows"].sum() == len(cust)
    for _, r in df.iterrows():
        e = exp.loc[int(r["l"])]
        assert r["n_groups"] == e["n_groups"]
        assert r["n_rows"] == e["n_rows"]
        assert r["meets_l"] == int(r["l"] >= L_DIV)
        # entropy l-diversity can never exceed distinct-l
        assert r["min_entropy_l"] <= r["l"] + 1e-6
        assert r["min_entropy_l"] >= 1 - 1e-6
    # worst-group entropy replay for the most-diverse stratum
    lmax = int(df["l"].max())
    ents = []
    for _, grp in cust.groupby(["c_nationkey", "c_mktsegment"]):
        vc = grp["sens"].value_counts()
        if len(vc) != lmax:
            continue
        p = vc / vc.sum()
        ents.append(math.exp(sum(round(-x * math.log(x), 9) for x in p)))
    assert abs(df.set_index("l").loc[lmax, "min_entropy_l"]
               - min(ents)) < 2e-6


def test_abc_classification_pandas_replay(spark):
    from covid_weather_etl_spark.operators.decision_support import (
        ABC_A_CUT, ABC_B_CUT)
    df = (_q("abc_pareto_classification").fn(spark, SF_DIR)
          .toPandas().set_index("abc_class"))
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])
    li["r"] = (li["l_extendedprice"] * (1 - li["l_discount"])).round(6)
    rev = (li.groupby("l_partkey")["r"].sum()
           .reset_index().sort_values(["r", "l_partkey"],
                                      ascending=[False, True]))
    rev["c"] = rev["r"].cumsum()
    t = rev["r"].sum()
    rev["cls"] = np.where(rev["c"] * 100 <= t * ABC_A_CUT, "A",
                          np.where(rev["c"] * 100 <= t * ABC_B_CUT,
                                   "B", "C"))
    exp = rev.groupby("cls").agg(n_parts=("r", "size"),
                                 class_revenue=("r", "sum"))
    assert set(df.index) == set(exp.index)
    for cls in df.index:
        assert df.loc[cls, "n_parts"] == exp.loc[cls, "n_parts"]
        assert (abs(df.loc[cls, "class_revenue"]
                    - exp.loc[cls, "class_revenue"])
                < 1e-3 * max(1.0, exp.loc[cls, "class_revenue"]) * 1e-6
                + 0.02)
    # shares partition to 1; Pareto shape: A has few parts, most revenue
    assert abs(df["revenue_share"].sum() - 1.0) < 5e-6
    assert df.loc["A", "n_parts"] < df.loc["C", "n_parts"] or \
        df.loc["A", "class_revenue"] > df.loc["C", "class_revenue"]
    assert df.loc["A", "max_cum_share"] <= ABC_A_CUT / 100 + 1e-9
