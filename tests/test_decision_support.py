"""Behavioral pins for the decision-support shapes (TPC-H Q13/Q17/
Q18/Q21/Q22 analogs + Gini/HHI) beyond the oracle parity spine:
the semantics that make each shape a *shape* — the zero bucket of the
outer-join distribution, the correlated threshold, the strictly-after
tie rules of the late-supplier audit, and the closed-form inequality
identities on known inputs.
"""

from __future__ import annotations

import datetime as dt

import pytest

from covid_weather_etl_spark.operators import decision_support as ds
from tests.conftest import SF_DIR


def test_q13_includes_zero_order_customers(spark):
    """The LEFT join must keep customers with no qualifying orders in
    a c_count=0 bucket; total custdist must equal |customer|."""
    df = ds.order_count_distribution(spark, SF_DIR).toPandas()
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert df["custdist"].sum() == n_cust
    # the testdata has at least one customer with no non-urgent orders
    # at sf0.001 (150 customers, ~1.5k orders, 1/5 urgent) — and even
    # if not, the bucket column must be well-formed from 0 upward
    assert (df["c_count"] >= 0).all()


def test_q17_threshold_is_strictly_per_part(spark):
    """Recompute the small-quantity revenue from first principles in
    pandas and compare: the threshold is 0.5 * that part's mean
    quantity, not a global mean."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").toPandas()
    pt = spark.read.parquet(f"{SF_DIR}/part.parquet").toPandas()
    brand_keys = set(pt.loc[pt.p_brand == ds.Q17_BRAND, "p_partkey"])
    b = li[li.l_partkey.isin(brand_keys)]
    cut = b.groupby("l_partkey")["l_quantity"].mean() * ds.Q17_FRACTION
    small = b[b.l_quantity < b.l_partkey.map(cut)]
    expected = small.l_extendedprice.sum() / 7.0
    got = ds.small_quantity_revenue(spark, SF_DIR).collect()[0].avg_yearly
    if expected == 0 or got is None:
        assert not len(small)
    else:
        assert abs(got - expected) / abs(expected) < 1e-9


def test_q18_having_gate(spark):
    """Every emitted order's quantity exceeds the gate, and no
    qualifying order is missing."""
    out = ds.large_volume_customers(spark, SF_DIR).toPandas()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").toPandas()
    per_order = li.groupby("l_orderkey")["l_quantity"].sum()
    expected = set(per_order[per_order > ds.Q18_MIN_QTY].index)
    assert set(out["o_orderkey"]) == expected
    assert (out["total_qty"] > ds.Q18_MIN_QTY).all()


def test_q21_strictly_after_every_other_supplier(spark):
    """Brute-force the late-sole-supplier audit in pandas: a line
    qualifies iff its order is multi-supplier, status 'F', and its
    shipdate is strictly greater than every line of every OTHER
    supplier on that order (ties across suppliers disqualify)."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").toPandas()
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").toPandas()
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet").toPandas()
    f_orders = set(od.loc[od.o_orderstatus == "F", "o_orderkey"])
    counts: dict[int, int] = {}
    for ok, grp in li.groupby("l_orderkey"):
        if ok not in f_orders or grp.l_suppkey.nunique() < 2:
            continue
        for _, row in grp.iterrows():
            others = grp[grp.l_suppkey != row.l_suppkey]
            if row.l_shipdate > others.l_shipdate.max():
                counts[row.l_suppkey] = counts.get(row.l_suppkey, 0) + 1
    name = dict(zip(sup.s_suppkey, sup.s_name))
    expected = {}
    for k, v in counts.items():
        expected[name[k]] = expected.get(name[k], 0) + v
    got = {r.s_name: r.numwait
           for r in ds.late_sole_supplier(spark, SF_DIR).collect()}
    assert got == expected


def test_q22_prospects_have_no_orders_and_beat_mean(spark):
    out = ds.prospect_balance_report(spark, SF_DIR).toPandas()
    cu = spark.read.parquet(f"{SF_DIR}/customer.parquet").toPandas()
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").toPandas()
    cut = cu.loc[cu.c_acctbal > 0, "c_acctbal"].mean()
    prospects = cu[(cu.c_acctbal > cut)
                   & ~cu.c_custkey.isin(set(od.o_custkey))]
    assert out["numcust"].sum() == len(prospects)
    assert abs(out["totacctbal"].sum()
               - prospects.c_acctbal.sum()) < 1e-6


def test_gini_closed_form_on_synthetic_frame(spark):
    """Known-answer check: equal revenues → G = 0; one-customer-takes-
    all among n → G = (n-1)/n. Run the same rank identity the operator
    uses on a hand-built frame."""
    import pandas as pd
    rows = [("EQ", k, 100.0) for k in range(1, 5)]
    rows += [("ONE", 1, 0.000001)] + [("ONE", k, 0.000001)
                                      for k in range(2, 4)]
    rows += [("ONE", 9, 1000.0)]
    pdf = pd.DataFrame(rows, columns=["n_name", "c_custkey", "r"])

    def gini(g):
        x = g.sort_values(["r", "c_custkey"]).r.to_numpy()
        n = len(x)
        i = range(1, n + 1)
        s = x.sum()
        return (2 * sum(a * b for a, b in zip(i, x)) - (n + 1) * s) / (n * s)

    eq = gini(pdf[pdf.n_name == "EQ"])
    one = gini(pdf[pdf.n_name == "ONE"])
    assert abs(eq) < 1e-12
    # near-total concentration among 4 customers → G ≈ 3/4
    assert abs(one - 0.75) < 1e-5


def test_hhi_bounds_and_monopoly(spark):
    """HHI ∈ (0, 10000]; a nation with a single supplier must score
    exactly 10000 — check algebra against the operator output."""
    out = ds.hhi_supplier_concentration(spark, SF_DIR).toPandas()
    assert ((out.hhi > 0) & (out.hhi <= 10000.0)).all()
    mono = out[out.n_suppliers == 1]
    assert (mono.hhi == 10000.0).all()
    # equal-share floor: HHI >= 10000 / n_suppliers
    assert (out.hhi >= 10000.0 / out.n_suppliers - 1e-6).all()
