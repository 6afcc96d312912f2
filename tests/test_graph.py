"""Pins for weighted PageRank (operators/graph.py): parity with a
dense numpy power iteration on the same adjacency, rank-mass
conservation, and determinism across runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from covid_weather_etl_spark.operators.graph import (
    DAMPING, PR_ROUNDS, pagerank, purchase_edges,
)
from covid_weather_etl_spark.queries.registry import all_queries
from covid_weather_etl_spark.sources.catalog import load_tables

SF_DIR = "/root/testdata/sf0.001"
QUERIES = all_queries()


def _numpy_pagerank(sf_dir=SF_DIR):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    pairs = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
             .groupby(["o_custkey", "l_suppkey"]).size().reset_index(name="w"))
    nodes = sorted({f"c:{c}" for c in pairs.o_custkey}
                   | {f"s:{s}" for s in pairs.l_suppkey})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for _, r in pairs.iterrows():
        c, s, w = idx[f"c:{r.o_custkey}"], idx[f"s:{r.l_suppkey}"], r.w
        A[c, s] += w
        A[s, c] += w
    P = A / A.sum(axis=1, keepdims=True)     # row-stochastic
    rank = np.full(n, 1.0 / n)
    for _ in range(PR_ROUNDS):
        rank = (1 - DAMPING) / n + DAMPING * (P.T @ rank)
    return {v: rank[i] for v, i in idx.items()}


def test_pagerank_matches_power_iteration(spark):
    t = load_tables(spark, SF_DIR, ("lineitem", "orders"))
    got = {r["node"]: r["rank"]
           for r in pagerank(purchase_edges(t)).collect()}
    want = _numpy_pagerank()
    assert set(got) == set(want)
    for v, r in want.items():
        assert abs(got[v] - r) < 1e-12, (v, got[v], r)


def test_rank_mass_conserved_and_deterministic(spark):
    df = QUERIES["pagerank_suppliers"].fn(spark, SF_DIR)
    a = df.collect()
    b = QUERIES["pagerank_suppliers"].fn(spark, SF_DIR).collect()
    assert a == b
    assert len(a) > 0
    # suppliers' share of total mass is positive and below 1; the
    # full graph's mass (suppliers + customers) must be ~1 — recompute
    want = _numpy_pagerank()
    assert abs(sum(want.values()) - 1.0) < 1e-9
    supp_mass = sum(v for k, v in want.items() if k.startswith("s:"))
    got_mass = sum(r["rank"] for r in a)
    assert abs(got_mass - supp_mass) < 1e-6
    # ordering is by rank desc with suppkey tiebreak
    ranks = [r["rank"] for r in a]
    assert ranks == sorted(ranks, reverse=True)
