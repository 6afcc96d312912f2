"""Round-9 continuation operator tests: Nelson-Aalen hazard,
l-diversity, ABC classification. Each test recomputes the operator's
semantics independently (pandas replay or invariants the SQL twin
can't fake — e.g. exp(-H) >= S against the Kaplan-Meier sibling)."""

from __future__ import annotations

import pytest

# The whole module is builder-side replay evidence (pandas/duckdb
# recomputations); the default run covers these ops via oracle parity.
pytestmark = pytest.mark.slow

import math

import numpy as np
import pandas as pd

from covid_weather_etl_spark.queries.registry import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name]


@pytest.mark.slow
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


@pytest.mark.slow
def test_kneser_ney_vs_addone_and_pandas_replay(spark):
    from covid_weather_etl_spark.operators.quality import (
        KN_DISCOUNT, PPLX_EVAL_CUT)
    kn = (_q("kneser_ney_bigram_eval").fn(spark, SF_DIR)
          .toPandas().set_index("source"))
    ao = (_q("ngram_perplexity_eval").fn(spark, SF_DIR)
          .toPandas().set_index("source"))
    # same split, same eval mass
    assert (kn["n_eval_bigrams"].sort_index()
            == ao["n_eval_bigrams"].sort_index()).all()
    assert (kn["oov_context_share"].between(0, 1)).all()
    # KN should beat add-one smoothing on held-out ppl for most
    # sources (that's WHY it's the production smoother)
    both = kn.join(ao, lsuffix="_kn", rsuffix="_ao")
    assert (both["perplexity_kn"] < both["perplexity_ao"]).mean() > 0.5
    # independent replay for one source
    import hashlib, math
    from collections import Counter
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    docs["is_eval"] = docs["doc_id"].map(
        lambda d: hashlib.md5(str(d).encode()).hexdigest()[:2]
        >= PPLX_EVAL_CUT)
    c12, uni = Counter(), set()
    for t in docs.loc[~docs["is_eval"], "text"]:
        w = t.split(" ")
        uni.update(w)
        for a, b in zip(w, w[1:]):
            c12[(a, b)] += 1
    c1, n1f, n1b = Counter(), Counter(), Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nb, v = len(c12), len(uni) + 1
    src = kn.index[0]
    ev = Counter()
    for t in docs.loc[docs["is_eval"]
                      & (docs["source"] == src), "text"]:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            ev[(a, b)] += 1
    tot = totk = 0.0
    for (a, b), k in ev.items():
        pc = (n1b.get(b, 0) + 1.0) / (nb + v)
        if a in c1:
            p = (max(c12.get((a, b), 0) - KN_DISCOUNT, 0.0) / c1[a]
                 + ((KN_DISCOUNT * n1f[a]) / c1[a]) * pc)
        else:
            p = pc
        tot += k * math.floor(math.log(p) * 1e6 + 0.5) / 1e6
        totk += k
    assert abs(kn.loc[src, "avg_neg_logprob"] - (-tot / totk)) < 2e-6


@pytest.mark.slow
def test_distinct_ngram_diversity_pandas_replay(spark):
    df = (_q("distinct_ngram_diversity").fn(spark, SF_DIR)
          .toPandas())
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["source", "text"])
    for (src, n), g in df.groupby(["source", "n"]):
        total = 0
        types = set()
        for t in docs.loc[docs["source"] == src, "text"]:
            w = t.split(" ")
            grams = [" ".join(w[i:i + n])
                     for i in range(len(w) - n + 1)]
            total += len(grams)
            types.update(grams)
        r = g.iloc[0]
        assert r["total_ngrams"] == total
        assert r["distinct_ngrams"] == len(types)
    # diversity declines with n never ABOVE 1, and distinct-1 <= vocab
    assert (df["distinct_ratio"] <= 1).all()
    assert (df["distinct_ratio"] > 0).all()


@pytest.mark.slow
def test_epoch_shuffle_plan_invariants(spark):
    from covid_weather_etl_spark.operators.bucketing import (
        EPOCH_SHARDS, EPOCH_SEEDS)
    df = (_q("epoch_shuffle_plan").fn(spark, SF_DIR)
          .toPandas().set_index("epoch"))
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    n = len(docs)
    ntok = int(docs["text"].str.split(" ").str.len().sum())
    assert set(df.index) == {str(e) for e in EPOCH_SEEDS}
    for e in df.index:
        assert df.loc[e, "n_docs"] == n
        assert df.loc[e, "n_tokens"] == ntok
        assert df.loc[e, "n_shards"] == EPOCH_SHARDS
        assert df.loc[e, "min_shard_docs"] >= 1
        # hash balance: no shard more than 2x the ideal
        assert df.loc[e, "max_shard_docs"] <= 2 * n / EPOCH_SHARDS + 8
    # both rows carry the same pair metrics
    assert df["preserved_adjacencies"].nunique() == 1
    assert df["moved_docs"].nunique() == 1
    # independent permutations: essentially no shared adjacency, and
    # ~ (S-1)/S of docs change shard between epochs
    assert df["preserved_adjacencies"].iloc[0] <= max(4, n // 100)
    expected_moved = n * (EPOCH_SHARDS - 1) / EPOCH_SHARDS
    assert abs(df["moved_docs"].iloc[0] - expected_moved) < 0.15 * n


@pytest.mark.slow
def test_bradley_terry_pandas_replay(spark):
    from covid_weather_etl_spark.operators.eventstats import BT_ROUNDS
    df = (_q("bradley_terry_strengths").fn(spark, SF_DIR)
          .toPandas().set_index("event_type").sort_index())
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["user_id", "event_type", "value"])
    ev = ev[ev["value"].notna()]
    tot = (ev.assign(v=ev["value"].round(6))
           .groupby(["user_id", "event_type"])["v"].sum().reset_index())
    import itertools
    types = sorted(tot["event_type"].unique())
    w = {(i, j): 0 for i in types for j in types if i != j}
    for _, g in tot.groupby("user_id"):
        vals = dict(zip(g["event_type"], g["v"]))
        for i, j in itertools.permutations(vals, 2):
            if vals[i] > vals[j]:
                w[(i, j)] += 1
    wins = {i: sum(w[(i, j)] for j in types if j != i) for i in types}
    nij = {(i, j): w[(i, j)] + w[(j, i)] for i, j in w}
    comps = {i: sum(nij[(i, j)] for j in types if j != i) for i in types}
    for i in types:
        assert df.loc[i, "n_wins"] == wins[i]
        assert df.loc[i, "n_comparisons"] == comps[i]
    # replay the fixed-round MM with the same grid snapping
    import math
    g6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    pi = {i: 1.0 for i in types}
    for _ in range(BT_ROUNDS):
        pr = {}
        for i in types:
            den = sum(math.floor(nij[(i, j)] * 1e9 / (pi[i] + pi[j])
                                 + 0.5) for j in types if j != i) / 1e9
            pr[i] = g6(wins[i] * 1.0 / den)
        tot_pi = sum(math.floor(pr[i] * 1e6 + 0.5) for i in types) / 1e6
        pi = {i: g6(pr[i] * len(types) / tot_pi) for i in types}
    for i in types:
        assert abs(df.loc[i, "strength"] - pi[i]) < 2e-6
    # more wins => more strength (same comparison counts by symmetry)
    order_w = sorted(types, key=lambda i: wins[i])
    order_s = sorted(types, key=lambda i: df.loc[i, "strength"])
    assert order_w == order_s


@pytest.mark.slow
def test_bradley_terry_kernel_equals_loop(spark):
    """The r12 single-task MM collapse is BIT-identical to the
    temp-view round loop: force both paths by flipping the gate
    (the graph-kernel test pattern)."""
    import struct

    import covid_weather_etl_spark.operators.eventstats as E

    def rows(df):
        return sorted((r["event_type"], r["n_wins"], r["n_comparisons"],
                       struct.pack("d", r["strength"]))
                      for r in df.collect())

    cap = E.BT_SINGLE_TASK_MAX
    try:
        E.BT_SINGLE_TASK_MAX = 10 ** 9
        single = rows(E.bradley_terry_strengths(spark, SF_DIR))
        E.BT_SINGLE_TASK_MAX = -1  # force the temp-view loop
        loop = rows(E.bradley_terry_strengths(spark, SF_DIR))
    finally:
        E.BT_SINGLE_TASK_MAX = cap
    assert single == loop and len(single) >= 2


@pytest.mark.slow
def test_fd_profile_pandas_replay(spark):
    from covid_weather_etl_spark.operators.dq import FD_CANDIDATES
    df = (_q("functional_dependency_profile").fn(spark, SF_DIR)
          .toPandas().set_index("candidate"))
    for tbl, lhs, rhs in FD_CANDIDATES:
        d = pd.read_parquet(f"{SF_DIR}/{tbl}.parquet",
                            columns=[lhs, rhs])
        g = d.groupby(lhs)[rhs].agg(["nunique", "size"])
        keep = (d.groupby([lhs, rhs]).size().reset_index(name="c")
                .groupby(lhs)["c"].max().sum())
        r = df.loc[f"{tbl}.{lhs} -> {tbl}.{rhs}"]
        assert r["n_rows"] == len(d)
        assert r["n_lhs_groups"] == len(g)
        assert r["n_violating_groups"] == int((g["nunique"] > 1).sum())
        assert r["g3_rows"] == len(d) - keep
        assert abs(r["g3_error"] - (len(d) - keep) / len(d)) < 2e-6
    # sanity: g3 = 0 iff zero violating groups
    z = df["n_violating_groups"] == 0
    assert (df.loc[z, "g3_rows"] == 0).all()
    assert (df.loc[~z, "g3_rows"] > 0).all()


@pytest.mark.slow
def test_cluster_purity_nmi_sklearn_free_replay(spark):
    """Replay purity/NMI from the engine's own assignment (codebook
    determinism itself is pinned in test_similarity_lsh), using only
    numpy — checks the information algebra, not the assignment."""
    df = (_q("cluster_purity_nmi_eval").fn(spark, SF_DIR)
          .toPandas().sort_values("cell").reset_index(drop=True))
    assert df["nmi"].nunique() == 1 and df["purity"].nunique() == 1
    nmi, purity = df["nmi"].iloc[0], df["purity"].iloc[0]
    assert 0 <= nmi <= 1 + 1e-9
    assert 0 < purity <= 1 + 1e-9
    # purity == weighted majority share
    w = (df["majority_share"] * df["n_vecs"]).sum() / df["n_vecs"].sum()
    assert abs(w - purity) < 5e-6
    assert (df["majority_share"] >= 1.0 / 10 - 1e-9).all()
    # NMI >= 0 requires MI >= 0 — and a clustering with k>1 cells on
    # labeled data should carry SOME signal here (fixture labels are
    # correlated with the embedding space)
    assert len(df) >= 2


def test_shapley_efficiency_axiom_and_replay(spark):
    from covid_weather_etl_spark.operators.eventstats import (
        SHAPLEY_CHANNELS, _SHAP_NFACT, _SHAP_W)
    df = (_q("shapley_attribution").fn(spark, SF_DIR)
          .toPandas().set_index("channel"))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    fp = (ev[ev["event_type"] == "purchase"]
          .groupby("user_id")["ts"].min())
    bits = dict(SHAPLEY_CHANNELS)
    touch = ev[ev["event_type"].isin(bits)].merge(
        fp.rename("p_ts"), on="user_id")
    touch = touch[touch["ts"] < touch["p_ts"]]
    masks = (touch.assign(b=touch["event_type"].map(bits))
             .groupby("user_id")["b"]
             .agg(lambda s: int(np.bitwise_or.reduce(s.values))))
    from collections import Counter
    cnt = Counter(masks.values)
    v = {S: sum(c for m, c in cnt.items() if (m & S) == m)
         for S in range(16)}
    # efficiency: sum phi = v(full lattice) (exact, integer phi24)
    assert df["phi24"].sum() == v[15] * _SHAP_NFACT
    assert sum(cnt.values()) == v[15]
    for ch, b in SHAPLEY_CHANNELS:
        phi24 = sum(_SHAP_W[bin(S).count("1")] * (v[S | b] - v[S])
                    for S in range(16) if not S & b)
        assert df.loc[ch, "phi24"] == phi24
        assert abs(df.loc[ch, "phi"] - phi24 / _SHAP_NFACT) < 1e-12
        assert df.loc[ch, "n_users_touched"] == sum(
            c for m, c in cnt.items() if m & b)
    # Shapley of a null player (channel touched by nobody) would be 0;
    # every real channel here has exposure, so all phis positive-ish
    assert (df["phi24"] >= 0).all()


def test_late_event_accounting_monotone_and_replay(spark):
    import hashlib
    from covid_weather_etl_spark.operators.temporal import (
        LATE_MAX_DELAY_SEC, LATE_WINDOW_SEC, LATE_WATERMARKS_MIN)
    df = (_q("late_event_accounting").fn(spark, SF_DIR)
          .toPandas().sort_values("watermark_min")
          .reset_index(drop=True))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_id", "ts"])
    sec = ev["ts"].astype("datetime64[us]").astype("int64") // 1_000_000
    delay = ev["event_id"].map(
        lambda e: int(hashlib.md5(str(e).encode()).hexdigest()[:8], 16)
        % LATE_MAX_DELAY_SEC)
    lateness = (sec + delay) - ((sec // LATE_WINDOW_SEC) + 1) \
        * LATE_WINDOW_SEC
    for _, r in df.iterrows():
        exp = int((lateness > r["watermark_min"] * 60).sum())
        assert r["n_dropped"] == exp
        assert r["n_events"] == len(ev)
        assert r["max_lateness_sec"] == int(lateness.max())
    # drops monotone non-increasing in the watermark delay
    assert df["n_dropped"].is_monotonic_decreasing
    assert (df["drop_share"] <= 1).all()
    # a 60-min watermark on a 60-min max delay drops ~nothing
    assert df.iloc[-1]["n_dropped"] <= df.iloc[0]["n_dropped"]


def test_term_burstiness_pandas_replay(spark):
    from collections import Counter
    from covid_weather_etl_spark.operators.text import BURST_TOPN
    df = (_q("term_burstiness_profile").fn(spark, SF_DIR)
          .toPandas())
    assert len(df) == BURST_TOPN
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["text"])
    n = len(docs)
    per_doc = [Counter(t.split(" ")) for t in docs["text"]]
    df_, cf, sq = Counter(), Counter(), Counter()
    for c in per_doc:
        for w, k in c.items():
            df_[w] += 1
            cf[w] += k
            sq[w] += k * k
    top = sorted(cf, key=lambda w: (-cf[w], w))[:BURST_TOPN]
    assert list(df["term"]) == top
    for _, r in df.iterrows():
        w = r["term"]
        assert r["df"] == df_[w] and r["cf"] == cf[w]
        m = cf[w] / n
        disp = (sq[w] / n - m * m) / m
        assert abs(r["dispersion"] - disp) < 2e-6
        assert abs(r["mean_when_present"] - cf[w] / df_[w]) < 2e-6
    # dispersion >= the underdispersion floor and, for clumpy text,
    # at least one term should be super-Poisson
    assert (df["dispersion"] >= 0).all()


def test_croston_pandas_replay(spark):
    import math
    from covid_weather_etl_spark.operators.timeseries import (
        CROSTON_ALPHA, CROSTON_QTY_MIN)
    df = (_q("croston_forecast_eval").fn(spark, SF_DIR)
          .toPandas().set_index("brand"))
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_shipdate"])
    pt = pd.read_parquet(f"{SF_DIR}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    m = (li[li["l_quantity"] >= CROSTON_QTY_MIN]
         .merge(pt, left_on="l_partkey", right_on="p_partkey"))
    m["day"] = m["l_shipdate"].dt.date
    daily = (m.groupby(["p_brand", "day"]).size()
             .rename("d").reset_index())
    for brand, g in daily.groupby("p_brand"):
        g = g.sort_values("day").reset_index(drop=True)
        z, p = float(g["d"].iloc[0]), 1.0
        for i in range(1, len(g)):
            gap = float((g["day"].iloc[i] - g["day"].iloc[i - 1]).days)
            z = CROSTON_ALPHA * float(g["d"].iloc[i]) \
                + (1.0 - CROSTON_ALPHA) * z
            p = CROSTON_ALPHA * gap + (1.0 - CROSTON_ALPHA) * p
        r = df.loc[brand]
        assert r["n_demands"] == len(g)
        assert r["last_demand_day"] == g["day"].iloc[-1]
        assert abs(r["size_ewma"]
                   - math.floor(z * 1e6 + 0.5) / 1e6) < 1e-9
        assert abs(r["interval_ewma"]
                   - math.floor(p * 1e6 + 0.5) / 1e6) < 1e-9
        assert abs(r["demand_rate"]
                   - math.floor(z / p * 1e6 + 0.5) / 1e6) < 1e-9
    # demand rate bounded by max size / min interval; intervals >= 1
    assert (df["interval_ewma"] >= 1 - 1e-9).all()
    assert (df["demand_rate"] <= df["size_ewma"] + 1e-9).all()


def test_zonemap_pruning_contrast(spark):
    from covid_weather_etl_spark.operators.warehouse import (
        ZM_BLOCKS, ZM_QUERY_MONTHS)
    df = (_q("zonemap_pruning_eval").fn(spark, SF_DIR).toPandas())
    assert len(df) == 2 * len(ZM_QUERY_MONTHS)
    un = df[df["layout"] == "unclustered"]
    cl = df[df["layout"] == "date_clustered"]
    # unclustered: key-scattered blocks straddle every month — nothing
    # prunes; clustered: only the probe month's block scans
    # (not == 100%: at the pytest SF a ~23-row block can end before a
    # late probe month; the CONTRAST vs clustered is the invariant)
    assert (un["scanned_blocks"] >= 0.5 * ZM_BLOCKS).all()
    assert un["scan_share"].mean() >= 0.8
    assert (un["scanned_blocks"].min()
            > 10 * cl["scanned_blocks"].max())
    assert (cl["scanned_blocks"] <= 2).all()
    assert (cl["scan_share"] < 0.1).all()
    # zone maps are sound: a scan can never miss matching rows
    assert (df["scanned_rows"] >= df["matching_rows"]).all()
    # ground truth selectivity identical across layouts
    m = df.groupby("q_month")["matching_rows"].nunique()
    assert (m == 1).all()


def test_neyman_allocation_pandas_replay(spark):
    from covid_weather_etl_spark.operators.stats import NEYMAN_BUDGET
    df = (_q("neyman_allocation_plan").fn(spark, SF_DIR)
          .toPandas().set_index("n_name"))
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    m = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey"))
    g = m.groupby("n_name")["o_totalprice"].agg(["size", "std"])
    for name, r in df.iterrows():
        assert r["n_rows"] == g.loc[name, "size"]
        assert abs(r["stratum_sd"] - g.loc[name, "std"]) < 1e-3
    # total allocations land within rounding slack of the budget
    assert abs(df["neyman_alloc"].sum() - NEYMAN_BUDGET) <= len(df)
    assert abs(df["proportional_alloc"].sum() - NEYMAN_BUDGET) <= len(df)
    assert abs(df["neyman_share"].sum() - 1.0) < 1e-4
    # Neyman oversamples the high-variance strata relative to
    # proportional whenever sd exceeds the weighted mean sd
    wmean_sd = (df["n_rows"] * df["stratum_sd"]).sum() / df["n_rows"].sum()
    hi = df["stratum_sd"] > wmean_sd * 1.02
    lo = df["stratum_sd"] < wmean_sd * 0.98
    if hi.any():
        assert (df.loc[hi, "neyman_alloc"]
                >= df.loc[hi, "proportional_alloc"] - 1).all()
    if lo.any():
        assert (df.loc[lo, "neyman_alloc"]
                <= df.loc[lo, "proportional_alloc"] + 1).all()


def test_source_similarity_matrix_shape_and_bounds(spark):
    import math
    from collections import Counter
    df = (_q("source_similarity_matrix").fn(spark, SF_DIR)
          .toPandas())
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["source", "text"])
    s = sorted(docs["source"].unique())
    # pairs with no shared discriminative term are absent (zero cosine)
    assert 0 < len(df) <= len(s) * (len(s) - 1) // 2
    assert (df["cosine"] >= 0).all() and (df["cosine"] <= 1 + 1e-9).all()
    assert (df["source_1"] < df["source_2"]).all()
    assert not df.duplicated(["source_1", "source_2"]).any()
    # numpy tf-idf replay for the pair sharing the most terms
    def tri(texts):
        c = Counter()
        for t in texts:
            w = t.split(" ")
            for i in range(len(w) - 2):
                c[" ".join(w[i:i + 3])] += 1
        return c

    tc = {src: tri(g["text"]) for src, g in docs.groupby("source")}
    dfs = Counter()
    for src in s:
        for term in tc[src]:
            dfs[term] += 1
    ns = len(s)
    top = df.sort_values(["n_shared_terms", "source_1", "source_2"],
                         ascending=[False, True, True]).iloc[0]
    a, b = top["source_1"], top["source_2"]
    g6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    wa = {t: g6(math.log(1 + c) * math.log(ns / dfs[t]))
          for t, c in tc[a].items() if dfs[t] < ns}
    wb = {t: g6(math.log(1 + c) * math.log(ns / dfs[t]))
          for t, c in tc[b].items() if dfs[t] < ns}
    dot = sum(round(wa[t] * wb[t], 9) for t in wa if t in wb)
    na = sum(round(v * v, 9) for v in wa.values())
    nb = sum(round(v * v, 9) for v in wb.values())
    exp = g6(dot / (math.sqrt(na) * math.sqrt(nb)))
    got = df[(df["source_1"] == a)
             & (df["source_2"] == b)]["cosine"].iloc[0]
    assert abs(got - exp) < 2e-6


def test_unigram_vocab_seed_pandas_replay(spark):
    from collections import Counter
    from covid_weather_etl_spark.operators.text import (
        UVS_MAX_LEN, UVS_MIN_LEN, UVS_TOPK)
    df = (_q("unigram_vocab_seed").fn(spark, SF_DIR).toPandas())
    assert len(df) == UVS_TOPK
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["text"])
    wc = Counter(" ".join(docs["text"]).split(" "))
    cand = Counter()
    for w, c in wc.items():
        for ln in range(UVS_MIN_LEN, UVS_MAX_LEN + 1):
            for i in range(len(w) - ln + 1):
                cand[w[i:i + ln]] += c
    scored = sorted(((c * len(p), p) for p, c in cand.items()),
                    key=lambda t: (-t[0], t[1]))[:UVS_TOPK]
    assert [p for _, p in scored] == list(df["piece"])
    for _, r in df.iterrows():
        assert r["freq"] == cand[r["piece"]]
        assert r["score"] == cand[r["piece"]] * len(r["piece"])
        assert r["piece_len"] == len(r["piece"])


def test_rank_biased_overlap_pandas_replay(spark):
    import math
    from covid_weather_etl_spark.operators.ranking import (
        RBO_DEPTH, RBO_P, RBO_REPORT_DEPTHS)
    df = (_q("rank_biased_overlap").fn(spark, SF_DIR)
          .toPandas().set_index("depth").sort_index())
    assert list(df.index) == sorted(RBO_REPORT_DEPTHS)
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount", "l_quantity"])
    li["rev"] = (li["l_extendedprice"] * (1 - li["l_discount"])).round(6)
    rev = li.groupby("l_partkey")["rev"].sum().round(6)
    qty = li.groupby("l_partkey")["l_quantity"].sum().round(6)
    ra = {pk: i + 1 for i, pk in enumerate(
        sorted(rev.index, key=lambda k: (-rev[k], k))[:RBO_DEPTH])}
    rb = {pk: i + 1 for i, pk in enumerate(
        sorted(qty.index, key=lambda k: (-qty[k], k))[:RBO_DEPTH])}
    m = {pk: max(ra[pk], rb[pk]) for pk in ra if pk in rb}
    for d in RBO_REPORT_DEPTHS:
        o = sum(1 for v in m.values() if v <= d)
        assert df.loc[d, "n_overlap"] == o
        rbo = sum(round((1 - RBO_P) * RBO_P ** (k - 1)
                        * sum(1 for v in m.values() if v <= k) / k, 9)
                  for k in range(1, d + 1))
        assert abs(df.loc[d, "rbo_truncated"]
                   - math.floor(rbo * 1e6 + 0.5) / 1e6) < 2e-6
    # RBO truncated is non-decreasing in depth; agreement in [0,1]
    assert df["rbo_truncated"].is_monotonic_increasing
    assert (df["agreement"] <= 1).all()


@pytest.mark.slow
def test_encoding_size_estimate_pandas_replay(spark):
    import math
    from collections import Counter
    from covid_weather_etl_spark.operators.warehouse import ENC_COLUMNS
    df = (_q("encoding_size_estimate").fn(spark, SF_DIR)
          .toPandas().set_index("col"))
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=[c for c, _ in ENC_COLUMNS])
    for col, width in ENC_COLUMNS:
        vc = Counter(li[col])
        n = sum(vc.values())
        r = df.loc[col]
        assert r["n_rows"] == n and r["n_distinct"] == len(vc)
        ent = sum(round(-(c / n) * math.log(c / n) / math.log(2), 9)
                  for c in vc.values())
        ent = math.floor(ent * 1e6 + 0.5) / 1e6
        assert abs(r["entropy_bits"] - ent) < 1e-9
        assert r["plain_bytes"] == n * width
        bits = math.ceil(math.log(len(vc) + 1) / math.log(2))
        assert r["dict_bytes"] == math.ceil(n * bits / 8) \
            + len(vc) * width
        assert r["entropy_floor_bytes"] == math.ceil(n * ent / 8)
        # information theory: the entropy floor never exceeds either
        # encoding and entropy never exceeds log2(cardinality)
        assert r["entropy_floor_bytes"] <= r["plain_bytes"]
        assert r["entropy_bits"] <= math.log2(len(vc)) + 1e-6
    # low-cardinality flags dictionary-win; keys don't
    assert df.loc["l_returnflag", "dict_bytes"] \
        < df.loc["l_returnflag", "plain_bytes"]
    assert df.loc["l_suppkey", "dict_bytes"] \
        > df.loc["l_suppkey", "entropy_floor_bytes"]


def test_holm_stepdown_properties(spark):
    from covid_weather_etl_spark.operators.drift import (
        HOLM_M, HOLM_ZCRIT, _BONF_Z, _RAW_Z, _norm_ppf)
    # the baked critical values are sane and ordered
    assert abs(_norm_ppf(0.975) - 1.959964) < 1e-5
    assert _BONF_Z == HOLM_ZCRIT[0] > HOLM_ZCRIT[-1] >= _RAW_Z
    assert len(HOLM_ZCRIT) == HOLM_M
    df = (_q("holm_multiple_tests").fn(spark, SF_DIR)
          .toPandas().sort_values("holm_rank").reset_index(drop=True))
    # ranks are a permutation; |z| non-increasing down the ranks
    assert list(df["holm_rank"]) == list(range(1, len(df) + 1))
    assert (df["z"].abs().diff().dropna() <= 1e-12).all()
    # logical nesting: bonferroni ⊆ holm ⊆ unadjusted
    assert (df["reject_bonferroni"] <= df["reject_holm"]).all()
    assert (df["reject_holm"] <= df["reject_unadjusted"]).all()
    # holm is a step-down: once a rank fails, all later ranks fail
    h = list(df["reject_holm"])
    assert h == sorted(h, reverse=True)
    # verdict replay against the baked thresholds
    for i, r in df.iterrows():
        assert r["reject_unadjusted"] == int(abs(r["z"]) >= _RAW_Z)
        assert r["reject_bonferroni"] == int(abs(r["z"]) >= _BONF_Z)
        expected = all(
            abs(df["z"].iloc[j]) >= HOLM_ZCRIT[j] for j in range(i + 1))
        assert r["reject_holm"] == int(expected)


def test_haar_kernel_equals_loop(spark):
    """The r12 single-task cascade collapse is BIT-identical to the
    distributed 6-level cascade: force both paths via the gate flag."""
    import struct

    import covid_weather_etl_spark.operators.timeseries as T

    def rows(df):
        return sorted((r["level"], r["n_coeffs"],
                       struct.pack("d", r["energy"]),
                       struct.pack("d", r["energy_share"]))
                      for r in df.collect())

    cap = T.HAAR_SINGLE_TASK_MAX
    try:
        T.HAAR_SINGLE_TASK_MAX = T.HAAR_N
        single = rows(T.haar_wavelet_energy(spark, SF_DIR))
        T.HAAR_SINGLE_TASK_MAX = -1  # force the distributed cascade
        loop = rows(T.haar_wavelet_energy(spark, SF_DIR))
    finally:
        T.HAAR_SINGLE_TASK_MAX = cap
    assert single == loop and len(single) == T.HAAR_LEVELS


def test_haar_energy_numpy_replay(spark):
    import math
    from covid_weather_etl_spark.operators.timeseries import (
        HAAR_LEVELS, HAAR_N)
    df = (_q("haar_wavelet_energy").fn(spark, SF_DIR)
          .toPandas().set_index("level").sort_index())
    assert list(df.index) == list(range(1, HAAR_LEVELS + 1))
    assert list(df["n_coeffs"]) == [HAAR_N >> k
                                    for k in range(1, HAAR_LEVELS + 1)]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    o["idx"] = (o["o_orderdate"].dt.normalize()
                - o["o_orderdate"].dt.normalize().min()).dt.days
    daily = (o[o["idx"] < HAAR_N].groupby("idx")["o_totalprice"]
             .apply(lambda s: float(s.round(6).sum())))
    x = np.zeros(HAAR_N)
    x[daily.index.to_numpy()] = daily.to_numpy()
    for lv in range(1, HAAR_LEVELS + 1):
        a = (x[0::2] + x[1::2]) / 2.0
        d = (x[0::2] - x[1::2]) / 2.0
        e = sum(math.floor(v * v + 0.5) for v in d)
        assert abs(df.loc[lv, "energy"] - e) < 1e-6 * max(e, 1)
        x = a
    assert abs(df["energy_share"].sum() - 1.0) < 5e-6
    # Parseval sanity: total detail energy <= total signal energy
    total = float((np.array(
        [daily.get(i, 0.0) for i in range(HAAR_N)]) ** 2).sum())
    assert df["energy"].sum() <= total + 1.0


def test_inbatch_collisions_pandas_replay(spark):
    import hashlib
    import math
    from covid_weather_etl_spark.operators.similarity import (
        INB_BATCH_SIZES)
    df = (_q("inbatch_negative_collisions").fn(spark, SF_DIR)
          .toPandas().set_index("batch_size"))
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                          columns=["vec_id", "label"])
    n = len(emb)
    for bsz in INB_BATCH_SIZES:
        nb = math.ceil(n / bsz)
        b = emb["vec_id"].map(lambda v: int(hashlib.md5(
            str(v).encode()).hexdigest()[:8], 16) % nb)
        coll = (emb.assign(b=b).groupby(["b", "label"]).size()
                .map(lambda k: k * (k - 1) // 2).sum())
        r = df.loc[bsz]
        assert r["colliding_pairs"] == coll
        assert r["n_rows"] == n
        assert r["n_batches"] <= nb
    s2 = (emb.groupby("label").size()
          .map(lambda k: k * (k - 1)).sum())
    exp = math.floor(s2 / (n * (n - 1)) * 1e6 + 0.5) / 1e6
    assert (df["random_pair_rate"] == exp).all()
    # more rows per batch => more collisions
    assert df["colliding_pairs"].is_monotonic_increasing


def test_srm_check_replay_and_health(spark):
    import hashlib
    from covid_weather_etl_spark.operators.drift import (
        SRM_SEEDS, _SRM_CHI2_95)
    df = (_q("srm_check").fn(spark, SF_DIR)
          .toPandas().set_index("seed"))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["user_id"])
    users = ev["user_id"].unique()
    for seed in SRM_SEEDS:
        arms = [int(hashlib.md5(f"{seed}:{u}".encode())
                    .hexdigest()[:8], 16) % 2 for u in users]
        na, nb = arms.count(0), arms.count(1)
        r = df.loc[seed]
        assert r["n_a"] == na and r["n_b"] == nb
        chi2 = (na - nb) ** 2 / (na + nb)
        assert abs(r["chi2"] - chi2) < 2e-6
        assert r["srm_95"] == int(chi2 > _SRM_CHI2_95)
        assert r["srm_95"] >= r["srm_99"]
    # healthy md5 assignment: no salt should scream SRM at 99%
    assert df["srm_99"].sum() == 0


def test_conversion_path_topk_pandas_replay(spark):
    from collections import Counter
    from covid_weather_etl_spark.operators.eventstats import (
        PATH_MAX_STEPS, PATH_TOPK)
    df = (_q("conversion_path_topk").fn(spark, SF_DIR).toPandas())
    assert len(df) <= PATH_TOPK
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["user_id", "event_type", "ts",
                                  "event_id"])
    fp = (ev[ev["event_type"] == "purchase"]
          .groupby("user_id")["ts"].min().rename("p_ts"))
    pre = ev.merge(fp, on="user_id")
    pre = pre[(pre["ts"] < pre["p_ts"])
              & (pre["event_type"] != "purchase")]
    paths = Counter()
    for _, g in pre.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).head(PATH_MAX_STEPS)
        paths[">".join(g["event_type"])] += 1
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:len(df)]
    assert list(df["path"]) == [p for p, _ in top]
    assert list(df["n_users"]) == [c for _, c in top]
    for _, r in df.iterrows():
        assert r["n_steps"] == len(r["path"].split(">"))
        assert r["n_steps"] <= PATH_MAX_STEPS
    assert abs(df["user_share"].iloc[0]
               - df["n_users"].iloc[0] / sum(paths.values())) < 2e-6


def test_bh_vs_holm_power_ordering(spark):
    from covid_weather_etl_spark.operators.drift import (
        BH_ZCRIT, HOLM_M, HOLM_ZCRIT)
    # step-up thresholds decrease, step-down thresholds increase...
    # in REJECTION difficulty: HOLM_ZCRIT falls with rank (alpha/(m-k+1)
    # grows), BH_ZCRIT falls faster from a lower start at k=1? No:
    # at k=1 BH tests q/m vs Holm alpha/m — BH's q=0.10 > alpha=0.05,
    # so BH is uniformly easier here. Pin the shapes:
    assert len(BH_ZCRIT) == HOLM_M
    assert all(a >= b for a, b in zip(BH_ZCRIT, BH_ZCRIT[1:]))
    assert all(h >= b for h, b in zip(HOLM_ZCRIT, BH_ZCRIT))
    bh = (_q("bh_fdr_control").fn(spark, SF_DIR)
          .toPandas().set_index("n_name"))
    holm = (_q("holm_multiple_tests").fn(spark, SF_DIR)
            .toPandas().set_index("n_name"))
    # same test frame
    assert (bh["z"].sort_index() == holm["z"].sort_index()).all()
    assert (bh["bh_rank"].sort_index()
            == holm["holm_rank"].sort_index()).all()
    # BH (FDR, q=0.10) rejects a superset of Holm (FWER, alpha=0.05)
    j = bh.join(holm[["reject_holm"]])
    assert (j["reject_holm"] <= j["reject_bh"]).all()
    # step-up: rejections are exactly ranks 1..k*
    r = bh.sort_values("bh_rank")["reject_bh"].tolist()
    assert r == sorted(r, reverse=True)
    # replay k*
    passes = [abs(z) >= c for z, c in zip(
        bh.sort_values("bh_rank")["z"], BH_ZCRIT)]
    ks = max((i + 1 for i, p in enumerate(passes) if p), default=0)
    assert sum(r) == ks


def test_gini_split_scores_pandas_replay(spark):
    import math
    from covid_weather_etl_spark.operators.stats import GINI_FEATURES
    df = (_q("gini_split_scores").fn(spark, SF_DIR)
          .toPandas().set_index("feature"))
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_shipdate", "l_quantity",
                                  "l_discount"])
    li["y"] = (li["l_discount"] > 0.05).astype(int)
    feats = {
        "returnflag": li["l_returnflag"],
        "linestatus": li["l_linestatus"],
        "weekend": li["l_shipdate"].dt.dayofweek.isin([5, 6])
        .map({True: "y", False: "n"}),
        "qty_band": np.floor(li["l_quantity"] / 10).astype(int)
        .astype(str),
    }
    n = len(li)
    t1 = li["y"].sum()
    parent = 1 - (t1 / n) ** 2 - ((n - t1) / n) ** 2
    for name, _, _ in GINI_FEATURES:
        g = li.assign(v=feats[name]).groupby("v")["y"] \
            .agg(["size", "sum"])
        wg = sum(math.floor(
            (r["size"] / n)
            * (1 - (r["sum"] / r["size"]) ** 2
               - ((r["size"] - r["sum"]) / r["size"]) ** 2) * 1e9
            + 0.5) for _, r in g.iterrows()) / 1e9
        row = df.loc[name]
        assert row["n_values"] == len(g)
        assert abs(row["parent_gini"] - parent) < 2e-6
        assert abs(row["weighted_gini"] - wg) < 2e-6
        assert abs(row["gini_gain"] - (parent - wg)) < 4e-6
        # splitting can never increase impurity
        assert row["gini_gain"] >= -1e-9
