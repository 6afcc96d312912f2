"""Round-9 operator tests: truncation loss, shard skew, nucleus
sampling, DPO pairs, ROUGE re-verification, dedup threshold sweep.
Each test recomputes the operator's semantics independently (pandas /
duckdb replay or structural invariants the SQL can't fake)."""

from __future__ import annotations

import pytest

import pandas as pd

from covid_weather_etl_spark.queries.registry import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name]


def test_truncation_loss_monotone_and_consistent(spark):
    df = _q("truncation_loss_report").fn(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["lang", "text"])
    docs["n_tok"] = docs["text"].str.split(" ").str.len()
    for (lim, lang), g in df.groupby(["context_limit", "lang"]):
        sub = docs[docs["lang"] == lang]
        r = g.iloc[0]
        assert r["n_docs"] == len(sub)
        assert r["n_truncated"] == int((sub["n_tok"] > lim).sum())
        assert r["total_tokens"] == int(sub["n_tok"].sum())
        assert r["kept_tokens"] == int(sub["n_tok"].clip(upper=lim).sum())
    # kept_tokens monotone non-decreasing in the limit, per lang
    for lang, g in df.groupby("lang"):
        g = g.sort_values("context_limit")
        assert g["kept_tokens"].is_monotonic_increasing
        assert (g["lost_share"].diff().dropna() <= 1e-12).all()


def test_shard_skew_report_accounts_every_row(spark):
    df = _q("shard_skew_report").fn(spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_suppkey"])
    assert df["n_rows"].sum() == len(li)
    assert df["n_keys"].sum() == li["l_suppkey"].nunique()
    assert (df["top_key_rows"] <= df["n_rows"]).all()
    # skew factors average to ~1 by construction (weighted by bucket)
    ideal = len(li) / len(df) if len(df) else 0
    assert df["n_rows"].max() >= ideal  # max bucket at or above ideal
    assert (df["skew_factor"] > 0).all()


def test_nucleus_profile_bounds(spark):
    from covid_weather_etl_spark.operators.text import (
        NUCLEUS_MIN_TOT, NUCLEUS_P_DEN, NUCLEUS_P_NUM)
    df = _q("nucleus_sampling_profile").fn(spark, SF_DIR).toPandas()
    assert (df["nucleus_size"] >= 1).all()
    assert (df["n_contexts"] >= 1).all()
    # a k90 = 1 context has top-1 share >= p by definition, so the
    # bucket mean must clear the threshold too
    one = df[df["nucleus_size"] == 1]
    if len(one):
        assert (one["mean_top1_share"]
                >= NUCLEUS_P_NUM / NUCLEUS_P_DEN - 1e-9).all()
    # independent context count: pandas bigram replay
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["text"])
    from collections import Counter
    tot = Counter()
    for t in docs["text"]:
        w = t.split(" ")
        for a in w[:-1]:
            tot[a] += 1
    expected = sum(1 for c in tot.values() if c >= NUCLEUS_MIN_TOT)
    assert df["n_contexts"].sum() == expected


def test_dpo_pairs_match_pandas_argmax(spark):
    from covid_weather_etl_spark.operators.eventstats import (
        DPO_CAND_TYPE, DPO_MIN_MARGIN)
    df = (_q("dpo_pair_construction").fn(spark, SF_DIR)
          .toPandas().sort_values("user_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[(ev["event_type"] == DPO_CAND_TYPE) & ev["value"].notna()]
    rows = []
    for uid, g in ev.groupby("user_id"):
        if len(g) < 2:
            continue
        ch = g.sort_values(["value", "event_id"],
                           ascending=[False, True]).iloc[0]
        rj = g.sort_values(["value", "event_id"],
                           ascending=[True, True]).iloc[0]
        if ch["value"] - rj["value"] >= DPO_MIN_MARGIN:
            rows.append((uid, len(g), ch["event_id"], ch["value"],
                         rj["event_id"], rj["value"],
                         ch["value"] - rj["value"]))
    exp = pd.DataFrame(rows, columns=df.columns).sort_values("user_id") \
        .reset_index(drop=True)
    assert len(df) == len(exp)
    for c in ["user_id", "n_candidates", "chosen_event",
              "rejected_event"]:
        assert (df[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert (df["margin"] >= DPO_MIN_MARGIN).all()
    assert (df["chosen_reward"] > df["rejected_reward"]).all()


def test_rouge_overlap_matches_counter_replay(spark):
    from collections import Counter
    df = _q("rouge_overlap_eval").fn(spark, SF_DIR).toPandas()
    if not len(df):
        pytest.skip("no near-dup candidate pairs at this SF")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .set_index("doc_id")["text"]
    for _, r in df.iterrows():
        c1 = Counter(docs[r["doc_id_1"]].split(" "))
        c2 = Counter(docs[r["doc_id_2"]].split(" "))
        ov = sum((c1 & c2).values())
        assert r["overlap"] == ov
        assert r["len_1"] == sum(c1.values())
        assert r["len_2"] == sum(c2.values())
        assert r["rouge1_f1"] == pytest.approx(
            2 * ov / (r["len_1"] + r["len_2"]), abs=1e-6)
        assert 0 < r["rouge1_f1"] <= 1


@pytest.mark.slow
def test_dedup_threshold_sweep_monotone_and_anchored(spark):
    df = (_q("dedup_threshold_sensitivity").fn(spark, SF_DIR)
          .toPandas().sort_values("threshold").reset_index(drop=True))
    assert list(df["threshold"]) == [0.2, 0.35, 0.5]
    # edge count, dup docs and max cluster size shrink as the cut rises
    assert df["n_edges"].is_monotonic_decreasing
    assert df["n_dup_docs"].is_monotonic_decreasing
    assert df["max_cluster_size"].is_monotonic_decreasing
    # the 0.2 row must agree exactly with the full-rebuild twin
    star = _q("dedup_clusters_star").fn(spark, SF_DIR).toPandas()
    sz = star.groupby("cluster_id").size()
    multi = sz[sz >= 2]
    r = df[df["threshold"] == 0.2].iloc[0]
    assert r["n_clusters"] == len(multi)
    assert r["n_dup_docs"] == int(multi.sum())
    assert r["max_cluster_size"] == (int(multi.max()) if len(multi)
                                     else 0)


@pytest.mark.slow
def test_split_leakage_duckdb_replay(spark):
    """Independent duckdb recount of the leakage census from the raw
    pair list + md5 split rule."""
    import duckdb
    import hashlib
    r = (_q("split_leakage_report").fn(spark, SF_DIR).collect())[0]
    pairs = (_q("ngram_jaccard_near_dup").fn(spark, SF_DIR)
             .select("doc_id_1", "doc_id_2").toPandas())
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id"])
    is_test = {d: hashlib.md5(str(d).encode()).hexdigest()[:2] >= "cc"
               for d in docs["doc_id"]}
    assert r["n_test"] == sum(is_test.values())
    assert r["n_train"] == len(is_test) - sum(is_test.values())
    assert r["n_near_dup_pairs"] == len(pairs)
    cross = pairs[[is_test[a] != is_test[b]
                   for a, b in zip(pairs["doc_id_1"], pairs["doc_id_2"])]]
    assert r["n_cross_split_pairs"] == len(cross)
    leaked = {(a if is_test[a] else b)
              for a, b in zip(cross["doc_id_1"], cross["doc_id_2"])}
    assert r["n_leaked_test_docs"] == len(leaked)


def test_reshard_ring_beats_mod(spark):
    """Consistent hashing must move FAR fewer keys than modulo on a
    +1-shard resize (theory: ~1/new vs ~(1-1/new)), and both schemes
    must account every key."""
    from covid_weather_etl_spark.operators.bucketing import RSP_TO
    df = (_q("reshard_movement_plan").fn(spark, SF_DIR)
          .toPandas().set_index("scheme"))
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_suppkey"])
    assert (df["n_keys"] == li["l_suppkey"].nunique()).all()
    mod, ring = df.loc["mod"], df.loc["ring"]
    assert ring["moved_share"] < mod["moved_share"]
    # ring moves on the order of 1/new, mod ~ 1 - 1/new; at sf0.001
    # the key census is ~tens of keys, so the bound is loose
    assert ring["moved_share"] <= 0.5, ring["moved_share"]
    assert mod["moved_share"] > 0.5
    assert RSP_TO > 0


@pytest.mark.slow
def test_bpe_budget_curve_monotone(spark):
    """More merges => fewer corpus symbols, never fewer symbol types
    drop below... the trade-off curve's structural invariants, plus
    budget-12 agreement with the shipped encode table."""
    df = (_q("bpe_vocab_budget_eval").fn(spark, SF_DIR)
          .toPandas().sort_values("merge_budget").reset_index(drop=True))
    from covid_weather_etl_spark.operators.text import BPE_BUDGETS
    assert list(df["merge_budget"]) == list(BPE_BUDGETS)
    assert df["corpus_tokens"].nunique() == 1          # invariant axis
    assert df["corpus_syms"].is_monotonic_decreasing   # merges compress
    assert (df["n_merges"].diff().dropna() >= 0).all()
    # budget-0 is the character baseline: symbols == total characters
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["text"])
    n_chars = sum(len(w) for t in docs["text"] for w in t.split(" "))
    assert df.iloc[0]["corpus_syms"] == n_chars
    # full budget agrees with bpe_encode_documents' totals
    enc = _q("bpe_encode_documents").fn(spark, SF_DIR).toPandas()
    assert df.iloc[-1]["corpus_syms"] == enc["n_bpe_syms"].sum()
