"""Semantic pins for the round-4 operators (exact engine/oracle parity
is covered by test_oracle_parity; these pin the invariants that make
each result MEANINGFUL): bigram-LM scoring, BM25, int8 quantization,
winsorization and the sequence-length histogram.
"""

from __future__ import annotations

import pytest

import math

import numpy as np
import pandas as pd

from covid_weather_etl_spark.operators.relational_ext import (
    WINSOR_HI, WINSOR_LO,
)
from covid_weather_etl_spark.operators.similarity import INT8_MAX
from covid_weather_etl_spark.operators.text import (
    BM25_B, BM25_K1, BM25_QUERY, SEQLEN_BIN,
)
from covid_weather_etl_spark.queries.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


@pytest.fixture(scope="module")
def docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def test_bigram_lm_matches_numpy(spark, docs_pdf):
    """Independent numpy oracle: add-one-smoothed bigram logprob for a
    handful of documents, computed from raw corpus counts."""
    got = (QUERIES["bigram_logprob_score"].fn(spark, SF_DIR)
           .toPandas().set_index("doc_id"))
    toks = {r.doc_id: r.text.split(" ") for r in docs_pdf.itertuples()}
    from collections import Counter
    bgc, pfc, vocab = Counter(), Counter(), set()
    for ts in toks.values():
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            bgc[(a, b)] += 1
            pfc[a] += 1
    V = len(vocab)
    for doc_id in list(toks)[:10]:
        ts = toks[doc_id]
        lps = [math.log((bgc[(a, b)] + 1.0) / (pfc[a] + V))
               for a, b in zip(ts, ts[1:])]
        want = -sum(lps) / len(lps)
        row = got.loc[doc_id]
        assert row["n_bigrams"] == len(ts) - 1
        assert abs(row["avg_neg_logprob"] - want) < 1e-6, doc_id


def test_bigram_sharper_than_unigram(spark):
    """A bigram model conditions on context, so its average surprisal
    on in-distribution text must beat (be below) the unigram model's —
    the reason CCNet uses an n-gram LM, not a unigram bag."""
    bg = (QUERIES["bigram_logprob_score"].fn(spark, SF_DIR)
          .toPandas()["avg_neg_logprob"])
    ug = (QUERIES["unigram_logprob_score"].fn(spark, SF_DIR)
          .toPandas()["avg_neg_logprob"])
    assert bg.mean() < ug.mean()


def test_bm25_matches_numpy(spark, docs_pdf):
    got = (QUERIES["bm25_doc_scores"].fn(spark, SF_DIR)
           .toPandas().set_index("doc_id"))
    toks = {r.doc_id: r.text.split(" ") for r in docs_pdf.itertuples()}
    N = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / N
    df = {q: sum(1 for t in toks.values() if q in t) for q in BM25_QUERY}
    hits = 0
    for doc_id, ts in toks.items():
        terms = [q for q in BM25_QUERY if q in ts]
        if not terms:
            assert doc_id not in got.index
            continue
        hits += 1
        want = sum(
            math.log((N - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            * (ts.count(q) * (BM25_K1 + 1.0))
            / (ts.count(q) + BM25_K1 * (1.0 - BM25_B
                                        + BM25_B * len(ts) / avgdl))
            for q in terms)
        row = got.loc[doc_id]
        assert row["n_hit_terms"] == len(terms)
        assert abs(row["bm25"] - want) < 1e-5, doc_id
    assert hits == len(got) > 0


def test_bm25_idf_orders_rare_terms_higher(spark, docs_pdf):
    """With equal tf and length, a rarer query term must contribute
    more score — sanity of the idf direction (checked through the
    aggregate: docs hitting ALL query terms outscore same-length docs
    hitting only the most common one, on average)."""
    got = QUERIES["bm25_doc_scores"].fn(spark, SF_DIR).toPandas()
    assert (got.groupby("n_hit_terms")["bm25"].mean().is_monotonic_increasing)


def test_int8_quantize_error_bound(spark):
    """Per-element quantization error is ≤ scale/2 by construction, so
    MSE ≤ scale²/4; scale must be positive and dims constant."""
    got = QUERIES["embedding_int8_quantize"].fn(spark, SF_DIR).toPandas()
    assert (got["scale"] > 0).all()
    assert (got["n_dims"] == got["n_dims"].iloc[0]).all()
    assert (got["mse"] <= got["scale"] ** 2 / 4 + 1e-15).all()
    assert (got["mse"] > 0).any()


def test_int8_quantize_roundtrip_numpy(spark):
    """End-to-end reconstruction check against numpy for 5 vectors:
    codes fit int8, reconstruction matches the reported MSE."""
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    got = (QUERIES["embedding_int8_quantize"].fn(spark, SF_DIR)
           .toPandas().set_index("vec_id"))
    for vec_id in emb["vec_id"].head(5):
        v = np.asarray(emb.loc[emb.vec_id == vec_id, "embedding"].iloc[0],
                       dtype=np.float64)
        scale = np.abs(v).max() / INT8_MAX
        codes = np.floor(v / scale + 0.5)
        assert np.abs(codes).max() <= 127
        mse = float(((v - codes * scale) ** 2).mean())
        assert abs(got.loc[vec_id, "mse"] - mse) < 1e-12


def test_winsorize_bounds_and_fraction(spark):
    got = QUERIES["winsorized_prices"].fn(spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    assert len(got) == len(li)
    # clipped rows changed, unclipped rows identical
    clipped = got[got.was_clipped]
    assert (clipped["price"] != clipped["price_winsor"]).all()
    kept = got[~got.was_clipped]
    assert (kept["price"] == kept["price_winsor"]).all()
    # the clipped fraction per group is ~ (lo + 1-hi) = 10%
    frac = got.groupby("l_returnflag")["was_clipped"].mean()
    expected = WINSOR_LO + (1 - WINSOR_HI)
    assert ((frac - expected).abs() < 0.02).all()
    # winsorized column has no values outside the group thresholds
    for rf, grp in got.groupby("l_returnflag"):
        lo = grp.loc[grp.was_clipped, "price_winsor"].min()
        hi = grp.loc[grp.was_clipped, "price_winsor"].max()
        assert grp["price_winsor"].between(
            min(lo, grp["price_winsor"].min()),
            max(hi, grp["price_winsor"].max())).all()


def test_snapshot_diff_partitions_change_space(spark):
    """Every key appears at most once; the three change types partition
    the diff; counts match the planted-change arithmetic (%7 → update
    unless %11 deleted it; %11 → delete; %13 → insert under −k−1,
    strictly negative so even key 0 cannot collide with its insert)."""
    got = QUERIES["snapshot_diff"].fn(spark, SF_DIR).toPandas()
    assert got["c_custkey"].is_unique
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    keys = cust["c_custkey"]
    want_delete = (keys % 11 == 0).sum()
    want_update = ((keys % 7 == 0) & (keys % 11 != 0)).sum()
    want_insert = (keys % 13 == 0).sum()
    by = got.groupby("change_type").size()
    assert by.get("delete", 0) == want_delete
    assert by.get("update", 0) == want_update
    assert by.get("insert", 0) == want_insert
    ins = got[got.change_type == "insert"]
    assert (ins["c_custkey"] < 0).all() and ins["old_segment"].isna().all()
    dels = got[got.change_type == "delete"]
    assert dels["new_segment"].isna().all()
    upd = got[got.change_type == "update"]
    assert (upd["new_segment"] == "MOVED").all()


def test_snapshot_diff_patch_reconstructs_new_state(spark):
    """The CDC contract: applying the diff to the old snapshot (drop
    deletes, apply updates, add inserts) reproduces the new snapshot
    exactly — the property a MERGE INTO consumer relies on."""
    got = QUERIES["snapshot_diff"].fn(spark, SF_DIR).toPandas()
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    old = cust.set_index("c_custkey")["c_mktsegment"]
    # independently rebuild the planted new snapshot
    keep = cust[cust.c_custkey % 11 != 0]
    new_expected = {
        int(k): ("MOVED" if k % 7 == 0 else s)
        for k, s in zip(keep.c_custkey, keep.c_mktsegment)}
    new_expected.update({int(-k - 1): "NEWBIE"
                         for k in cust.c_custkey if k % 13 == 0})
    # patch = old minus deletes, with updates applied, plus inserts
    patched = {int(k): s for k, s in old.items()}
    for r in got.itertuples():
        if r.change_type == "delete":
            del patched[int(r.c_custkey)]
        elif r.change_type == "update":
            patched[int(r.c_custkey)] = r.new_segment
        else:
            patched[int(r.c_custkey)] = r.new_segment
    assert patched == new_expected


def test_winsorize_idempotent(spark):
    """Winsorizing an already-winsorized column with the same
    thresholds changes nothing (clip is a projection onto [lo, hi])."""
    got = QUERIES["winsorized_prices"].fn(spark, SF_DIR).toPandas()
    thr = (got.groupby("l_returnflag")["price_winsor"]
           .agg(["min", "max"]))
    for rf, grp in got.groupby("l_returnflag"):
        lo, hi = thr.loc[rf, "min"], thr.loc[rf, "max"]
        again = grp["price_winsor"].clip(lo, hi)
        assert (again == grp["price_winsor"]).all()


def test_key_skew_profile_matches_pandas(spark):
    got = QUERIES["key_skew_profile"].fn(spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cnt = orders.groupby("o_custkey").size()
    n = cnt.sum()
    assert got["n_keys"] == len(cnt)
    assert got["n_rows"] == n
    assert got["max_cnt"] == cnt.max()
    assert got["skew_ratio"] == pytest.approx(cnt.max() * len(cnt) / n,
                                              abs=1e-5)
    p = cnt / n
    assert got["entropy_nats"] == pytest.approx(-(p * np.log(p)).sum(),
                                                abs=1e-5)
    assert got["entropy_nats"] <= math.log(len(cnt)) + 1e-9


def test_seq_length_histogram_totals(spark, docs_pdf):
    got = (QUERIES["seq_length_histogram"].fn(spark, SF_DIR)
           .toPandas().sort_values("bin").reset_index(drop=True))
    assert got["n_docs"].sum() == len(docs_pdf)
    assert got["cum_share"].iloc[-1] == pytest.approx(1.0, abs=1e-9)
    assert got["cum_share"].is_monotonic_increasing
    assert ((got["bin_hi"] - got["bin_lo"]) == SEQLEN_BIN - 1).all()
    # bins agree with a pandas recount
    want = (docs_pdf["text"].str.split(" ").str.len() // SEQLEN_BIN) \
        .value_counts().sort_index()
    assert dict(zip(got["bin"], got["n_docs"])) == want.to_dict()


@pytest.mark.slow
def test_distributed_exact_quantile_pathological_inputs(spark):
    """The iterative rank-refinement selection on inputs the histogram
    narrowing finds hardest: all-equal values (range never shrinks),
    heavy duplicates, a two-value interpolation, and n=1."""
    import numpy as np
    from covid_weather_etl_spark.operators.stats import (
        _exact_quantile_distributed)

    def med(vals):
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        return _exact_quantile_distributed(df, "v", 0.5)

    assert med([7.0] * 500) == (500, 7.0)
    assert med([1.0]) == (1, 1.0)
    assert med([1.0, 2.0]) == (2, 1.5)
    rng = np.random.RandomState(3)
    vals = rng.choice([0.25, 0.5, 0.5, 0.5, 9.75], size=801)
    n, got = med(vals)
    assert n == 801 and got == float(np.percentile(vals, 50))
    vals2 = rng.normal(100.0, 5.0, size=1001)
    n2, got2 = med(vals2)
    assert n2 == 1001
    assert abs(got2 - float(np.percentile(vals2, 50))) < 1e-9
