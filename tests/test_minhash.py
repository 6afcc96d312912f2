"""Numpy-oracle tests for the MinHash / SimHash operators — these are
rows-only for the driver (DuckDB has no xxhash64), so correctness is
pinned here instead: an independent plain-Python reimplementation of
the same hash algebra must agree exactly, and the LSH pipeline's recall
vs brute-force shingle Jaccard must match its banding calibration.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from covid_weather_etl_spark.operators import minhash as M
from tests.conftest import SF_DIR


def shingle_set(text: str, n: int = 3) -> set[str]:
    words = text.split(" ")
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


@pytest.fixture(scope="module")
def docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def brute_force_jaccard_pairs(docs_pdf: pd.DataFrame, threshold: float):
    toks = {r.doc_id: shingle_set(r.text) for r in docs_pdf.itertuples()}
    ids = sorted(toks)
    out = {}
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            inter = len(toks[d1] & toks[d2])
            if not inter:
                continue
            j = inter / len(toks[d1] | toks[d2])
            if j >= threshold:
                out[(d1, d2)] = j
    return out


def test_minhash_signature_matches_python(spark, docs, docs_pdf):
    """Spark signature == independent python implementation, doc by doc."""
    sigs = {r["doc_id"]: [r[f"sig_{i}"] for i in range(M.N_HASHES)]
            for r in M.minhash_signatures(docs).collect()}
    params = M._perm_params()
    # xxhash64 is Spark-side; fetch shingle→hash once from the JVM and
    # recompute the permutation algebra in python.
    tok_hash = {r["token"]: r["h"] for r in
                M.shingles(docs).withColumn(
                    "h", F.pmod(F.xxhash64("token"), F.lit(M.MERSENNE)))
                .collect()}
    for row in docs_pdf.head(25).itertuples():
        toks = shingle_set(row.text)
        expected = [min((a * tok_hash[t] + b) % M.MERSENNE for t in toks)
                    for a, b in params]
        assert sigs[row.doc_id] == expected, f"doc {row.doc_id}"


def test_lsh_recall_and_precision(spark, docs, docs_pdf):
    """No false positives ever (exact re-check); full recall for
    strong near-dups (j ≥ 0.7: P(miss) = (1−0.49)¹⁶ ≈ 2e-5); recall at
    the j=0.5 boundary consistent with the banding calibration
    (P(candidate) = 1−(1−0.25)¹⁶ ≈ 0.99)."""
    truth = brute_force_jaccard_pairs(docs_pdf, 0.5)
    strong = {p for p, j in truth.items() if j >= 0.7}
    got = {(r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
           for r in M.minhash_near_dup(spark, SF_DIR).collect()}
    assert set(got) <= set(truth)                       # no false positives
    assert strong <= set(got)                           # full strong recall
    if truth:
        assert len(got) / len(truth) >= 0.9             # boundary recall
    for pair, j in got.items():
        assert abs(j - truth[pair]) < 1e-12


def test_simhash_matches_python(spark, docs, docs_pdf):
    """Spark simhash == python majority-vote over the same token hashes."""
    fps = {r["doc_id"]: r["simhash"] for r in M.simhash(docs).collect()}
    tok_hash = {r["token"]: r["h"] for r in (
        docs.select(F.explode(F.split("text", " ")).alias("token")).distinct()
        .withColumn("h", F.xxhash64("token")).collect())}
    for row in docs_pdf.head(25).itertuples():
        toks = set(row.text.split(" "))
        fp = 0
        for i in range(64):
            vote = sum(1 if (tok_hash[t] >> i) & 1 else -1 for t in toks)
            if vote > 0:
                fp |= 1 << i
        # Spark long is signed 64-bit; normalize python int the same way
        if fp >= 1 << 63:
            fp -= 1 << 64
        assert fps[row.doc_id] == fp, f"doc {row.doc_id}"


def test_simhash_near_dup_is_exact_close_pair_set(spark):
    """The operator returns EXACTLY the brute-force pair set at
    Hamming ≤ 7 (8-band pigeonhole guarantees completeness, the
    residual filter guarantees precision)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fps = sorted((r["doc_id"], r["simhash"])
                 for r in M.simhash(docs).collect())
    truth = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            if bin((fps[i][1] ^ fps[j][1]) & ((1 << 64) - 1)).count("1") <= 7:
                truth.add((fps[i][0], fps[j][0]))
    got = {(r["doc_id_1"], r["doc_id_2"])
           for r in M.simhash_near_dup(spark, SF_DIR).collect()}
    assert got == truth


def test_incremental_ingest_matches_bruteforce_and_skips_old_pairs(spark):
    """hashlib reimplementation of the md5-permutation banding +
    exact-Jaccard verify; the incremental result must equal the
    brute-force pair set MINUS the old×old pairs (the index-reuse
    contract), and backfill/intra-batch labels must match the split.
    """
    import hashlib

    from covid_weather_etl_spark.operators.minhash import (
        INC_OLD_CUT, INC_PERMS, INC_ROWS, INC_TAU,
        incremental_minhash_ingest,
    )

    out = incremental_minhash_ingest(spark, "/root/testdata/sf0.001")
    got = {(r.doc_id_1, r.doc_id_2): (round(r.jaccard, 9), r.pair_kind)
           for r in out.collect()}

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").toPandas())

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    sets, bands, new = {}, {}, {}
    for _, r in docs.iterrows():
        toks = r.text.split(" ")
        sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        sets[r.doc_id] = sh
        mh = [min(md5(f"{p}|{s}") for s in sh) for p in range(INC_PERMS)]
        bands[r.doc_id] = ["|".join(mh[b * INC_ROWS:(b + 1) * INC_ROWS])
                           for b in range(INC_PERMS // INC_ROWS)]
        new[r.doc_id] = md5(str(r.doc_id))[:2] >= INC_OLD_CUT

    ids = sorted(sets)
    want = {}
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            if not (new[d1] or new[d2]):
                continue                       # old×old: never re-checked
            if not any(a == b for a, b in zip(bands[d1], bands[d2])):
                continue
            inter = len(sets[d1] & sets[d2])
            j = inter / (len(sets[d1]) + len(sets[d2]) - inter)
            if j >= INC_TAU:
                kind = ("intra-batch" if new[d1] and new[d2]
                        else "backfill")
                want[(d1, d2)] = (round(j, 9), kind)

    assert got == want
    assert len(got) > 0                        # fixture has planted dups
