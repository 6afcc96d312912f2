"""Text-analysis operators on constructed inputs that exercise the
cases the synthetic corpus doesn't (digits, punctuation, mixed runs) —
the registry-wide oracle sweep covers the corpus itself.
"""

from __future__ import annotations

import pytest

import pandas as pd

from pyspark.sql import functions as F


def _bpe_counts(spark, text: str) -> dict:
    from covid_weather_etl_spark.operators import text as tx
    toks = F.expr(
        r"regexp_extract_all(text, '\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]+', 0)")
    df = (spark.createDataFrame([(0, text)], "doc_id long, text string")
          .select(toks.alias("toks")))
    return df.collect()[0]["toks"]


def test_bpe_pretokens_split_letter_digit_punct_runs(spark):
    assert _bpe_counts(spark, "abc123!? x") == ["abc", "123", "!?", "x"]


def test_bpe_pretokens_unicode_letters(spark):
    assert _bpe_counts(spark, "héllo wörld42") == ["héllo", "wörld", "42"]


def test_bpe_stats_on_mixed_text(spark, tmp_path):
    """Full query over a tiny parquet 'documents' table with mixed
    content: category counts must add up and fertility > 1 when
    punctuation splits whitespace tokens apart."""
    from covid_weather_etl_spark.queries.registry import all_queries
    sf = str(tmp_path)
    (spark.createDataFrame(
        [(1, "Hello, world! 2 + 2 = 4."), (2, "plain words only")],
        "doc_id long, text string")
     .write.parquet(f"{sf}/documents.parquet"))
    rows = {r["doc_id"]: r for r in
            all_queries()["bpe_token_stats"].fn(spark, sf).collect()}
    r1 = rows[1]
    assert (r1["n_word_tokens"] + r1["n_num_tokens"]
            + r1["n_punct_tokens"]) == r1["n_bpe_tokens"]
    assert r1["n_num_tokens"] == 3 and r1["n_punct_tokens"] == 5
    assert r1["bpe_per_ws_ratio"] > 1.0
    r2 = rows[2]
    assert r2["n_bpe_tokens"] == 3 and r2["n_punct_tokens"] == 0
    assert r2["bpe_per_ws_ratio"] == 1.0


def test_winnowing_shared_substring_guarantee(spark, tmp_path):
    """Winnowing guarantee (Schleimer et al.): two documents sharing a
    substring of length >= k + w - 1 share at least one fingerprint;
    disjoint-alphabet documents share none."""
    from covid_weather_etl_spark.operators.text import (
        WINNOW_K, WINNOW_W, winnowing_fingerprint,
    )
    shared = "the quick brown fox jumps over the lazy dog"
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    sf = str(tmp_path)
    (spark.createDataFrame(
        [(1, f"aaaa {shared} bbbb"),
         (2, f"cccc {shared} dddd"),
         (3, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")],
        "doc_id long, text string")
     .write.parquet(f"{sf}/documents.parquet"))
    fps = winnowing_fingerprint(spark, sf).toPandas()
    by_doc = {d: set(g["fp"]) for d, g in fps.groupby("doc_id")}
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_bpe_vocab_train_matches_python_trainer(spark):
    """The full merge sequence must equal a pure-python BPE trainer
    with the identical tie-break (count desc, then (left, right))."""
    from collections import Counter

    import pandas as pd

    from covid_weather_etl_spark.operators.text import (
        BPE_MIN_PAIR_COUNT, BPE_TRAIN_MERGES)
    from covid_weather_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR
    QUERIES = all_queries()
    got = [tuple(r) for r in
           QUERIES["bpe_vocab_train"].fn(spark, SF_DIR).collect()]

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")["text"]
    wc = Counter(tok for t in docs for tok in t.split(" "))
    vocab = {w: [c for c in w] for w in wc}
    expect = []
    for idx in range(1, BPE_TRAIN_MERGES + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < BPE_MIN_PAIR_COUNT:
            break
        expect.append((idx, a, b, c))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    assert got == expect
    assert len(got) >= 3  # the corpus supports a real merge sequence


def test_pmi_collocations_match_numpy(spark):
    """PMI values against raw Counter-based recomputation; also the
    report must be support-filtered and sorted by (pmi desc, w1, w2)."""
    import math
    from collections import Counter

    import pandas as pd

    from covid_weather_etl_spark.operators.text import PMI_MIN_CNT, PMI_TOP
    from covid_weather_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR
    pdf = all_queries()["pmi_collocations"].fn(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    uni, big = Counter(), Counter()
    for text in docs.text:
        ts = text.split(" ")
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    nb, nu = sum(big.values()), sum(uni.values())
    assert len(pdf) <= PMI_TOP
    assert (pdf.pair_cnt >= PMI_MIN_CNT).all()
    for r in pdf.itertuples():
        assert big[(r.w1, r.w2)] == r.pair_cnt
        want = math.log((r.pair_cnt / nb)
                        / ((uni[r.w1] / nu) * (uni[r.w2] / nu)))
        assert abs(r.pmi - round(want, 6)) < 1e-9
    # sorted by pmi desc with deterministic tie-break
    key = list(zip(-pdf.pmi, pdf.w1, pdf.w2))
    assert key == sorted(key)


def test_bpe_encode_documents_matches_python_encoder(spark):
    """Per-document encoded totals must equal a pure-python trainer +
    greedy encoder replaying the identical merge sequence."""
    from collections import Counter

    import pandas as pd

    from covid_weather_etl_spark.operators.text import (
        BPE_MIN_PAIR_COUNT, BPE_TRAIN_MERGES)
    from covid_weather_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR
    got = {r["doc_id"]: r for r in
           all_queries()["bpe_encode_documents"].fn(spark, SF_DIR).collect()}

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    wc = Counter(tok for t in docs.text for tok in t.split(" "))
    vocab = {w: [c for c in w] for w in wc}
    for _ in range(BPE_TRAIN_MERGES):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < BPE_MIN_PAIR_COUNT:
            break
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out

    for _, row in docs.iterrows():
        toks = row.text.split(" ")
        n_syms = sum(len(vocab[w]) for w in toks)
        n_chars = sum(len(w) for w in toks)
        g = got[row.doc_id]
        assert g["n_tokens"] == len(toks)
        assert g["n_bpe_syms"] == n_syms
        assert g["n_chars"] == n_chars
        assert g["chars_per_sym"] == round(n_chars / n_syms, 6)


def test_exact_substring_spans_matches_python_recount(spark):
    """Brute-force recount of the cross-doc duplicated-span coverage
    in pure python sets — independent of both the engine's window
    algebra and the oracle's SQL."""
    from covid_weather_etl_spark.operators.text import SPAN_L
    from covid_weather_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR

    got = {r["doc_id"]: r for r in
           all_queries()["exact_substring_spans"].fn(spark, SF_DIR)
           .collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    span_docs: dict[tuple, set] = {}
    toks_by_doc = {}
    for _, row in docs.iterrows():
        tk = row.text.split(" ")
        toks_by_doc[row.doc_id] = tk
        for i in range(len(tk) - SPAN_L + 1):
            span_docs.setdefault(tuple(tk[i:i + SPAN_L]),
                                 set()).add(row.doc_id)
    dup = {s for s, ds in span_docs.items() if len(ds) >= 2}
    want = {}
    for doc_id, tk in toks_by_doc.items():
        covered = set()
        for i in range(len(tk) - SPAN_L + 1):
            if tuple(tk[i:i + SPAN_L]) in dup:
                covered.update(range(i, i + SPAN_L))
        if covered:
            want[doc_id] = (len(tk), len(covered))
    assert set(got) == set(want)
    for doc_id, (n_tok, n_cov) in want.items():
        g = got[doc_id]
        assert g["n_tokens"] == n_tok
        assert g["dup_tokens"] == n_cov
        import math
        assert math.isclose(
            g["dup_fraction"],
            math.floor(n_cov / n_tok * 1e6 + 0.5) / 1e6, abs_tol=1e-12)


def test_exact_substring_spans_planted_boilerplate(spark, tmp_path):
    """Two long, otherwise-disjoint documents sharing one verbatim
    SPAN_L+2-token paragraph: doc-level dedup misses them (different
    texts), set-Jaccard is tiny, but span coverage must flag EXACTLY
    the shared paragraph's tokens in both docs — and a third document
    with no cross-doc span must be absent."""
    from covid_weather_etl_spark.operators.text import SPAN_L
    from covid_weather_etl_spark.queries.registry import all_queries

    boiler = [f"b{i}" for i in range(SPAN_L + 2)]
    d0 = [f"x{i}" for i in range(20)] + boiler + [f"y{i}" for i in range(20)]
    d1 = [f"z{i}" for i in range(10)] + boiler + [f"w{i}" for i in range(30)]
    d2 = [f"u{i}" for i in range(40)]
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [" ".join(d0), " ".join(d1), " ".join(d2)],
        "lang": ["en"] * 3, "source": ["t"] * 3,
        "n_chars": [len(" ".join(d)) for d in (d0, d1, d2)],
    })
    spark.createDataFrame(pdf).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in
           all_queries()["exact_substring_spans"].fn(spark, str(tmp_path))
           .collect()}
    assert set(out) == {0, 1}
    for doc_id in (0, 1):
        assert out[doc_id]["dup_tokens"] == len(boiler)


def test_regex_token_profile_matches_python_re(spark):
    """Recount every class with python's re module — a third regex
    engine — plus the accounting identity regex = letter+number+punct
    (the three classes partition the pattern's alternatives)."""
    import re

    from covid_weather_etl_spark.operators.text import (
        _RX_LETTER, _RX_NUMBER, _RX_PUNCT, _RX_TOKEN,
    )
    from covid_weather_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR

    got = {(r["lang"], r["source"]): r for r in
           all_queries()["regex_token_profile"].fn(spark, SF_DIR)
           .collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    agg: dict = {}
    for _, row in docs.iterrows():
        k = (row.lang, row.source)
        a = agg.setdefault(k, [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += len(row.text.split(" "))
        a[2] += len(re.findall(_RX_TOKEN, row.text))
        a[3] += len(re.findall(_RX_LETTER, row.text))
        a[4] += len(re.findall(_RX_NUMBER, row.text))
        a[5] += len(re.findall(_RX_PUNCT, row.text))
    assert set(got) == set(agg)
    for k, (nd, ws, rx, lt, nm, pn) in agg.items():
        g = got[k]
        assert (g["n_docs"], g["ws_tokens"], g["regex_tokens"],
                g["letter_tokens"], g["number_tokens"],
                g["punct_tokens"]) == (nd, ws, rx, lt, nm, pn), k
        assert g["regex_tokens"] == (g["letter_tokens"]
                                     + g["number_tokens"]
                                     + g["punct_tokens"])
        import math
        assert math.isclose(g["fertility"],
                            math.floor(rx / ws * 1e6 + 0.5) / 1e6,
                            abs_tol=1e-12)


def test_benchmark_decontamination_planted(spark, tmp_path):
    """Planted leakage: doc 7 (eval: 7 % 7 == 0) shares one verbatim
    8-gram with train doc 1; train doc 2 shares nothing. The report
    must flag exactly doc 1's cohort with one hit, correct fraction."""
    from covid_weather_etl_spark.operators.text import (
        DECON_EVAL_MOD, DECON_NGRAM)
    from covid_weather_etl_spark.queries.registry import all_queries

    leak = " ".join(f"w{i}" for i in range(DECON_NGRAM))  # the 8-gram
    rows = [
        # eval doc (id % 7 == 0) carrying the leaked span
        (7, f"{leak} evalish tail tokens here now right", "en", "web"),
        # contaminated train doc: 10 tokens -> 3 total 8-grams, 1 shared
        (1, f"{leak} aaa bbb", "en", "web"),
        # clean train doc, same cohort
        (2, " ".join(f"c{i}" for i in range(12)), "en", "web"),
        # clean train doc, other cohort
        (3, " ".join(f"d{i}" for i in range(12)), "fr", "books"),
    ]
    assert all(r[0] % DECON_EVAL_MOD != 0 for r in rows[1:])
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf.text.str.len()
    spark.createDataFrame(pdf).write.parquet(f"{tmp_path}/documents.parquet")

    got = {(r["lang"], r["source"]): r for r in
           all_queries()["benchmark_decontamination"]
           .fn(spark, str(tmp_path)).collect()}
    web = got[("en", "web")]
    assert web["n_docs"] == 2
    assert web["contaminated_docs"] == 1
    assert web["shared_grams"] == 1
    # doc 1: 10 tokens -> 3 distinct 8-grams, 1 shared -> 1/3 floored
    third = int(1 / 3 * 1e6 + 0.5) / 1e6
    assert web["max_contamination"] == third
    assert abs(web["mean_contamination"] - third / 2) < 2e-6
    books = got[("fr", "books")]
    assert books["contaminated_docs"] == 0 and books["shared_grams"] == 0
    assert books["mean_contamination"] == 0.0


def test_ngram_novelty_profile_planted(spark, tmp_path):
    """Planted ownership: doc 1 introduces a span, doc 2 repeats it
    verbatim plus fresh content, doc 3 is entirely fresh — novelty
    attribution must follow first-occurrence by doc_id."""
    from covid_weather_etl_spark.operators.text import NOVELTY_N
    from covid_weather_etl_spark.queries.registry import all_queries

    span = " ".join(f"s{i}" for i in range(NOVELTY_N))  # one shared gram
    rows = [
        (1, span, "en", "web"),                                   # 1 gram
        (2, f"{span} z0", "en", "web"),     # 2 grams: 1 copied, 1 novel
        (3, " ".join(f"f{i}" for i in range(NOVELTY_N + 1)),
         "en", "books"),                                         # 2 novel
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf.text.str.len()
    spark.createDataFrame(pdf).write.parquet(f"{tmp_path}/documents.parquet")

    got = {r["source"]: r for r in
           all_queries()["ngram_novelty_profile"]
           .fn(spark, str(tmp_path)).collect()}
    web = got["web"]
    # web: doc1 (1 gram, novel) + doc2 (2 grams, 1 novel)
    assert web["n_docs"] == 2
    assert web["total_grams"] == 3 and web["novel_grams"] == 2
    assert abs(web["novelty_rate"] - round(2 / 3, 6)) < 2e-6
    books = got["books"]
    assert books["total_grams"] == 2 and books["novel_grams"] == 2
    assert books["novelty_rate"] == 1.0


def test_bpe_fertility_by_lang_matches_python(spark):
    """Per-language fertility must equal a pure-python recount: train
    BPE (reusing the trainer pinned above), encode every distinct
    word, and aggregate syms/words per language on the exact grid."""
    import math
    from collections import Counter

    import pandas as pd

    from covid_weather_etl_spark.operators.text import (
        BPE_MIN_PAIR_COUNT, BPE_TRAIN_MERGES)
    from covid_weather_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR

    got = {r["lang"]: r for r in
           all_queries()["bpe_fertility_by_lang"].fn(spark, SF_DIR)
           .collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    wc = Counter(tok for t in docs["text"] for tok in t.split(" "))
    vocab = {w: [c for c in w] for w in wc}
    for _ in range(BPE_TRAIN_MERGES):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < BPE_MIN_PAIR_COUNT:
            break
        nv = {}
        for w, syms in vocab.items():
            acc = []
            for s in syms:
                if acc and acc[-1] == a and s == b:
                    acc[-1] = a + b
                else:
                    acc.append(s)
            nv[w] = acc
        vocab = nv
    per_lang: dict = {}
    for row in docs.itertuples():
        st = per_lang.setdefault(row.lang, [0, 0, 0])
        for tok in row.text.split(" "):
            st[0] += 1
            st[1] += len(vocab[tok])
            st[2] += len(tok)
    assert set(got) == set(per_lang)
    for lang, (nw, ns, nc) in per_lang.items():
        r = got[lang]
        assert r["n_words"] == nw and r["n_syms"] == ns
        assert r["fertility"] == math.floor(ns / nw * 1e6 + 0.5) / 1e6
        assert r["chars_per_sym"] == math.floor(nc / ns * 1e6 + 0.5) / 1e6
        assert r["fertility"] >= 1.0


def test_prefix_cache_reuse_matches_python(spark):
    """Per-k savings must equal a pure-python recount of the prefix
    groups, and the saved-token arithmetic must be internally
    consistent (saved = Σ (c-1)·k over shared groups)."""
    from collections import Counter

    import pandas as pd

    from covid_weather_etl_spark.operators.text import PCR_KS
    from covid_weather_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR

    got = {r["prefix_len"]: r for r in
           all_queries()["prefix_cache_reuse_stats"].fn(spark, SF_DIR)
           .collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = [t.split(" ") for t in docs["text"]]
    for k in PCR_KS:
        elig = [t for t in toks if len(t) >= k]
        groups = Counter(" ".join(t[:k]) for t in elig)
        shared = {p: c for p, c in groups.items() if c >= 2}
        r = got[k]
        assert r["n_docs"] == len(elig)
        assert r["total_tokens"] == sum(len(t) for t in elig)
        assert r["shared_groups"] == len(shared)
        assert r["docs_sharing"] == sum(shared.values())
        want_saved = sum((c - 1) * k for c in shared.values())
        assert r["tokens_saved"] == want_saved
        import math
        assert r["save_ratio"] == math.floor(
            want_saved / r["total_tokens"] * 1e6 + 0.5) / 1e6


def test_speculative_acceptance_bounds_and_python_recount(spark):
    """alpha must sit in (0, 1]; and a python recount of
    E[min(p_bigram, p_unigram)] per source must agree on the 1e-6
    grid (same fround-snap-then-weighted-mean arithmetic)."""
    import math
    from collections import Counter

    import pandas as pd

    from covid_weather_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR

    got = {r["source"]: r for r in
           all_queries()["speculative_decoding_acceptance"]
           .fn(spark, SF_DIR).collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    uni: Counter = Counter()
    c12: Counter = Counter()
    srcb: dict[str, Counter] = {}
    for _, row in docs.iterrows():
        t = row["text"].split(" ")
        uni.update(t)
        bg = list(zip(t, t[1:]))
        c12.update(bg)
        srcb.setdefault(row["source"], Counter()).update(bg)
    c1: Counter = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    n = sum(uni.values())
    for src, r in got.items():
        assert 0.0 < r["alpha"] <= 1.0
        num = 0
        tot = 0
        for (w1, w2), k in srcb[src].items():
            v = min(c12[(w1, w2)] / c1[w1], uni[w2] / n)
            v6 = math.floor(v * 1e6 + 0.5)   # decimal(25,6) micro-units
            num += k * v6
            tot += k
        assert r["n_bigrams"] == tot
        want = math.floor(num / 1e6 / tot * 1e6 + 0.5) / 1e6
        assert r["alpha"] == want, (src, r["alpha"], want)
        assert r["expected_tokens_per_step"] == math.floor(
            (1.0 + num / 1e6 / tot) * 1e6 + 0.5) / 1e6


def test_heaps_law_monotone_and_beta_band(spark):
    """Checkpoints must be monotone in both n and V (prefixes grow),
    the fit must be shared across rows, and beta must land in (0, 1)
    with high r2 on the synthetic corpus (trigram type space)."""
    from covid_weather_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR

    rows = sorted(all_queries()["heaps_law_fit"].fn(spark, SF_DIR)
                  .collect(), key=lambda r: r["checkpoint"])
    assert [r["checkpoint"] for r in rows] == list(range(1, 11))
    ns = [r["n_tokens"] for r in rows]
    vs = [r["vocab"] for r in rows]
    assert ns == sorted(ns) and vs == sorted(vs)
    assert vs[0] < vs[-1]          # the type space actually grows
    assert len({r["beta"] for r in rows}) == 1
    beta, r2 = rows[0]["beta"], rows[0]["r2"]
    assert 0.0 < beta < 1.0, beta
    assert r2 > 0.9, r2


@pytest.mark.slow
def test_bpe_continue_train_resume_equals_scratch(spark):
    """The resumability identity behind bpe_continue_train: running
    BPE_EXTEND_MERGES more rounds FROM the persisted round-12 state
    must reproduce, merge for merge and segmentation for
    segmentation, a from-scratch 12+K training run — the property
    that makes checkpoint-resume tokenizer training trustworthy."""
    from covid_weather_etl_spark.operators.text import (
        BPE_EXTEND_MERGES, BPE_TRAIN_MERGES, _bpe_init_vocab,
        _bpe_rounds, ensure_bpe_artifacts)
    from tests.conftest import SF_DIR

    scratch_m, scratch_v = _bpe_rounds(
        _bpe_init_vocab(spark, SF_DIR), 1,
        BPE_TRAIN_MERGES + BPE_EXTEND_MERGES)
    merges, vocab = ensure_bpe_artifacts(spark, SF_DIR)
    ext_m, ext_v = _bpe_rounds(vocab, len(merges) + 1, BPE_EXTEND_MERGES)
    assert merges + ext_m == scratch_m
    assert len(ext_m) > 0  # the corpus supports real extension merges
    got = sorted((r["word"], list(r["syms"])) for r in ext_v.collect())
    want = sorted((r["word"], list(r["syms"])) for r in scratch_v.collect())
    assert got == want


def test_bpe_continue_train_parity(spark, duck):
    """Driver-style oracle parity for the registered maintain→verify
    query (the oracle's from-scratch 12+K recursive-CTE replay IS the
    cross-engine resumability check)."""
    from covid_weather_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR, assert_parity
    q = all_queries()["bpe_continue_train"]
    assert_parity(spark, duck, q)
    # non-degenerate: the extension must actually save symbols
    pdf = q.fn(spark, SF_DIR).toPandas()
    assert (pdf["syms_saved"] > 0).any()

