"""operators/stats: exact group quantiles vs numpy-free python oracle
(discrete/lower quantile at rank ceil(n*q/100)), ties, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_please_spark.operators.stats import group_quantiles


def _py_q(vals, q):
    s = sorted(vals)
    rank = -(-len(s) * q // 100)  # ceil
    return s[rank - 1]


def test_group_quantiles_matches_python_oracle(spark):
    rows = [("a", (i * 17) % 101) for i in range(157)] + [
        ("b", v) for v in [5, 5, 5, 5, 9]          # heavy ties
    ] + [("c", 42)]                                 # singleton group
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r for r in group_quantiles(df, "g", "v", [1, 50, 90, 100]).collect()}
    import collections

    by_g = collections.defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    for g, vals in by_g.items():
        assert got[g].n == len(vals)
        for q in (1, 50, 90, 100):
            assert getattr(got[g], f"p{q}") == _py_q(vals, q), (g, q)


def test_group_quantiles_validates(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "v", [])
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "v", [0])
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "v", [101])


def test_group_quantiles_excludes_nulls(spark):
    rows = [("a", 1), ("a", None), ("a", 3), ("a", None), ("a", 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = group_quantiles(df, "g", "v", [50, 100]).first()
    assert (r.n, r.p50, r.p100) == (3, 3, 5)


# ---------------------------------------------------------------------------
# n-gram diversity


def _py_diversity(rows, n=2):
    from collections import Counter

    out = {}
    per = {}
    for src, text in rows:
        toks = text.lower().split()
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        per.setdefault(src, Counter()).update(grams)
    for src, c in per.items():
        slots = sum(c.values())
        if slots == 0:
            continue
        types = len(c)
        coll = sum(v * (v - 1) for v in c.values())
        simpson = (
            10000 - (coll * 10000 // (slots * (slots - 1))) if slots > 1 else 10000
        )
        out[src] = (slots, types, types * 10000 // slots, simpson)
    return out


def test_ngram_diversity_matches_python(spark):
    from news_please_spark.operators.stats import ngram_diversity

    rows = [
        ("tmpl", "buy now buy now buy now buy now"),  # heavy repetition
        ("tmpl", "buy now buy now"),
        ("wiki", "the quick brown fox jumps over the lazy dog"),
        ("wiki", "an entirely different sentence with fresh words"),
        ("tiny", "word"),  # < n tokens: zero slots, no row
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r.source: (r.slots, r.types, r.ttr_bp, r.simpson_bp)
        for r in ngram_diversity(df, n=2).collect()
    }
    assert got == _py_diversity(rows)
    # templated source must score below the natural-text source on both
    assert got["tmpl"][2] < got["wiki"][2]
    assert got["tmpl"][3] < got["wiki"][3]
    assert "tiny" not in got


def test_ngram_diversity_single_slot_group(spark):
    from news_please_spark.operators.stats import ngram_diversity

    df = spark.createDataFrame([("one", "exactly two")], "source string, text string")
    r = ngram_diversity(df, n=2).first()
    assert (r.slots, r.types, r.ttr_bp, r.simpson_bp) == (1, 1, 10000, 10000)


def test_ngram_diversity_one_data_shuffle(spark):
    from news_please_spark.operators.stats import ngram_diversity

    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "p q r")], "source string, text string"
    )
    plan = ngram_diversity(df)._jdf.queryExecution().executedPlan().toString()
    # (source, gram) count + per-source reduce: two hash exchanges, both
    # post-aggregation (map-side combined); no join anywhere
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_vocab_drift_detects_planted_shift(spark):
    from news_please_spark.operators.stats import vocab_drift

    old = spark.createDataFrame(
        [(i, "common words here plus legacy token legacy") for i in range(10)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(i, "common words here plus novel token novel") for i in range(10)],
        "doc_id long, text string",
    )
    rows = vocab_drift(old, new, min_count=5, top_k=10).collect()
    by_term = {r.term: r for r in rows}
    assert by_term["legacy"].drift_ppm < 0 and by_term["legacy"].n_new == 0
    assert by_term["novel"].drift_ppm > 0 and by_term["novel"].n_old == 0
    # stable terms have zero drift (same rates both sides)
    assert by_term["common"].drift_ppm == 0
    # ranking: the two shifted terms outrank the stable ones
    assert {rows[0].term, rows[1].term} == {"legacy", "novel"}


def test_tokenizer_fertility_hand_computed(spark):
    from news_please_spark.operators.stats import tokenizer_fertility

    docs = spark.createDataFrame(
        [
            # "ab cd" -> 2 words, 2 subtokens, 5 bytes
            ("s1", "en", "ab cd"),
            # "it's 2x!" -> 2 words, subtokens: it ' s 2 x ! = 6; 8 bytes
            ("s1", "en", "it's 2x!"),
            # multibyte: "héllo" -> 1 word; subtokens: h é(punct-class) llo
            # lower('héllo') tokens by [a-z]+|[0-9]+|[^a-z0-9\s]: 'h','é','llo' = 3
            ("s2", "fr", "héllo"),
        ],
        "source string, lang string, text string",
    )
    got = {
        (r.source, r.lang): (
            r.n_docs, r.n_words, r.n_subtokens, r.n_bytes,
            r.fertility_q, r.bytes_per_subtoken_q,
        )
        for r in tokenizer_fertility(docs).collect()
    }
    assert got[("s1", "en")] == (2, 4, 8, 13, 20000, 16250)
    # é is 2 bytes in UTF-8 -> 6 bytes total
    assert got[("s2", "fr")] == (1, 1, 3, 6, 30000, 20000)


def test_tokenizer_fertility_zero_word_slice_is_null_not_crash(spark):
    from news_please_spark.operators.stats import tokenizer_fertility

    docs = spark.createDataFrame(
        [("s", "xx", "")], "source string, lang string, text string"
    )
    row = tokenizer_fertility(docs).collect()[0]
    # empty text: split('') = [''] -> 1 "word", 0 subtokens, 0 bytes
    assert (row.n_words, row.n_subtokens, row.n_bytes) == (1, 0, 0)
    assert row.fertility_q == 0 and row.bytes_per_subtoken_q is None


def test_tokenizer_fertility_single_exchange(spark):
    from news_please_spark.operators.stats import tokenizer_fertility

    df = spark.createDataFrame(
        [("s", "en", "a b")], "source string, lang string, text string"
    )
    plan = (
        tokenizer_fertility(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # one map-side-combinable aggregate
    assert "Python" not in plan


def test_lang_segments_runs_merge_and_split(spark):
    from news_please_spark.operators.stats import lang_segments

    text = (
        "the cat and the dog. a house of cards. "
        "der die und. die und der. el los y."
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.seg_id, r.lang, r.n_sentences, r.seg_text)
        for r in lang_segments(docs).collect()
    )
    assert rows == [
        (0, "en", 2, "the cat and the dog. a house of cards."),
        (1, "de", 2, "der die und. die und der."),
        (2, "es", 1, "el los y."),
    ]


def test_lang_segments_und_and_empty(spark):
    from news_please_spark.operators.stats import lang_segments

    docs = spark.createDataFrame(
        [(1, "xyz qqq. zzz www."), (2, "")], "doc_id long, text string"
    )
    rows = [(r.doc_id, r.seg_id, r.lang, r.n_sentences) for r in lang_segments(docs).collect()]
    # unknown sentences merge into one 'und' run; empty doc vanishes
    assert rows == [(1, 0, "und", 2)]


def test_lang_segments_zero_shuffle(spark):
    from news_please_spark.operators.stats import lang_segments

    docs = spark.createDataFrame([(1, "the a of.")], "doc_id long, text string")
    plan = lang_segments(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_first_discovery_prefers_wave_then_channel(spark):
    from news_please_spark.operators.stats import first_discovery

    rows = [
        ("u1", "link", 0, "sA"),      # earliest wave wins outright
        ("u1", "sitemap", 1, "sB"),
        ("u2", "link", 2, "sC"),      # same wave: sitemap outranks link
        ("u2", "sitemap", 2, "sD"),
        ("u3", "feed", 1, "sZ"),      # same wave+channel: src tiebreak
        ("u3", "feed", 1, "sA"),
    ]
    df = spark.createDataFrame(rows, "url string, channel string, wave long, src string")
    got = {r.url: (r.first_wave, r.channel, r.src)
           for r in first_discovery(df, {"sitemap": 0, "feed": 1, "link": 2}).collect()}
    assert got == {
        "u1": (0, "link", "sA"),
        "u2": (2, "sitemap", "sD"),
        "u3": (1, "feed", "sA"),
    }
    import pytest as _pytest
    with _pytest.raises(ValueError):
        first_discovery(df, {})


def test_lang_mismatch_audit_counts(spark):
    from news_please_spark.operators.stats import lang_mismatch_audit

    rows = [
        ("s1", "en", "the a of and the"),          # en declared, en detected
        ("s1", "en", "der die und der die"),       # en declared, de detected -> mismatch
        ("s1", "en", "xqz wvu"),                   # undetected -> excluded from rate
        ("s2", "de", "der die und"),               # agree
    ]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    got = {(r.source, r.lang): r for r in lang_mismatch_audit(df).collect()}
    a = got[("s1", "en")]
    assert (a.n_docs, a.n_det, a.n_mismatch, a.mismatch_bp) == (3, 2, 1, 5000)
    b = got[("s2", "de")]
    assert (b.n_docs, b.n_det, b.n_mismatch, b.mismatch_bp) == (1, 1, 0, 0)


def test_lang_mismatch_audit_null_rate_when_undetected(spark):
    from news_please_spark.operators.stats import lang_mismatch_audit

    df = spark.createDataFrame(
        [("s", "en", "zzz qqq")], "source string, lang string, text string"
    )
    r = lang_mismatch_audit(df).collect()[0]
    assert r.n_det == 0 and r.mismatch_bp is None


# ---------------------------------------------------------------------------
# path_rollup


def test_path_rollup_depths_and_weights(spark):
    from news_please_spark.operators.stats import path_rollup

    urls = spark.createDataFrame(
        [
            ("h", "/a/b", 10),
            ("h", "/a/c", 20),
            ("h", "/a", 5),
            ("g", "/a/b", 7),
        ],
        "host string, path string, w long",
    )
    got = {
        (r["host"], r["depth"], r["prefix"]): (r["n_urls"], r["total_w"])
        for r in path_rollup(urls, max_depth=2, weight_col="w").collect()
    }
    assert got[("h", 0, "/")] == (3, 35)
    assert got[("h", 1, "/a")] == (3, 35)
    assert got[("h", 2, "/a/b")] == (1, 10)
    assert got[("h", 2, "/a/c")] == (1, 20)
    assert got[("g", 0, "/")] == (1, 7)
    assert got[("g", 2, "/a/b")] == (1, 7)
    # "/a" contributes to depth <=1 only; no depth-2 row for it
    assert ("h", 2, "/a") not in got
    assert len(got) == 7


def test_path_rollup_depth_cap_and_default_weight(spark):
    from news_please_spark.operators.stats import path_rollup

    urls = spark.createDataFrame(
        [("h", "/a/b/c/d")], "host string, path string"
    )
    got = {
        r["depth"]: (r["prefix"], r["total_w"])
        for r in path_rollup(urls, max_depth=2).collect()
    }
    assert got == {0: ("/", 1), 1: ("/a", 1), 2: ("/a/b", 1)}


def test_path_rollup_trailing_and_double_slashes(spark):
    from news_please_spark.operators.stats import path_rollup

    urls = spark.createDataFrame(
        [("h", "/a//b/"), ("h", "/a/b")], "host string, path string"
    )
    got = {
        (r["depth"], r["prefix"]): r["n_urls"]
        for r in path_rollup(urls, max_depth=3).collect()
    }
    # empty segments collapse: both URLs are /a/b
    assert got == {(0, "/"): 2, (1, "/a"): 2, (2, "/a/b"): 2}


# ---------------------------------------------------------------------------
# histogram_drift


def test_histogram_drift_identical_zero(spark):
    from news_please_spark.operators.stats import histogram_drift

    rows = [("s", b, e) for e in (0, 1) for b in (1, 1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, bkt long, ep long")
    out = histogram_drift(df, "g", "bkt", "ep").collect()
    assert len(out) == 1
    assert out[0]["drift_bp"] == 0
    assert out[0]["n_epoch0"] == 4 and out[0]["n_epoch1"] == 4


def test_histogram_drift_disjoint_full(spark):
    from news_please_spark.operators.stats import histogram_drift

    df = spark.createDataFrame(
        [("s", 1, 0), ("s", 1, 0), ("s", 2, 1)],
        "g string, bkt long, ep long",
    )
    out = histogram_drift(df, "g", "bkt", "ep").collect()[0]
    # disjoint supports: TV distance = 1.0 -> 10000 bp
    assert out["drift_bp"] == 10000


def test_histogram_drift_half_moved(spark):
    from news_please_spark.operators.stats import histogram_drift

    # epoch0: 2x bkt1, 2x bkt2 ; epoch1: 4x bkt1 -> TV = 0.5
    rows = (
        [("s", 1, 0)] * 2 + [("s", 2, 0)] * 2 + [("s", 1, 1)] * 4
    )
    df = spark.createDataFrame(rows, "g string, bkt long, ep long")
    out = histogram_drift(df, "g", "bkt", "ep").collect()[0]
    assert out["drift_bp"] == 5000


def test_histogram_drift_missing_epoch_null(spark):
    from news_please_spark.operators.stats import histogram_drift

    df = spark.createDataFrame(
        [("only0", 1, 0), ("both", 1, 0), ("both", 1, 1)],
        "g string, bkt long, ep long",
    )
    got = {r["g"]: r for r in histogram_drift(df, "g", "bkt", "ep").collect()}
    assert got["only0"]["drift_bp"] is None
    assert got["only0"]["n_epoch1"] == 0
    assert got["both"]["drift_bp"] == 0


# ---------------------------------------------------------------------------
# key_skew_audit


def test_key_skew_audit_even_keys_zero_gini(spark):
    from news_please_spark.operators.stats import key_skew_audit

    df = spark.createDataFrame(
        [(k,) for k in "aabbcc"], "k string"
    )
    r = key_skew_audit(df, "k", top_n=2).collect()[0]
    assert r["n_keys"] == 3 and r["n_rows"] == 6
    assert r["gini_bp"] == 0
    assert r["top1_bp"] == 3333  # 2/6
    assert r["top2_bp"] == 6666  # 4/6


def test_key_skew_audit_one_hot_key(spark):
    from news_please_spark.operators.stats import key_skew_audit

    rows = [("hot",)] * 97 + [("a",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_audit(df, "k", top_n=1).collect()[0]
    assert r["n_keys"] == 4 and r["n_rows"] == 100
    assert r["top1_bp"] == 9700
    # exact Gini: x=[1,1,1,97], n=4: sum((2i-5)*x)=(-3)+(-1)+(1)+(3*97)=288
    # 10000*288 // (4*100) = 7200
    assert r["gini_bp"] == 7200


def test_key_skew_audit_matches_hand_formula(spark):
    from news_please_spark.operators.stats import key_skew_audit

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_audit(df, "k", top_n=10).collect()[0]
    # x=[2,3,5], n=3: (2*1-4)*2 + (2*2-4)*3 + (2*3-4)*5 = -4+0+10 = 6
    # 10000*6 // (3*10) = 2000
    assert r["gini_bp"] == 2000
    assert r["top10_bp"] == 10000  # fewer keys than top_n: all rows
