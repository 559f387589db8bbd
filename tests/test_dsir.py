"""DSIR importance weights vs a from-scratch pure-Python reference
(hashed unigram+bigram models, integer-quantized ratio weights)."""

from __future__ import annotations

import hashlib
import math

import pytest

from news_please_spark.operators.dsir import (
    PROB_SCALE,
    RATIO_SCALE,
    dsir_fit,
    dsir_score,
    dsir_select,
)


def py_feats(text):
    toks = text.strip().lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def py_bucket(feat, buckets):
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % buckets


def py_fit(target_texts, raw_texts, buckets):
    t_cnt, q_cnt = [0] * buckets, [0] * buckets
    for texts, cnt in ((target_texts, t_cnt), (raw_texts, q_cnt)):
        for t in texts:
            if not t.strip():
                continue
            for f in py_feats(t):
                cnt[py_bucket(f, buckets)] += 1
    T, Q = sum(t_cnt), sum(q_cnt)
    return [
        ((PROB_SCALE * (t_cnt[b] + 1)) // (T + buckets) * RATIO_SCALE)
        // ((PROB_SCALE * (q_cnt[b] + 1)) // (Q + buckets))
        for b in range(buckets)
    ]


def py_score(texts_by_id, llr, buckets):
    out = {}
    for i, t in texts_by_id.items():
        if not t.strip():
            continue
        fs = py_feats(t)
        out[i] = (len(fs), sum(llr[py_bucket(f, buckets)] for f in fs))
    return out


TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "the quick red fox runs over the green hill",
    "quick foxes and lazy dogs share the meadow",
]
RAW = {
    0: "the quick brown fox naps under the lazy dog",
    1: "stock prices fell sharply after the earnings call",
    2: "quick fox quick dog quick meadow",
    3: "buy cheap pills online now best price guaranteed",
    4: "the lazy dog chased the quick fox over the hill",
    5: "   ",
    6: "zebra xylophone quagmire jostle vex",
}
B = 512


@pytest.fixture(scope="module")
def frames(spark):
    tgt = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(TARGET)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        list(RAW.items()), "doc_id long, text string"
    )
    return tgt, raw


def test_fit_matches_python(frames):
    tgt, raw = frames
    got = dsir_fit(tgt, raw, buckets=B)
    want = py_fit(TARGET, list(RAW.values()), B)
    assert got == want


def test_score_matches_python(frames):
    tgt, raw = frames
    llr = py_fit(TARGET, list(RAW.values()), B)
    got = {
        r.doc_id: (r.n_feats, r.dsir_q)
        for r in dsir_score(raw, llr, buckets=B).collect()
    }
    assert got == py_score(RAW, llr, B)
    assert 5 not in got  # blank text excluded


def test_targetlike_outranks_junk(frames):
    tgt, raw = frames
    llr = py_fit(TARGET, list(RAW.values()), B)
    s = py_score(RAW, llr, B)
    # per-feature average so length doesn't confound the ordering
    avg = {i: q / n for i, (n, q) in s.items()}
    assert avg[0] > avg[3] and avg[4] > avg[3]
    assert avg[2] > avg[6]


def test_select_equals_rank_semantics(frames):
    tgt, raw = frames
    out = {
        r.doc_id: r for r in dsir_select(tgt, raw, frac_pct=40, buckets=B).collect()
    }
    llr = py_fit(TARGET, list(RAW.values()), B)
    s = py_score(RAW, llr, B)
    k = math.ceil(len(s) * 40 / 100)
    ranked = sorted(s, key=lambda i: (-s[i][1], i))
    want_sel = set(ranked[:k])
    assert {i for i, r in out.items() if r.selected == 1} == want_sel
    assert all(r.selected in (0, 1) for r in out.values())


def test_scoring_is_zero_shuffle(frames):
    tgt, raw = frames
    llr = py_fit(TARGET, list(RAW.values()), B)
    plan = (
        dsir_score(raw, llr, buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_partitioning_invariance(frames):
    tgt, raw = frames
    llr1 = dsir_fit(tgt, raw, buckets=B)
    llr2 = dsir_fit(tgt.repartition(7), raw.repartition(5), buckets=B)
    assert llr1 == llr2


def test_score_rejects_wrong_model_size(frames):
    _, raw = frames
    with pytest.raises(ValueError):
        dsir_score(raw, [1, 2, 3], buckets=B)
