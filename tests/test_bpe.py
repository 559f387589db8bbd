"""BPE trainer vs a from-scratch pure-Python Sennrich Algorithm-1
implementation (get_stats / merge with identical tie-break)."""

from __future__ import annotations

import collections

import pytest

from news_please_spark.operators.bpe import (
    SYM_CLOSE,
    SYM_OPEN,
    apply_merges,
    bpe_token_counts,
    train_bpe,
    word_freqs,
)


def py_word_freqs(texts):
    wf = collections.Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                wf[w] += 1
    return dict(wf)


def py_get_stats(vocab):
    stats = collections.Counter()
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            stats[(syms[i], syms[i + 1])] += freq
    return stats


def py_merge(vocab, pair):
    a, b = pair
    out = {}
    for syms, freq in vocab.items():
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = freq
    return out


def py_train(texts, k, min_pair_freq=1):
    vocab = {
        tuple(w): f for w, f in py_word_freqs(texts).items()
    }
    merges = []
    for step in range(k):
        stats = py_get_stats(vocab)
        if not stats:
            break
        (a, b), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_freq:
            break
        merges.append(
            {"step": step, "left": a, "right": b, "pair_freq": cnt}
        )
        vocab = py_merge(vocab, (a, b))
    return merges, vocab


TEXTS = [
    "low low low low low lower lower newest newest",
    "newest newest newest newest widest widest widest",
    "aaa aaa aaa abab abab banana bandana",
    "the cat sat on the mat the cat",
]


def test_merges_match_python_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    got = train_bpe(word_freqs(docs), num_merges=12)
    want, _ = py_train(TEXTS, 12)
    assert got == want


def test_overlap_and_adjacent_disjoint_semantics(spark):
    # 'aaaa' + pair (a,a): leftmost-first -> [aa, aa]; 'abab' + (a,b)
    # -> [ab, ab] (the framed replace must not eat the next match's
    # leading frame)
    docs = spark.createDataFrame(
        [(0, "aaaa abab aaaa abab aaaa")], "doc_id int, text string"
    )
    got = train_bpe(word_freqs(docs), num_merges=3)
    want, _ = py_train(["aaaa abab aaaa abab aaaa"], 3)
    assert got == want


def test_early_stop_on_min_freq(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab cd")], "doc_id int, text string"
    )
    got = train_bpe(word_freqs(docs), num_merges=10, min_pair_freq=2)
    assert [m["left"] + m["right"] for m in got] == ["ab"]


def test_batched_rounds_equal_sequential_when_disjoint(spark):
    # top pairs are symbol-disjoint by construction: (a,b), (c,d),
    # (e,f) with strictly separated frequencies
    texts = ["ab " * 9 + "cd " * 7 + "ef " * 5 + "xy"]
    docs = spark.createDataFrame(
        [(0, texts[0])], "doc_id int, text string"
    )
    wf = word_freqs(docs)
    seq = train_bpe(wf, num_merges=3, pairs_per_round=1)
    bat = train_bpe(wf, num_merges=3, pairs_per_round=3)
    assert seq == bat == py_train(texts, 3)[0]


def test_encode_matches_python_vocab(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    merges = train_bpe(word_freqs(docs), num_merges=8)
    got = {
        r.doc_id: (r.ws_tokens, r.bpe_tokens)
        for r in bpe_token_counts(docs, merges).collect()
    }
    _, vocab = py_train(TEXTS, 8)
    enc = {"".join(s): len(s) for s in vocab}
    want = {}
    for i, t in enumerate(TEXTS):
        ws = [w for w in t.strip().lower().split() if w]
        want[i] = (len(ws), sum(enc[w] for w in ws))
    assert got == want


def test_framed_repr_roundtrip(spark):
    docs = spark.createDataFrame([(0, "banana")], "doc_id int, text string")
    merges = train_bpe(word_freqs(docs), num_merges=2)
    df = spark.createDataFrame([("banana",)], "word string")
    (row,) = df.select(
        apply_merges(df.word, merges).alias("w")
    ).collect()
    syms = row.w[1:-1].split(SYM_CLOSE + SYM_OPEN)
    assert "".join(syms) == "banana"
    assert SYM_OPEN not in "".join(syms) and SYM_CLOSE not in "".join(syms)


def test_rejects_bad_params(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id int, text string")
    wf = word_freqs(docs)
    with pytest.raises(ValueError):
        train_bpe(wf, num_merges=0)
    with pytest.raises(ValueError):
        train_bpe(wf, num_merges=1, pairs_per_round=0)
