"""operators/terms: rational TF-IDF top-terms vs a python oracle."""

from __future__ import annotations

import pytest

from news_please_spark.operators.terms import tfidf_top_terms


def _py_tfidf(rows, k):
    import collections
    import re

    tf = collections.Counter()
    docs_of_term = collections.defaultdict(set)
    ids = set()
    for d, text in rows:
        ids.add(d)
        for t in re.split(r"\s+", text.strip().lower()):
            tf[(d, t)] += 1
            docs_of_term[t].add(d)
    n = len(ids)
    per_doc = collections.defaultdict(list)
    for (d, t), c in tf.items():
        score = (c * n * 10000) // len(docs_of_term[t])
        per_doc[d].append((-score, t))
    out = []
    for d, terms in per_doc.items():
        for rk, (neg, t) in enumerate(sorted(terms)[:k], 1):
            out.append((d, t, -neg, rk))
    return sorted(out, key=repr)


def test_tfidf_top_terms_matches_python_oracle(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana date"),
        (3, "apple date date date egg"),
        (4, "Fig  fig\tFIG"),        # casing + whitespace normalization
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((tuple(r) for r in tfidf_top_terms(df, k=2).collect()), key=repr)
    assert got == _py_tfidf(rows, 2)
    # rare term beats common: doc 3's top term is 'egg' (df=1) over 'date'
    top3 = {r.rk: r.term for r in tfidf_top_terms(df, k=3).collect() if r.doc_id == 3}
    assert top3[1] == "date"  # tf=3 dominates here (score 3*4*10000/2)
    assert top3[2] == "egg"   # df=1 beats apple (df=2)


def test_tfidf_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        tfidf_top_terms(df, k=0)
