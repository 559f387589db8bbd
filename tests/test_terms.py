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


# ---------------------------------------------------------------------------
# bigram LM quality scoring


def _py_bigrams(docs):
    out = {}
    for did, text in docs:
        toks = text.strip().lower().split()
        out[did] = list(zip(toks, toks[1:]))
    return out


def _py_lm_scores(docs, model_docs=None):
    from collections import Counter

    bg_by_doc = _py_bigrams(docs)
    model_bgs = _py_bigrams(model_docs if model_docs is not None else docs)
    c2 = Counter(b for bgs in model_bgs.values() for b in bgs)
    c1 = Counter()
    for (w1, _), n in c2.items():
        c1[w1] += n
    out = {}
    for did, bgs in bg_by_doc.items():
        if not bgs:
            continue
        qs = [
            (c2[b] * 1_000_000) // c1[b[0]] if b in c2 else 0 for b in bgs
        ]
        out[did] = (len(bgs), sum(qs) // len(qs))
    return out


def test_lm_scores_match_python_oracle(spark):
    from news_please_spark.operators.terms import lm_doc_scores

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the hat"),
        (2, "the dog sat on the mat"),
        (3, "zx qv zx qv zx"),          # repetitive: self-model p=1
        (4, "one"),                      # too short: no bigrams
        (5, "  "),                       # empty after trim
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.lm_q) for r in lm_doc_scores(df).collect()}
    assert got == _py_lm_scores(docs)


def test_lm_scores_reference_model_flags_junk(spark):
    from news_please_spark.operators.terms import lm_doc_scores

    # the filtering configuration: model trained on trusted text, junk
    # bigrams are out-of-model and score 0
    ref = [(100, "the cat sat on the mat"), (101, "the dog sat on the hat")]
    docs = [
        (0, "the cat sat on the hat"),   # fluent vs the reference
        (1, "zx qv zx qv zx"),           # junk: every bigram OOV -> 0
    ]
    rdf = spark.createDataFrame(ref, "doc_id long, text string")
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.lm_q)
        for r in lm_doc_scores(ddf, model_docs=rdf).collect()
    }
    assert got == _py_lm_scores(docs, ref)
    assert got[1][1] == 0 and got[0][1] > 0


def test_lm_scores_partition_invariant(spark):
    from news_please_spark.operators.terms import lm_doc_scores

    docs = [(i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5} common tail") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    one = sorted(tuple(r) for r in lm_doc_scores(df.coalesce(1)).collect())
    many = sorted(tuple(r) for r in lm_doc_scores(df.repartition(13)).collect())
    assert one == many


# ---------------------------------------------------------------------------
# BM25 search


def _py_bm25(queries, docs, k=10):
    from collections import Counter

    toked = {
        did: text.strip().lower().split()
        for did, text in docs
        if text.strip()
    }
    tf = {did: Counter(ts) for did, ts in toked.items()}
    df = Counter(t for c in tf.values() for t in c)
    n = len(toked)
    avgdl = sum(len(ts) for ts in toked.values()) // n
    out = {}
    for qid, qtext in queries:
        scores = {}
        for did, c in tf.items():
            s = 0
            for term in dict.fromkeys(qtext.strip().lower().split()):
                if term not in c:
                    continue
                idf = ((2 * (n - df[term]) + 1) * 1_000_000) // (2 * df[term] + 1)
                dl = len(toked[did])
                tfq = (c[term] * 2_200_000_000) // (
                    c[term] * 1_000_000 + 1200 * (250 + (750 * dl) // avgdl)
                )
                s += idf * tfq
            if s:
                scores[did] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rk, (did, s) in enumerate(ranked, 1):
            out[(qid, did)] = (s, rk)
    return out


_BM25_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown cat sleeps"),
    (2, "a slow green turtle crawls under the log"),
    (3, "quick quick quick repetition of quick"),
    (4, "unrelated text about spark clusters and shuffles"),
    (5, "   "),
]


def test_bm25_matches_python_oracle(spark):
    from news_please_spark.operators.terms import bm25_topk

    queries = [(100, "quick brown fox"), (101, "turtle log"), (102, "zzz missing")]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    ddf = spark.createDataFrame(_BM25_DOCS, "doc_id long, text string")
    got = {
        (r.query_id, r.doc_id): (r.score_q, r.rk)
        for r in bm25_topk(qdf, ddf, k=3).collect()
    }
    assert got == _py_bm25(queries, _BM25_DOCS, k=3)
    # the all-OOV query matches nothing
    assert not any(q == 102 for q, _ in got)


def test_bm25_prebuilt_index_path_identical(spark):
    from news_please_spark.operators.terms import bm25_topk, inverted_index

    qdf = spark.createDataFrame([(0, "quick brown")], "query_id long, text string")
    ddf = spark.createDataFrame(_BM25_DOCS, "doc_id long, text string")
    direct = sorted(tuple(r) for r in bm25_topk(qdf, ddf).collect())
    post = inverted_index(ddf)
    via_index = sorted(
        tuple(r) for r in bm25_topk(qdf, ddf, postings=post).collect()
    )
    assert direct == via_index


def test_bm25_rejects_bad_k(spark):
    from news_please_spark.operators.terms import bm25_topk

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    q = spark.createDataFrame([(1, "a")], "query_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(q, df, k=0)


def test_bm25_partition_invariant(spark):
    from news_please_spark.operators.terms import bm25_topk

    docs = [(i, f"w{i % 7} w{(i + 1) % 7} common tail w{i % 3}") for i in range(60)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(0, "w1 common"), (1, "w4 tail")], "query_id long, text string"
    )
    one = sorted(tuple(r) for r in bm25_topk(qdf, ddf.coalesce(1), k=5).collect())
    many = sorted(
        tuple(r) for r in bm25_topk(qdf, ddf.repartition(13), k=5).collect()
    )
    assert one == many


def test_bm25_corpus_never_join_shuffles(spark):
    """Every join in the query path builds on the broadcast tiny side:
    no SortMergeJoin/ShuffledHashJoin anywhere — the corpus's only
    shuffles are the index-build aggregations."""
    from news_please_spark.operators.terms import bm25_topk

    ddf = spark.createDataFrame(_BM25_DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame([(0, "quick fox")], "query_id long, text string")
    plan = bm25_topk(qdf, ddf)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


# ---------------------------------------------------------------------------
# windowed co-occurrence + word2phrase collocation scores


def _py_cooc(docs, window):
    from collections import Counter

    c = Counter()
    for _, text in docs:
        ts = text.strip().lower().split()
        for i, a in enumerate(ts):
            for d in range(1, window + 1):
                if i + d < len(ts):
                    c[(a, ts[i + d])] += 1
    return dict(c)


def test_cooccurrence_counts_matches_python(spark):
    from news_please_spark.operators.terms import cooccurrence_counts

    docs = [(i, f"w{i%3} shared w{(i+1)%3} shared tail{i}") for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for w in (1, 2, 3):
        got = {
            (r.w1, r.w2): r.n_pair
            for r in cooccurrence_counts(df, window=w).collect()
        }
        assert got == _py_cooc(docs, w), w


def test_phrase_scores_promotes_collocation(spark):
    from news_please_spark.operators.terms import phrase_scores

    docs = [(i, f"head{i} new york tail{i} end{i}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = phrase_scores(df, delta=2, min_pair=3).collect()
    scores = {(r.w1, r.w2): r.score_q for r in rows}
    top = max(scores, key=scores.get)
    assert top == ("new", "york")
    # exact integer check against the formula on one pair
    n_tok = sum(len(t.strip().split()) for _, t in docs)
    c_ab = 40
    assert scores[("new", "york")] == (c_ab - 2) * n_tok * 10_000 // (40 * 40)


def test_phrase_scores_clamps_below_discount(spark):
    from news_please_spark.operators.terms import phrase_scores

    # pair seen 3 times with delta=5 -> clamped numerator -> score 0
    docs = [(i, "rare pair") for i in range(3)] + [(9, "x y z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {(r.w1, r.w2): r.score_q
            for r in phrase_scores(df, delta=5, min_pair=3).collect()}
    assert rows[("rare", "pair")] == 0


def test_cooccurrence_rejects_bad_window(spark):
    import pytest as _pytest

    from news_please_spark.operators.terms import cooccurrence_counts

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        cooccurrence_counts(df, window=0)


def test_phrase_search_alignment_and_repeats(spark):
    from news_please_spark.operators.terms import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the quick brown dog"),
            (2, "quick brown quick brown quick"),
            (3, "brown quick nothing here"),
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [(100, "quick brown quick"), (200, "the quick brown")],
        "query_id long, phrase string",
    )
    got = {
        (r.query_id, r.doc_id): (r.n_hits, r.first_pos)
        for r in phrase_search(docs, phrases, n=3).collect()
    }
    # "quick brown quick" occurs in doc2 at anchors 0 and 2 only
    assert got[(100, 2)] == (2, 0)
    # "the quick brown" occurs in doc1 at anchors 0 and 6
    assert got[(200, 1)] == (2, 0)
    assert (100, 1) not in got and (100, 3) not in got and (200, 2) not in got


def test_phrase_search_validates_length(spark):
    import pytest
    from news_please_spark.operators.terms import phrase_search

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    phrases = spark.createDataFrame([(1, "a b")], "query_id long, phrase string")
    with pytest.raises(ValueError):
        phrase_search(docs, phrases, n=3)


def test_rrf_fuse_hand_computed_and_missing_run(spark):
    from news_please_spark.operators.terms import rrf_fuse

    ra = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2), (1, "z", 3)], "query long, item string, rank long"
    )
    rb = spark.createDataFrame(
        [(1, "y", 1), (1, "w", 2)], "query long, item string, rank long"
    )
    got = {
        r.item: (r.rrf_q, r.fused_rank)
        for r in rrf_fuse(ra, rb, k=60, scale=10_000_000).collect()
    }
    s = lambda r: 10_000_000 // (60 + r)  # noqa: E731
    # y appears in both runs and must win
    assert got["y"] == (s(2) + s(1), 1)
    assert got["x"] == (s(1), 2)
    assert got["w"] == (s(2), 3)
    assert got["z"] == (s(3), 4)


def test_rrf_fuse_tie_breaks_on_item_and_validates(spark):
    import pytest

    from news_please_spark.operators.terms import rrf_fuse

    ra = spark.createDataFrame(
        [(1, "b", 1), (1, "a", 1)], "query long, item string, rank long"
    )
    rb = spark.createDataFrame([], "query long, item string, rank long")
    rows = rrf_fuse(ra, rb).orderBy("fused_rank").collect()
    assert [r.item for r in rows] == ["a", "b"]  # equal score: item asc
    with pytest.raises(ValueError):
        rrf_fuse(ra, rb, k=-1)
