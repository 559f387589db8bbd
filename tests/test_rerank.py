"""MMR diversified re-ranking: integer-greedy parity with a pure-Python
reference, diversity behavior (a redundant twin is demoted below a less
relevant but novel candidate), tie-breaks, and the end-to-end
mmr_topk path on deterministic vectors."""

import math

from pyspark.sql import functions as F

from news_please_spark.operators.rerank import (
    candidate_pair_sims,
    mmr_rerank,
    mmr_topk,
)


def _py_mmr(rel, sim, k, lam_num=7, lam_den=10):
    """Reference greedy: rel {doc: rel_q}, sim {(a,b): sim_q} both
    directions. Returns [(doc, rank, mmr_q)]."""
    mu = lam_den - lam_num
    max_sim = {d: None for d in rel}
    remaining = sorted(rel)
    out = []
    for rank in range(1, k + 1):
        if not remaining:
            break
        best, best_score = None, None
        for d in remaining:
            ms = max_sim[d]
            score = lam_num * rel[d] - mu * (ms if ms is not None else 0)
            if best_score is None or score > best_score:
                best, best_score = d, score
        out.append((best, rank, best_score))
        remaining.remove(best)
        for d in remaining:
            s = sim[(d, best)]
            old = max_sim[d]
            max_sim[d] = s if old is None else max(old, s)
    return out


def _tables(spark, rel, sim, qid=1):
    cand = spark.createDataFrame(
        [(qid, d, r) for d, r in rel.items()],
        "query_id long, doc_id long, rel_q long",
    )
    pairs = spark.createDataFrame(
        [(qid, a, b, s) for (a, b), s in sim.items()],
        "query_id long, doc_a long, doc_b long, sim_q long",
    )
    return cand, pairs


def _full_sim(vals):
    """Symmetric sim dict over doc ids from {(a,b): s} upper entries."""
    out = {}
    for (a, b), s in vals.items():
        out[(a, b)] = s
        out[(b, a)] = s
    return out


def test_mmr_demotes_redundant_twin(spark):
    # doc 2 is nearly identical to the top pick 1; doc 3 is less
    # relevant but novel — MMR must pick 1, then 3, then 2.
    rel = {1: 9000, 2: 8900, 3: 6000}
    sim = _full_sim({(1, 2): 9900, (1, 3): 100, (2, 3): 150})
    cand, pairs = _tables(spark, rel, sim)
    got = [
        (r["doc_id"], r["rank"], r["mmr_q"])
        for r in mmr_rerank(cand, pairs, k=3).orderBy("rank").collect()
    ]
    assert [g[0] for g in got] == [1, 3, 2]
    assert got == _py_mmr(rel, sim, k=3)
    # plain relevance order would have been 1, 2, 3
    assert sorted(rel, key=lambda d: -rel[d]) == [1, 2, 3]


def test_mmr_score_tie_breaks_to_smaller_doc_id(spark):
    rel = {5: 7000, 9: 7000, 2: 7000}
    sim = _full_sim({(2, 5): 0, (2, 9): 0, (5, 9): 0})
    cand, pairs = _tables(spark, rel, sim)
    got = [
        r["doc_id"]
        for r in mmr_rerank(cand, pairs, k=3).orderBy("rank").collect()
    ]
    assert got == [2, 5, 9]


def test_mmr_negative_sims_boost_and_k_truncates(spark):
    # negative running max => textbook formula ADDS to the score
    rel = {1: 5000, 2: 4000, 3: 4995}
    sim = _full_sim({(1, 2): -8000, (1, 3): 9000, (2, 3): -100})
    cand, pairs = _tables(spark, rel, sim)
    out = mmr_rerank(cand, pairs, k=2).orderBy("rank").collect()
    assert [(r["doc_id"], r["rank"], r["mmr_q"]) for r in out] == _py_mmr(
        rel, sim, k=2
    )
    # pick 1 (7*5000); then 2 scores 7*4000-3*(-8000)=52000 beats
    # 3's 7*4995-3*9000=7965 despite lower relevance
    assert [r["doc_id"] for r in out] == [1, 2]


def test_mmr_k_beyond_candidates_returns_all(spark):
    rel = {1: 100, 2: 50}
    sim = _full_sim({(1, 2): 10})
    cand, pairs = _tables(spark, rel, sim)
    out = mmr_rerank(cand, pairs, k=10).collect()
    assert {r["rank"] for r in out} == {1, 2}


def test_mmr_multi_query_independence(spark):
    rel_a = {1: 9000, 2: 8900, 3: 6000}
    sim_a = _full_sim({(1, 2): 9900, (1, 3): 100, (2, 3): 150})
    rel_b = {7: 8000, 8: 1000}
    sim_b = _full_sim({(7, 8): 500})
    cand = spark.createDataFrame(
        [(1, d, r) for d, r in rel_a.items()]
        + [(2, d, r) for d, r in rel_b.items()],
        "query_id long, doc_id long, rel_q long",
    )
    pairs = spark.createDataFrame(
        [(1, a, b, s) for (a, b), s in sim_a.items()]
        + [(2, a, b, s) for (a, b), s in sim_b.items()],
        "query_id long, doc_a long, doc_b long, sim_q long",
    )
    out = mmr_rerank(cand, pairs, k=3).collect()
    got = {
        qid: [
            (r["doc_id"], r["rank"], r["mmr_q"])
            for r in sorted(out, key=lambda r: r["rank"])
            if r["query_id"] == qid
        ]
        for qid in (1, 2)
    }
    assert got[1] == _py_mmr(rel_a, sim_a, k=3)
    assert got[2] == _py_mmr(rel_b, sim_b, k=3)


def _vecs(spark, n=30, dim=6):
    rows = []
    for i in range(n):
        v = [0.05 * ((i * 7 + j * 3) % 11 - 5) for j in range(dim)]
        v[i % 3] += 2.0
        rows.append((i, v))
    return (
        rows,
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
    )


def _qcos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return math.floor(10000 * (d / (na * nb)))


def test_mmr_topk_end_to_end_matches_python(spark):
    rows, e = _vecs(spark)
    byid = dict(rows)
    q = e.filter(F.col("vec_id") % 10 == 0)
    n_cand, k = 8, 4
    out = mmr_topk(q, e, n_cand=n_cand, k=k).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["rank"], r["mmr_q"])
        )
    for qid in (0, 10, 20):
        rel_all = sorted(
            (
                (-_qcos(byid[qid], v), d)
                for d, v in byid.items()
                if d != qid
            ),
        )[:n_cand]
        rel = {d: -nr for nr, d in rel_all}
        sim = {
            (a, b): _qcos(byid[a], byid[b])
            for a in rel
            for b in rel
            if a != b
        }
        assert sorted(got[qid], key=lambda t: t[1]) == _py_mmr(
            rel, sim, k=k
        )


def test_candidate_pair_sims_symmetric_and_complete(spark):
    _, e = _vecs(spark, n=12)
    cand = spark.createDataFrame(
        [(0, d, 0) for d in (1, 2, 3)],
        "query_id long, doc_id long, rel_q long",
    )
    ps = candidate_pair_sims(cand, e).collect()
    got = {(r["doc_a"], r["doc_b"]): r["sim_q"] for r in ps}
    assert set(got) == {
        (a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b
    }
    for (a, b), s in got.items():
        assert got[(b, a)] == s
