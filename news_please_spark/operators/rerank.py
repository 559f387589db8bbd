"""Maximal-marginal-relevance (MMR) diversified re-ranking — the
result-diversification stage a retrieval/RAG pipeline runs AFTER the
ANN candidate generator (Carbonell & Goldstein, "The Use of MMR,
Diversity-Based Reranking for Reordering Documents and Producing
Summaries", SIGIR 1998).

Plain top-k by relevance returns near-duplicate neighbors (a web
corpus's candidate lists are full of mirror pages and boilerplate
twins — see operators/dedup.py); MMR greedily picks

    argmax_c  lam*rel(c) - (1-lam)*max_{s in selected} sim(c, s)

so every pick is penalized by its similarity to what was already
picked. All arithmetic here is INTEGER (lam = lam_num/lam_den, scores
scaled by lam_den): rel_q and sim_q arrive pre-quantized
(floor(10^4*cos), the repo-wide convention from operators/similarity),
so the greedy is engine-portable and hash-exact against a DuckDB
recursive-CTE oracle.

Contract (both engines, per query):
  * penalty of an EMPTY selected set is 0 — the first pick is the
    plain relevance argmax;
  * after that the penalty is the true running max (negative sims
    boost, the textbook formula — not clipped at 0);
  * score ties break toward the smaller doc_id;
  * mmr_q emitted for a pick is its score AT SELECTION TIME.

Scale shape: the corpus is touched only by the candidate generator
(brute force here as the exact baseline; swap lsh_topk/ivf_topk —
operators/similarity.py — above memory scale: mmr_rerank itself never
sees the corpus). Candidates per query are bounded by n_cand, so the
pairwise-sim table is |Q|*n_cand^2 rows of narrow integers, the greedy
is a per-query-group loop over <= n_cand rows inside ONE cogrouped
applyInPandas (Arrow-batched, hash-partitioned on query_id, zero
driver state), and nothing corpus-proportional ever broadcasts or
collects. Reference has no analogue (news-please returns extraction
results unranked); this is a beyond-reference retrieval operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from news_please_spark.operators.similarity import as_double, dot, norm_of

_OUT_SCHEMA = "query_id long, doc_id long, rank long, mmr_q long"


def mmr_rerank(
    candidates: DataFrame,
    pair_sims: DataFrame,
    k: int = 10,
    lam_num: int = 7,
    lam_den: int = 10,
) -> DataFrame:
    """Greedy MMR over pre-quantized integer tables.

    candidates: (query_id, doc_id, rel_q) — rel_q BIGINT, already
        quantized (floor(10^4*cos) or any integer relevance).
    pair_sims: (query_id, doc_a, doc_b, sim_q) — BOTH directions of
        every unordered candidate pair of the query (build with
        candidate_pair_sims).
    Returns (query_id, doc_id, rank, mmr_q), rank 1..k per query.
    """
    if not 0 < lam_num <= lam_den:
        raise ValueError("need 0 < lam_num <= lam_den")
    mu = lam_den - lam_num

    def greedy(cand: pd.DataFrame, sims: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(
                columns=["query_id", "doc_id", "rank", "mmr_q"]
            )
        qid = int(cand["query_id"].iloc[0])
        rel = {
            int(d): int(r) for d, r in zip(cand["doc_id"], cand["rel_q"])
        }
        sim = {
            (int(a), int(b)): int(s)
            for a, b, s in zip(
                sims["doc_a"], sims["doc_b"], sims["sim_q"]
            )
        }
        max_sim: dict[int, int | None] = {d: None for d in rel}
        remaining = sorted(rel)
        rows = []
        for rank in range(1, k + 1):
            if not remaining:
                break
            best, best_score = None, None
            for d in remaining:  # ascending doc_id; strict > keeps the
                ms = max_sim[d]  # smallest id on score ties
                score = lam_num * rel[d] - mu * (ms if ms is not None else 0)
                if best_score is None or score > best_score:
                    best, best_score = d, score
            rows.append((qid, best, rank, best_score))
            remaining.remove(best)
            for d in remaining:
                s = sim.get((d, best))
                if s is None:
                    continue
                old = max_sim[d]
                max_sim[d] = s if old is None else max(old, s)
        return pd.DataFrame(
            rows, columns=["query_id", "doc_id", "rank", "mmr_q"]
        )

    # rename the pair table's key: candidates and pair_sims routinely
    # share lineage (pairs are built FROM the candidate table), and a
    # cogroup over two branches of one plan with the same attribute is
    # an ambiguous self-join to the analyzer
    ps = pair_sims.select(
        F.col("query_id").alias("_qp"), "doc_a", "doc_b", "sim_q"
    )
    return (
        candidates.groupBy("query_id")
        .cogroup(ps.groupBy("_qp"))
        .applyInPandas(lambda c, s: greedy(c, s), schema=_OUT_SCHEMA)
    )


def candidate_pair_sims(
    candidates: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantized cosine for every ordered pair of a query's candidates:
    (query_id, doc_a, doc_b, sim_q).  The fold/sqrt/divide order is the
    repo-wide cross-engine-exact form (see ann_cosine_topk): 10^4 *
    (dot / (norm_a * norm_b)), floored.  |Q|*n_cand rows join the
    vector table once (hash join on the id), then self-join on
    query_id — n_cand^2 narrow rows per query, never the corpus."""
    v = vectors.select(
        F.col(id_col).alias("_vid"), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_vn", norm_of(F.col("_v")))
    cv = candidates.select("query_id", "doc_id").join(
        v, F.col("doc_id") == F.col("_vid")
    )
    a = cv.select(
        "query_id",
        F.col("doc_id").alias("doc_a"),
        F.col("_v").alias("_va"),
        F.col("_vn").alias("_na"),
    )
    b = cv.select(
        F.col("query_id").alias("_qb"),
        F.col("doc_id").alias("doc_b"),
        F.col("_v").alias("_vb"),
        F.col("_vn").alias("_nb"),
    )
    return (
        a.join(b, a["query_id"] == b["_qb"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            "query_id",
            "doc_a",
            "doc_b",
            F.floor(
                10000
                * (
                    dot(F.col("_va"), F.col("_vb"))
                    / (F.col("_na") * F.col("_nb"))
                )
            )
            .cast("long")
            .alias("sim_q"),
        )
    )


def mmr_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_cand: int = 25,
    k: int = 10,
    lam_num: int = 7,
    lam_den: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end diversified retrieval: exact quantized top-n_cand
    candidates (broadcast queries x corpus — the small-|Q| baseline;
    at corpus scale feed mmr_rerank from lsh_topk/ivf_topk instead),
    pairwise candidate sims, then the integer MMR greedy."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("_q"),
    ).withColumn("_qn", norm_of(F.col("_q")))
    c = corpus.select(
        F.col(id_col).alias("doc_id"), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_vn", norm_of(F.col("_v")))
    rel = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("doc_id"))
        .select(
            "query_id",
            "doc_id",
            F.floor(
                10000
                * (
                    dot(F.col("_q"), F.col("_v"))
                    / (F.col("_qn") * F.col("_vn"))
                )
            )
            .cast("long")
            .alias("rel_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rel_q"), F.col("doc_id")
    )
    cand = (
        rel.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_cand)
        .select("query_id", "doc_id", "rel_q")
    )
    # two downstream consumers (rerank input + pair generation): one
    # eager cut so the broadcast crossJoin runs once
    cand = cand.localCheckpoint()
    pairs = candidate_pair_sims(cand, corpus, id_col, vec_col)
    return mmr_rerank(cand, pairs, k=k, lam_num=lam_num, lam_den=lam_den)
