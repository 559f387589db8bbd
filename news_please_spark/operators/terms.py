"""Corpus term statistics: TF-IDF-style salient-term extraction.

The classic corpus-analytics query over a crawl's document table:
which terms characterize each document against the whole corpus?
Plan shape is the scalable one — explode to (doc, term) counts
(map-side combinable), one aggregate to the document-frequency table,
one equi-join on term (AQE-routed; the df table is |vocab| rows, far
smaller than the corpus), then a per-doc top-k window (bounded by the
doc's own vocabulary, never a skew bomb).

Scoring uses the RATIONAL idf surrogate ``tf * N / df`` quantized by
integer arithmetic (``(tf * N * 10000) DIV df``) rather than
``tf * ln(N/df)``: transcendental functions round differently across
engines (JVM Math.log vs libm), which would make a floor-quantized
score a knife-edge in the cross-engine oracle gate.  The ranking it
induces is the same family (monotone in tf and 1/df); swap in
``F.log`` for production scoring where bit-exactness across engines
is not a contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` salient terms per document by the rational TF-IDF
    score above; ties break toward the lexicographically smaller term.
    Tokenization is the corpus convention (trim + lower + split \\s+).
    Output: (id, term, score_q, rk)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs)).select(
        F.col(id_col),
        "term",
        F.expr("(tf * n * 10000) DIV df").alias("score_q"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score_q"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "score_q", F.col("rk").cast("long").alias("rk"))
    )


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, corpus
    tokenization (trim + lower + split \\s+).  Derived with an array
    transform over 1-based element_at, so pair extraction is a
    zero-shuffle scan stage; docs with < 2 tokens yield no rows."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )
    return (
        docs.filter(F.trim(F.col(text_col)) != "")
        .filter(F.size(toks) >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("_p"))
        .select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


def lm_doc_scores(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020
    filter corpora by LM perplexity; reference has no analogue — this
    is the training-data tier): train a bigram model on `model_docs`
    (a trusted reference corpus — THE filtering configuration: junk
    bigrams are out-of-model and score 0) or, when omitted, on `docs`
    itself (corpus-self statistics; note a self-trained
    mean-probability REWARDS repetitive docs whose transitions are
    deterministic — pair it with the repetition signals, don't use it
    alone as a junk gate).

    Integer-exact scoring for the cross-engine oracle gate:
    p(w2|w1) is surrogate ``(c(w1,w2) * 10^6) DIV c1(w1)`` where c1
    counts w1 as a bigram PREFIX (so probabilities over successors of
    a fixed w1 sum to ~1), and the doc score is the integer mean of
    its per-occurrence surrogates.  Production would sum logs; the
    mean-probability form keeps every step BIGINT while inducing the
    same junk-vs-fluent separation.

    Plan: one explode to bigram occurrences, one map-side-combinable
    count per distinct bigram (the "training" pass), prefix counts by
    a second aggregation OF THE BIGRAM TABLE (|bigram vocab| rows, not
    the corpus), then one equi-join of doc occurrences against the
    |vocab|-sized model table and a per-doc mean.  Every join is an
    equi-join on the bigram key — hash-partitionable at any corpus
    size; no broadcast of anything corpus-proportional.

    Output: (id, n_bigrams, lm_q)."""
    bg = doc_bigrams(docs, id_col, text_col)
    mbg = (
        bg
        if model_docs is None
        else doc_bigrams(model_docs, id_col, text_col)
    )
    # model: bigram counts + prefix counts (derived from the bigram
    # table, so both "passes" share one shuffle of md5-sized keys)
    c2 = mbg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("_c2")
    )
    c1 = c2.groupBy("w1").agg(F.sum("_c2").cast("long").alias("_c1"))
    model = c2.join(c1, "w1").select(
        "w1", "w2",
        F.expr("_c2 * 1000000 div _c1").cast("long").alias("_pq"),
    )
    # LEFT join: an out-of-model bigram is evidence of junk and must
    # drag the mean down as p=0, not silently vanish from it
    return (
        bg.join(model, ["w1", "w2"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("sum(coalesce(_pq, 0)) div count(1)")
            .cast("long")
            .alias("lm_q"),
        )
    )
