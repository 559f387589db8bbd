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
