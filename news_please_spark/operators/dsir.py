"""DSIR — Data Selection with Importance Resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023) in the repo's integer-exact surrogate form.

DSIR picks pretraining documents that look like a small trusted target
corpus: fit bag-of-hashed-n-gram (unigram + bigram) models p (target)
and q (raw), score every raw document by its likelihood ratio under
the two models, and resample proportionally to the weight.  The weight
is a LINEAR score over hashed features — exactly the shape the
hashed-linear classifier (functions/text.py) already scans with — so
the whole method distributes as:

  fit:    ONE pass over target ∪ raw → per-(side, bucket) counts.
          Only (2 · buckets) keys ever cross the shuffle (map-side
          combinable); the model collects to the driver at config size
          (buckets ints), the temperature_thresholds grain.
  score:  ZERO-shuffle scan — per-bucket quantized ratios ride the
          plan as ONE constant-folded literal array; each document
          folds its features through `element_at` (O(1) per feature
          against a Literal, not a per-element re-derivation — the
          interpreted-HOF trap repetition.py documents).
  select: top ⌈frac_pct%⌉ by weight via the skew-safe histogram
          ranking of sampling.topfrac_per_group (only the one boundary
          score cell ever ranks rows).

Integer surrogate (the lm_score/bm25 convention — cross-engine
bit-exactness instead of float logs): smoothed bucket probabilities
are quantized to PROB_SCALE,

  pt_b = (PROB_SCALE · (t_b + 1)) // (T + B)
  pq_b = (PROB_SCALE · (q_b + 1)) // (Q + B)

and the per-bucket importance weight is the quantized ratio
llr_b = (pt_b · RATIO_SCALE) // pq_b.  A document's score is the SUM
of llr over its feature occurrences — the same monotone bag-of-
features linear form as the paper's Σ c_b·log(p_b/q_b), with the
quantized ratio standing in for the log ratio (documented surrogate,
not an approximation claim).  Every scored feature occurs in the raw
corpus, so pq_b ≥ PROB_SCALE·2/(Q+B) and the products stay far inside
int64 for any corpus DuckDB can hold; at design scale the same plan
runs with DECIMAL(38) ratios.

Reference semantics source: Xie et al. 2023 §2 (hashed n-gram
importance weights); no news-please analogue (beyond-reference tier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from news_please_spark.functions.text import hashed_bucket
from news_please_spark.operators.sampling import topfrac_per_group

DSIR_BUCKETS = 512
PROB_SCALE = 1_000_000_000
RATIO_SCALE = 1_000_000


def feature_array(text_col: Column) -> Column:
    """Unigram + bigram feature strings of a document: tokens under the
    corpus convention (trim + lower + split \\s+) followed by the
    adjacent pairs joined with one space.  Pure Column — evaluated
    inside the scan stage."""
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    return F.concat(
        toks,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> list[int]:
    """Fit the importance model: one job over target ∪ raw yielding the
    per-bucket quantized probability ratios ``llr[bucket]``.

    The union is tagged, exploded to hashed buckets, and aggregated by
    (side, bucket) — ≤ 2·buckets rows reach the driver regardless of
    corpus size.  Ratios are computed in exact Python integers (``//``
    matches DuckDB's BIGINT division on non-negatives)."""
    tagged = target.select(
        F.lit(1).alias("_t"), F.col(text_col).alias("_x")
    ).unionByName(
        raw.select(F.lit(0).alias("_t"), F.col(text_col).alias("_x"))
    )
    counts = (
        tagged.filter(F.trim(F.col("_x")) != "")
        .select("_t", F.explode(feature_array(F.col("_x"))).alias("_f"))
        .select("_t", hashed_bucket(F.col("_f"), buckets).alias("_b"))
        .groupBy("_t", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    t_cnt = [0] * buckets
    q_cnt = [0] * buckets
    for r in counts:
        (t_cnt if r._t == 1 else q_cnt)[r._b] = r._c
    t_tot, q_tot = sum(t_cnt), sum(q_cnt)
    llr = []
    for b in range(buckets):
        pt = (PROB_SCALE * (t_cnt[b] + 1)) // (t_tot + buckets)
        pq = (PROB_SCALE * (q_cnt[b] + 1)) // (q_tot + buckets)
        llr.append((pt * RATIO_SCALE) // pq)
    return llr


def dsir_score(
    docs: DataFrame,
    llr: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, n_feats, dsir_q): importance weight per document as ONE
    zero-shuffle fold — the llr table is a constant-folded literal
    array (config-sized), each feature contributes
    ``llr[hash(feature)]`` via O(1) ``element_at``.  Documents with
    blank text are excluded (no features → no model evidence)."""
    if len(llr) != buckets:
        raise ValueError(
            f"llr has {len(llr)} entries, expected buckets={buckets}"
        )
    arr = F.array(*[F.lit(int(v)).cast("long") for v in llr])
    feats = docs.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), feature_array(F.col(text_col)).alias("_feats")
    )
    score = F.aggregate(
        F.col("_feats"),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(arr, (hashed_bucket(t, buckets) + 1).cast("int")),
    )
    return feats.select(
        F.col(id_col),
        F.size("_feats").cast("long").alias("n_feats"),
        score.alias("dsir_q"),
    )


def dsir_select(
    target: DataFrame,
    raw: DataFrame,
    frac_pct: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Fit on (target, raw), score raw, and flag the global top
    ⌈frac_pct% · n⌉ documents by (dsir_q DESC, id ASC) — equal to
    ``row_number() OVER (ORDER BY dsir_q DESC, id) <= k`` but computed
    through the skew-safe histogram ranking (no global data sort; only
    the one boundary score cell ranks its rows).  Returns
    (id, n_feats, dsir_q, selected)."""
    llr = dsir_fit(target, raw, text_col=text_col, buckets=buckets)
    w = dsir_score(
        raw, llr, id_col=id_col, text_col=text_col, buckets=buckets
    )
    # "_grp": topfrac_per_group aliases its histogram's group column to
    # "_g", so the caller-side constant group must not reuse that name
    picked = topfrac_per_group(
        w.withColumn("_grp", F.lit(0)), "_grp", "dsir_q", frac_pct, id_col
    ).select(F.col(id_col), F.lit(1).alias("selected"))
    return (
        w.join(picked, id_col, "left")
        .withColumn(
            "selected", F.coalesce(F.col("selected"), F.lit(0)).cast("int")
        )
        .select(id_col, "n_feats", "dsir_q", "selected")
    )
