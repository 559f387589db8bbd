"""clean_corpus — the end-to-end corpus-hygiene pipeline.

The reference stops at extraction (NewsArticle rows); a training-data
corpus builder then runs hygiene over that table. This module chains
the engine's operators into the standard sequence, entirely as
DataFrame composition (one lazy plan per stage, no driver-side loops):

  1. exact dedup        — one survivor per byte-identical text
                          (min-id representative, deterministic);
  2. near-dup removal   — MinHash-LSH candidates verified with exact
                          n-gram Jaccard; for every verified pair the
                          HIGHER id drops (greedy min-id keep; chains
                          collapse toward their smallest member but a
                          doc similar only to a dropped doc survives —
                          the standard one-pass tradeoff, documented);
  3. decontamination    — drop docs sharing any 8-gram with the
                          benchmark set (GPT-3/PaLM-style; if the
                          benchmark texts themselves are in the corpus
                          they self-hit and drop, which is the correct
                          outcome for eval leakage);
  4. quality gate       — Gopher-style repetition rule: drop docs
                          whose top bigram fills >= top_bigram_q_max
                          of bigram slots (boilerplate/spam shape).

Removal joins are STATISTICS-ROUTED, not force-broadcast: web corpora
commonly carry 30-50% near-duplicates, so at design scale the near-dup
drop set is billions of ids — a forced broadcast is a driver OOM. With
materialize_stages=True (the production shape) the drop set is
checkpointed and its measured row count routes the anti-join
(broadcast under the threshold, shuffle_hash above — the same
engine-held-statistics routing the frontier uses for its seen set);
in the pure-lazy mode the join is left unhinted so AQE routes it from
the measured shuffle size at runtime. The corpus is never shuffled by
content in the removal steps; only the candidate/verify machinery
shuffles, and only on fixed-width keys (see operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_please_spark.operators.decontam import contamination
from news_please_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates_from_grams,
    ngram_jaccard_pairs,
    ngram_set_rows,
)
from news_please_spark.operators.repetition import ngrams, run_stats

# drop sets under this many id rows broadcast (cheap local hash
# relation); above it the anti-join takes the scale-safe shuffle_hash
# path where each task builds only its own drop partition
BROADCAST_DROP_ROWS = 1_000_000


def _anti_drop(
    kept: DataFrame, drops: DataFrame, id_col: str, materialized: bool
) -> DataFrame:
    """left_anti removal with statistics-routed join strategy (see
    module docstring)."""
    if materialized:
        drops = drops.localCheckpoint(eager=True)
        side = (
            F.broadcast(drops)
            if drops.count() <= BROADCAST_DROP_ROWS
            else drops.hint("shuffle_hash")
        )
        return kept.join(side, id_col, "left_anti")
    # lazy mode: no engine-held statistic exists yet — leave the join
    # unhinted and let AQE pick from the measured shuffle size
    return kept.join(drops, id_col, "left_anti")


def _clean_stages(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    top_bigram_q_max: int = 2000,
    decontam_n: int = 8,
    materialize_stages: bool = False,
    transitive_near_dup: bool = False,
    cut_all: bool = False,
) -> list[tuple[str, DataFrame]]:
    """The hygiene stages as an ordered list of (stage_name, survivor
    DataFrame) — the single implementation behind clean_corpus (which
    returns the last survivor set) and clean_corpus_audit (which labels
    every input doc with the first stage that dropped it). See
    clean_corpus's docstring for stage semantics and ordering.

    cut_all=True (with materialize_stages) also checkpoints the
    decontam and final-stage frames — pointless when each is consumed
    once (clean_corpus), necessary when every stage feeds TWO
    consumers (the audit's ledger join plus the next stage), where the
    lazy decontam/gopher branches would otherwise evaluate twice.

    materialize_stages=True cuts the plan after the near-dup and
    decontamination stages (localCheckpoint): each stage's survivor set
    is consumed by SEVERAL downstream branches (the LSH index build,
    the Jaccard verify's two sides, the contamination explode), and
    without a cut every branch re-derives the whole upstream pipeline.
    That is what a production hygiene run does between stages anyway
    (materialize to a table); the default stays pure-lazy for
    composability into a larger plan.

    transitive_near_dup=True replaces stage 2's greedy pairwise drop
    (doc drops iff ANY verified smaller-id neighbor — a doc similar
    only to a dropped doc survives) with true cluster semantics: the
    verified-pair graph's connected components keep exactly their
    min-id member (operators/graph.py).  The two rules differ on
    chains like 2—5—1: greedy keeps 2 (its only neighbor 5 is larger),
    transitive drops it (component min is 1).  Greedy stays the
    default — it is one set-algebra pass (and the oracle-checked
    shape); transitive costs O(cluster diameter) extra join rounds."""

    def _cut(d: DataFrame) -> DataFrame:
        return d.localCheckpoint(eager=True) if materialize_stages else d

    stages: list[tuple[str, DataFrame]] = []

    # 1. exact dedup (min id per content hash); cut BEFORE the LSH
    # index + verify consume it from three branches
    kept = _cut(exact_dedup(df, text_col, id_col))
    stages.append(("exact", kept))

    # 2. near-dup: LSH candidates -> exact Jaccard -> drop doc_b.
    # The corpus is shingled ONCE: a lazily-persisted (id, gram-set)
    # table feeds both the LSH index build and the verify joins —
    # tokenization is the dominant map-side cost at corpus scale, and
    # the split plan paid it twice (same fix jaccard_verify carries).
    grams = (
        ngram_set_rows(kept, id_col=id_col, text_col=text_col)
        .filter(F.size("_g") > 0)
        .persist()
    )
    cand = minhash_lsh_candidates_from_grams(grams, id_col=id_col, gram_col="_g")
    pairs = ngram_jaccard_pairs(
        kept, cand, text_col, id_col, threshold=jaccard_threshold, grams_df=grams
    )
    if transitive_near_dup:
        # cluster semantics: every component keeps only its min id
        from news_please_spark.operators.graph import connected_components

        labels = connected_components(pairs.select("doc_a", "doc_b"))
        dups = labels.filter(F.col("id") != F.col("root")).select(
            F.col("id").alias(id_col)
        )
    else:
        dups = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    kept = _cut(_anti_drop(kept, dups, id_col, materialize_stages))
    stages.append(("near_dup", kept))

    # 3. decontamination vs the benchmark set — routed the same way for
    # uniformity (hits are usually a sliver, so this routes to the
    # broadcast branch, but an eval-set leak of a popular template can
    # blow the hit set up too)
    if benchmark is not None:
        hits = contamination(kept, benchmark, text_col, id_col, n=decontam_n)
        kept = _anti_drop(
            kept, hits.select(id_col), id_col, materialize_stages
        )
        if cut_all:
            kept = _cut(kept)
        stages.append(("decontam", kept))

    # 4. Gopher-style repetition gate (staged so the gram array builds
    # once per row; run_stats' lambda touches only (acc, x))
    g2 = ngrams(F.col(text_col), 2)
    scored = kept.withColumn("_g2", g2).withColumn(
        "_top_q",
        F.when(F.size("_g2") == 0, F.lit(0)).otherwise(
            F.floor(10000.0 * run_stats(F.col("_g2"))["best"] / F.size("_g2"))
        ),
    )
    final = scored.filter(F.col("_top_q") < top_bigram_q_max).drop("_g2", "_top_q")
    if cut_all:
        final = _cut(final)
    stages.append(("repetition", final))
    return stages


def clean_corpus(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    top_bigram_q_max: int = 2000,
    decontam_n: int = 8,
    materialize_stages: bool = False,
    transitive_near_dup: bool = False,
) -> DataFrame:
    """Returns the surviving rows of `df` (same schema): exact dedup ->
    near-dup removal -> decontamination -> repetition gate. See the
    module docstring for stage semantics and join routing;
    _clean_stages holds the single stage implementation."""
    return _clean_stages(
        df,
        benchmark,
        text_col,
        id_col,
        jaccard_threshold,
        top_bigram_q_max,
        decontam_n,
        materialize_stages,
        transitive_near_dup,
    )[-1][1]


# the ledger verdict each stage's drop carries (first drop wins)
_VERDICT_OF_STAGE = {
    "exact": "exact_dup",
    "near_dup": "near_dup",
    "decontam": "contaminated",
    "repetition": "repetitive",
}


def clean_corpus_audit(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    top_bigram_q_max: int = 2000,
    decontam_n: int = 8,
    materialize_stages: bool = False,
    transitive_near_dup: bool = False,
) -> DataFrame:
    """Per-document drop-reason ledger for the hygiene pipeline: one
    row per INPUT doc with `verdict` = the first stage that dropped it
    ('exact_dup' | 'near_dup' | 'contaminated' | 'repetitive') or
    'kept'. The observability table a production hygiene run writes
    next to the cleaned corpus — corpus-loss attribution, per-source
    drop-rate dashboards, and "why did my doc disappear" lookups all
    read it.

    Built on the SAME _clean_stages plan clean_corpus consumes, so the
    ledger can never drift from the pipeline's actual decisions (a
    pytest pins audit['kept'] == clean_corpus output ids). Scale shape:
    one left join per stage, every join on the fixed-width id key with
    survivor sets shrinking monotonically — the corpus text never
    re-shuffles for the ledger."""
    stages = _clean_stages(
        df,
        benchmark,
        text_col,
        id_col,
        jaccard_threshold,
        top_bigram_q_max,
        decontam_n,
        materialize_stages,
        transitive_near_dup,
        cut_all=True,
    )
    lab = df.select(F.col(id_col))
    flags: list[tuple[str, str]] = []
    for name, surv in stages:
        flag = f"_in_{name}"
        lab = lab.join(
            surv.select(F.col(id_col), F.lit(1).alias(flag)), id_col, "left"
        )
        flags.append((name, flag))
    verdict = F.when(
        F.col(flags[0][1]).isNull(), F.lit(_VERDICT_OF_STAGE[flags[0][0]])
    )
    for name, flag in flags[1:]:
        verdict = verdict.when(F.col(flag).isNull(), F.lit(_VERDICT_OF_STAGE[name]))
    verdict = verdict.otherwise(F.lit("kept"))
    return lab.select(F.col(id_col), verdict.alias("verdict"))


def corpus_report(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus health report — the one table a pipeline
    operator reads every morning: volume (docs, tokens), exact-dup
    rate in basis points, average quality signals, dominant language.

    Scale shape: ONE doc-level aggregation by source (count / token
    sum / distinct normalized fingerprints — all map-side combinable
    or hash-agg), plus one tiny (source, lang) count for the dominant
    language (deterministic tie-break: count DESC, lang ASC).  Joins
    are per-source grain — thousands of rows, never corpus-sized.
    Quality columns reuse the oracle-gated quantized signals
    (functions/text.quality_struct), so the report's numbers are the
    SAME integers the quality_topfrac/gopher tiers filter on."""
    from pyspark.sql import Window
    from news_please_spark.functions.text import fingerprint, quality_struct

    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        fingerprint(F.col(text_col)).alias("_fp"),
        quality_struct(F.col(text_col)).alias("_q"),
    )
    stats = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_q.n_tokens").cast("long").alias("total_tokens"),
        F.countDistinct("_fp").cast("long").alias("n_uniq"),
        F.sum("_q.alpha_q").cast("long").alias("_alpha_sum"),
        F.sum("_q.stop_q").cast("long").alias("_stop_sum"),
    )
    lang_rk = Window.partitionBy("source").orderBy(
        F.desc("n_lang"), F.asc("lang")
    )
    top_lang = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_lang"))
        .withColumn("_rk", F.row_number().over(lang_rk))
        .filter(F.col("_rk") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return stats.join(top_lang, "source").select(
        "source",
        "n_docs",
        "total_tokens",
        "n_uniq",
        F.expr("((n_docs - n_uniq) * 10000) DIV n_docs").alias("dup_bp"),
        F.expr("_alpha_sum DIV n_docs").alias("avg_alpha_q"),
        F.expr("_stop_sum DIV n_docs").alias("avg_stop_q"),
        "top_lang",
    )
