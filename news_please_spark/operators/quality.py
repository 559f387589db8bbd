"""Heuristic document-quality rule sets for training-data pipelines.

Two public rule families, both pure per-row Column expressions (array
HOFs over the line/word splits) so they ride the parquet scan with zero
shuffle and stay inside whole-stage codegen at any corpus size — the
same execution contract as the repetition signals in
``operators/repetition.py``:

* ``gopher_quality``    — the Gopher quality-filter rules (Rae et al.
  2021, §A1.1): word-count bounds, mean-word-length bounds,
  symbol-to-word ratio, bullet-line and ellipsis-line fractions,
  alphabetic-word fraction, and the required-stopword rule. Emits the
  raw metrics (integer-quantized to floor(1e4·x) ratios, exactly
  representable cross-engine), one 0/1 flag per rule, and the combined
  ``keep`` decision.
* ``c4_line_filter``    — the C4 cleaning heuristics (Raffel et al.
  2020, §2.2): keep only lines that end in a terminal punctuation mark,
  contain at least five words, and do not mention "javascript"; drop
  the whole page when it contains "lorem ipsum", a curly brace, or
  fewer than three sentences after line filtering. Emits the cleaned
  text plus counters and the page-level ``keep`` decision.

The reference pipeline has no corpus-quality tier (it filters at the
URL/heuristics level — see ``extraction/heuristics.py`` for those); the
two rule sets here are the published-pipeline analogues a 100-TB corpus
build runs immediately after extraction.

Ratio quantization: all fractional metrics are emitted as
``floor(10000 * num / den)`` BIGINTs via integer division so Spark and
any oracle engine agree bit-for-bit (no float formatting drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's required-stopword list (Rae et al. 2021 §A1.1): a document
# must contain at least GOPHER_MIN_STOP_HITS distinct entries.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)
GOPHER_MIN_STOP_HITS = 2

# Gopher thresholds, in the quantized floor(1e4·x) domain.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN_Q = 3 * 10_000
GOPHER_MAX_MEAN_WORD_LEN_Q = 10 * 10_000
GOPHER_MAX_SYMBOL_RATIO_Q = 1_000     # symbols (# or …) per word ≤ 0.1
GOPHER_MAX_BULLET_FRAC_Q = 9_000      # ≤ 90% of lines bullet-started
GOPHER_MAX_ELLIPSIS_FRAC_Q = 3_000    # ≤ 30% of lines ellipsis-ended
GOPHER_MIN_ALPHA_WORD_FRAC_Q = 8_000  # ≥ 80% of words contain a letter

C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def _q(num: Column, den: Column) -> Column:
    """floor(1e4 · num/den) as BIGINT, 0 when the denominator is 0."""
    return F.when(den == 0, F.lit(0)).otherwise(
        F.floor((F.lit(10_000) * num) / den)
    ).cast("long")


def _count_occurrences(text: Column, needle: str) -> Column:
    """Exact count of non-overlapping literal occurrences."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def gopher_metrics(text: Column) -> list[Column]:
    """The raw Gopher §A1.1 metrics as aliased Columns (see module
    docstring for the quantization contract)."""
    words = F.split(F.trim(text), r"\s+")
    lines = F.split(text, "\n")
    n_words = F.size(words).cast("long")
    n_lines = F.size(lines).cast("long")
    char_sum = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_symbols = _count_occurrences(text, "#") + _count_occurrences(text, "...")
    n_bullet = F.size(F.filter(lines, lambda l: l.startswith("- "))).cast("long")
    n_ellipsis = F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("long")
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[a-z]"))
    ).cast("long")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(
                F.transform(words, lambda w: F.regexp_replace(w, "[^a-z]", ""))
            ),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    ).cast("long")
    return [
        n_words.alias("n_words"),
        _q(char_sum, n_words).alias("mean_word_len_q"),
        _q(n_symbols, n_words).alias("symbol_ratio_q"),
        _q(n_bullet, n_lines).alias("bullet_frac_q"),
        _q(n_ellipsis, n_lines).alias("ellipsis_frac_q"),
        _q(n_alpha_words, n_words).alias("alpha_word_frac_q"),
        stop_hits.alias("stop_hits"),
    ]


def _gopher_metric_values(text: str | None):
    """Pure-Python image of gopher_metrics for ONE document — exactly
    the Column semantics: Spark trim strips SPACES only, split keeps
    trailing empties (Java limit=-1), [a-z] is ASCII, literal counts
    are non-overlapping left-to-right, and the _q quantizer divides as
    double then floors. Pinned against the Column form by
    test_quality's golden rows + the oracle gate."""
    import math
    import re

    if text is None:
        return (None,) * 7
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    words = ws.split(text.strip(" "))
    lines = text.split("\n")
    n_words = len(words)
    n_lines = len(lines)
    char_sum = sum(len(w) for w in words)
    n_symbols = text.count("#") + text.count("...")
    n_bullet = sum(1 for l in lines if l.startswith("- "))
    n_ellipsis = sum(1 for l in lines if l.endswith("..."))
    lower = set("abcdefghijklmnopqrstuvwxyz")
    n_alpha = sum(1 for w in words if any(c in lower for c in w))
    stripped = {"".join(c for c in w if c in lower) for w in words}
    stop_hits = len(stripped & set(GOPHER_STOPWORDS))

    def q(num, den):
        return 0 if den == 0 else int(math.floor((10000 * num) / den))

    return (
        n_words,
        q(char_sum, n_words),
        q(n_symbols, n_words),
        q(n_bullet, n_lines),
        q(n_ellipsis, n_lines),
        q(n_alpha, n_words),
        stop_hits,
    )


_GOPHER_METRIC_NAMES = (
    "n_words", "mean_word_len_q", "symbol_ratio_q", "bullet_frac_q",
    "ellipsis_frac_q", "alpha_word_frac_q", "stop_hits",
)


def gopher_quality(df: DataFrame, text: Column | None = None) -> DataFrame:
    """Append the Gopher metrics, one 0/1 flag per rule, and the
    combined ``keep`` decision. Zero-shuffle: the seven metrics compute
    in ONE mapInPandas pass per row (the Column form paid interpreted
    per-element HOF lambdas for four token/line-array passes per doc;
    a whole-string regex rewrite was also tried and REJECTED — Java
    backtracking on the letters-only-image patterns was slower than
    the HOFs; see OPTIMIZATION_r06.md). Flags/keep stay native
    expressions over the metric columns."""
    from pyspark.sql.types import LongType, StructField, StructType

    t = text if text is not None else F.col("text")
    base = df.withColumn("_gq_text", t)
    out_schema = StructType(
        list(base.schema.fields)
        + [StructField(n, LongType()) for n in _GOPHER_METRIC_NAMES]
    )

    def gen(batches):
        for pdf in batches:
            vals = [_gopher_metric_values(x) for x in pdf["_gq_text"]]
            cols = list(zip(*vals)) if vals else [[]] * 7
            out = pdf.copy()
            for name, col in zip(_GOPHER_METRIC_NAMES, cols):
                out[name] = list(col)
            yield out

    out = base.mapInPandas(gen, out_schema).drop("_gq_text")
    flags = {
        "r_word_count": (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS),
        "r_mean_word_len": (F.col("mean_word_len_q") >= GOPHER_MIN_MEAN_WORD_LEN_Q)
        & (F.col("mean_word_len_q") <= GOPHER_MAX_MEAN_WORD_LEN_Q),
        "r_symbol_ratio": F.col("symbol_ratio_q") <= GOPHER_MAX_SYMBOL_RATIO_Q,
        "r_bullet": F.col("bullet_frac_q") <= GOPHER_MAX_BULLET_FRAC_Q,
        "r_ellipsis": F.col("ellipsis_frac_q") <= GOPHER_MAX_ELLIPSIS_FRAC_Q,
        "r_alpha_words": F.col("alpha_word_frac_q")
        >= GOPHER_MIN_ALPHA_WORD_FRAC_Q,
        "r_stopwords": F.col("stop_hits") >= GOPHER_MIN_STOP_HITS,
    }
    for name, cond in flags.items():
        out = out.withColumn(name, cond.cast("long"))
    keep = None
    for name in flags:
        keep = F.col(name) if keep is None else keep * F.col(name)
    return out.withColumn("keep", keep.cast("long"))


def c4_line_filter(df: DataFrame, text: Column | None = None) -> DataFrame:
    """Append C4-cleaned text + counters + the page ``keep`` decision.

    Line rules (each line must pass all): ends in terminal punctuation
    ([.!?]), has ≥ C4_MIN_LINE_WORDS space-separated words, does not
    contain "javascript". Page rules: ≥ C4_MIN_SENTENCES sentence
    terminators in the cleaned text, no "lorem ipsum", no '{'.
    Zero-shuffle per-row expressions throughout.
    """
    t = text if text is not None else F.col("text")
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike("[.!?]$")
        & (F.size(F.split(l, " ")) >= C4_MIN_LINE_WORDS)
        & ~l.contains("javascript"),
    )
    clean = F.array_join(kept, "\n")
    n_sentences = (
        F.length(clean) - F.length(F.regexp_replace(clean, "[.!?]", ""))
    ).cast("long")
    keep = (
        (n_sentences >= C4_MIN_SENTENCES)
        & ~t.contains("lorem ipsum")
        & ~t.contains("{")
    )
    return df.select(
        "*",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        F.md5(clean).alias("clean_md5"),
        keep.cast("long").alias("keep"),
    )


def ccnet_buckets(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet's head/middle/tail perplexity bucketing (Wenzek et al.
    2020 §4.3): score every document with the bigram-LM quality
    surrogate (`operators/terms.lm_doc_scores` — higher = more fluent,
    the integer image of lower perplexity), then split each language
    into terciles by PER-LANGUAGE score thresholds — CCNet's insight is
    that perplexity distributions differ per language, so a global
    cutoff over- or under-filters low-resource languages.

        bucket = head    if score >  p66(lang)
                 middle  if score >  p33(lang)
                 tail    otherwise

    Thresholds are the exact discrete per-group percentiles
    (`operators/stats.group_quantiles` — histogram-rank plan, no
    per-group sort), so the bucketing is bit-reproducible cross-engine.
    Train the LM on ``model_docs`` (CCNet uses Wikipedia) or corpus-self
    when omitted.

    Scale shape: scoring is the lm_doc_scores plan (bigram-key
    equi-joins only); the threshold table is ONE row per language —
    config-sized — and is explicitly broadcast back onto the corpus.
    Returns (id, group, score, bucket).  Self-trained, every bigram is
    in-model, so all >=2-token docs are scored; with an explicit
    ``model_docs`` out-of-model bigrams score 0 (junk sinks to tail).
    Sub-2-token docs are unscorable and excluded, as in CCNet, where
    unscorable lines never reach a bucket."""
    from news_please_spark.operators.stats import group_quantiles
    from news_please_spark.operators.terms import lm_doc_scores

    scores = lm_doc_scores(
        docs.select(F.col(id_col), F.col(text_col)),
        model_docs,
        id_col=id_col,
        text_col=text_col,
    ).select(id_col, F.col("lm_q").alias("score"))
    scored = scores.join(
        docs.select(F.col(id_col), F.col(group_col)), on=id_col, how="inner"
    )
    # two consumers (threshold derivation + the bucket join) would
    # otherwise each re-evaluate the whole bigram-model subtree — lazy
    # persist, so the cost lands once, inside the first action
    scored = scored.persist()
    th = group_quantiles(scored, group_col, "score", [33, 66]).select(
        group_col, "p33", "p66"
    )
    return scored.join(F.broadcast(th), on=group_col, how="inner").select(
        F.col(id_col),
        F.col(group_col),
        F.col("score"),
        F.when(F.col("score") > F.col("p66"), F.lit("head"))
        .when(F.col("score") > F.col("p33"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def rank_calibrate(
    df: DataFrame,
    group_col: str = "source",
    score_col: str = "score",
    out: str = "pct_bp",
) -> DataFrame:
    """Per-group rank normalization of a quality score — the
    calibration step that makes one threshold mean the same thing
    across sources whose raw score DISTRIBUTIONS differ (a classifier
    scores Wikipedia systematically higher than forums; "keep top 30%"
    must mean top 30% OF EACH source, or the mixture silently tilts).

    pct_bp = 10⁴ · (#rows in the group with a strictly smaller score)
    DIV group size — integer basis points, ties share a value, exact
    cross-engine. This is the empirical-CDF transform; filtering
    pct_bp ≥ 7000 afterwards is exactly quality_topfrac's "top 30%"
    with a reusable calibrated column instead of a one-shot filter.

    Plan shape (the group_quantiles/topfrac histogram trick): ONE
    map-side-combinable (group, score) count — the only data-sized
    shuffle; both windows run over the HISTOGRAM (bounded by distinct
    scores, not rows); the data rejoins the histogram on
    (group, score), AQE-routed. Never a per-row window."""
    from pyspark.sql import Window

    h = df.groupBy(group_col, score_col).agg(F.count(F.lit(1)).alias("_c"))
    w_ord = Window.partitionBy(group_col).orderBy(score_col)
    w_all = Window.partitionBy(group_col)
    cum = h.select(
        group_col,
        score_col,
        (F.sum("_c").over(w_ord) - F.col("_c")).alias("_below"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    return (
        df.join(cum, [group_col, score_col])
        .withColumn(out, F.expr("_below * 10000 DIV _n"))
        .drop("_below", "_n")
    )
