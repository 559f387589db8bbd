"""Text-analysis scalar functions for training-data pipelines (task
brief: language-ID, quality scoring, token counting, fingerprinting) —
all native Column expressions, shared by the query registry and the
extraction pipeline. Quantized variants (floor(x*10^4) as long) exist so
cross-engine comparisons are exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOP = ("the", "a", "of", "and")
STOPWORDS = {
    "en": EN_STOP,
    "de": ("der", "die", "und"),
    "es": ("el", "los", "y"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the baseline counter)."""
    return F.split(F.trim(text), r"\s+")


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish sub-word count: words + digit runs + punctuation marks
    split out (a regex approximation of what a trained tokenizer would
    emit — useful as a corpus-size proxy)."""
    return F.regexp_extract_all(
        F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_ratio_q(text: Column, stop: tuple[str, ...] = EN_STOP) -> Column:
    t = tokens(text)
    return F.floor(
        10000.0 * F.size(F.filter(t, lambda x: x.isin(*stop))) / F.size(t)
    ).cast("long")


def alpha_ratio_q(text: Column) -> Column:
    return F.floor(
        10000.0 * F.length(F.regexp_replace(text, "[^a-z]", "")) / F.length(text)
    ).cast("long")


def quality_struct(text: Column) -> Column:
    """Quality-scoring bundle: token/char counts + ratios."""
    t = tokens(text)
    return F.struct(
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_uniq"),
        F.length(text).cast("long").alias("n_chars"),
        alpha_ratio_q(text).alias("alpha_q"),
        stopword_ratio_q(text).alias("stop_q"),
    )


def lang_scores(text: Column) -> dict[str, Column]:
    t = tokens(text)

    def _counter(words):  # real closure: a default arg would read as the
        return lambda x: x.isin(*words)  # HOF's (element, index) form

    return {
        lang: F.size(F.filter(t, _counter(words)))
        for lang, words in STOPWORDS.items()
    }


def predict_lang(text: Column) -> Column:
    """Stopword-vote language id ('und' when nothing matches) —
    the table-level primitive behind extraction's E4 fallback."""
    s = lang_scores(text)
    return (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] > 0), F.lit("en")
        )
        .when((s["de"] >= s["es"]) & (s["de"] > 0), F.lit("de"))
        .when(s["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )


def fingerprint(text: Column) -> Column:
    """Normalized-content identity: md5 of lowercased,
    whitespace-collapsed text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def rolling_fingerprints_of(
    t: Column, window_tokens: int = 32, stride: int = 16
) -> Column:
    """Windowed fingerprints over an ALREADY-MATERIALIZED token array
    column. The window slice necessarily references `t` inside the
    transform lambda (the offset is per-element), so `t` must be a
    column attribute — passing a raw split(...) expression here would
    re-tokenize the whole text once per window in interpreted eval
    (O(L^2/stride) per row). `t` is referenced twice (window count +
    slice), which also keeps CollapseProject from re-inlining a
    projected token column into this expression."""
    n_win = F.greatest(
        F.ceil((F.size(t) - window_tokens) / stride) + 1, F.lit(1)
    ).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.md5(
            F.array_join(F.slice(t, i * stride + 1, window_tokens), " ")
        ),
    )


def rolling_fingerprints(text: Column, window_tokens: int = 32, stride: int = 16) -> Column:
    """Windowed fingerprints (rolling-hash style): md5 per token window —
    the building block for partial-overlap / containment detection.
    Convenience form for small texts; for per-row-heavy plans, project
    tokens(text) to a column first and use rolling_fingerprints_of."""
    return rolling_fingerprints_of(tokens(text), window_tokens, stride)
