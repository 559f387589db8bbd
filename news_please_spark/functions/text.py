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


# ---------------------------------------------------------------------------
# Hashed-linear quality classifier (fastText-style inference as a scan)

HASHED_LM_BUCKETS = 512
_HASH_MULT = 2654435761  # Knuth's multiplicative constant
_W_MOD = 2003  # prime > 2*buckets so bucket->weight is injective at 512


def hashed_bucket(token: Column, buckets: int = HASHED_LM_BUCKETS) -> Column:
    """Engine-portable feature hashing: first 8 hex chars of md5 as an
    unsigned 32-bit int, mod the bucket count.  (DuckDB image:
    ('0x' || substr(md5(t),1,8))::BIGINT % buckets.)"""
    return (
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long") % buckets
    )


def bucket_weight(bucket: Column) -> Column:
    """Deterministic integer weight in [-1001, 1001] derived from the
    bucket id — the stand-in for a trained weight vector.  A REAL model's
    weights would ride as a broadcast `F.create_map` literal over the same
    bucket expression (config-sized: `buckets` ints), keeping the exact
    same zero-shuffle plan; deriving them arithmetically here keeps the
    cross-engine oracle derivable with no side-channel weight file."""
    return (bucket * _HASH_MULT) % _W_MOD - (_W_MOD - 1) // 2


def hashed_linear_logit(
    tok_array: Column, buckets: int = HASHED_LM_BUCKETS
) -> Column:
    """Linear-model inference as ONE zero-shuffle fold: the sum over
    tokens of the hashed feature's weight (fastText-style bag-of-hashed-
    words scoring, Joulin et al. 2016).  Integer arithmetic end-to-end,
    so results are bit-identical across engines and partitionings.

    Scale shape: no explode, no groupBy, no join — the classifier is a
    map-side Column over the corpus scan, which is what lets quality
    filtering run inside the same stage as the parquet read at 100 TB.
    The fold's lambda touches only (acc, tok) — one md5 per token,
    O(tokens) per row (the interpreted-HOF trap is re-deriving OUTER
    expressions per element, which this avoids)."""
    return F.aggregate(
        tok_array,
        F.lit(0).cast("long"),
        lambda acc, t: acc + bucket_weight(hashed_bucket(t, buckets)),
    )


# ---------------------------------------------------------------------------
# Unicode script profiling — the script-level complement to the n-gram
# language heuristic above: codepoint-range counts per writing system,
# used for script filtering/routing in multilingual corpus prep (e.g.
# route CJK to a different tokenizer, drop scripts outside the training
# mix). Counts are exact integers (length minus length-after-removal),
# so the whole profile is oracle-gated; character classes are built
# from literal BMP codepoints, giving identical semantics to Java
# regex and RE2.

_SCRIPT_RANGES: list[tuple[str, list[tuple[int, int]]]] = [
    ("latin", [(0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)]),
    ("cyrillic", [(0x400, 0x4FF)]),
    ("arabic", [(0x600, 0x6FF)]),
    ("devanagari", [(0x900, 0x97F)]),
    ("cjk", [(0x3040, 0x30FF), (0x4E00, 0x9FFF)]),  # kana + unified han
    ("hangul", [(0xAC00, 0xD7AF)]),
]

SCRIPT_NAMES = [name for name, _ in _SCRIPT_RANGES]


def script_char_class(name: str) -> str:
    """The literal-codepoint regex character class for one script."""
    ranges = dict(_SCRIPT_RANGES)[name]
    return "[" + "".join(f"{chr(a)}-{chr(b)}" for a, b in ranges) + "]"


def script_count(text: Column, name: str) -> Column:
    """Exact count of ``text``'s characters in the script's ranges."""
    return (
        F.length(text)
        - F.length(F.regexp_replace(text, script_char_class(name), ""))
    ).cast("long")


def dominant_script(text: Column) -> Column:
    """The script with the most characters; first in SCRIPT_NAMES order
    wins ties; 'none' when no profiled script appears."""
    counts = [script_count(text, n) for n in SCRIPT_NAMES]
    m = F.greatest(*counts)
    expr = F.lit("none")
    for name, c in reversed(list(zip(SCRIPT_NAMES, counts))):
        expr = F.when((m > 0) & (c == m), F.lit(name)).otherwise(expr)
    return expr
