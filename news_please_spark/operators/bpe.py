"""Distributed BPE tokenizer training — learned merges over the corpus
word-frequency table (Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016, Algorithm 1).

The LLM-pipeline op the quality/token tiers were missing: everything
else in this repo *consumes* a tokenization (whitespace or the BPE-ish
regex in functions/text.py); this module *learns* one from the corpus,
which is how real training pipelines derive their vocabulary.

Spark-first shape (nothing here is a port — the classic implementation
is a single-process dict loop):

- the corpus collapses ONCE to the distinct-word frequency table
  (map-side-combinable count; |vocab| rows, orders of magnitude smaller
  than the corpus — the only pass over the 100-TB input);
- each word is a SINGLE STRING of framed symbols ``\\x02sym\\x03`` so
  that "merge pair (a, b) everywhere" is one literal, non-overlapping,
  left-to-right ``replace`` — a whole-stage-codegen Column, no UDF, no
  per-symbol explode-and-reassemble.  The framing makes the pattern
  ``\\x02a\\x03\\x02b\\x03`` alignment-safe (it can only match whole
  symbols) and merge-complete (adjacent disjoint occurrences like
  ``[a,b,a,b]`` both merge, because a match never consumes the next
  match's leading frame — the bug a separator-only encoding has), while
  preserving BPE's leftmost-first semantics on overlaps
  (``[a,a,a]`` + (a,a) -> ``[aa,a]``);
- per round: adjacent-pair counts are one explode + one map-side-
  combinable sum over the VOCAB table (pair keys cross the shuffle,
  never documents), the argmax is a 1-row collect (the same
  config-sized driver grain as temperature_thresholds), and the merge
  application is the literal replace above.  Round cost is O(|vocab|);
  the corpus is touched zero times after the first aggregation.
- lineage: each round's repr table is persisted and the superseded one
  released after the next action materializes its successor — k rounds
  hold at most two |vocab|-row caches.

The identical framed-string representation runs in DuckDB (regexp
encode + chained ``replace``), so the learned merge table is
oracle-gated bit-for-bit (entry ``bpe_merges``), and applying the
learned merges is a chain of the same literal replaces
(``apply_merges`` / entry ``bpe_encode``).

At a production vocabulary size (32-64k merges) one-pair-per-round is
scheduler-bound; real distributed trainers batch rounds.  ``train_bpe``
exposes that as ``pairs_per_round``: each round greedily admits the
top-m pairs that share no symbol with a higher-ranked admitted pair
(disjoint merges commute, so the batch equals m sequential rounds
whenever those rounds would have picked the same pairs — the standard
batching; exactness vs sequential is pinned for the disjoint case in
pytest, and the oracle entry runs the exact m=1 form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_please_spark.operators.cacheutil import release_df

SYM_OPEN = "\x02"
SYM_CLOSE = "\x03"
_FRAME_SPLIT = SYM_CLOSE + SYM_OPEN  # boundary between adjacent symbols


def word_freqs(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq): corpus word-frequency table under the repo's
    tokenization convention (trim + lower + split \\s+), empty tokens
    dropped.  The one corpus-wide pass; map-side combinable."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        docs.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def framed(word) -> F.Column:
    """Encode a word as framed initial symbols: 'ab' -> ␂a␃␂b␃."""
    col = F.col(word) if isinstance(word, str) else word
    return F.regexp_replace(col, "(.)", SYM_OPEN + "$1" + SYM_CLOSE)


def merge_pattern(a: str, b: str) -> tuple[str, str]:
    """(search, replacement) literals for merging pair (a, b)."""
    return (
        SYM_OPEN + a + SYM_CLOSE + SYM_OPEN + b + SYM_CLOSE,
        SYM_OPEN + a + b + SYM_CLOSE,
    )


def _pair_counts(reprs: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair counts (overlapping, per
    classic get_stats) weighted by word frequency."""
    syms = F.split(
        F.expr("substring(w, 2, length(w) - 2)"), _FRAME_SPLIT
    )
    pairs = F.expr(
        "zip_with(slice(syms, 1, size(syms) - 1),"
        " slice(syms, 2, size(syms) - 1), (a, b) -> struct(a, b))"
    )
    return (
        reprs.select(F.col("freq"), syms.alias("syms"))
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def train_bpe(
    wf: DataFrame,
    num_merges: int,
    min_pair_freq: int = 1,
    pairs_per_round: int = 1,
) -> list[dict]:
    """Learn up to ``num_merges`` BPE merges from a (word, freq) table.

    Returns [{"step", "left", "right", "pair_freq"}, ...] in merge
    order; ``step`` is 0-based rank.  Ties break (cnt DESC, a ASC,
    b ASC) — deterministic across engines and partitionings.  Stops
    early when no pair reaches ``min_pair_freq``.

    ``pairs_per_round`` > 1 admits the top-m symbol-disjoint pairs per
    round (see module docstring) — m sequential argmax jobs collapse
    into one, the scale knob for production vocabulary sizes.
    """
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    if pairs_per_round <= 0:
        raise ValueError(
            f"pairs_per_round must be positive, got {pairs_per_round}"
        )
    cur = wf.select(framed("word").alias("w"), "freq").persist()
    prev: DataFrame | None = None
    merges: list[dict] = []
    try:
        while len(merges) < num_merges:
            take = min(pairs_per_round, num_merges - len(merges))
            # fetch extra rows so disjointness filtering can still fill
            # the round; 4x is a heuristic — a short round only costs
            # the next iteration re-running on the updated reprs
            top = (
                _pair_counts(cur)
                .filter(F.col("cnt") >= min_pair_freq)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(take * 4 if take > 1 else 1)
                .collect()
            )
            if prev is not None:
                release_df(prev)  # materialized via the collect above
                prev = None
            if not top:
                break
            used: set[str] = set()
            batch = []
            for r in top:
                if len(batch) == take:
                    break
                if r.a in used or r.b in used:
                    continue
                used.update((r.a, r.b, r.a + r.b))
                batch.append(r)
            col = F.col("w")
            for r in batch:
                merges.append(
                    {
                        "step": len(merges),
                        "left": r.a,
                        "right": r.b,
                        "pair_freq": r.cnt,
                    }
                )
                pat, rep = merge_pattern(r.a, r.b)
                col = F.replace(col, F.lit(pat), F.lit(rep))
            prev = cur
            cur = prev.select(col.alias("w"), "freq").persist()
        return merges
    finally:
        release_df(cur)
        if prev is not None:
            release_df(prev)


def apply_merges(words, merges: list[dict]) -> F.Column:
    """Framed-repr Column of ``words`` after applying ``merges`` in
    rank order — a chain of literal replaces (whole-stage codegen; at
    32k+ merges encode via the trained-vocab longest-match instead)."""
    col = framed(words)
    for m in sorted(merges, key=lambda m: m["step"]):
        pat, rep = merge_pattern(m["left"], m["right"])
        col = F.replace(col, F.lit(pat), F.lit(rep))
    return col


def symbol_count(framed_col: F.Column) -> F.Column:
    """Number of symbols in a framed repr (= BPE token count): count
    of close-frames, no split/array materialization."""
    return (
        F.length(framed_col)
        - F.length(F.replace(framed_col, F.lit(SYM_CLOSE), F.lit("")))
    ).cast("bigint")


def bpe_token_counts(
    docs: DataFrame,
    merges: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, ws_tokens, bpe_tokens): per-document token counts under the
    learned merges.  Re-tokenizes with the corpus convention, encodes
    each occurrence, sums symbol counts — zero shuffle beyond the
    per-doc aggregation (map-side combinable)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    words = (
        docs.select(F.col(id_col), F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
    )
    enc = apply_merges(F.col("word"), merges)
    return (
        words.select(F.col(id_col), symbol_count(enc).alias("n"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("ws_tokens"),
            F.sum("n").alias("bpe_tokens"),
        )
    )
