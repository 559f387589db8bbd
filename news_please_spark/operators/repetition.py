"""Repetition-based quality signals for training-data pipelines.

Implements the repetition family of document-quality rules popularized
by the Gopher data pipeline (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", §A1.1) and reused
by C4/Falcon-style corpus builders:

  * duplicate-line fraction       (within-document, for real corpora)
  * duplicate-n-gram fraction     (within-document)
  * top-n-gram fraction           (within-document)
  * corpus-level duplicate n-grams (cross-document, the "this boilerplate
    appears in 40k pages" signal)

Everything within-document is a pure per-row Column expression (array
HOFs — sort, fold, indexed filter), so the signals ride the scan with
zero shuffle and stay inside whole-stage codegen at any corpus size.
The corpus-level operator is the only one that shuffles, and only on
fixed-width md5 gram keys with map-side-combinable counts.

Definitions (slot-fraction form, quantized to floor(1e4·x) for exact
cross-engine comparison):

  dup_gram_frac  = (# n-gram slots whose gram occurs >1× in the doc) / slots
  top_gram_frac  = (occurrences of the doc's most frequent n-gram) / slots
  dup_line_frac  = (# line slots whose exact line occurs >1×) / lines

Gopher's char-weighted variants differ only in the weighting; the slot
form is chosen because it is exactly representable as a ratio of small
integers (portable across engines bit-for-bit after quantization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from news_please_spark.functions.text import tokens


def ngrams(text: Column, n: int = 2) -> Column:
    """All overlapping word n-grams, in document order (slots).
    Short docs (< n tokens) yield an empty array — the guard matters
    because sequence(1, 0) generates DESCENDING [1, 0] in Spark and
    element_at(toks, 0) is a runtime error."""
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _dup_slot_count(arr: Column) -> Column:
    """# slots whose value occurs more than once in arr — computed on
    the sorted array: a slot is duplicated iff it equals a neighbour.
    O(L log L) per row, no shuffle."""
    s = F.array_sort(arr)
    return F.size(
        F.filter(
            s,
            lambda x, i: (x == F.get(s, i - 1)) | (x == F.get(s, i + 1)),
        )
    )


def _top_run_length(arr: Column) -> Column:
    """Occurrence count of the most frequent value = longest run in the
    sorted array, via a single fold (ties resolved by count, value
    irrelevant)."""
    s = F.array_sort(arr)
    acc0 = F.struct(
        F.lit("\x00").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    folded = F.aggregate(
        s,
        acc0,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return folded["best"]


def _frac_q(num: Column, den: Column) -> Column:
    """floor(1e4 · num/den) as long; 0 when there are no slots."""
    return (
        F.when(den == 0, F.lit(0))
        .otherwise(F.floor(10000.0 * num / den))
        .cast("long")
    )


def dup_gram_frac_q(text: Column, n: int = 2) -> Column:
    g = ngrams(text, n)
    return _frac_q(_dup_slot_count(g), F.size(g))


def top_gram_frac_q(text: Column, n: int = 2) -> Column:
    g = ngrams(text, n)
    return _frac_q(_top_run_length(g), F.size(g))


def dup_line_frac_q(text: Column) -> Column:
    """Duplicate-line fraction (exact line repeated within the doc).
    Empty lines are excluded — boilerplate detection targets content
    lines, and blank separators would otherwise dominate."""
    lines = F.filter(F.split(text, "\n"), lambda x: F.trim(x) != "")
    return _frac_q(_dup_slot_count(lines), F.size(lines))


def repetition_struct(text: Column) -> Column:
    """The per-document repetition signal bundle (all zero-shuffle)."""
    return F.struct(
        dup_line_frac_q(text).alias("dup_line_q"),
        dup_gram_frac_q(text, 2).alias("dup_bigram_q"),
        dup_gram_frac_q(text, 3).alias("dup_trigram_q"),
        top_gram_frac_q(text, 2).alias("top_bigram_q"),
        top_gram_frac_q(text, 3).alias("top_trigram_q"),
    )


def corpus_dup_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Cross-document duplicate n-grams: for each doc, how many of its
    DISTINCT n-grams also appear in at least one other document.

    Scale plan (the only shuffling operator in this module):
      1. explode distinct grams as (doc, md5(gram)) — fixed-width keys,
         no raw shingle strings cross the shuffle;
      2. gram document-frequency via groupBy(gram) count — map-side
         partial aggregation bounds the shuffle at distinct-grams rows,
         and no task ever holds a gram's full posting list (no
         collect_list);
      3. left_semi back onto the pairs to keep shared grams, then a
         per-doc count — both map-side combinable.
    Docs with no grams (< n tokens) are kept via a left join with 0s.
    """
    base = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    pairs = base.select(
        id_col,
        F.explode(F.array_distinct(ngrams(F.col("_t"), n))).alias("_g"),
    ).select(id_col, F.md5("_g").alias("_g"))
    shared = (
        pairs.groupBy("_g")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > 1)
        .select("_g")
    )
    per_doc = (
        pairs.join(shared, "_g", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("shared_grams"))
    )
    totals = pairs.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("shared_grams", F.lit(0)).cast("long").alias("shared_grams"),
            _frac_q(
                F.coalesce("shared_grams", F.lit(0)),
                F.coalesce("n_grams", F.lit(0)),
            ).alias("dup_frac_q"),
        )
    )
