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
    """All overlapping word n-grams, in document order (slots), built by
    zip_with over n shifted slices of the token array.

    Expression-shape constraint (the reason for the zip_with form): a
    higher-order-function lambda body is evaluated ONCE PER ELEMENT in
    interpreted (non-codegen) mode, and any outer expression referenced
    inside it — e.g. element_at(split(text), i) — is re-evaluated from
    scratch each time, turning the n-gram build into O(L^2) regex work
    per row. Here every lambda touches only its element values; the
    token array appears solely as a HOF *argument*, evaluated once per
    row. Short docs (< n tokens) yield an empty array via the slice
    length clamp (slice with length 0 is an empty array)."""
    toks = tokens(text)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    g = F.slice(toks, 1, m)
    for j in range(1, n):
        g = F.zip_with(
            g, F.slice(toks, 1 + j, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return g


def run_stats(arr: Column) -> Column:
    """Run statistics over arr in ONE fold of the sorted array
    (returned as the fold's accumulator struct — read .dup / .best):
      dup  = # slots whose value occurs more than once (sum of run
             lengths >= 2 — a run reaching 2 adds both slots, each
             further extension adds 1);
      best = occurrence count of the most frequent value (longest run).
    The lambda touches only the accumulator and the element, so the
    (potentially expensive) arr expression is evaluated once per row
    even in interpreted eval. O(L log L) per row, no shuffle. The null
    sentinel is safe because sorted-array elements here (grams/lines)
    are never null (eqNullSafe(null) is false for non-null x)."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("dup"),
    )

    def _merge(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            (
                acc["dup"]
                + F.when(run == 2, F.lit(2))
                .when(run > 2, F.lit(1))
                .otherwise(F.lit(0))
            ).alias("dup"),
        )

    # Return the fold struct itself (fields prev/run/best/dup): wrapping
    # dup+best in a fresh struct would inline the WHOLE fold once per
    # extracted field. Callers project this to a column and read .dup /
    # .best so the fold runs once per array per row.
    return F.aggregate(F.array_sort(arr), acc0, _merge)


def _dup_slot_count(arr: Column) -> Column:
    """# slots whose value occurs more than once in arr."""
    return run_stats(arr)["dup"]


def _top_run_length(arr: Column) -> Column:
    """Occurrence count of the most frequent value in arr."""
    return run_stats(arr)["best"]


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


def repetition_scores_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Staged plan for the per-document repetition signals: the gram and
    line arrays materialize as real columns (each is referenced more
    than once downstream, so CollapseProject keeps the project
    boundaries instead of re-inlining the array builds), then exactly
    one run_stats fold per array. Per-row cost is O(L log L) with each
    array built once — the shape that survives million-token documents."""
    t = F.col(text_col)
    staged = (
        df.select(
            F.col(id_col),
            ngrams(t, 2).alias("_g2"),
            ngrams(t, 3).alias("_g3"),
            F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "").alias("_lns"),
        )
        .select(
            id_col,
            F.size("_g2").alias("_n2"),
            F.size("_g3").alias("_n3"),
            F.size("_lns").alias("_nl"),
            run_stats(F.col("_g2")).alias("_s2"),
            run_stats(F.col("_g3")).alias("_s3"),
            run_stats(F.col("_lns")).alias("_sl"),
        )
    )
    return staged.select(
        id_col,
        _frac_q(F.col("_sl")["dup"], F.col("_nl")).alias("dup_line_q"),
        _frac_q(F.col("_s2")["dup"], F.col("_n2")).alias("dup_bigram_q"),
        _frac_q(F.col("_s3")["dup"], F.col("_n3")).alias("dup_trigram_q"),
        _frac_q(F.col("_s2")["best"], F.col("_n2")).alias("top_bigram_q"),
        _frac_q(F.col("_s3")["best"], F.col("_n3")).alias("top_trigram_q"),
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


def corpus_line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style corpus-level paragraph/line deduplication (Wenzek et
    al. 2020 §3.1): across the WHOLE corpus, every occurrence of a
    (lowercased, trimmed) line except the globally first one — ordered
    by (doc id, line position) — is removed; whitespace-only lines are
    never hashed and always kept.  Web boilerplate ("subscribe to our
    newsletter", cookie banners) appears verbatim in millions of docs,
    so this single pass removes most of it without any per-site rules.

    Returns (id, text, n_removed) with surviving lines rejoined in
    their original order.

    Scale plan — deliberately NOT a broadcast of the duplicate-line
    set (at 100 TB that set is corpus-sized):
      1. posexplode lines; only (doc, pos, md5(norm)) fixed-width rows
         carry into the shuffle, never twice the text;
      2. the canonical copy per hash is min(struct(doc, pos)) — a
         map-side-combinable aggregate, so a line occurring 10^9 times
         ("Subscribe") partial-aggregates inside each task instead of
         skewing one reducer the way a PARTITION BY hash window would;
      3. winners join back on the hash key (co-keyed hash join), and
         docs reassemble with one groupBy(id) ordered concat.
    Three shuffles total (hash agg, hash join, doc re-agg), each on
    fixed-width keys."""
    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    lines = base.select(
        "_id",
        F.posexplode(F.split(F.col("_t"), "\n")).alias("_pos", "_line"),
    ).withColumn("_norm", F.trim(F.lower(F.col("_line"))))
    hashed = lines.withColumn(
        "_h", F.when(F.col("_norm") != "", F.md5("_norm"))
    )
    winners = (
        hashed.filter(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(F.min(F.struct("_id", "_pos")).alias("_w"))
    )
    marked = hashed.join(winners, "_h", "left").withColumn(
        "_keep",
        F.col("_h").isNull()
        | ((F.col("_w._id") == F.col("_id")) & (F.col("_w._pos") == F.col("_pos"))),
    )
    return (
        marked.groupBy("_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_keep"), F.struct("_pos", "_line"))
                        )
                    ),
                    lambda s: s["_line"],
                ),
            ).alias(text_col),
            F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
        )
        .select(F.col("_id").alias(id_col), text_col, "n_removed")
    )
