"""Benchmark decontamination + PII redaction for training-data corpora.

Two more operators a corpus builder needs downstream of the crawler
(reference scope ends at extraction — news-please's NewsArticle rows
are exactly the input these consume):

* ``contamination`` / ``decontaminate`` — n-gram overlap against an
  evaluation ("benchmark") set, the GPT-3/PaLM-style decontamination
  step: a corpus document that shares any word n-gram with a benchmark
  document leaks eval data into training and must be dropped.

  Scale plan: the benchmark side is tiny relative to the corpus (10^5
  eval docs vs 10^10 pages), so its distinct gram hashes BROADCAST;
  the corpus side explodes distinct grams per doc (fixed-width md5
  keys, never raw shingles) and the contamination count is a
  broadcast-join + per-doc count with map-side partial aggregation.
  The corpus is never shuffled by gram — the only shuffle carries
  (doc_id, count) for the contaminated subset, which is by
  construction a sliver of the corpus.

* ``redact_pii`` — email / IPv4 / phone-shaped span redaction with
  per-doc counts, as a chain of native regexp Columns riding the scan
  (zero shuffle, whole-stage codegen). Patterns are deliberately
  RE2-compatible (no lookaround, no backreferences) so the SAME regex
  text runs on Spark (java.util.regex) and DuckDB (RE2) — which is what
  makes the operator oracle-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_please_spark.operators.repetition import ngrams

# ---------------------------------------------------------------------------
# benchmark decontamination


def _doc_grams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, md5(gram)) pairs, one row per DISTINCT gram per doc."""
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams(F.lower(F.col(text_col)), n))).alias("_g"),
    ).select(id_col, F.md5("_g").alias("_g"))


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """(id_col, n_hits) for every corpus doc sharing >= 1 word n-gram
    with the benchmark set; n_hits = # of the doc's distinct grams that
    appear anywhere in the benchmark. Docs with zero overlap are NOT
    returned (at design scale the clean set is ~the whole corpus —
    materializing zeros would be a full-corpus row per operator call).
    """
    bench_grams = F.broadcast(
        _doc_grams(benchmark, text_col, id_col, n).select("_g").distinct()
    )
    return (
        _doc_grams(corpus, text_col, id_col, n)
        .join(bench_grams, "_g", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """The filtered corpus: drop every doc contamination() flags.
    left_anti on the (small) contaminated-id set — no corpus shuffle."""
    hits = contamination(corpus, benchmark, text_col, id_col, n).select(id_col)
    return corpus.join(F.broadcast(hits), id_col, "left_anti")


def contamination_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Contamination SPANS, not just per-doc hit counts: the
    PaLM/GPT-3-style decontamination reports expand each matched
    benchmark n-gram into the contiguous token range it covers and
    merge runs of matches into one span — the unit a curation team
    actually inspects (and the unit surgical span-removal operates
    on, vs dropping whole documents).

    Semantics: token position p (1-based) is a match when the doc's
    n-gram starting at p appears anywhere in the benchmark gram set.
    Two matches belong to the same span when their windows touch or
    overlap (p2 − p1 ≤ n); each span reports
    (span_start, span_end = last_match + n − 1, span_tokens, n_grams).
    All-integer output — exact cross-engine.

    Scale: benchmark grams broadcast (eval sets ARE small); the corpus
    explodes positional gram hashes map-side and the broadcast
    left-semi keeps only matched (doc, pos) rows — a sliver, and the
    ONLY rows that shuffle (for the per-doc island window). The corpus
    itself is never shuffled, same plan family as contamination()."""
    bench_grams = F.broadcast(
        _doc_grams(benchmark, text_col, id_col, n).select("_g").distinct()
    )
    matched = (
        corpus.select(
            F.col(id_col),
            F.posexplode(ngrams(F.lower(F.col(text_col)), n)).alias(
                "_p0", "_g"
            ),
        )
        .select(id_col, (F.col("_p0") + 1).alias("pos"), F.md5("_g").alias("_g"))
        .join(bench_grams, "_g", "left_semi")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    isl = matched.withColumn(
        "_brk",
        F.when(F.col("pos") - F.lag("pos").over(w) > n, 1).otherwise(0),
    ).withColumn("_island", F.sum("_brk").over(w))
    return isl.groupBy(id_col, "_island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (n - 1)).alias("span_end"),
        (F.max("pos") - F.min("pos") + n).alias("span_tokens"),
        F.count(F.lit(1)).alias("n_grams"),
    ).drop("_island")


# ---------------------------------------------------------------------------
# cross-source contamination matrix


def source_overlap(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise n-gram overlap between sources — the contamination
    matrix a curation team reads before mixing corpora: how much of
    source A's shingle vocabulary also appears in source B (mirror
    dumps, syndication rings, and benchmark bleed all show up as an
    off-diagonal spike).  One row per unordered source pair that
    shares at least one shingle: (source_a, source_b, shared_grams,
    grams_a, grams_b, jaccard_bp) with jaccard_bp the integer Jaccard
    in basis points (shared·10⁴ DIV (a+b−shared)).

    Scale shape — the corpus is never self-joined:

      1. distinct (md5(shingle), source): map-side-combinable distinct;
         only fixed-width hashes shuffle (lowercased shingles, the
         dedup tier's ngram_set convention).
      2. per-gram source set: bounded by |sources| (a config-sized
         set — tens, not corpus-proportional), so the pair explode is
         ≤ C(|sources|, 2) rows per gram regardless of corpus size.
      3. count per pair; per-source totals join back via broadcast
         (the totals table has |sources| rows — genuinely tiny at any
         corpus scale, unlike document-keyed "small" sets).
    """
    from news_please_spark.operators.dedup import ngram_set

    grams = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(ngram_set(F.col(text_col), n)).alias("_g"),
        )
        .select("source", F.md5(F.col("_g")).alias("_gh"))
        .distinct()
    )
    totals = grams.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    sets = grams.groupBy("_gh").agg(
        F.sort_array(F.collect_set("source")).alias("_ss")
    )
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                F.col("_ss"),
                lambda a: F.transform(
                    F.col("_ss"),
                    lambda b: F.struct(a.alias("source_a"), b.alias("source_b")),
                ),
            )
        ),
        lambda p: p["source_a"] < p["source_b"],
    )
    shared = (
        sets.select(F.explode(pair_structs).alias("_p"))
        .select("_p.source_a", "_p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_grams"))
    )
    ta = F.broadcast(totals.select(F.col("source").alias("source_a"), F.col("n_grams").alias("grams_a")))
    tb = F.broadcast(totals.select(F.col("source").alias("source_b"), F.col("n_grams").alias("grams_b")))
    return (
        shared.join(ta, "source_a")
        .join(tb, "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            "grams_a",
            "grams_b",
            F.expr(
                "shared_grams * 10000L DIV (grams_a + grams_b - shared_grams)"
            ).alias("jaccard_bp"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction

# RE2-compatible (and java.util.regex-compatible) patterns; keep in sync
# with the SQL oracle strings in plans/queries.py.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,3}[- ][0-9]{2,4}[- ][0-9]{3,4}[- ][0-9]{3,4}"

_PII = [("email", EMAIL_RE), ("ip", IPV4_RE), ("phone", PHONE_RE)]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace PII-shaped spans with <KIND> sentinels and count each
    kind per row. Order matters and is fixed (email, ip, phone): email
    local parts may contain digits that would otherwise half-match the
    phone shape. Pure regexp Columns — rides the scan, no shuffle."""
    out = df
    clean = F.col(text_col)
    for kind, pat in _PII:
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(clean, F.lit(pat), F.lit(0))).cast("long"),
        )
        clean = F.regexp_replace(clean, pat, f"<{kind.upper()}>")
    return out.withColumn("clean_text", clean)
