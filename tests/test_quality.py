"""Gopher quality rules + C4 line filters (operators/quality.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from news_please_spark.operators.quality import (
    c4_line_filter,
    gopher_quality,
)

GOOD = "\n".join(
    [
        "the quick brown fox jumps over the lazy dog today.",
        "we have to be sure that every line of prose reads well.",
        "writers of long articles tend to keep sentences complete.",
    ]
    * 4  # 12 lines, ~120 words — clears the 50-word floor
)


def _gq(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r.asDict() for r in gopher_quality(df).collect()}


def test_gopher_rules_each_axis(spark):
    rows = [
        (0, GOOD),
        (1, "short text."),                               # word-count floor
        (2, " ".join(["a"] * 60) + " the of."),           # mean word len < 3
        (3, GOOD + "\n" + " ".join(["###"] * 30)),        # symbol ratio
        (4, "\n".join(["- bullet line here"] * 10)),      # all bullets
        (5, "\n".join(["trailing off line..."] * 10)),    # all ellipsis
        (6, " ".join(["123 456"] * 40) + " the of"),      # alpha-word frac
        (7, " ".join(["word"] * 60)),                     # no stopwords
    ]
    got = _gq(spark, rows)
    assert got[0]["keep"] == 1 and all(
        got[0][k] == 1 for k in got[0] if k.startswith("r_")
    )
    assert got[1]["r_word_count"] == 0 and got[1]["keep"] == 0
    assert got[2]["r_mean_word_len"] == 0
    assert got[3]["r_symbol_ratio"] == 0
    assert got[4]["r_bullet"] == 0 and got[4]["bullet_frac_q"] == 10_000
    assert got[5]["r_ellipsis"] == 0 and got[5]["ellipsis_frac_q"] == 10_000
    assert got[6]["r_alpha_words"] == 0
    assert got[7]["r_stopwords"] == 0 and got[7]["stop_hits"] == 0


def test_gopher_metrics_exact(spark):
    got = _gq(spark, [(0, "the cat... sat\n- on # the mat.")])
    m = got[0]
    # words: the cat... sat - on # the mat.  (8 slots)
    assert m["n_words"] == 8
    # chars: 3+6+3+1+2+1+3+4 = 23 -> floor(1e4*23/8)
    assert m["mean_word_len_q"] == 10_000 * 23 // 8
    assert m["symbol_ratio_q"] == 10_000 * 2 // 8  # one '#', one '...'
    assert m["bullet_frac_q"] == 5_000  # 1 of 2 lines
    assert m["stop_hits"] == 1  # 'the' (punctuation stripped for matching)


def test_c4_line_filter_rules(spark):
    doc = "\n".join(
        [
            "this line has enough words and ends well.",   # kept
            "too short.",                                   # < 5 words
            "no terminal punctuation so this line drops",   # no [.!?]$
            "please enable javascript to view this page.",  # javascript
            "another perfectly fine sentence goes here!",   # kept
            "is this a question with enough words here?",   # kept
        ]
    )
    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    row = c4_line_filter(df).collect()[0]
    assert row.n_lines == 6 and row.n_kept_lines == 3
    kept = "\n".join(
        [
            "this line has enough words and ends well.",
            "another perfectly fine sentence goes here!",
            "is this a question with enough words here?",
        ]
    )
    assert row.clean_md5 == hashlib.md5(kept.encode()).hexdigest()
    assert row.n_sentences == 3 and row.keep == 1


def test_c4_page_gates(spark):
    rows = [
        (0, "good sentence with five words here.\n" * 3),
        (1, "we used lorem ipsum filler text in this page today.\n" * 3),
        (2, "this page contains a { brace } in its body text.\n" * 3),
        (3, "only one good sentence lives in this page here."),  # < 3 sentences
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in c4_line_filter(df).collect()}
    assert got[0].keep == 1
    assert got[1].keep == 0 and got[1].n_kept_lines == 3  # lines fine, page gated
    assert got[2].keep == 0
    assert got[3].keep == 0 and got[3].n_sentences == 1


def test_quality_entries_zero_shuffle(spark):
    from news_please_spark.plans.queries import QUERIES

    for name in ("gopher_rules", "c4_clean"):
        plan = (
            QUERIES[name](spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, (name, plan)


def test_quality_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert gopher_quality(empty).count() == 0
    assert c4_line_filter(empty).count() == 0


# ---------------------------------------------------------------------------
# per-group rank calibration


def test_rank_calibrate_matches_python(spark):
    from news_please_spark.operators.quality import rank_calibrate

    rows = [
        ("a", 1, 10), ("a", 2, 20), ("a", 3, 20), ("a", 4, 30),  # tie at 20
        ("b", 5, 100), ("b", 6, 200),
        ("c", 7, 5),  # singleton group -> below=0 -> 0 bp
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, score long")
    got = {
        r.doc_id: r.pct_bp for r in rank_calibrate(df, "source", "score").collect()
    }
    want = {}
    for src, did, s in rows:
        grp = [x[2] for x in rows if x[0] == src]
        want[did] = sum(1 for v in grp if v < s) * 10000 // len(grp)
    assert got == want
    assert got[2] == got[3]  # ties share a percentile
    assert got[7] == 0


def test_rank_calibrate_makes_thresholds_comparable(spark):
    """Same cut (pct_bp >= 5000) keeps the top half of EACH source even
    when raw score ranges differ by 100x — the calibration contract."""
    from news_please_spark.operators.quality import rank_calibrate

    rows = [("lo", i, i) for i in range(10)] + [("hi", 100 + i, 1000 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "source string, doc_id long, score long")
    kept = (
        rank_calibrate(df, "source", "score")
        .filter(F.col("pct_bp") >= 5000)
        .groupBy("source")
        .count()
        .collect()
    )
    assert {r.source: r["count"] for r in kept} == {"lo": 5, "hi": 5}


def test_rank_calibrate_windows_run_over_histogram(spark):
    from news_please_spark.operators.quality import rank_calibrate

    df = spark.createDataFrame(
        [("a", 1, 10)], "source string, doc_id long, score long"
    )
    plan = (
        rank_calibrate(df, "source", "score")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # both windows sit ABOVE the aggregate (histogram side), never on raw rows
    agg_pos = plan.find("Aggregate")
    assert agg_pos != -1
    assert all(p < agg_pos for p in _find_all(plan, "Window"))


def _find_all(s, needle):
    out, i = [], s.find(needle)
    while i != -1:
        out.append(i)
        i = s.find(needle, i + 1)
    return out


# ---------------------------------------------------------------------------
# readability surrogates


def test_readability_cols_matches_python(spark):
    import re

    from news_please_spark.functions.text import readability_cols

    rows = [
        (1, "The cat sat. The dog ran! Did it? Yes."),
        (2, "one two three"),                      # no terminator: 1 sentence
        (3, ""),                                   # empty: clamps to 1/1
        (4, "Numbers 123 and punct ,;: only!!"),   # letters-only char axis
        (5, "Trailing terminator stays clean..."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.n_sents, r.words_per_sent_c, r.chars_per_word_c)
        for r in df.select("doc_id", *readability_cols(F.col("text"))).collect()
    }
    for did, text in rows:
        n_words = max(len(text.strip().lower().split()), 1) if text.strip() else 1
        sents = [s for s in re.split(r"[.!?]+", text) if s.strip()]
        n_sents = max(len(sents), 1)
        letters = len(re.sub(r"[^A-Za-z]", "", text))
        want = (
            n_words,
            n_sents,
            n_words * 100 // n_sents,
            letters * 100 // n_words,
        )
        assert got[did] == want, (did, got[did], want)


def test_readability_zero_shuffle(spark):
    from news_please_spark.functions.text import readability_cols

    df = spark.createDataFrame([(1, "a b. c!")], "doc_id long, text string")
    plan = (
        df.select("doc_id", *readability_cols(F.col("text")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# quotation extraction


def test_quotes_of_semantics(spark):
    from news_please_spark.functions.text import quotes_of

    rows = [
        (1, 'He said "a quote long enough here" then "no" and "another quote of size".'),
        (2, 'An unclosed " quote never ends'),
        (3, 'Nothing quoted at all'),
        (4, '"' + "x" * 500 + '"'),  # above ceiling: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.q
        for r in df.select("doc_id", quotes_of(F.col("text")).alias("q")).collect()
    }
    assert got[1] == ["a quote long enough here", "another quote of size"]
    assert got[2] == []
    assert got[3] == []
    assert got[4] == []


def test_quotes_of_zero_shuffle(spark):
    from news_please_spark.functions.text import quotes_of

    df = spark.createDataFrame([(1, 'x "a quote of length" y')], "id long, t string")
    plan = (
        df.select(quotes_of(F.col("t")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# text normalization


def test_normalize_text_semantics(spark):
    from news_please_spark.functions.text import normalize_text

    rows = [
        (1, "“Hi” — it’s… fine"),
        (2, "a\x07b\x00c"),              # control chars drop, letters keep
        (3, "  lots\t of   space  "),
        (4, "line1   \n\n\n   line2"),
        (5, "tabs\tand\nnewlines\nsurvive"),
        (6, "nb sp"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n for r in df.select(
        "doc_id", normalize_text(F.col("text")).alias("n")).collect()}
    assert got[1] == "\"Hi\" - it's... fine"
    assert got[2] == "abc"
    assert got[3] == "lots of space"
    assert got[4] == "line1\nline2"
    assert got[5] == "tabs and\nnewlines\nsurvive"
    assert got[6] == "nb sp"


def test_normalize_text_makes_cosmetic_variants_dedup_equal(spark):
    from news_please_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "“breaking” – news  today"),
         (2, '"breaking" - news today')],
        "doc_id long, text string",
    )
    out = df.select(normalize_text(F.col("text")).alias("n")).distinct()
    assert out.count() == 1
