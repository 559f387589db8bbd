"""Repetition-signal operators (Gopher-style quality rules) vs a naive
pure-Python oracle, plus the guard rails the synthetic corpus can't
exercise (newline-bearing docs, short docs, empty docs)."""

from collections import Counter

from pyspark.sql import functions as F

from news_please_spark.operators.repetition import (
    corpus_dup_ngrams,
    dup_gram_frac_q,
    dup_line_frac_q,
    ngrams,
    repetition_struct,
    top_gram_frac_q,
)

DOCS = [
    # (doc_id, text)
    (0, "a b c a b c a b"),                      # heavy bigram repetition
    (1, "the quick brown fox jumps"),            # all unique
    (2, "x"),                                    # 1 token: no bigrams
    (3, ""),                                     # empty
    (4, "one two\none two\nthree four\n\n  \n"), # duplicate lines + blanks
    (5, "a b c a b c a b"),                      # exact dup of doc 0
    (6, "spam spam spam spam spam spam"),        # single token repeated
]


def _py_ngrams(text, n):
    toks = [t for t in text.strip().split()] if text.strip() else [""]
    if text.strip() == "":
        toks = [""]
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def _frac_q(num, den):
    return 0 if den == 0 else int(10000.0 * num / den // 1)


def _py_dup_frac(items):
    c = Counter(items)
    dup = sum(v for v in c.values() if v > 1)
    return _frac_q(dup, len(items))


def _py_top_frac(items):
    c = Counter(items)
    return _frac_q(max(c.values(), default=0), len(items))


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_ngrams_short_docs_yield_empty(spark):
    rows = (
        _df(spark)
        .select("doc_id", F.size(ngrams(F.col("text"), 3)).alias("n"))
        .orderBy("doc_id")
        .collect()
    )
    by_id = {r["doc_id"]: r["n"] for r in rows}
    assert by_id[2] == 0 and by_id[3] == 0        # < 3 tokens: empty, no error
    assert by_id[0] == len(_py_ngrams(DOCS[0][1], 3))


def test_repetition_matches_python_oracle(spark):
    rows = (
        _df(spark)
        .select("doc_id", repetition_struct(F.col("text")).alias("r"))
        .select("doc_id", "r.*")
        .collect()
    )
    for r in rows:
        text = dict(DOCS)[r["doc_id"]]
        # mirror the engine's tokenizer: Spark trim() strips SPACES
        # only (not \n), and split('\s+') keeps empty edge tokens —
        # the DuckDB oracle tokenizes identically
        import re

        toks = re.split(r"\s+", text.strip(" "))
        for col, n, fn in [
            ("dup_bigram_q", 2, _py_dup_frac),
            ("dup_trigram_q", 3, _py_dup_frac),
            ("top_bigram_q", 2, _py_top_frac),
            ("top_trigram_q", 3, _py_top_frac),
        ]:
            grams = (
                [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
                if len(toks) >= n
                else []
            )
            assert r[col] == fn(grams), (r["doc_id"], col, grams)
        lines = [ln for ln in text.split("\n") if ln.strip()]
        assert r["dup_line_q"] == _py_dup_frac(lines), (r["doc_id"], "lines")


def test_dup_line_counts_duplicates_not_blanks(spark):
    row = (
        _df(spark)
        .filter(F.col("doc_id") == 4)
        .select(dup_line_frac_q(F.col("text")).alias("q"))
        .first()
    )
    # 3 non-blank lines, 'one two' twice → 2/3 of slots duplicated
    assert row["q"] == _frac_q(2, 3)


def test_single_token_doc_is_fully_repetitive(spark):
    row = (
        _df(spark)
        .filter(F.col("doc_id") == 6)
        .select(
            dup_gram_frac_q(F.col("text"), 2).alias("d"),
            top_gram_frac_q(F.col("text"), 2).alias("t"),
        )
        .first()
    )
    assert row["d"] == 10000 and row["t"] == 10000


def test_corpus_dup_ngrams_matches_python_oracle(spark):
    out = {
        r["doc_id"]: (r["n_grams"], r["shared_grams"], r["dup_frac_q"])
        for r in corpus_dup_ngrams(_df(spark)).collect()
    }
    # python oracle on distinct 3-grams (engine tokenization: trim
    # spaces only, empty edge tokens kept)
    import re

    sets = {}
    for d, text in DOCS:
        toks = re.split(r"\s+", text.strip(" "))
        sets[d] = (
            {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3
            else set()
        )
    for d, grams in sets.items():
        shared = sum(
            1 for g in grams
            if any(g in other for od, other in sets.items() if od != d)
        )
        assert out[d] == (len(grams), shared, _frac_q(shared, len(grams))), d
    # docs 0 and 5 are identical: every gram shared
    assert out[0][2] == 10000 and out[5][2] == 10000
    # empty docs still present with zeros
    assert out[3] == (0, 0, 0)


def test_repetition_is_zero_shuffle(spark):
    plan = (
        _df(spark)
        .select("doc_id", repetition_struct(F.col("text")).alias("r"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_repetition_large_doc_is_linearithmic(spark):
    """Regression guard for the interpreted-HOF re-evaluation pathology:
    an expression like element_at(split(text), i) inside a transform
    lambda re-tokenizes the whole text once per element (O(L^2) per
    row), and referencing array_sort(grams) inside a filter lambda
    compounds it to O(L^3) — a 20k-token doc then takes HOURS. The
    zip_with/fold shapes finish instantly; completing at all (with
    exact values) is the assertion."""
    from news_please_spark.operators.repetition import repetition_scores_df

    n = 20_000
    toks = [f"w{i % 977}" for i in range(n)]  # every value repeats
    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = repetition_scores_df(df).collect()[0]

    big2 = [" ".join(toks[i : i + 2]) for i in range(n - 1)]
    big3 = [" ".join(toks[i : i + 3]) for i in range(n - 2)]
    assert row["dup_bigram_q"] == _py_dup_frac(big2)
    assert row["dup_trigram_q"] == _py_dup_frac(big3)
    assert row["top_bigram_q"] == _py_top_frac(big2)
    assert row["top_trigram_q"] == _py_top_frac(big3)
    assert row["dup_line_q"] == 0  # single line occurs once: no dup lines


# ---------------------------------------------------------------------------
# CCNet-style corpus line dedup (keep globally-first occurrence)


def _py_line_dedup(docs):
    first = {}
    for did, text in sorted(docs):
        for pos, line in enumerate(text.split("\n")):
            norm = line.strip().lower()
            if norm and norm not in first:
                first[norm] = (did, pos)
    out = {}
    for did, text in docs:
        kept, removed = [], 0
        for pos, line in enumerate(text.split("\n")):
            norm = line.strip().lower()
            if norm == "" or first[norm] == (did, pos):
                kept.append(line)
            else:
                removed += 1
        out[did] = ("\n".join(kept), removed)
    return out


def test_corpus_line_dedup_matches_python_oracle(spark):
    from news_please_spark.operators.repetition import corpus_line_dedup

    docs = [
        (1, "alpha\ncommon banner\nbody one"),
        (2, "COMMON BANNER\nbody two\n  common banner  "),
        (3, "body three\ncommon banner\nalpha"),
        (4, "\n\nonly here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_removed)
        for r in corpus_line_dedup(df).collect()
    }
    assert got == _py_line_dedup(docs)
    # the canonical copy survives exactly once, in doc 1
    assert "common banner" in got[1][0]
    assert "banner" not in got[2][0].lower() and "banner" not in got[3][0].lower()


def test_corpus_line_dedup_keeps_blank_lines_and_order(spark):
    from news_please_spark.operators.repetition import corpus_line_dedup

    docs = [(7, "a\n\n\nb\na"), (8, "z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.text for r in corpus_line_dedup(df).collect()}
    # in-doc repeat of 'a' is ALSO a duplicate (global semantics);
    # blank lines pass through untouched and order is preserved
    assert got[7] == "a\n\n\nb"
    assert got[8] == "z"


def test_corpus_line_dedup_repartition_invariant(spark):
    from news_please_spark.operators.repetition import corpus_line_dedup

    docs = [(i, f"shared line\nuniq {i}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(tuple(r) for r in corpus_line_dedup(df).collect())
    b = sorted(tuple(r) for r in corpus_line_dedup(df.repartition(13)).collect())
    assert a == b
    # exactly one survivor of the shared line
    assert sum(1 for (_, t, _) in a if "shared line" in t) == 1
