"""Text-analysis scalar functions (functions/text.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_please_spark.functions.text import (
    bpe_ish_tokens,
    fingerprint,
    predict_lang,
    quality_struct,
    rolling_fingerprints,
    token_count,
)


def test_quality_and_tokens(spark):
    df = spark.createDataFrame(
        [("the cat and the hat sat, 42 times!",)], "text string"
    )
    row = df.select(
        token_count(F.col("text")).alias("n"),
        quality_struct(F.col("text")).alias("q"),
        bpe_ish_tokens(F.col("text")).alias("bpe"),
    ).first()
    assert row.n == 8
    assert row.q.n_tokens == 8
    assert row.q.n_uniq == 7  # 'the' repeats
    # bpe-ish: words + '42' + ',' + '!' split out
    assert list(row.bpe) == [
        "the", "cat", "and", "the", "hat", "sat", ",", "42", "times", "!",
    ]


def test_predict_lang(spark):
    df = spark.createDataFrame(
        [
            ("en", "the cat and the dog of a house"),
            ("de", "der hund und die katze"),
            ("es", "el perro y los gatos"),
            ("und", "xyzzy plugh quux"),
        ],
        "expected string, text string",
    )
    rows = df.select("expected", predict_lang(F.col("text")).alias("p")).collect()
    for r in rows:
        assert r.p == r.expected, r


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("  The   QUICK fox  ",), ("the quick fox",)], "text string"
    )
    fps = [r.fp for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_rolling_fingerprints_detect_containment(spark):
    base = " ".join(f"w{i}" for i in range(100))
    contained = " ".join(f"w{i}" for i in range(32, 64))  # one aligned window
    df = spark.createDataFrame(
        [("a", base), ("b", contained)], "id string, text string"
    )
    rows = {
        r.id: set(r.fps)
        for r in df.select(
            "id", rolling_fingerprints(F.col("text")).alias("fps")
        ).collect()
    }
    assert rows["b"] & rows["a"], "aligned window fingerprint must match"


def test_hashed_linear_logit_matches_python_and_is_zero_shuffle(spark):
    import hashlib

    from news_please_spark.functions.text import (
        _HASH_MULT,
        _W_MOD,
        hashed_linear_logit,
        tokens,
    )

    def py_logit(text, buckets=512):
        s = 0
        for tok in text.strip().lower().split():
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % buckets
            s += (b * _HASH_MULT) % _W_MOD - (_W_MOD - 1) // 2
        return s

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "aaa aaa aaa aaa"),
        (2, "mixed CASE Tokens 123 !!"),
        (3, "  padded   whitespace\ttabs\nnewlines  "),
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        hashed_linear_logit(tokens(F.lower(F.col("text")))).alias("logit"),
    )
    got = {r.doc_id: r.logit for r in out.collect()}
    assert got == {i: py_logit(t) for i, t in rows}
    # the classifier is a map-side Column: no Exchange anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Unicode script profiling


def test_script_counts_and_dominance(spark):
    from pyspark.sql import functions as F

    from news_please_spark.functions.text import (
        SCRIPT_NAMES,
        dominant_script,
        script_count,
    )

    rows = [
        (0, "hello world"),                      # latin
        (1, "привет мир"),                       # cyrillic
        (2, "日本語のテキストです"),                 # cjk (kana + han)
        (3, "مرحبا بالعالم"),                    # arabic
        (4, "한국어 텍스트"),                      # hangul
        (5, "नमस्ते दुनिया"),                      # devanagari
        (6, "12345 !!! ..."),                    # none
        (7, "abc привет"),                       # tie broken by order: latin=3 < cyr=6
        (8, "abcdef мир"),                       # latin wins 6 > 3
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r.i: (r.script, {n: r[f"n_{n}"] for n in SCRIPT_NAMES})
        for r in df.select(
            "i",
            dominant_script(F.col("t")).alias("script"),
            *[script_count(F.col("t"), n).alias(f"n_{n}") for n in SCRIPT_NAMES],
        ).collect()
    }
    assert got[0][0] == "latin" and got[0][1]["latin"] == 10
    assert got[1][0] == "cyrillic" and got[1][1]["cyrillic"] == 9
    assert got[2][0] == "cjk" and got[2][1]["cjk"] == 10
    assert got[3][0] == "arabic"
    assert got[4][0] == "hangul"
    assert got[5][0] == "devanagari"
    assert got[6][0] == "none" and all(v == 0 for v in got[6][1].values())
    assert got[7][0] == "cyrillic"
    assert got[8][0] == "latin"


def test_script_profile_zero_shuffle(spark):
    from news_please_spark.plans.queries import QUERIES

    plan = (
        QUERIES["script_profile"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_winnow_matches_python_reference(spark):
    """Pin winnowing (k-gram md5, window-min, RIGHTMOST tie-break) to a
    pure-Python reference, covering: docs shorter than k (no output),
    fewer grams than w (single all-gram window), exact-boundary sizes,
    and repeated tokens that force hash ties inside one window."""
    import hashlib

    from news_please_spark.functions.text import (
        kgram_hashes_of,
        tokens,
        winnow_selections_of,
    )

    K, W = 3, 4

    def py_winnow(text):
        toks = text.strip().split()
        grams = [
            hashlib.md5(" ".join(toks[i : i + K]).encode()).hexdigest()
            for i in range(len(toks) - K + 1)
        ]
        if not grams:
            return set()
        out = set()
        for j in range(max(len(grams) - W + 1, 1)):
            win = grams[j : j + W]
            m = min(win)
            # rightmost occurrence of the min
            pos = j + len(win) - 1 - win[::-1].index(m)
            out.add((pos, m))
        return out

    docs = [
        ("short", "a b"),                        # < k tokens: no grams
        ("exact_k", "a b c"),                    # one gram, one window
        ("under_w", "a b c d e"),                # 3 grams < w: one window
        ("boundary", "a b c d e f"),             # exactly w grams
        ("ties", "x x x x x x x x"),             # identical grams: rightmost wins
        ("mixed", "p q r s p q r s t u v"),      # repeats across windows
        ("longer", " ".join(f"t{i % 7}" for i in range(40))),
    ]
    df = spark.createDataFrame(docs, "id string, text string")
    got = {
        r.id: {(s.pos, s.fp) for s in r.sel}
        for r in df.select(
            "id", tokens(F.col("text")).alias("_t")
        )
        .select("id", kgram_hashes_of(F.col("_t"), K).alias("_g"))
        .select(
            "id",
            F.array_distinct(winnow_selections_of(F.col("_g"), W)).alias("sel"),
        )
        .collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == py_winnow(text), doc_id


def test_winnow_survives_single_token_insertion(spark):
    """The property winnowing buys over fixed-stride sampling: a one-
    token insertion near the front still leaves shared fingerprints for
    the long common run (guarantee: any shared run of >= w+k-1 tokens
    shares at least one selected fingerprint)."""
    from news_please_spark.functions.text import (
        kgram_hashes_of,
        tokens,
        winnow_selections_of,
    )

    base = " ".join(f"w{i}" for i in range(60))
    shifted = "INS " + base
    df = spark.createDataFrame(
        [("a", base), ("b", shifted)], "id string, text string"
    )
    rows = {
        r.id: {s.fp for s in r.sel}
        for r in df.select("id", tokens(F.col("text")).alias("_t"))
        .select("id", kgram_hashes_of(F.col("_t"), 5).alias("_g"))
        .select(
            "id",
            F.array_distinct(winnow_selections_of(F.col("_g"), 4)).alias("sel"),
        )
        .collect()
    }
    shared = rows["a"] & rows["b"]
    assert len(shared) >= 10, f"expected many shared fingerprints, got {len(shared)}"


def test_mojibake_counts(spark):
    from news_please_spark.functions.text import mojibake_counts
    import pyspark.sql.functions as F

    rows = [
        ("caf\u00c3\u00a9 and \u00c3\u00bcber", 2, 0, 0),  # latin block, twice
        ("it\u00e2\u20ac\u2122s \u00e2\u20ac\u0153quoted ok", 0, 2, 0),  # curly + left dquote
        ("\u00c2\u00a0lead and \u00c2\u00ab guillemet", 0, 0, 2),  # stray C2 (nbsp + guillemet)
        ("clean ascii text", 0, 0, 0),
        ("caf\u00e9 na\u00efve \u2014 real unicode is NOT damage", 0, 0, 0),
    ]
    df = spark.createDataFrame(
        [(t,) for t, *_ in rows], "text string"
    ).select("text", *mojibake_counts(F.col("text")))
    got = {r.text: (r.moji_latin, r.moji_punct, r.moji_c2) for r in df.collect()}
    for t, a, b, c in rows:
        assert got[t] == (a, b, c), (t, got[t])


def test_unwrap_text_dehyphenate_and_paragraphs(spark):
    from news_please_spark.functions.text import unwrap_text
    import pyspark.sql.functions as F

    cases = [
        ("exam-\nple text", "example text"),
        # interior hyphens survive; uppercase continuation untouched
        ("state-\nof-the-art", "stateof-the-art"),
        ("Müller-\nThurgau stays", "Müller-\nThurgau stays".replace("-\n", "- ").replace("- Th", "- Th")),
        ("hard\nwrapped\nprose", "hard wrapped prose"),
        ("para one\n\npara two", "para one\n\npara two"),
        ("a-\nb c\nd\n\ne", "ab c d\n\ne"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    got = {r.text: r.out for r in df.select("text", unwrap_text(F.col("text")).alias("out")).collect()}
    assert got["exam-\nple text"] == "example text"
    assert got["state-\nof-the-art"] == "stateof-the-art"
    # uppercase after break: hyphen kept, line unwrapped
    assert got["Müller-\nThurgau stays"] == "Müller- Thurgau stays"
    assert got["hard\nwrapped\nprose"] == "hard wrapped prose"
    assert got["para one\n\npara two"] == "para one\n\npara two"
    assert got["a-\nb c\nd\n\ne"] == "ab c d\n\ne"


def test_unwrap_text_alternating_short_lines(spark):
    """The paragraph-domain formulation handles alternating one-char
    lines (a sequential regexp replace would skip every other one)."""
    from news_please_spark.functions.text import unwrap_text
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("a\nb\nc\nd",), ("x\n\n\ny",)], "text string")
    got = {r.text: r.out for r in df.select(
        "text", unwrap_text(F.col("text")).alias("out")).collect()}
    assert got["a\nb\nc\nd"] == "a b c d"
    assert got["x\n\n\ny"] == "x\n\ny"  # 3+ blank-run collapses to one
