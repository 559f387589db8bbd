"""Benchmark decontamination + PII redaction vs pure-Python oracles."""

import re

from pyspark.sql import functions as F

from news_please_spark.operators.decontam import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    contamination,
    decontaminate,
    redact_pii,
)

BENCH = [
    (100, "the quick brown fox jumps over the lazy dog today"),
    (101, "one two three four five six seven eight nine ten"),
]
CORPUS = [
    # exact copy of bench 100 (fully contaminated)
    (0, "the quick brown fox jumps over the lazy dog today"),
    # bench 100 with a trailer (shares all of 100's 8-grams)
    (1, "the quick brown fox jumps over the lazy dog today extra tail"),
    # clean doc, long enough to have 8-grams
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # too short for any 8-gram: can never be flagged
    (3, "just a few words"),
    # shares a 7-gram but not an 8-gram with bench 100
    (4, "quick brown fox jumps over the lazy cat entirely different end"),
]


def _py_grams8(text):
    toks = text.strip().lower().split()
    return {" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)}


def _dfs(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    return corpus, bench


def test_contamination_matches_python(spark):
    corpus, bench = _dfs(spark)
    got = {
        r["doc_id"]: r["n_hits"]
        for r in contamination(corpus, bench).collect()
    }
    bg = set().union(*(_py_grams8(t) for _, t in BENCH))
    want = {}
    for d, t in CORPUS:
        hits = len(_py_grams8(t) & bg)
        if hits:
            want[d] = hits
    assert got == want
    assert 0 in got and 1 in got          # copy + superset both flagged
    assert 2 not in got and 3 not in got and 4 not in got


def test_decontaminate_drops_exactly_the_flagged(spark):
    corpus, bench = _dfs(spark)
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench).collect()
    )
    assert kept == [2, 3, 4]


def test_contamination_plan_broadcasts_bench_not_corpus(spark):
    corpus, bench = _dfs(spark)
    plan = (
        contamination(corpus, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_redact_pii_matches_python(spark):
    rows = [
        (0, "write to jane.doe+x@example.co.uk or call +1 555-0100-123"),
        (1, "server at 10.0.255.7 and 192.168.1.1; not 1234.5.6.7 dotted"),
        (2, "no pii here at all"),
        (3, "a@b.io a@b.io twice, ip 8.8.8.8, phone +49 30-1234-567"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    for d, t in rows:
        clean = t
        counts = {}
        for kind, pat in (("email", EMAIL_RE), ("ip", IPV4_RE), ("phone", PHONE_RE)):
            counts[kind] = len(re.findall(pat, clean))
            clean = re.sub(pat, f"<{kind.upper()}>", clean)
        r = got[d]
        assert (r["n_email"], r["n_ip"], r["n_phone"]) == (
            counts["email"], counts["ip"], counts["phone"]
        ), d
        assert r["clean_text"] == clean, d
    # spot-check absolute expectations, not just oracle agreement
    assert got[2]["clean_text"] == "no pii here at all"
    assert got[3]["n_email"] == 2 and got[3]["n_ip"] == 1 and got[3]["n_phone"] == 1


def test_redact_pii_is_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "a@b.io")], "doc_id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
