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


# ---------------------------------------------------------------------------
# cross-source contamination matrix


def _overlap_oracle(rows, n=3):
    """Quadratic python oracle: distinct lowercased n-gram shingles per
    source, pairwise intersections, integer Jaccard in basis points."""
    from collections import defaultdict
    from itertools import combinations

    per = defaultdict(set)
    for src, text in rows:
        toks = text.strip().lower().split()
        per[src] |= {
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
        }
    out = {}
    for a, b in combinations(sorted(per), 2):
        shared = len(per[a] & per[b])
        if shared:
            na, nb = len(per[a]), len(per[b])
            out[(a, b)] = (shared, na, nb, shared * 10000 // (na + nb - shared))
    return out


def test_source_overlap_matches_python_oracle(spark):
    from news_please_spark.operators.decontam import source_overlap

    rows = [
        ("wiki", "the quick brown fox jumps over the lazy dog"),
        ("wiki", "completely original encyclopedic sentence here"),
        ("news", "The QUICK brown fox JUMPS over a fence"),  # case-folds to overlap
        ("news", "breaking story with unique newsroom wording"),
        ("forum", "no tokens in common with anybody else whatsoever"),
        ("mirror", "the quick brown fox jumps over the lazy dog"),  # full dup of wiki
        ("tiny", "xy"),  # < n tokens: no shingles, never appears
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r.source_a, r.source_b): (r.shared_grams, r.grams_a, r.grams_b, r.jaccard_bp)
        for r in source_overlap(df, 3).collect()
    }
    assert got == _overlap_oracle(rows, 3)
    # the mirror source is a full copy of one wiki doc: its Jaccard vs
    # wiki must dominate every other wiki pairing
    wiki_pairs = {k: v for k, v in got.items() if "wiki" in k}
    assert max(wiki_pairs, key=lambda k: wiki_pairs[k][3]) == ("mirror", "wiki")
    assert all(v[3] <= 10000 for v in got.values())


def test_source_overlap_never_self_joins_corpus(spark):
    """Plan contract: the document table is scanned, hashed, and
    reduced to (gram, source) — no corpus-side self-join; the only
    joins are the two broadcast totals joins (|sources| rows)."""
    from news_please_spark.operators.decontam import source_overlap

    rows = [("a", "one two three four"), ("b", "two three four five")]
    df = spark.createDataFrame(rows, "source string, text string")
    plan = source_overlap(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("BroadcastHashJoin") == 2


# ---------------------------------------------------------------------------
# contamination span expansion


def _py_spans(corpus_rows, bench_rows, n):
    def grams(text):
        toks = text.lower().split()
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    bench = {g for _, t in bench_rows for g in grams(t)}
    out = set()
    for did, t in corpus_rows:
        pos = [i + 1 for i, g in enumerate(grams(t)) if g in bench]
        if not pos:
            continue
        start = prev = pos[0]
        cnt = 1
        for p in pos[1:]:
            if p - prev > n:
                out.add((did, start, prev + n - 1, prev - start + n, cnt))
                start, cnt = p, 0
            prev = p
            cnt += 1
        out.add((did, start, prev + n - 1, prev - start + n, cnt))
    return out


def test_contamination_spans_matches_python(spark):
    from news_please_spark.operators.decontam import contamination_spans

    bench = [(100, "alpha beta gamma delta epsilon zeta")]
    corpus = [
        # two disjoint matches separated by > n tokens -> two spans
        (1, "alpha beta gamma x1 x2 x3 x4 x5 alpha beta gamma y"),
        # overlapping matches -> one merged span
        (2, "q alpha beta gamma delta r s"),
        # full containment of the bench text -> one long span
        (3, "pre alpha beta gamma delta epsilon zeta post"),
        # no overlap at all -> no rows
        (4, "totally unrelated words only here nothing shared"),
        # adjacent windows exactly n apart -> merged (touching)
        (5, "alpha beta gamma a b c beta gamma delta"),
    ]
    n = 3
    df_c = spark.createDataFrame(corpus, "doc_id long, text string")
    df_b = spark.createDataFrame(bench, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_grams)
        for r in contamination_spans(df_c, df_b, n=n).collect()
    }
    assert got == _py_spans(corpus, bench, n)
    assert not any(d == 4 for d, *_ in got)


def test_contamination_spans_plan_broadcasts_bench(spark):
    from news_please_spark.operators.decontam import contamination_spans

    df_c = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    df_b = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    plan = (
        contamination_spans(df_c, df_b, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only join is the broadcast semi against bench grams; the
    # corpus never sort-merge-joins
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1
