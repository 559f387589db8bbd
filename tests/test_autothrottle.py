"""autothrottle_update (operators/ordering.py) + ccnet_buckets
(operators/quality.py) vs from-scratch pure-Python references."""

from __future__ import annotations

from news_please_spark.operators.ordering import autothrottle_update
from news_please_spark.operators.quality import ccnet_buckets

METRICS = [
    # (host, latency_ms, ok)
    ("a", 400, True),
    ("a", 600, True),
    ("a", 100, False),   # error: delay must not decrease
    ("b", 200, True),
    ("b", 300, True),
    ("c", 900, False),   # all-errors host: keeps prev
    ("d", 80, True),     # fast host: clamps at min
]
PREV = [("a", 700), ("c", 450), ("e", 3000)]  # e silent this cycle


def py_autothrottle(metrics, prev, c, start, lo, hi):
    hosts = {h for h, _, _ in metrics} | {h for h, _ in prev}
    pm = dict(prev)
    out = {}
    for h in hosts:
        oks = [l for hh, l, ok in metrics if hh == h and ok]
        bads = [l for hh, l, ok in metrics if hh == h and not ok]
        p = pm.get(h, start)
        avg = sum(oks) // len(oks) if oks else None
        if not oks:
            new = p
        else:
            cand = (p + avg // c) // 2
            new = max(cand, p) if bads else cand
        out[h] = (len(oks), len(bads), avg, max(lo, min(hi, new)))
    return out


def test_autothrottle_matches_python(spark):
    m = spark.createDataFrame(METRICS, "host string, latency_ms long, ok boolean")
    p = spark.createDataFrame(PREV, "host string, delay_ms long")
    got = {
        r.host: (r.n_ok, r.n_bad, r.avg_ok_ms, r.new_delay_ms)
        for r in autothrottle_update(
            m, p, target_concurrency=2, start_delay_ms=1000,
            min_delay_ms=100, max_delay_ms=5000,
        ).collect()
    }
    assert got == py_autothrottle(METRICS, PREV, 2, 1000, 100, 5000)


def test_autothrottle_semantics_pins(spark):
    m = spark.createDataFrame(METRICS, "host string, latency_ms long, ok boolean")
    p = spark.createDataFrame(PREV, "host string, delay_ms long")
    got = {
        r.host: r.new_delay_ms
        for r in autothrottle_update(
            m, p, target_concurrency=2, start_delay_ms=1000,
            min_delay_ms=100, max_delay_ms=5000,
        ).collect()
    }
    # a: avg=500, cand=(700+250)//2=475 but errors present -> stays 700
    assert got["a"] == 700
    # b: no prev -> start 1000; avg=250, cand=(1000+125)//2=562, no errors
    assert got["b"] == 562
    # c: no OK responses -> keeps prev 450
    assert got["c"] == 450
    # d: avg=80, cand=(1000+40)//2=520 -> no clamp; with hi=300 it would
    got2 = {
        r.host: r.new_delay_ms
        for r in autothrottle_update(
            m, p, target_concurrency=2, start_delay_ms=1000,
            min_delay_ms=600, max_delay_ms=650,
        ).collect()
    }
    assert got2["b"] == 600 and got2["a"] == 650  # both clamps fire
    # e: silent host keeps prev (clamped)
    assert got["e"] == 3000


def test_autothrottle_no_prev_table(spark):
    m = spark.createDataFrame(METRICS, "host string, latency_ms long, ok boolean")
    got = {
        r.host: r.new_delay_ms
        for r in autothrottle_update(m, None, target_concurrency=1,
                                     start_delay_ms=400).collect()
    }
    # a: avg=500, errors -> max((400+500)//2, 400)=450
    assert got["a"] == 450
    assert set(got) == {"a", "b", "c", "d"}


DOCS = [
    # lang X: clearly separable fluency levels; repetitive bigrams score high
    (1, "x", "the cat sat on the mat and the cat sat again"),
    (2, "x", "the cat sat on the mat and the cat sat again"),
    (3, "x", "cat the on sat mat plus random words here now"),
    (4, "x", "zz qq ww ee rr tt yy uu ii oo pp aa"),
    (5, "y", "alpha beta alpha beta alpha beta alpha beta"),
    (6, "y", "alpha gamma delta beta omega phi chi psi"),
    (7, "y", "one two three four five six seven eight"),
]


def test_ccnet_buckets_properties(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    out = ccnet_buckets(df).collect()
    by_id = {r.doc_id: r for r in out}
    # every scored doc gets a bucket; langs preserved
    assert set(by_id) == {1, 2, 3, 4, 5, 6, 7}
    assert {r.bucket for r in out} <= {"head", "middle", "tail"}
    # per-lang: bucket boundaries respect score ordering — no tail doc
    # may outscore a head doc within the same language
    for lang in ("x", "y"):
        rows = [r for r in out if r.lang == lang]
        heads = [r.score for r in rows if r.bucket == "head"]
        tails = [r.score for r in rows if r.bucket == "tail"]
        if heads and tails:
            assert min(heads) > max(tails)
    # self-trained caveat pinned (lm_doc_scores docstring): the all-
    # singleton doc has deterministic transitions and tops lang x
    assert by_id[4].bucket == "head"
    assert by_id[1].bucket == by_id[2].bucket  # identical docs, same bucket


def test_ccnet_buckets_reference_model_oov_is_tail(spark):
    """CCNet proper: LM trained on a trusted corpus; out-of-model
    bigrams score 0, so fully-OOV junk lands in tail, never head."""
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    model = spark.createDataFrame(
        [(100, "the cat sat on the mat and the cat sat again")],
        "doc_id long, text string",
    )
    out = ccnet_buckets(df, model_docs=model).collect()
    by_id = {r.doc_id: r for r in out}
    assert set(by_id) == {1, 2, 3, 4, 5, 6, 7}
    # in-model fluent docs outscore the shuffled-word and junk docs
    assert by_id[1].score > by_id[3].score
    assert by_id[4].score == 0 and by_id[4].bucket == "tail"
    assert by_id[1].bucket in ("head", "middle")


def test_ccnet_buckets_partitioning_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    a = sorted(tuple(r) for r in ccnet_buckets(df).collect())
    b = sorted(tuple(r) for r in ccnet_buckets(df.repartition(5)).collect())
    assert a == b
