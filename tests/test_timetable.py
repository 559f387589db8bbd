"""fetch_timetable (operators/ordering.py) + media_dedup
(operators/spans.py) vs from-scratch pure-Python references."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_please_spark.operators.ordering import fetch_timetable
from news_please_spark.operators.spans import media_dedup

URLS = [
    # (host, url, priority)
    ("a.com", "https://a.com/1", 2),
    ("a.com", "https://a.com/2", 1),
    ("a.com", "https://a.com/3", 1),
    ("b.com", "https://b.com/x", 5),
    ("b.com", "https://b.com/y", 5),
    ("c.com", "https://c.com/only", 0),
]
DELAYS = [("a.com", 10), ("c.com", -3)]  # b.com uses the default


def py_timetable(urls, delays, default, start):
    dm = {h: max(d, 0) for h, d in delays}
    out = []
    by_host: dict[str, list] = {}
    for h, u, p in urls:
        by_host.setdefault(h, []).append((p, u))
    for h, rows in by_host.items():
        d = dm.get(h, default)
        for slot, (p, u) in enumerate(sorted(rows)):
            out.append((h, u, p, slot, start + slot * d))
    return sorted(out)


def test_fetch_timetable_matches_python(spark):
    u = spark.createDataFrame(URLS, "host string, url string, priority long")
    d = spark.createDataFrame(DELAYS, "host string, crawl_delay_s long")
    got = sorted(
        tuple(r)
        for r in fetch_timetable(
            u, d, default_delay_s=7, start_epoch=100
        ).collect()
    )
    assert got == py_timetable(URLS, DELAYS, 7, 100)


def test_fetch_timetable_no_delay_table(spark):
    u = spark.createDataFrame(URLS, "host string, url string, priority long")
    got = sorted(
        tuple(r) for r in fetch_timetable(u, None, default_delay_s=3).collect()
    )
    assert got == py_timetable(URLS, [], 3, 0)


def test_fetch_timetable_negative_delay_clamps(spark):
    # c.com declares -3: clamped to 0, both slots fire at start_epoch
    u = spark.createDataFrame(
        [("c.com", "https://c.com/a", 0), ("c.com", "https://c.com/b", 0)],
        "host string, url string, priority long",
    )
    d = spark.createDataFrame(DELAYS, "host string, crawl_delay_s long")
    rows = fetch_timetable(u, d, start_epoch=50).collect()
    assert sorted(r.fetch_epoch for r in rows) == [50, 50]
    assert sorted(r.slot for r in rows) == [0, 1]


def test_fetch_timetable_partitioning_invariance(spark):
    u = spark.createDataFrame(URLS, "host string, url string, priority long")
    d = spark.createDataFrame(DELAYS, "host string, crawl_delay_s long")
    a = sorted(tuple(r) for r in fetch_timetable(u, d).collect())
    b = sorted(
        tuple(r) for r in fetch_timetable(u.repartition(7), d.coalesce(1)).collect()
    )
    assert a == b


SPANS = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def _doc(doc_id, media):
    # media: list of (ref, offset); one text span so kind-mix is real
    spans = [("text", "hello world", None, 0)] + [
        ("image", None, ref, off) for ref, off in media
    ]
    return (doc_id, spans)


def test_media_dedup_matches_python(spark):
    rows = [
        _doc(1, [("logo", 5), ("pic1", 9)]),
        _doc(2, [("logo", 1)]),
        _doc(3, [("logo", 2), ("pic1", 3), ("pic1", 7)]),
        _doc(4, []),
    ]
    df = spark.createDataFrame(rows, f"doc_id long, spans {SPANS}")
    got = {
        r.media_key: (r.n_docs, r.n_spans, r.canonical_doc, r.canonical_offset)
        for r in media_dedup(df, content_key=lambda c: c, min_docs=1).collect()
    }
    # canonical = lexicographically smallest (doc, offset) occurrence
    assert got == {
        "logo": (3, 3, 1, 5),
        "pic1": (2, 3, 1, 9),
    }
    dups_only = media_dedup(df, content_key=lambda c: c, min_docs=2)
    assert {r.media_key for r in dups_only.collect()} == {"logo", "pic1"}


def test_media_dedup_min_docs_filters_singletons(spark):
    rows = [_doc(1, [("solo", 4)]), _doc(2, [("dup", 1)]), _doc(3, [("dup", 2)])]
    df = spark.createDataFrame(rows, f"doc_id long, spans {SPANS}")
    out = media_dedup(df, content_key=lambda c: c, min_docs=2).collect()
    assert [(r.media_key, r.n_docs, r.canonical_doc) for r in out] == [
        ("dup", 2, 2)
    ]


def test_media_dedup_ignores_text_spans(spark):
    # a text span whose text happens to collide with a ref must not count
    rows = [
        (1, [("text", "logo", None, 0), ("image", None, "logo", 1)]),
        (2, [("image", None, "logo", 0)]),
    ]
    df = spark.createDataFrame(rows, f"doc_id long, spans {SPANS}")
    out = media_dedup(df, content_key=lambda c: c).collect()
    assert [(r.media_key, r.n_docs, r.n_spans) for r in out] == [("logo", 2, 2)]


def test_fetch_timetable_single_shuffle_for_window(spark):
    """The slot window must reuse the delays join's host partitioning:
    no more than 2 Exchanges total (one per join side), none between
    the join and the window."""
    u = spark.createDataFrame(URLS, "host string, url string, priority long")
    d = spark.createDataFrame(DELAYS, "host string, crawl_delay_s long")
    plan = fetch_timetable(u, d)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan
