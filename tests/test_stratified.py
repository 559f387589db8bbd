"""priority_sample_per_group (operators/sampling.py) + sitemap_stale
(operators/recrawl.py) vs pure-Python references."""

from __future__ import annotations

import hashlib

from news_please_spark.operators.recrawl import sitemap_stale
from news_please_spark.operators.sampling import priority_sample_per_group


def py_priority(doc_id, w):
    u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) + 1
    return (max(w or 1, 1) << 32) // u


def py_sample_per_group(rows, k):
    out = []
    groups: dict[str, list] = {}
    for g, i, w in rows:
        groups.setdefault(g, []).append((i, max(w or 1, 1)))
    for g, items in groups.items():
        scored = sorted(
            ((py_priority(i, w), i, w) for i, w in items),
            key=lambda t: (-t[0], t[1]),
        )
        tau = scored[k][0] if len(scored) > k else 0
        for rk, (q, i, w) in enumerate(scored[:k], 1):
            out.append((g, i, w, q, rk, max(w, tau)))
    return sorted(out)


ROWS = [("s1", i, 10 + (i * 37) % 90) for i in range(40)] + [
    ("s2", 100 + i, 5) for i in range(3)  # group smaller than k
] + [("s3", 200, None)]  # null weight clamps to 1


def test_stratified_sample_matches_python(spark):
    df = spark.createDataFrame(ROWS, "source string, doc_id long, w long")
    got = sorted(
        tuple(r)
        for r in priority_sample_per_group(
            df, "w", 5, "source", id_col="doc_id"
        ).collect()
    )
    assert got == py_sample_per_group(ROWS, 5)


def test_stratified_sample_small_group_keeps_all_exact_weights(spark):
    df = spark.createDataFrame(ROWS, "source string, doc_id long, w long")
    out = priority_sample_per_group(df, "w", 5, "source").collect()
    s2 = [r for r in out if r.source == "s2"]
    assert len(s2) == 3  # fewer rows than k: all kept
    assert all(r.w_est == r.w for r in s2)  # tau=0 -> exact weights
    s3 = [r for r in out if r.source == "s3"]
    assert s3[0].w == 1  # null weight clamped


def test_stratified_sample_partitioning_and_salt_invariance(spark):
    df = spark.createDataFrame(ROWS, "source string, doc_id long, w long")
    a = sorted(tuple(r) for r in priority_sample_per_group(df, "w", 4, "source").collect())
    b = sorted(
        tuple(r)
        for r in priority_sample_per_group(
            df.repartition(9), "w", 4, "source", salt_buckets=3
        ).collect()
    )
    c = sorted(
        tuple(r)
        for r in priority_sample_per_group(
            df.coalesce(1), "w", 4, "source", salt_buckets=1
        ).collect()
    )
    assert a == b == c


SITEMAP = [
    ("u1", 1000),   # stale (fetched at 900)
    ("u2", 800),    # fresh (fetched at 900) -> dropped
    ("u3", 700),    # new (never fetched)
    ("u4", None),   # nolastmod (fetched)
    ("u5", None),   # new AND nolastmod -> 'new' wins (never fetched)
]
FETCHLOG = [("u1", 900), ("u2", 900), ("u4", 500), ("u9", 100)]


def test_sitemap_stale_semantics(spark):
    s = spark.createDataFrame(SITEMAP, "url string, lastmod_us long")
    f = spark.createDataFrame(FETCHLOG, "url string, fetched_us long")
    got = {r.url: r.reason for r in sitemap_stale(s, f).collect()}
    assert got == {"u1": "stale", "u3": "new", "u4": "nolastmod", "u5": "new"}
    # u9 is log-only (not in the sitemap) and must not appear


def test_sitemap_stale_bootstrap_no_log(spark):
    s = spark.createDataFrame(SITEMAP, "url string, lastmod_us long")
    got = {r.url: r.reason for r in sitemap_stale(s, None).collect()}
    assert got == {
        "u1": "new", "u2": "new", "u3": "new",
        "u4": "nolastmod", "u5": "nolastmod",
    }


def test_sitemap_stale_equal_timestamps_are_fresh(spark):
    s = spark.createDataFrame([("u", 500)], "url string, lastmod_us long")
    f = spark.createDataFrame([("u", 500)], "url string, fetched_us long")
    assert sitemap_stale(s, f).count() == 0
