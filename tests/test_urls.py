"""URL scalar functions (reference newsplease/helper_classes/url_extractor.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_please_spark.functions.urls import (
    canonical_host,
    canonical_url,
    subdomain,
    url_directory,
    url_filename,
    url_host,
    url_path,
)


def test_url_parts(spark):
    df = spark.createDataFrame(
        [
            ("https://www.Example.com/a/b/c.html?q=1#frag", "r1"),
            ("http://sub.news.example.org/", "r2"),
            ("https://example.com", "r3"),
            ("mailto:user@example.com", "r4"),
        ],
        "url string, id string",
    )
    rows = {
        r.id: r
        for r in df.select(
            "id",
            url_host(F.col("url")).alias("host"),
            url_path(F.col("url")).alias("path"),
            canonical_host(F.col("url")).alias("canon"),
            subdomain(F.col("url")).alias("sub"),
            url_directory(F.col("url")).alias("dir"),
            url_filename(F.col("url")).alias("fname"),
        ).collect()
    }
    assert rows["r1"].host == "www.Example.com"
    assert rows["r1"].path == "/a/b/c.html"
    assert rows["r1"].canon == "example.com"
    assert rows["r1"].dir == "/a/b/"
    assert rows["r1"].fname == "c.html"
    assert rows["r2"].canon == "sub.news.example.org"
    assert rows["r2"].sub == "sub.news"
    assert rows["r3"].path == "/"
    assert rows["r4"].host == ""  # not hierarchical


def test_redirect_canonical_keying(spark):
    # D4: reference pipelines.py:516-521 — store under first redirect source
    df = spark.createDataFrame(
        [
            ("https://www.a.com/x", None),
            ("https://b.com/final", "https://WWW.b.com/orig"),
        ],
        "url string, redirect_from string",
    )
    vals = [
        r[0]
        for r in df.select(
            canonical_url(F.col("url"), F.col("redirect_from"))
        ).collect()
    ]
    assert vals == ["https://a.com/x", "https://b.com/orig"]


def test_canonical_url_with_query(spark):
    from news_please_spark.functions.urls import canonical_url_with_query

    cases = [
        # tracking stripped, survivors sorted by kv text
        ("https://a.com/p?utm_source=x&b=2&a=1", "https://a.com/p?a=1&b=2"),
        # order-insensitive: same key as above
        ("https://a.com/p?b=2&a=1", "https://a.com/p?a=1&b=2"),
        # fragment dropped
        ("https://a.com/p?a=1#sec", "https://a.com/p?a=1"),
        # all-tracking query -> no '?'
        ("https://a.com/p?utm_medium=m&fbclid=f1&gclid=g&ref=tw", "https://a.com/p"),
        # no query, www + case canonicalized, path kept verbatim
        ("https://WWW.A.com/P/Q", "https://a.com/P/Q"),
        # bare host -> '/' path
        ("https://b.com?x=1", "https://b.com/?x=1"),
        # valueless parameter survives as its name
        ("https://a.com/p?flag&z=1", "https://a.com/p?flag&z=1"),
        # utm-PREFIXED only: 'utmost' is not a tracking param
        ("https://a.com/p?utmost=1", "https://a.com/p?utmost=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r[0]
        for r in df.select(canonical_url_with_query(F.col("url"))).collect()
    ]
    assert got == [want for _, want in cases]


def test_surt_key_rules(spark):
    """Every SURT rule against literal expected keys: lowercasing,
    www-strip, host reversal, default-port drop, non-default-port keep,
    fragment drop, query sort, empty-pair drop, missing path -> '/'."""
    from news_please_spark.functions.urls import surt_key

    cases = [
        ("HTTP://WWW.News.Example.com:80/Art/7?b=2&a=1#x",
         "com,example,news)/art/7?a=1&b=2"),
        ("https://news.example.com:443/a", "com,example,news)/a"),
        ("http://example.com:8080/a", "com,example:8080)/a"),
        ("https://m.news.example.com/a#frag", "com,example,news,m)/a"),
        ("http://example.com", "com,example)/"),
        ("http://example.com/a?&&x=1&", "com,example)/a?x=1"),
        ("http://example.com/a?", "com,example)/a"),
    ]
    df = spark.createDataFrame(
        [(u,) for u, _ in cases], "url string"
    ).select("url", surt_key(F.col("url")).alias("k"))
    got = {r.url: r.k for r in df.collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_surt_keys_sort_site_adjacent(spark):
    """The property SURT buys: one site's URLs (any subdomain/surface
    form) are a contiguous run under the plain string sort order, so a
    sort-ordered index table answers per-site range scans."""
    from news_please_spark.functions.urls import surt_key

    urls = [
        "http://a.example.com/2",
        "http://zoo.test/1",
        "http://www.example.com/1",
        "http://beta.test/9",
        "http://example.com/3",
        "http://b.example.com/0",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    ordered = [
        r.k
        for r in df.select(surt_key(F.col("url")).alias("k"))
        .orderBy("k")
        .collect()
    ]
    site_runs = ["".join("E" if k.startswith("com,example") else "o" for k in ordered)]
    assert "EoE" not in site_runs[0], ordered  # no interleaving
    assert site_runs[0].count("E") == 4


def test_canonical_link_of_markup_variants(spark):
    from news_please_spark.functions.urls import canonical_link_of
    from pyspark.sql import functions as F

    rows = [
        (0, '<head><link rel="canonical" href="https://c.test/a"/></head>'),
        (1, "<head><link href='https://c.test/b' rel='canonical'></head>"),
        (2, '<head><LINK REL="canonical" HREF="https://c.test/c" /></head>'),
        (3, '<head><link rel="stylesheet" href="https://x.test/s.css">'
            '<link rel="canonical" href="https://c.test/d"></head>'),
        (4, "<head><title>none</title></head>"),
        (5, '<head><link rel = "canonical" href = "https://c.test/e"></head>'),
        (6, '<head><link rel="canonical"></head>'),  # no href: NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r.doc_id: r.href
        for r in df.select("doc_id", canonical_link_of(F.col("html")).alias("href")).collect()
    }
    assert got == {
        0: "https://c.test/a",
        1: "https://c.test/b",
        2: "https://c.test/c",
        3: "https://c.test/d",
        4: None,
        5: "https://c.test/e",
        6: None,
    }
