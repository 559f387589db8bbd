"""Source connectors: sitemap recursion S6, RSS S7, GDELT S8,
URL file S10, WARC split S4, WARC index S5."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_please_spark.sources.flat import gdelt_urls, urls_from_file, warc_index
from news_please_spark.sources.rss import discover_feed_urls, parse_feeds
from news_please_spark.sources.sitemap import expand_sitemaps
from news_please_spark.sources.warc import split_warc_records, write_warc


def test_sitemap_recursive_expansion_with_cycle(spark):
    rows = [
        # root → child sitemap + 2 leaves
        ("https://s.com/sitemap.xml", "https://s.com/news.xml", True, 0),
        ("https://s.com/sitemap.xml", "https://s.com/a", False, 1),
        ("https://s.com/sitemap.xml", "https://s.com/b", False, 2),
        # child → leaf + CYCLE back to root + dup leaf /a
        ("https://s.com/news.xml", "https://s.com/c", False, 0),
        ("https://s.com/news.xml", "https://s.com/sitemap.xml", True, 1),
        ("https://s.com/news.xml", "https://s.com/a", False, 2),
    ]
    sm = spark.createDataFrame(
        rows, "sitemap_url string, entry_url string, is_sitemap boolean, entry_index int"
    )
    out = expand_sitemaps(sm, ["https://s.com/sitemap.xml"])
    got = {r.url: (r.depth, r.order_key) for r in out.collect()}
    assert set(got) == {"https://s.com/a", "https://s.com/b", "https://s.com/c"}
    assert got["https://s.com/a"][0] == 1           # first discovery wins
    assert got["https://s.com/c"][0] == 2
    # ordering: a(000000/000001) < b(000000/000002) < c(000000/000000/000000)
    assert got["https://s.com/a"][1] < got["https://s.com/b"][1]


def test_rss_discovery_and_parse(spark):
    pages = spark.createDataFrame(
        [
            ("https://n.com/", '<html><link rel="alternate" type="application/rss+xml" href="https://n.com/feed.xml"></html>'),
            ("https://x.com/", "<html>no feed here</html>"),
        ],
        "url string, html string",
    )
    feeds = discover_feed_urls(pages)
    assert [r.feed_url for r in feeds.collect()] == ["https://n.com/feed.xml"]

    xml = (
        "<rss><channel>"
        "<item><link>https://n.com/a1</link><title>T1</title>"
        "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
        "<item><link>https://n.com/a2</link><title>T2</title></item>"
        "<item><title>no link, dropped</title></item>"
        "</channel></rss>"
    )
    bodies = spark.createDataFrame(
        [("https://n.com/feed.xml", xml), ("https://bad.com/f", "not xml <<<")],
        "feed_url string, body string",
    )
    items = parse_feeds(bodies).collect()
    assert len(items) == 2
    assert items[0].item_url == "https://n.com/a1" and items[0].item_index == 0
    assert items[1].title == "T2" and items[1].item_index == 1
    # RFC-2822 pubDate is parsed to a real timestamp (reference pipes it
    # through dateutil); missing pubDate stays null
    assert str(items[0].pub_date_parsed) == "2024-01-01 00:00:00"
    assert items[1].pub_date_parsed is None


def test_gdelt_and_urlfile(spark, tmp_path):
    csv = tmp_path / "export.CSV"
    csv.write_text(
        "1\tx\thttps://a.com/1\n2\ty\thttps://a.com/2\n3\tz\thttps://a.com/1\n4\tw\tnot-a-url\n"
    )
    urls = sorted(r.url for r in gdelt_urls(spark, str(csv)).collect())
    assert urls == ["https://a.com/1", "https://a.com/2"]

    uf = tmp_path / "urls.txt"
    uf.write_text("https://b.com/x\n\n   \nhttps://b.com/y\n")
    got = sorted(r.url for r in urls_from_file(spark, str(uf)).collect())
    assert got == ["https://b.com/x", "https://b.com/y"]


def test_gdelt_zip_matches_csv_path(spark, tmp_path):
    """The export.CSV.zip shape the reference actually downloads
    (gdelt_crawler.py:54-71): zip → distinct URLs must equal the
    extracted-CSV path byte for byte."""
    import zipfile

    from news_please_spark.sources.flat import gdelt_urls_from_zip

    body = (
        "1\tx\thttps://a.com/1\n2\ty\thttps://a.com/2\n"
        "3\tz\thttps://a.com/1\n4\tw\tnot-a-url\n"
    )
    csv = tmp_path / "20240101.export.CSV"
    csv.write_text(body)
    zpath = tmp_path / "20240101.export.CSV.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("20240101.export.CSV", body)
        zf.writestr("README.txt", "not a csv")  # non-CSV members skipped

    via_zip = sorted(r.url for r in gdelt_urls_from_zip(spark, str(zpath)).collect())
    via_csv = sorted(r.url for r in gdelt_urls(spark, str(csv)).collect())
    assert via_zip == via_csv == ["https://a.com/1", "https://a.com/2"]


def test_warc_roundtrip(spark, tmp_path):
    p = str(tmp_path / "test-00001.warc.gz")
    write_warc(
        p,
        [
            ("https://w.com/ok", 200, "text/html; charset=utf-8", "<html>héllo</html>".encode()),
            ("https://w.com/gone", 404, "text/html", b"<html>404</html>"),
            ("https://w.com/latin", 200, "text/html", "caf\xe9".encode("latin-1")),
        ],
    )
    recs = split_warc_records(
        spark.read.format("binaryFile").load(p)
    ).orderBy("record_index").collect()
    assert len(recs) == 3
    assert recs[0].target_uri == "https://w.com/ok"
    assert recs[0].http_status == 200
    assert "héllo" in recs[0].body
    assert recs[1].http_status == 404
    assert recs[2].body == "café"  # latin-1 fallback (S3)


def test_warc_index_window_and_completed(spark):
    files = spark.createDataFrame(
        [
            ("s3://cc/CC-NEWS-20230101120000-00001.warc.gz",),
            ("s3://cc/CC-NEWS-20230215120000-00002.warc.gz",),
            ("s3://cc/CC-NEWS-20230401120000-00003.warc.gz",),
        ],
        "path string",
    )
    done = spark.createDataFrame(
        [("s3://cc/CC-NEWS-20230215120000-00002.warc.gz",)], "path string"
    )
    out = warc_index(files, "2023-02-01", "2023-12-31", completed=done)
    assert [r.path for r in out.collect()] == [
        "s3://cc/CC-NEWS-20230401120000-00003.warc.gz"
    ]


# --- sitemap XML parsing + robots.txt discovery -------------------------

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        xmlns:news="http://www.google.com/schemas/sitemap-news/0.9">
  <url>
    <loc>https://s.com/a</loc>
    <lastmod>2026-01-02</lastmod>
    <news:news>
      <news:title>Story A</news:title>
      <news:publication_date>2026-01-02T03:04:05Z</news:publication_date>
      <news:keywords>alpha, beta</news:keywords>
    </news:news>
  </url>
  <url><loc> https://s.com/b </loc></url>
  <url><lastmod>2026-01-03</lastmod></url>
</urlset>"""

_INDEX = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://s.com/news.xml</loc><lastmod>2026-02-01</lastmod></sitemap>
  <sitemap><loc>https://s.com/archive.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_xml_urlset_with_news_extension(spark):
    from news_please_spark.sources.sitemap import parse_sitemap_xml

    bodies = spark.createDataFrame(
        [("https://s.com/news.xml", _URLSET)], "sitemap_url string, body string"
    )
    rows = parse_sitemap_xml(bodies).orderBy("entry_index").collect()
    # the loc-less <url> is skipped (scrapy's parser requires loc)
    assert [r.entry_url for r in rows] == ["https://s.com/a", "https://s.com/b"]
    assert all(r.is_sitemap is False for r in rows)
    assert rows[0].lastmod == "2026-01-02"
    assert rows[0].news_title == "Story A"
    assert rows[0].news_pub_date == "2026-01-02T03:04:05Z"
    assert rows[0].news_keywords == "alpha, beta"
    assert rows[1].news_title is None and rows[1].lastmod is None
    assert [r.entry_index for r in rows] == [0, 1]


def test_parse_sitemap_xml_index_and_malformed(spark):
    from news_please_spark.sources.sitemap import parse_sitemap_xml

    bodies = spark.createDataFrame(
        [
            ("https://s.com/sitemap.xml", _INDEX),
            ("https://s.com/broken.xml", "<urlset><url><loc>x"),
            ("https://s.com/empty.xml", None),
        ],
        "sitemap_url string, body string",
    )
    rows = parse_sitemap_xml(bodies).orderBy("sitemap_url", "entry_index").collect()
    assert len(rows) == 2  # broken + empty yield nothing
    assert all(r.sitemap_url == "https://s.com/sitemap.xml" for r in rows)
    assert [r.entry_url for r in rows] == [
        "https://s.com/news.xml",
        "https://s.com/archive.xml",
    ]
    assert all(r.is_sitemap is True for r in rows)
    assert rows[0].lastmod == "2026-02-01"


def test_discover_sitemap_urls_from_robots(spark):
    from news_please_spark.sources.sitemap import discover_sitemap_urls

    robots = spark.createDataFrame(
        [
            (
                "https://s.com/robots.txt",
                "User-agent: *\nDisallow: /tmp\n"
                "Sitemap: https://s.com/sitemap.xml  \r\n"
                "sitemap-like: not a line\n"
                "Sitemap: https://s.com/news.xml # trailing comment\n",
            ),
            ("https://t.com/robots.txt", "User-agent: *\nDisallow:\n"),
        ],
        "url string, body string",
    )
    rows = discover_sitemap_urls(robots).orderBy("url", "line_index").collect()
    assert [(r.url, r.sitemap_url) for r in rows] == [
        ("https://s.com/robots.txt", "https://s.com/sitemap.xml"),
        ("https://s.com/robots.txt", "https://s.com/news.xml"),
    ]
    assert [r.line_index for r in rows] == [0, 1]


def test_sitemap_xml_to_expand_end_to_end(spark):
    """robots.txt → discover → parse XML bodies → recursive expansion:
    the full S6 chain over real XML."""
    from news_please_spark.sources.sitemap import (
        discover_sitemap_urls,
        expand_sitemaps,
        parse_sitemap_xml,
    )

    news = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>https://s.com/n1</loc></url>
      <url><loc>https://s.com/n2</loc></url>
    </urlset>"""
    robots = spark.createDataFrame(
        [("https://s.com/robots.txt", "Sitemap: https://s.com/sitemap.xml\n")],
        "url string, body string",
    )
    roots = [r.sitemap_url for r in discover_sitemap_urls(robots).collect()]
    bodies = spark.createDataFrame(
        [("https://s.com/sitemap.xml", _INDEX), ("https://s.com/news.xml", news)],
        "sitemap_url string, body string",
    )
    table = parse_sitemap_xml(bodies).select(
        "sitemap_url", "entry_url", "is_sitemap", "entry_index"
    )
    out = expand_sitemaps(table, roots, max_depth=4).orderBy("order_key").collect()
    assert [r.url for r in out] == ["https://s.com/n1", "https://s.com/n2"]
    assert [r.depth for r in out] == [2, 2]
