"""O5 crawler fallback chain + H7 heuristic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_please_spark.extraction.heuristics import pass_heuristics
from news_please_spark.sources.dispatch import choose_crawler, probes_from_tables


def test_fallback_chain():
    probes = probes_from_tables(
        "https://news.example.com/",
        sitemap_roots=set(),
        rss_feeds_of={},
    )
    # nothing supported → falls all the way to RecursiveCrawler
    assert choose_crawler("RssCrawler", probes) == "RecursiveCrawler"

    probes = probes_from_tables(
        "https://news.example.com/",
        sitemap_roots={"https://news.example.com/sitemap.xml"},
        rss_feeds_of={},
    )
    assert choose_crawler("RssCrawler", probes) == "SitemapCrawler"
    assert choose_crawler("SitemapCrawler", probes) == "SitemapCrawler"

    probes = probes_from_tables(
        "https://news.example.com/",
        rss_feeds_of={"news.example.com": "https://news.example.com/feed"},
    )
    assert choose_crawler("RssCrawler", probes) == "RssCrawler"


def test_fallback_loop_detection():
    looped = {"A": "B", "B": "A"}
    with pytest.raises(ValueError, match="fallback loop"):
        choose_crawler("A", {"A": lambda: False, "B": lambda: False}, looped)


def test_h7_main_content_ratio(spark):
    html_ok = (
        "<html><head><meta property='og:type' content='article'></head><body>"
        + "".join(f"<h2><a href='https://x.com/{i}'>s{i}</a></h2>" for i in range(8))
        + "<article><h2>inner</h2><p>text</p></article></body></html>"
    )
    df = spark.createDataFrame([("https://x.com/a", html_ok)], "url string, html string")
    row = df.select(
        pass_heuristics(
            F.col("html"), F.col("url"),
            condition="og_type and main_content_linked_headlines",
            comparators={"main_content_linked_headlines": "<=0.5"},
        ).alias("ok")
    ).first()
    # article block has 1 headline (<5) → ratio 0.0 → passes even though
    # the page chrome is all linked headlines
    assert row.ok is True
