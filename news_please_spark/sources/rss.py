"""S7 — RSS feed source (reference crawler/spiders/rss_crawler.py:63-78:
page → <link type=application/rss+xml> → feed → //item/link + title).

Two vectorized steps:
  * discover_feed_urls: native regexp over fetched HTML pages,
  * parse_feeds: Arrow-batched pandas UDF running xml.etree per feed
    body, exploded to one row per item.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FEED_ITEM = T.ArrayType(
    T.StructType(
        [
            T.StructField("item_url", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("pub_date", T.StringType()),
            # pubDate run through the fuzzy date parser (the reference
            # pipes it through dateutil downstream; RSS pubDates are
            # RFC-2822 — 'Tue, 04 Mar 2021 05:06:07 GMT')
            T.StructField("pub_date_parsed", T.StringType()),
        ]
    )
)


def discover_feed_urls(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, html) → (url, feed_url) for pages advertising an RSS feed
    (reference url_extractor.py:223-236)."""
    feed = F.regexp_extract(
        F.col(html_col),
        r'<link[^>]*type=["\']application/rss\+xml["\'][^>]*href=["\']([^"\']+)["\']',
        1,
    )
    return pages.select("url", feed.alias("feed_url")).filter(
        F.col("feed_url") != ""
    )


@F.pandas_udf(_FEED_ITEM)
def _parse_feed_udf(body: pd.Series) -> pd.Series:
    import xml.etree.ElementTree as ET

    from news_please_spark.extraction.extract import _norm_date

    out = []
    for xml in body:
        items = []
        if xml:
            try:
                root = ET.fromstring(xml)
                for item in root.iter("item"):
                    link = item.findtext("link")
                    if not link:
                        continue
                    pub = (item.findtext("pubDate") or "").strip() or None
                    items.append(
                        {
                            "item_url": link.strip(),
                            "title": (item.findtext("title") or "").strip() or None,
                            "pub_date": pub,
                            "pub_date_parsed": _norm_date(pub),
                        }
                    )
            except ET.ParseError:
                pass
        out.append(items)
    return pd.Series(out)


def parse_feeds(feeds: DataFrame, body_col: str = "body") -> DataFrame:
    """(feed_url, body) → one row per feed item, feed order preserved in
    item_index."""
    parsed = feeds.select(
        "feed_url", F.posexplode(_parse_feed_udf(F.col(body_col))).alias("item_index", "it")
    )
    return parsed.select(
        "feed_url",
        F.col("it.item_url").alias("item_url"),
        F.col("it.title").alias("title"),
        F.col("it.pub_date").alias("pub_date"),
        F.to_timestamp(F.col("it.pub_date_parsed")).alias("pub_date_parsed"),
        F.col("item_index").cast("int").alias("item_index"),
    )
