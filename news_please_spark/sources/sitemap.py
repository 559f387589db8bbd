"""S6 — recursive sitemap expansion as an iterative DataFrame loop
(reference: scrapy SitemapSpider recursion in
crawler/spiders/recursive_sitemap_crawler.py:10-79 + sitemap discovery
from robots.txt `Sitemap:` lines, helper_classes/url_extractor.py:98-220).

Input model: a `sitemaps` table (sitemap_url, entry_url, is_sitemap,
entry_index) — the parsed form of sitemap XML (the XML→rows step is the
rss.py-style pandas UDF; here the tree walk itself is the operator).
Each wave: join the open sitemap set against the table, split entries
into nested sitemaps (anti-joined against visited — sitemap graphs have
cycles in the wild) vs leaf URLs. Leaf ordering is deterministic:
(depth, parent discovery order, entry_index)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Above this many open/visited sitemap URLs, stop broadcasting and let the
# join shuffle: 2M rows of sitemap-index-grain strings is ~150 MB serialized,
# the ceiling of a comfortable broadcast. Real sitemap trees are far below
# this (a large site has 10^3-10^5 sitemap FILES even at 10^8 leaf entries).
_BROADCAST_MAX_SITEMAPS = 2_000_000


def expand_sitemaps(
    sitemaps: DataFrame, roots: list[str], max_depth: int = 16
) -> DataFrame:
    """Returns (url, depth, order_key) for every leaf URL reachable from
    the root sitemaps; order_key is lexicographic-by-level.

    Scale shape: the per-level join is statistics-routed — the frontier
    and visited sets are sitemap-index grain (orders of magnitude below
    leaf-entry grain) and the loop holds their exact counts driver-side,
    so while they fit they are broadcast and every level is a map-side
    join against the big ENTRIES table (zero shuffles of it, scan stays
    in place); past the ceiling the joins fall back to shuffles."""
    spark = sitemaps.sparkSession
    frontier = spark.createDataFrame(
        [(u, 0, str(i).zfill(6)) for i, u in enumerate(sorted(roots))],
        "sitemap_url string, depth int, okey string",
    )
    visited = frontier.select("sitemap_url")
    visited_n = len(roots)
    leaves = None
    depth = 0
    pending = len(roots)
    while depth < max_depth:
        if pending == 0:
            break
        build = (
            F.broadcast(frontier)
            if pending <= _BROADCAST_MAX_SITEMAPS
            else frontier
        )
        joined = build.join(sitemaps, "sitemap_url").select(
            "entry_url",
            "is_sitemap",
            (F.col("depth") + 1).alias("depth"),
            F.concat(
                F.col("okey"), F.lit("/"), F.lpad(F.col("entry_index").cast("string"), 6, "0")
            ).alias("okey"),
        )
        new_leaves = joined.filter(~F.col("is_sitemap")).select(
            F.col("entry_url").alias("url"), "depth", F.col("okey").alias("order_key")
        )
        leaves = new_leaves if leaves is None else leaves.unionByName(new_leaves)
        nested = (
            joined.filter(F.col("is_sitemap"))
            .select(F.col("entry_url").alias("sitemap_url"), "depth", "okey")
            .groupBy("sitemap_url")
            .agg(F.min(F.struct("depth", "okey")).alias("m"))  # BFS: level first
            .select("sitemap_url", F.col("m.depth").alias("depth"), F.col("m.okey").alias("okey"))
            .join(
                F.broadcast(visited)
                if visited_n <= _BROADCAST_MAX_SITEMAPS
                else visited,
                "sitemap_url",
                "left_anti",
            )
        )
        frontier = nested.localCheckpoint(eager=True)
        # count on the just-checkpointed blocks is near-free and replaces
        # next iteration's isEmpty() job (one fewer driver round-trip
        # per level — iterative operators pay fixed job overhead per
        # level in local mode, and one job per wave at cluster scale)
        pending = frontier.count()
        # visited needs no checkpoint of its own: it is a union of
        # ALREADY-checkpointed frontiers, so its lineage stays one
        # union node per level over materialized leaves — no
        # exponential plan growth, and one fewer eager job per level
        visited = visited.unionByName(frontier.select("sitemap_url"))
        visited_n += pending
        depth += 1
    if leaves is None:
        return spark.createDataFrame([], "url string, depth int, order_key string")
    # one URL can appear in several sitemaps — keep the first by BFS order
    return (
        leaves.groupBy("url")
        .agg(F.min(F.struct("depth", "order_key")).alias("m"))
        .select("url", F.col("m.depth").alias("depth"), F.col("m.order_key").alias("order_key"))
    )


# --------------------------------------------------------------------------
# XML → rows (the step the tree walk above consumes) + robots.txt discovery
# --------------------------------------------------------------------------

_SITEMAP_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
_NEWS_NS = "{http://www.google.com/schemas/sitemap-news/0.9}"

_SITEMAP_ENTRY = "array<struct<entry_url:string,is_sitemap:boolean,lastmod:string,news_title:string,news_pub_date:string,news_keywords:string>>"


def discover_sitemap_urls(robots: DataFrame, body_col: str = "body") -> DataFrame:
    """(url, body) of fetched robots.txt files → (url, sitemap_url,
    line_index), one row per `Sitemap:` line in file order (reference
    helper_classes/url_extractor.py:31 `re_sitemap` — scrapy's
    SitemapSpider feeds these into the recursive walk).

    Pure native plan: regexp_extract_all + posexplode, zero shuffle,
    rides the scan at any corpus size."""
    lines = F.regexp_extract_all(F.col(body_col), F.lit(r"Sitemap:\s([^\r\n#]*)"), 1)
    return (
        robots.select("url", F.posexplode(lines).alias("line_index", "sitemap_url"))
        .select("url", F.trim("sitemap_url").alias("sitemap_url"), F.col("line_index").cast("int"))
        .filter(F.col("sitemap_url") != "")
    )


def parse_sitemap_xml(bodies: DataFrame, url_col: str = "sitemap_url", body_col: str = "body") -> DataFrame:
    """(sitemap_url, body) of fetched sitemap XML → the `sitemaps` table
    expand_sitemaps consumes: (sitemap_url, entry_url, is_sitemap,
    entry_index) plus lastmod and the Google News extension columns
    (news_title, news_pub_date, news_keywords) that the reference's
    SitemapSpider sees via scrapy's sitemap parser
    (crawler/spiders/recursive_sitemap_crawler.py:10-79; news extension
    namespace http://www.google.com/schemas/sitemap-news/0.9).

    Arrow-batched pandas UDF (one xml.etree parse per sitemap FILE — the
    per-row unit is a whole file, never a per-entry Python loop across
    rows), exploded to one row per <url>/<sitemap> entry in document
    order. A <sitemapindex> root yields is_sitemap=true rows, a <urlset>
    root is_sitemap=false; malformed XML yields zero rows (scrapy's
    sitemap parser likewise skips unparseable documents)."""
    @F.pandas_udf(_SITEMAP_ENTRY)
    def _parse(body: pd.Series) -> pd.Series:
        import xml.etree.ElementTree as ET

        out = []
        for xml in body:
            entries = []
            if xml:
                try:
                    root = ET.fromstring(xml)
                    tag = root.tag
                    is_index = tag.endswith("sitemapindex")
                    child_tag = (
                        (_SITEMAP_NS if tag.startswith(_SITEMAP_NS) else "")
                        + ("sitemap" if is_index else "url")
                    )
                    loc_tag = (_SITEMAP_NS if tag.startswith(_SITEMAP_NS) else "") + "loc"
                    mod_tag = (_SITEMAP_NS if tag.startswith(_SITEMAP_NS) else "") + "lastmod"
                    for el in root.iter(child_tag):
                        loc = el.findtext(loc_tag)
                        if not loc or not loc.strip():
                            continue
                        news = el.find(_NEWS_NS + "news")
                        entries.append(
                            {
                                "entry_url": loc.strip(),
                                "is_sitemap": is_index,
                                "lastmod": (el.findtext(mod_tag) or "").strip() or None,
                                "news_title": (
                                    news.findtext(_NEWS_NS + "title").strip()
                                    if news is not None and news.findtext(_NEWS_NS + "title")
                                    else None
                                ),
                                "news_pub_date": (
                                    news.findtext(_NEWS_NS + "publication_date").strip()
                                    if news is not None
                                    and news.findtext(_NEWS_NS + "publication_date")
                                    else None
                                ),
                                "news_keywords": (
                                    news.findtext(_NEWS_NS + "keywords").strip()
                                    if news is not None and news.findtext(_NEWS_NS + "keywords")
                                    else None
                                ),
                            }
                        )
                except ET.ParseError:
                    pass
            out.append(entries)
        return pd.Series(out)

    parsed = bodies.select(
        F.col(url_col).alias("sitemap_url"),
        F.posexplode(_parse(F.col(body_col))).alias("entry_index", "e"),
    )
    return parsed.select(
        "sitemap_url",
        F.col("e.entry_url").alias("entry_url"),
        F.col("e.is_sitemap").alias("is_sitemap"),
        F.col("entry_index").cast("int").alias("entry_index"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.news_title").alias("news_title"),
        F.col("e.news_pub_date").alias("news_pub_date"),
        F.col("e.news_keywords").alias("news_keywords"),
    )
