"""O5 — crawler selection with fallback chain (reference
newsplease/single_crawler.py:189-238 `get_crawler`/`supports_site` and
the fallback map in config/config.cfg:32-38).

Driver-side control flow by design (one decision per seed — plain
Python, per SURVEY.md §2.7 O5); the capability probes are cheap
set-membership checks against the already-ingested source tables
instead of network round-trips.
"""

from __future__ import annotations

from collections.abc import Callable

# reference fallback map (config.cfg:32-38): crawler → try-next
DEFAULT_FALLBACK: dict[str, str | None] = {
    "RssCrawler": "SitemapCrawler",
    "SitemapCrawler": "RecursiveSitemapCrawler",
    "RecursiveSitemapCrawler": "RecursiveCrawler",
    "RecursiveCrawler": None,       # always supported
    "Download": None,               # plain fetch, always supported
}


def choose_crawler(
    requested: str,
    supports: dict[str, Callable[[], bool]],
    fallback: dict[str, str | None] | None = None,
) -> str:
    """Walk the fallback chain from `requested` until a crawler whose
    `supports()` probe passes; loop-safe (reference detects fallback
    loops at single_crawler.py:222-231)."""
    chain = fallback if fallback is not None else DEFAULT_FALLBACK
    seen: set[str] = set()
    cur: str | None = requested
    while cur is not None:
        if cur in seen:
            raise ValueError(f"fallback loop at {cur}: {sorted(seen)}")
        seen.add(cur)
        probe = supports.get(cur)
        if probe is None or probe():
            return cur
        cur = chain.get(cur)
    return "RecursiveCrawler"


def probes_from_tables(
    seed_url: str,
    sitemap_roots: set[str] | None = None,
    rss_feeds_of: dict[str, str] | None = None,
) -> dict[str, Callable[[], bool]]:
    """Capability probes backed by ingested tables:
    SitemapCrawler supported iff the site exposes a sitemap
    (url_extractor.get_sitemap_urls analogue), RssCrawler iff a feed was
    discovered on the landing page (rss_crawler.supports_site)."""
    from news_please_spark.oracle import host_of

    host = host_of(seed_url)
    return {
        "RssCrawler": lambda: bool(rss_feeds_of and host in rss_feeds_of),
        "SitemapCrawler": lambda: bool(
            sitemap_roots and any(host_of(s) == host for s in sitemap_roots)
        ),
        "RecursiveSitemapCrawler": lambda: bool(
            sitemap_roots and any(host_of(s) == host for s in sitemap_roots)
        ),
        "RecursiveCrawler": lambda: True,
        "Download": lambda: True,
    }
