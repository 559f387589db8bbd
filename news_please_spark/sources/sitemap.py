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
