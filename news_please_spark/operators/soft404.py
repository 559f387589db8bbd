"""Soft-404 / error-template detection over fetched pages.

A "soft 404" is a page a server returns with HTTP 200 whose *content*
is an error template ("not found", empty shell) — the crawler's status
filter (reference: simple_crawler's status gate,
/root/reference/newsplease/crawler/simple_crawler.py) passes it, and
without content-side detection the frontier wastes budget recrawling
and the corpus fills with identical junk.

Detection signal (content-side, complementary to the URL-side
template_fanout in operators/traps.py): one content fingerprint served
by a host under MANY distinct paths, covering a large share of the
host's pages, with template-sized (short) bodies. All three thresholds
are integer-exact so the decision replays bit-for-bit cross-engine.

Plan shape: pages aggregate once to (host, fp) CELLS (the distinct-
path count adds a (host, fp, path) pre-distinct — still key-grain,
never row-grain state); host totals aggregate the cell table again and
join back on host. Every exchange is over cell/host-grain tables, so
the plan's width is bounded by distinct fingerprints, not page count —
at 10^10 pages the cells are exactly the dedup tables the corpus
already maintains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def soft404_cells(
    pages: DataFrame,
    min_paths: int = 10,
    min_share_bp: int = 2000,
    max_chars: int = 200,
) -> DataFrame:
    """Flag per-host error-template fingerprints.

    `pages` columns: host STRING, path STRING, fp STRING (content
    fingerprint), n_chars BIGINT-castable (body size).

    Returns one row per (host, fp) cell:
      host, fp, n_paths (distinct paths), n_urls (pages), host_urls,
      share_q (basis points, floor), chars_max, is_soft404 (0/1).

    A cell is flagged iff n_paths >= min_paths AND share_q >=
    min_share_bp AND chars_max <= max_chars: path diversity separates
    a template from one popular page, the host-share separates it from
    incidental duplication, and the size cap separates error shells
    from legitimately mirrored long articles.
    """
    cells = pages.groupBy("host", "fp").agg(
        F.countDistinct("path").cast("long").alias("n_paths"),
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.max(F.col("n_chars").cast("long")).alias("chars_max"),
    )
    host_tot = cells.groupBy("host").agg(
        F.sum("n_urls").cast("long").alias("host_urls")
    )
    c = cells.join(host_tot, "host")
    share_q = F.expr("(10000 * n_urls) div host_urls").cast("long")
    flagged = (
        (F.col("n_paths") >= min_paths)
        & (F.col("share_q") >= min_share_bp)
        & (F.col("chars_max") <= max_chars)
    )
    return (
        c.withColumn("share_q", share_q)
        .withColumn("is_soft404", F.when(flagged, 1).otherwise(0).cast("long"))
        .select(
            "host",
            "fp",
            "n_paths",
            "n_urls",
            "host_urls",
            "share_q",
            "chars_max",
            "is_soft404",
        )
    )
