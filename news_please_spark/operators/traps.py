"""Crawl-trap detection: per-host URL-template fan-out bounding.

Crawler traps — calendars, session-id links, faceted search — generate
unbounded URL families under one host. The reference bounds the damage
with per-site URL limits (config max_urls); at 10^10-frontier scale the
standard refinement is structural: collapse each URL to its template
(``functions/urls.py::url_template`` — digit runs → N, query values
dropped, parameter names sorted) and bound the per-template fan-out.
A template that owns both MANY URLs and a LARGE share of its host's
frontier is a generator, not content.

``template_fanout`` emits one row per (host, template) with the counts,
the quantized share, and the trap flag; the admission tier anti-joins
flagged templates (the same left_anti shape as the URL-seen filter).

Plan shape: one map-side-combinable count to (host, template) cells,
then a per-host window sum over the CELL table (cardinality = templates
per host, typically 10^0-10^3 — not URLs per host), so no per-URL data
crosses the second exchange. Scales to any frontier the cell table
itself fits; skewed hosts are bounded by their template diversity, not
their URL count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from news_please_spark.functions.urls import url_host, url_template


def template_fanout(
    df: DataFrame,
    url_col: str = "url",
    min_urls: int = 20,
    min_share_q: int = 2_000,
) -> DataFrame:
    """Per-(host, template) URL counts + per-host share + trap flag.

    ``is_trap`` = n_urls ≥ min_urls AND share_q ≥ min_share_q, where
    share_q = floor(1e4 · n_urls / host_urls) — both thresholds must
    hit: absolute fan-out alone flags big hosts' legitimate sections,
    share alone flags tiny hosts' only page.
    """
    u = F.col(url_col)
    cells = (
        df.select(
            url_host(u).alias("host"), url_template(u).alias("template")
        )
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    )
    host_urls = F.sum("n_urls").over(Window.partitionBy("host"))
    out = cells.select(
        "host",
        "template",
        "n_urls",
        host_urls.cast("long").alias("host_urls"),
    ).withColumn(
        "share_q",
        F.floor((F.lit(10_000) * F.col("n_urls")) / F.col("host_urls")).cast(
            "long"
        ),
    )
    return out.withColumn(
        "is_trap",
        (
            (F.col("n_urls") >= min_urls)
            & (F.col("share_q") >= min_share_q)
        ).cast("long"),
    )
