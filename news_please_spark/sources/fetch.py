"""S1/S2/S3 — the fetch tier, network-free by design.

The reference fetches with requests/scrapy (SimpleCrawler.fetch_url,
reference crawler/simple_crawler.py:30-87; thread-parallel fetch_urls
:89-108; encoding detection crawler/response_decoder.py:19-48). In the
Spark engine "fetch" is a *pluggable resolver*: production would be an
Arrow-batched HTTP UDF over per-host partitions; tests and benchmarks
resolve against a `responses` table (FIXTURES.md §4) with identical
semantics:

  F5 status filter (non-200 dropped, reference pipelines.py:44-57)
  F1 content-type filter (text/html only, parse_crawler.py:122-137)
  F6 size bounds (10 B – 20 MB, simple_crawler.py:11-12)
  S3 encoding detection (UTF-8 → latin-1 fallback, response_decoder.py)
  D4 redirect-canonical keying (first redirect source wins,
     pipelines.py:516-521)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MIN_BYTES = 10
MAX_BYTES = 20 * 1024 * 1024


@F.pandas_udf(T.StringType())
def decode_body_udf(body: pd.Series) -> pd.Series:
    """S3: UTF-8 first, latin-1 fallback (cchardet-free)."""
    out = []
    for b in body:
        if b is None:
            out.append(None)
            continue
        raw = bytes(b)
        try:
            out.append(raw.decode("utf-8"))
        except UnicodeDecodeError:
            out.append(raw.decode("latin-1"))
    return pd.Series(out)


def fetch_from_responses(
    urls: DataFrame,
    responses: DataFrame,
    min_bytes: int = MIN_BYTES,
    max_bytes: int = MAX_BYTES,
) -> DataFrame:
    """urls(url) × responses table → fetched(url, html, fetched_at).

    The join replaces the network round-trip; every filter is native and
    runs BEFORE the decode UDF (cheap predicates first, SURVEY.md §4).
    Rows that fail F1/F5/F6 disappear exactly as failed fetches would.
    Redirected responses are re-keyed to the redirect source (D4).
    """
    r = responses.select(
        F.col("url").alias("r_url"),
        "status",
        "content_type",
        "body",
        "redirect_to",
        "fetched_at",
    )
    hit = urls.select("url").join(r, urls.url == r.r_url).drop("r_url")
    ok = (
        hit.filter(F.col("status") == 200)                            # F5
        .filter(F.col("content_type").rlike("^text/html"))            # F1
        .filter(F.length("body").between(min_bytes, max_bytes))       # F6
    )
    decoded = ok.withColumn("html", decode_body_udf(F.col("body"))).drop("body")
    # D4: the row is stored under the *requested* url even when the
    # server redirected; the final location is kept alongside
    return decoded.select(
        "url",
        F.coalesce(F.col("redirect_to"), F.col("url")).alias("final_url"),
        "html",
        "fetched_at",
    )
