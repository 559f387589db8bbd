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
  S3 encoding detection (UTF-8 first, then a candidate-scoring guess
     over cp1251/shift_jis/gbk/latin-1 — the cchardet-free analogue of
     response_decoder.py:19-48)
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

def detect_and_decode(raw: bytes) -> str:
    """S3: UTF-8 first (reference response_decoder.py:9-17 isutf8), then
    a script-evidence decision tree over shift_jis / gbk / cp1251 /
    latin-1 — the from-scratch stand-in for cchardet.detect (:19-31):

      * shift_jis wins when it strict-decodes AND ≥20% of the non-ASCII
        output is kana (Japanese text always carries kana; other byte
        streams decoded as shift_jis yield at most stray kana),
      * word-spaced byte streams (≥5% 0x20) are single-byte European:
        cp1251 when the non-ASCII mass decodes to Cyrillic letters and
        dominates the letters (Russian is ~all high bytes), else latin-1
        (European text has sparse accents among ASCII),
      * unspaced dense-high streams that strict-decode as gbk to mostly
        han are gbk,
      * latin-1 is the decode-anything last resort, as in the reference.
    """
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        pass
    try:
        txt = raw.decode("shift_jis")
        non_ascii = [ch for ch in txt if ord(ch) > 127]
        kana = sum("぀" <= ch <= "ヿ" for ch in non_ascii)
        if non_ascii and kana / len(non_ascii) >= 0.2:
            return txt
    except UnicodeDecodeError:
        pass
    word_spaced = raw.count(0x20) / max(len(raw), 1) >= 0.05
    if not word_spaced:
        try:
            txt = raw.decode("gbk")
            non_ascii = [ch for ch in txt if ord(ch) > 127]
            han = sum("一" <= ch <= "鿿" for ch in non_ascii)
            if non_ascii and han / len(non_ascii) >= 0.5:
                return txt
        except UnicodeDecodeError:
            pass
    try:
        # cp1251 is not decode-anything: byte 0x98 is undefined, so a
        # windows-1252-ish body reaching this branch must fall through to
        # the latin-1 last resort instead of raising (the reference's
        # decoder always falls back, response_decoder.py:40-48)
        txt_1251 = raw.decode("cp1251")
    except UnicodeDecodeError:
        return raw.decode("latin-1")
    non_ascii = [ch for ch in txt_1251 if ord(ch) > 127]
    letters = sum(ch.isalpha() for ch in txt_1251)
    cyr = sum("Ѐ" <= ch <= "ӿ" for ch in non_ascii)
    if non_ascii and letters and cyr / len(non_ascii) >= 0.9 and len(non_ascii) / letters >= 0.4:
        return txt_1251
    return raw.decode("latin-1")


@F.pandas_udf(T.StringType())
def decode_body_udf(body: pd.Series) -> pd.Series:
    out = []
    for b in body:
        out.append(None if b is None else detect_and_decode(bytes(b)))
    return pd.Series(out)


def fetch_from_responses(
    urls: DataFrame,
    responses: DataFrame,
    min_bytes: int = MIN_BYTES,
    max_bytes: int = MAX_BYTES,
    keep: list[str] | None = None,
) -> DataFrame:
    """urls(url) × responses table → fetched(url, html, fetched_at).

    The join replaces the network round-trip; every filter is native and
    runs BEFORE the decode UDF (cheap predicates first, SURVEY.md §4).
    Rows that fail F1/F5/F6 disappear exactly as failed fetches would.
    Redirected responses are re-keyed to the redirect source (D4).
    `keep` names extra url-side columns to carry through (the streaming
    admission tier rides its host/priority/admitted_seq along this way).
    """
    keep = [c for c in (keep or []) if c != "url"]
    r = responses.select(
        F.col("url").alias("r_url"),
        "status",
        "content_type",
        "body",
        "redirect_to",
        "fetched_at",
    )
    hit = urls.select("url", *keep).join(r, urls.url == r.r_url).drop("r_url")
    ok = (
        hit.filter(F.col("status") == 200)                            # F5
        .filter(F.col("content_type").rlike("^text/html"))            # F1
        .filter(F.length("body").between(min_bytes, max_bytes))       # F6
    )
    decoded = ok.withColumn("html", decode_body_udf(F.col("body"))).drop("body")
    # D4: the row is stored under the *requested* url even when the
    # server redirected; the final location is kept alongside
    return decoded.select(
        *keep,
        "url",
        F.coalesce(F.col("redirect_to"), F.col("url")).alias("final_url"),
        "html",
        "fetched_at",
    )
