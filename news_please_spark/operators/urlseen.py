"""Partitioned bloom-filter URL-seen prefilter (north_rule: "partitioned
bloom/cuckoo URL-seen filter"; reference analogue: scrapy RFPDupeFilter
persisted per crawler JOBDIR, reference newsplease/single_crawler.py:170-187).

Design: the `seen` table is hash-bucketed by pmod(xxhash64(url), B).
Per bucket we build an independent bloom blob with `applyInPandas`
(numpy bit array, double hashing from two md5-derived 64-bit lanes),
so build parallelism == bucket count and each blob sizes to its bucket.

Probe path: candidates get the same bucket id, join the (tiny) blobs
table broadcast, and a vectorized pandas UDF answers might_contain.
Candidates the bloom rejects are *definitely unseen* → skip the exact
join entirely. Candidates the bloom accepts go through the exact
left_anti confirm, so false positives can never drop URLs — exactness
is preserved, the bloom only cuts the big-join input.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hash_lanes(urls: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash lanes per url from one md5 pass."""
    h1 = np.empty(len(urls), dtype=np.uint64)
    h2 = np.empty(len(urls), dtype=np.uint64)
    for i, u in enumerate(urls):
        d = hashlib.md5(u.encode("utf-8", "surrogatepass")).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")
    return h1, h2


def _bloom_set(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    n = max(n_items, 16)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(128, (m + 7) // 8 * 8)  # byte-aligned bit count
    k = max(1, int(round(m / n * math.log(2))))
    return m, min(k, 8)


def build_bloom_blobs(
    seen: DataFrame, n_buckets: int, fpp: float = 0.01
) -> DataFrame:
    """seen(url) → blobs(bucket, m, k, blob) — one bloom per hash bucket."""

    schema = T.StructType(
        [
            T.StructField("bucket", T.IntegerType(), False),
            T.StructField("m", T.LongType(), False),
            T.StructField("k", T.IntegerType(), False),
            T.StructField("blob", T.BinaryType(), False),
        ]
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=["bucket", "m", "k", "blob"])
        bucket = int(pdf["bucket"].iloc[0])
        m, k = _bloom_set(len(pdf), fpp)
        bits = np.zeros(m // 8, dtype=np.uint8)
        h1, h2 = _hash_lanes(pdf["url"])
        for j in range(k):
            idx = (h1 + np.uint64(j) * h2) % np.uint64(m)
            np.bitwise_or.at(bits, (idx // 8).astype(np.int64), (1 << (idx % 8)).astype(np.uint8))
        return pd.DataFrame(
            [{"bucket": bucket, "m": m, "k": k, "blob": bits.tobytes()}]
        )

    bucketed = seen.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )
    return bucketed.groupBy("bucket").applyInPandas(build, schema)


def bloom_prefilter(
    candidates: DataFrame, seen: DataFrame, n_buckets: int, fpp: float = 0.01
) -> DataFrame:
    """Split candidates by bloom verdict; return
    definitely-new ∪ (maybe-seen exact-anti-join seen).

    Output preserves the candidate schema and exact semantics; the bloom
    only shrinks the expensive anti-join's probe side.
    """
    blobs = build_bloom_blobs(seen, n_buckets, fpp)
    cand_cols = candidates.columns

    @F.pandas_udf(T.BooleanType())
    def might_contain(url: pd.Series, m: pd.Series, k: pd.Series, blob: pd.Series) -> pd.Series:
        out = np.ones(len(url), dtype=bool)
        if len(url) == 0:
            return pd.Series(out)
        h1, h2 = _hash_lanes(url)
        for i in range(len(url)):
            if blob.iloc[i] is None:
                out[i] = False  # empty bucket: nothing seen there
                continue
            bits = np.frombuffer(blob.iloc[i], dtype=np.uint8)
            mm = np.uint64(m.iloc[i])
            hit = True
            for j in range(int(k.iloc[i])):
                idx = int((h1[i] + np.uint64(j) * h2[i]) % mm)
                if not (bits[idx // 8] >> (idx % 8)) & 1:
                    hit = False
                    break
            out[i] = hit
        return pd.Series(out)

    probed = (
        candidates.withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
        )
        .join(F.broadcast(blobs), "bucket", "left")
        .withColumn(
            "_maybe", might_contain(F.col("url"), F.col("m"), F.col("k"), F.col("blob"))
        )
    )
    definitely_new = probed.filter(~F.col("_maybe")).select(*cand_cols)
    maybe = probed.filter(F.col("_maybe")).select(*cand_cols)
    confirmed_new = maybe.join(seen, "url", "left_anti")
    return definitely_new.unionByName(confirmed_new)
