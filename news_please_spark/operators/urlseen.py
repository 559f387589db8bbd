"""Partitioned bloom-filter URL-seen prefilter (north_rule: "partitioned
bloom/cuckoo URL-seen filter"; reference analogue: scrapy RFPDupeFilter
persisted per crawler JOBDIR, reference newsplease/single_crawler.py:170-187).

Design: the `seen` table is hash-bucketed by pmod(xxhash64(url), B).
Per bucket we build an independent bloom blob with `applyInPandas`
(numpy bit array, double hashing), so build parallelism == bucket count
and each blob sizes to its bucket.

Hashing discipline: BOTH 64-bit hash lanes are computed JVM-side with
the codegen'd xxhash64 (two different seed columns) — no URL string
ever crosses Arrow, and the Python side only does numpy bit-twiddling
over int64 arrays (vectorized across the whole batch, zero per-row
Python). Spark's internal BloomFilterAggregate/might_contain pair would
be simpler still, but it is not registered in the public function
registry as of Spark 4.1.2 (UNRESOLVED_ROUTINE), so this keeps the same
JVM-hash + Arrow-batch shape explicitly.

Probe path: candidates get the same bucket id, join the (tiny) blobs
table broadcast, and a vectorized pandas UDF answers might_contain.
Candidates the bloom rejects are *definitely unseen* → skip the exact
join entirely. Candidates the bloom accepts go through the exact
left_anti confirm, so false positives can never drop URLs — exactness
is preserved, the bloom only cuts the big-join input.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _lane_cols(url: str | Column = "url") -> tuple[Column, Column]:
    """Two independent JVM-side 64-bit hash lanes (xxhash64, distinct
    seeds via an extra literal column)."""
    return F.xxhash64(url), F.xxhash64(url, F.lit(0x9E3779B9))


def _as_u64(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype=np.int64).view(np.uint64)


def _bloom_set(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    n = max(n_items, 16)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(128, (m + 7) // 8 * 8)  # byte-aligned bit count
    k = max(1, int(round(m / n * math.log(2))))
    return m, min(k, 8)


_BLOB_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("m", T.LongType(), False),
        T.StructField("k", T.IntegerType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ]
)


def build_bloom_blobs(
    seen: DataFrame, n_buckets: int, fpp: float = 0.01, capacity: int | None = None
) -> DataFrame:
    """seen(url) → blobs(bucket, m, k, blob) — one bloom per hash bucket.

    capacity=None sizes each blob to its bucket's actual row count
    (tightest for a one-shot build). With capacity=N the (m, k) pair is
    FIXED for the expected per-bucket capacity, which makes blobs from
    different deltas bitwise OR-mergeable — the incremental path the
    crawl loop uses so each wave hashes only its delta, never the whole
    seen set. Overfilling past capacity only raises the false-positive
    rate; the exact anti-join confirm keeps results bit-exact."""
    fixed = _bloom_set(capacity, fpp) if capacity else None

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=["bucket", "m", "k", "blob"])
        bucket = int(pdf["bucket"].iloc[0])
        m, k = fixed if fixed else _bloom_set(len(pdf), fpp)
        bits = np.zeros(m // 8, dtype=np.uint8)
        h1, h2 = _as_u64(pdf["h1"]), _as_u64(pdf["h2"])
        for j in range(k):  # k ≤ 8 vectorized passes, no per-row work
            idx = (h1 + np.uint64(j) * h2) % np.uint64(m)
            np.bitwise_or.at(
                bits, (idx // 8).astype(np.int64), (1 << (idx % 8)).astype(np.uint8)
            )
        return pd.DataFrame(
            [{"bucket": bucket, "m": m, "k": k, "blob": bits.tobytes()}]
        )

    h1, h2 = _lane_cols("url")
    bucketed = seen.select(
        F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int").alias("bucket"),
        h1.alias("h1"),
        h2.alias("h2"),
    )
    return bucketed.groupBy("bucket").applyInPandas(build, _BLOB_SCHEMA)


def merge_bloom_blobs(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bitwise-OR per-bucket blobs built with the SAME fixed capacity
    (m, k must match within a bucket; asserted). One tiny
    applyInPandas over ≤ n_buckets groups."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=["bucket", "m", "k", "blob"])
        ms = pdf["m"].unique()
        ks = pdf["k"].unique()
        if len(ms) != 1 or len(ks) != 1:
            raise ValueError(
                f"bloom blobs in bucket {pdf['bucket'].iloc[0]} have mixed "
                f"(m, k) — build deltas with the same fixed capacity"
            )
        acc = np.zeros(int(ms[0]) // 8, dtype=np.uint8)
        for blob in pdf["blob"]:
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pd.DataFrame(
            [{"bucket": int(pdf["bucket"].iloc[0]), "m": int(ms[0]),
              "k": int(ks[0]), "blob": acc.tobytes()}]
        )

    return a.unionByName(b).groupBy("bucket").applyInPandas(merge, _BLOB_SCHEMA)


def bloom_prefilter(
    candidates: DataFrame,
    seen: DataFrame,
    n_buckets: int,
    fpp: float = 0.01,
    blobs: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Split candidates by bloom verdict; return
    definitely-new ∪ (maybe-seen exact-anti-join seen).

    Output preserves the candidate schema and exact semantics; the bloom
    only shrinks the expensive anti-join's probe side. Pass prebuilt
    `blobs` (incrementally merged across waves) to avoid rehashing the
    whole seen set per call.

    materialize=True localCheckpoints the probed candidates before the
    split — the verdict column feeds THREE consumers (two filter
    branches + the anti-join), and without a cut each one would
    re-execute the whole upstream plan (for the crawl loop that is the
    expansion join, 3×).
    """
    if blobs is None:
        blobs = build_bloom_blobs(seen, n_buckets, fpp)
    cand_cols = candidates.columns

    # ship the blobs as a REAL broadcast variable, not a broadcast JOIN:
    # a join would copy each bucket's ~100 KB blob into every candidate
    # row (the probe then materializes GBs); as a task broadcast the
    # blobs exist once per executor. ≤ n_buckets rows collect to the
    # driver — the classic runtime-filter distribution path.
    blob_map = {
        int(r["bucket"]): (int(r["m"]), int(r["k"]), bytes(r["blob"]))
        for r in blobs.collect()
    }
    bc = candidates.sparkSession.sparkContext.broadcast(blob_map)

    @F.pandas_udf(T.BooleanType())
    def might_contain(
        bucket: pd.Series, h1s: pd.Series, h2s: pd.Series
    ) -> pd.Series:
        bm = bc.value
        out = np.zeros(len(bucket), dtype=bool)
        if len(bucket) == 0:
            return pd.Series(out)
        h1a, h2a = _as_u64(h1s), _as_u64(h2s)
        barr = bucket.to_numpy()
        # one vectorized probe per distinct bucket in the batch (each
        # bucket shares one blob) — no per-row Python
        for b in np.unique(barr):
            sel = barr == b
            entry = bm.get(int(b))
            if entry is None:
                continue  # empty bucket: nothing seen there
            m, k, blob = entry
            bits = np.frombuffer(blob, dtype=np.uint8)
            mm = np.uint64(m)
            hit = np.ones(int(sel.sum()), dtype=bool)
            g1, g2 = h1a[sel], h2a[sel]
            for j in range(k):
                idx = (g1 + np.uint64(j) * g2) % mm
                hit &= (
                    (bits[(idx // 8).astype(np.int64)] >> (idx % 8).astype(np.uint8)) & 1
                ) == 1
            out[sel] = hit
        return pd.Series(out)

    h1, h2 = _lane_cols("url")
    probed = candidates.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    ).withColumn(
        "_maybe", might_contain(F.col("bucket"), h1, h2)
    )
    if materialize:
        probed = probed.localCheckpoint(eager=True)
    definitely_new = probed.filter(~F.col("_maybe")).select(*cand_cols)
    maybe = probed.filter(F.col("_maybe")).select(*cand_cols)
    confirmed_new = maybe.join(seen, "url", "left_anti")
    return definitely_new.unionByName(confirmed_new)
