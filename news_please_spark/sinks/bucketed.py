"""Bucketed parquet tables — pre-shuffled storage for co-located joins.

The 100-TB lever: a table that is joined on the same key by many
queries (the URL-seen set, documents by doc_id, lineitem by orderkey)
pays its shuffle ONCE at write time.  `bucketBy(n, key)` hash-
partitions rows into n files per partition exactly the way a shuffle
on the join key would, and records that layout in the catalog; any
later equi-join (or aggregation) on the key between two tables
bucketed with the same n reads both sides ALREADY co-located — the
planner drops the Exchange on both sides entirely (sortBy on the same
key additionally drops the Sort under a sort-merge join).  On a
1000-executor cluster that turns the nightly "join today's crawl
against the 10^10-row seen table" from a full two-sided shuffle into
a bucket-wise local merge.

Spark only honors bucket metadata through the session catalog, so the
writer goes through ``saveAsTable`` with an explicit ``path`` (external
table: data lives where the caller says, the catalog holds only the
layout contract).  Readers use ``spark.table(name)`` — a plain
``spark.read.parquet(path)`` sees the same rows but not the bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key_cols: list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write `df` as an external bucketed parquet table registered as
    `table`.  `key_cols` is the future join/agg key; `buckets` must
    match between tables meant to join exchange-free.  `sort=True`
    additionally sorts within buckets on the key so a sort-merge join
    needs no Sort either."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    w = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, *key_cols)
    )
    if sort:
        w = w.sortBy(*key_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucket layout (a path-based
    parquet read would not)."""
    return spark.table(table)
