"""Count-min sketch — fixed-memory frequency estimation (heavy hitters).

True per-token counts over a 100 TB corpus shuffle one key per distinct
token (billions).  A count-min sketch (Cormode & Muthukrishnan 2005)
instead aggregates into a FIXED d x w counter table: every token
occurrence increments d bucket counters, and the estimate for a token
is the MIN over its d counters — an overestimate with error
<= e*N/w at probability 1 - e^-d.  The groupBy key space collapses
from |vocab| to d*w (4096 cells by default), so the aggregation is a
map-side-combinable shuffle into a table that fits in L2, and the
counter table itself broadcasts for estimate lookups.

Engine-portable hashing: row i hashes token t to
md5(i || '|' || t)[:8 hex] as uint32 mod w — the same arithmetic is
expressible in any SQL engine, which is what lets the driver
hash-compare estimates bit-for-bit against DuckDB.

All counts are exact integers (the sketch is approximate in the
estimation-theory sense, not the floating-point sense), so results are
deterministic across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_bucket(token: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-i bucket of a token: md5-prefix uint32 mod width."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}|"), token)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def cms_counters(
    items: DataFrame,
    item_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the d x w counter table from an item-occurrence table
    (one row per occurrence).  Returns (row, bucket, cnt) — d*w rows
    max, regardless of corpus size.

    Hash work is per DISTINCT item, not per occurrence: occurrences
    are counted first (map-side-combinable groupBy), then each distinct
    item's d bucket cells are incremented by its count.  Token
    frequencies are Zipfian, so this is orders of magnitude fewer md5
    evaluations than hashing every occurrence — for identical counters
    (integer sums commute)."""
    counts = items.groupBy(item_col).agg(
        F.count(F.lit(1)).cast("long").alias("_w")
    )
    return cms_counters_weighted(counts, item_col, "_w", depth, width)


def cms_counters_weighted(
    counts: DataFrame,
    item_col: str = "token",
    weight_col: str = "_w",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Counter build from a pre-aggregated (item, weight) table —
    share the aggregation when the caller already has frequencies.
    The final shuffle carries only d*w distinct keys with map-side
    partial sums."""
    c = F.col(item_col)
    pairs = counts.select(
        F.col(weight_col).alias("_w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_bucket(c, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    )
    return pairs.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.sum("_w").cast("long").alias("cnt"))


def cms_estimate(
    queries: DataFrame,
    counters: DataFrame,
    item_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    out: str = "est",
) -> DataFrame:
    """Point-estimate each query item's frequency: min over the d
    counters it hashes to.  Implemented as d BROADCAST joins of the
    (w-row) per-row counter slices + one `least` — the query table
    never shuffles and never explodes, so estimation composes into any
    scan-side plan.  Missing cells count 0 (an item whose cell was
    never incremented has true count 0).

    `counters` is read once per depth row (d broadcast slices): pass a
    persisted/stored table — handing a lazy plan here re-runs the whole
    counter build d times."""
    c = F.col(item_col)
    q = queries.select(
        item_col,
        *[cms_bucket(c, i, width).alias(f"_b{i}") for i in range(depth)],
    )
    for i in range(depth):
        slice_i = counters.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"_b{i}"), F.col("cnt").alias(f"_c{i}")
        )
        q = q.join(F.broadcast(slice_i), f"_b{i}", "left")
    est = F.least(
        *[F.coalesce(F.col(f"_c{i}"), F.lit(0)) for i in range(depth)]
    )
    return q.select(item_col, est.cast("long").alias(out))
