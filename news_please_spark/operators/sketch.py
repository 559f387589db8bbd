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


# ---------------------------------------------------------------------------
# HyperLogLog — fixed-memory DISTINCT-count estimation (Flajolet et al.
# 2007).  Exact count-distinct over a 100 TB corpus shuffles one key per
# distinct item (billions); HLL instead folds every item into m = 2^p
# registers holding max(rho) — the register table is mergeable by MAX,
# so per-partition sketches combine map-side and per-group sketches
# union across days/sources without touching the raw data again.
#
# Engine-portable arithmetic (the same reasons as the CMS above):
#   hash   = first 8 hex chars of md5(item) as uint32
#   bucket = top p bits           (shiftright)
#   rho    = leading-zero count of the remaining (32-p) bits + 1,
#            derived from length(bin(rest)) — no float log2
#   raw estimate = alpha_m * m^2 / sum(2^-rho)  computed as ONE integer
#   division: alpha_m = 0.7213/(1 + 1.079/m) is the rational
#   7213*m / (10000*m + 10790), and sum(2^-rho) = S / 2^R with
#   S = sum_buckets 2^(R - rho) (absent buckets contribute rho=0), so
#       est = (7213 * m^3 * 2^R) DIV ((10000*m + 10790) * S)
#   — every factor a BIGINT, bit-identical across engines and
#   partitionings.  The default p=8 keeps the constant numerator under
#   2^63; larger p needs DECIMAL and is documented, not silently wrong.
#   This is the RAW estimator: production accuracy would add the
#   linear-counting small-range correction below 2.5m, which is float
#   territory and deliberately outside the oracle-gated surface.

HLL_P = 8  # 256 registers, ~6.5% standard error


def hll_rho(item: Column, p: int = HLL_P) -> tuple[Column, Column]:
    """(bucket, rho) of one item under the engine-portable hash."""
    nbits = 32 - p
    h = F.conv(F.substring(F.md5(item), 1, 8), 16, 10).cast("long")
    bucket = F.shiftright(h, nbits)
    rest = h.bitwiseAND(F.lit((1 << nbits) - 1))
    rho = (
        F.when(rest == 0, F.lit(nbits + 1))
        .otherwise(F.lit(nbits) + 1 - F.length(F.bin(rest)))
        .cast("int")
    )
    return bucket.cast("int"), rho


def hll_registers(
    items: DataFrame,
    item_col: str = "token",
    group_cols: tuple[str, ...] = (),
    p: int = HLL_P,
) -> DataFrame:
    """Register table (group..., bucket, max_rho) from an item table.
    At most 2^p rows per group regardless of item volume; the groupBy
    is map-side combinable (MAX).  Merge two register tables with
    `hll_merge`; estimate with `hll_estimate`."""
    bucket, rho = hll_rho(F.col(item_col), p)
    return (
        items.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Union two register tables: per-(group, bucket) MAX.  Exactly the
    sketch of the unioned item sets — the property that lets daily
    sketches roll up to monthly ones without rescanning."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    p: int = HLL_P,
    out: str = "hll_est",
) -> DataFrame:
    """Integer-exact raw HLL estimate per group from a register table.
    One aggregation over <= 2^p rows per group; absent buckets enter
    the sum as 2^R (rho = 0)."""
    m = 1 << p
    nbits = 32 - p
    big_r = nbits + 1
    numer = 7213 * (m**3) * (1 << big_r)
    if numer >= 1 << 63:
        raise ValueError(f"p={p} overflows BIGINT; use p<=8 or DECIMAL")
    denom_c = 10000 * m + 10790
    # S = sum over PRESENT buckets of 2^(R - rho) + (m - present) * 2^R.
    # The final division is BIGINT `div` — the double-precision quotient
    # of a ~4e18 numerator would flip low bits between engines.
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {big_r} - max_rho)")
    agg = registers.groupBy(*group_cols).agg(
        (
            F.sum(term).cast("long")
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << big_r)
        ).alias("_s")
    )
    return agg.select(
        *group_cols,
        F.expr(f"CAST({numer} AS BIGINT) div ({denom_c} * _s)").alias(out),
    )


# ---------------------------------------------------------------------------
# KMV / bottom-k (theta) sketch — mergeable distinct-count AND
# set-intersection estimation (Bar-Yossef et al. 2002; Beyer et al.
# SIGMOD 2007 "On synopses for distinct-value estimation under multiset
# operations").  The family member HLL cannot supply: HLL unions by
# register-max but intersections only via unstable inclusion-exclusion;
# a KMV sketch of the k smallest hashes supports DIRECT Jaccard /
# intersection estimates over the combined sketch — the cross-source
# content-overlap primitive at 10^10-doc scale.
#
# Engine-portable arithmetic: hash = first 15 hex chars of md5 as a
# 60-bit non-negative long (conv-safe, no sign wrap); estimates use the
# k-th smallest of the merged sketch as theta.

_KMV_M = 1 << 60


def kmv_hash60(item: Column) -> Column:
    return F.conv(F.substring(F.md5(item), 1, 15), 16, 10).cast("long")


def kmv_sketches(
    df: DataFrame,
    item_col: str,
    group_col: str,
    k: int = 256,
    safety: int = 8,
) -> DataFrame:
    """(group, ks, nd): per group the k smallest distinct item hashes
    (ascending array, fewer when the group has < k distinct items) and
    the exact distinct count nd.

    Scale shape: NO per-group sort of the full item set. The items
    dedupe once on md5 keys (the corpus_dup_ngrams cost class), the
    distinct count is a map-side-combinable agg, and a hash THRESHOLD
    pass keeps ~k*safety expected survivors per group (hashes are
    uniform, so P[h < M*k*safety/nd] ~ k*safety/nd) — only that tiny
    candidate set is collected and sorted per group. Deterministic:
    the threshold is a pure function of (k, safety, nd), so the same
    input always yields the same sketch; safety=8 makes
    fewer-than-k-survivors a < 10^-40 Chernoff event for k=256 (and
    groups with nd <= k*safety keep everything — exact mode)."""
    # items feeds the distinct-count agg AND the threshold pass — lazy
    # persist so the dedupe shuffle is paid once
    items = df.select(
        F.col(group_col).alias("g"), kmv_hash60(F.col(item_col)).alias("h")
    ).distinct().persist()
    counts = items.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    # threshold as ONE double literal divided by nd — the identical IEEE
    # op in any engine; the nd <= k*safety arm keeps everything (exact
    # mode) and dodges the near-2^71 threshold that would overflow an
    # integer representation
    keep = (F.col("nd") <= F.lit(k * safety)) | (
        F.col("h").cast("double")
        < F.lit(float(_KMV_M * k * safety)) / F.col("nd")
    )
    cand = items.join(counts, "g").filter(keep)
    return cand.groupBy("g", "nd").agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("ks")
    ).select("g", "ks", "nd")


def kmv_overlap_pairs(sketches: DataFrame, k: int = 256) -> DataFrame:
    """Pairwise overlap estimates from KMV sketches: for each group
    pair (g_a < g_b) merge the two sketches, take theta = the kk-th
    smallest of the union (kk = min(k, |merged|)), and estimate

      union_est    = floor((kk-1) * 2^60 / theta)
      jaccard_q    = floor(10000 * c / kk),  c = |shared hashes <= theta|
      inter_est    = floor(union_est * c / kk)

    EXACT mode: when BOTH groups fit in their sketches (nd <= k) the
    sketches are exhaustive, so the true values are returned instead
    of estimates — union_est = |merged|, inter_est = |intersect|,
    jaccard_q = floor(10000*inter/union). kk/shared still report the
    estimator's inputs.

    Sketch rows are <= k longs, so the pair join moves tiny arrays;
    with S sources this is S^2 sketch-sized work, never corpus-sized."""
    # both join sides reference the same sketch table — persist so the
    # upstream dedupe/threshold/collect pipeline runs once, not twice
    # (S rows of <=k longs: negligible memory)
    sketches = sketches.persist()
    a = sketches.select(
        F.col("g").alias("g_a"), F.col("ks").alias("ka"), F.col("nd").alias("nd_a")
    )
    b = sketches.select(
        F.col("g").alias("g_b"), F.col("ks").alias("kb"), F.col("nd").alias("nd_b")
    )
    pairs = a.join(b, F.col("g_a") < F.col("g_b"))
    u = F.array_sort(F.array_distinct(F.concat(F.col("ka"), F.col("kb"))))
    kk = F.least(F.lit(k), F.size(u))
    theta = F.element_at(u, kk)
    shared = F.size(
        F.filter(
            F.array_intersect(F.col("ka"), F.col("kb")), lambda x: x <= theta
        )
    )
    exhaustive = (F.col("nd_a") <= F.lit(k)) & (F.col("nd_b") <= F.lit(k))
    inter_ex = F.size(F.array_intersect(F.col("ka"), F.col("kb")))
    union_est = F.when(exhaustive, F.size(u).cast("long")).otherwise(
        F.floor(
            (kk - 1).cast("double") * F.lit(float(_KMV_M)) / theta.cast("double")
        ).cast("long")
    )
    jaccard_q = F.when(
        exhaustive, F.floor(F.lit(10000) * inter_ex / F.size(u)).cast("long")
    ).otherwise(F.floor(F.lit(10000) * shared / kk).cast("long"))
    inter_est = F.when(exhaustive, inter_ex.cast("long")).otherwise(
        F.floor(union_est * shared / kk).cast("long")
    )
    return pairs.select(
        "g_a",
        "g_b",
        kk.cast("int").alias("kk"),
        shared.cast("int").alias("shared"),
        union_est.alias("union_est"),
        jaccard_q.alias("jaccard_q"),
        inter_est.alias("inter_est"),
    )


def kmv_merge(sketches: DataFrame, out_group, k: int = 256) -> DataFrame:
    """Merge per-group KMV sketches UP a hierarchy (per-partition →
    per-source → corpus; per-day → per-month) without touching raw
    data — the property that makes bottom-k a sketch rather than a
    sample: the k smallest of a union are always contained in the
    union of each part's k smallest, so

        sketch(A ∪ B) == kmv_merge(sketch(A), sketch(B))

    exactly (tested as a property in test_sketch.py). `out_group` is a
    Column (or name) giving each input row's target group. nd sums —
    parts of one hierarchy level partition their items, so distinct
    counts add; for OVERLAPPING parts the summed nd only steers the
    (conservative) threshold and exact-mode flag, never the hashes.
    One map-side-combinable agg: flatten + re-sort of <= k-long arrays."""
    g = F.col(out_group) if isinstance(out_group, str) else out_group
    return (
        sketches.select(g.alias("g"), "ks", "nd")
        .groupBy("g")
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("ks")))),
                1,
                k,
            ).alias("ks"),
            F.sum("nd").alias("nd"),
        )
    )
