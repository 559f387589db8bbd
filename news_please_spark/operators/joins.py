"""As-of and range (interval) joins — the two time-series joins Spark's
built-in operator set lacks, expressed so Catalyst still sees plain
equi-joins / windows and never falls back to a nested-loop plan.

Neither exists in the reference (a crawler), but both are table stakes
for the analytics a crawl corpus feeds (attribute an event to the most
recent crawl snapshot; find every fetch inside a site's maintenance
window).  Both are pure DataFrame compositions — no UDFs, no driver
loops.

* ``asof_join`` — for every left row, the single right row with the
  greatest ``right_ts <= left_ts`` for the same key (LEFT semantics:
  unmatched left rows survive with nulls).  The classic distributed
  plan: union both sides tagged, one shuffle+sort on (key, ts, side),
  then ``last(right_struct, ignorenulls)`` over an unbounded-preceding
  window carries the latest right payload forward onto each left row.
  One Exchange, one Sort — same cost as a single window aggregate,
  independent of how many right rows precede each left row.  (Contrast:
  the naive ``left join ... on ts <= ts`` + row_number plan is a
  BroadcastNestedLoop that materializes every (left, preceding-right)
  pair.)

* ``range_join`` — match interval rows [start, end) to point rows with
  the same key where start <= ts < end.  Naively an inequality join =
  nested loop.  Here time is cut into fixed-width bands; every interval
  is exploded onto each band it overlaps (``sequence`` + ``explode``,
  ~(len/band + 1) copies), points map to exactly one band, and the join
  runs as a hash equi-join on (key, band) with the exact containment
  predicate applied as a post-filter.  Band width should be >= the
  typical interval length so the explosion factor stays ~2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """ASOF LEFT join: attach to each left row the payload of the right
    row with the greatest ``right_ts`` <= ``left_ts`` for the same key
    (ties at equal ts match, like DuckDB/QuestDB ASOF semantics).

    Requires the right side to hold at most one row per (key, ts) —
    pre-aggregate with ``max_by`` if it doesn't; ambiguity there is a
    data-model bug, not a join concern.  Payload columns must be
    non-null on the right side (``last(ignorenulls)`` is what carries
    them; a null payload cell would fall through to an older row).

    Output: all left columns + the payload columns (null when no right
    row precedes).

    Skew: the window partitions by key, so one pathological key (a
    single user holding 10^9 events) serializes into one task — the
    inherent grain of as-of semantics (the running "latest right value"
    is a sequential scan per key).  Mitigate upstream by splitting hot
    keys on coarse time ranges and carrying each range's closing
    payload into the next as a synthetic right row; below ~10^7 rows
    per key the single sorted task is the right plan.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_p")
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload,
    )
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *left.columns,
    )
    # right rows sort before left rows at equal ts, so ts-equal matches
    # are visible to the window (<= semantics).
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l.unionByName(r, allowMissingColumns=True).withColumn(
        "_last", F.last("_p", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_side") == 1).select(
        *left.columns,
        *[F.col("_last")[c].alias(c) for c in payload_cols],
    )


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    interval_key: str,
    point_key: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    band: Column,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: pair every interval row with every
    point row of the same key whose ``ts_col`` lies in
    [``start_col``, ``end_col``).  ``band`` is the band width as a
    Column in the units the time columns band on — epoch MICROSECONDS
    for timestamp columns, the raw value for numerics — pick it >= the
    typical interval length.

    Plan shape: explode intervals onto overlapped bands, hash equi-join
    on (key, band), post-filter exact containment.  No inequality join
    condition ever reaches the optimizer, so no BroadcastNestedLoop.
    """
    if how != "inner":
        raise ValueError(f"only inner range_join is implemented, got {how!r}")

    def _as_long(df: DataFrame, col: str) -> Column:
        # timestamps band on exact epoch micros (TIMESTAMP_NTZ has no
        # direct long cast in Spark 4); numerics band on their value.
        # Band units follow: micros for timestamps.
        if df.schema[col].dataType.typeName().startswith("timestamp"):
            return F.unix_micros(F.col(col).cast("timestamp"))
        return F.col(col).cast("long")

    s = _as_long(intervals, start_col)
    e = _as_long(intervals, end_col)
    # end is exclusive, but the band range is conservative (up to end's
    # own band): one spare interval copy when end sits exactly on a band
    # edge, removed by the exact post-filter below.
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_band", F.explode(F.sequence(F.floor(s / band), F.floor(e / band)))
    )
    pt = points.withColumn("_band", F.floor(_as_long(points, ts_col) / band))
    cond = (
        (iv[interval_key] == pt[point_key])
        & (iv["_band"] == pt["_band"])
        & (pt[ts_col] >= iv[start_col])
        & (pt[ts_col] < iv[end_col])
    )
    return iv.join(pt, cond, "inner").select(
        *[iv[c] for c in intervals.columns],
        *[pt[c] for c in points.columns],
    )


def fuzzy_link(
    records: DataFrame,
    key_col: str = "key",
    block_cols: list[str] | None = None,
    max_dist: int = 3,
    id_col: str = "id",
    n_groups: int = 8,
) -> DataFrame:
    """Blocked fuzzy record linkage: candidate pairs from an equi-join
    on the blocking keys, verified with edit distance on `key_col` —
    the classic dedup/linkage shape (Fellegi & Sunter 1969 blocking +
    string comparator) for titles, author names, and near-identical
    headlines that token-set methods (minhash) treat as disjoint when
    the edit is INSIDE a token.

    Returns (id_a, id_b, dist) with id_a < id_b and
    dist = levenshtein(key_a, key_b) <= max_dist.

    Scale shape: the cross product only ever forms WITHIN a block —
    a hash equi-join on the blocking columns, so cost is sum over
    blocks of |block|^2, not n^2.  On top of the blocking, each
    block's quadratic pair set is split into G*(G+1)/2 balanced units
    by a deterministic hash group g(id) in [0, G): the left side of
    the self-join carries (g, h) for every h >= g, the right side
    (g, h) for every g <= h, and the equi-join runs on
    (blocks..., g, h).  Every unordered pair lands in exactly one
    unit — cross-group pairs under (min_g, max_g), same-group pairs
    deduped by id order — so a single hot block ("the"-block) spreads
    over G*(G+1)/2 tasks instead of serializing on one join key
    (AQE's skew split cannot divide a single key; this can).  The
    replication is (G+1)x of the lightweight proxy rows
    (id, key, blocks) only, never payloads.  The probe side is
    round-robin respread when the input has fewer splits than cores
    (single-row-group small files); at real scale the scan already
    has more splits and the respread is a no-op.  levenshtein is the
    threshold-bounded codegen'd JVM builtin (O(len*max_dist) banded
    DP, -1 above the bound) — no UDF."""
    blocks = block_cols or ["block"]
    cols = [id_col, key_col, *blocks]
    G = max(1, n_groups)
    grp = F.pmod(F.xxhash64(F.col(id_col)), F.lit(G)).cast("int")
    base = records.select(*cols).withColumn("_g", grp)
    a = base.withColumn(
        "_h", F.explode(F.sequence(F.col("_g"), F.lit(G - 1)))
    ).select(
        *[F.col(c).alias(f"_a_{c}") for c in cols],
        F.col("_g").alias("_a_g1"),
        F.col("_h").alias("_a_g2"),
    )
    sc = records.sparkSession.sparkContext
    goal = sc.defaultParallelism
    if a.rdd.getNumPartitions() < goal:
        a = a.repartition(goal)
    b = base.withColumn(
        "_h", F.explode(F.sequence(F.lit(0), F.col("_g")))
    ).select(
        *[F.col(c).alias(f"_b_{c}") for c in cols],
        F.col("_h").alias("_b_g1"),
        F.col("_g").alias("_b_g2"),
    )
    cond = [F.col(f"_a_{c}") == F.col(f"_b_{c}") for c in blocks] + [
        F.col("_a_g1") == F.col("_b_g1"),
        F.col("_a_g2") == F.col("_b_g2"),
    ]
    ida, idb = F.col(f"_a_{id_col}"), F.col(f"_b_{id_col}")
    return (
        a.join(b, cond)
        # exact-once pairing: cross-group pairs appear only under
        # (min_g, max_g) with the lower-group record on the left;
        # same-group pairs appear in both orders and dedupe on id.
        .filter((F.col("_a_g1") < F.col("_a_g2")) | (ida < idb))
        # lossless prune BEFORE the quadratic compare: edit distance is
        # bounded below by the length difference, and length() is O(1)
        .filter(
            F.abs(
                F.length(F.col(f"_a_{key_col}"))
                - F.length(F.col(f"_b_{key_col}"))
            )
            <= max_dist
        )
        # threshold-bounded levenshtein: the JVM builtin early-exits at
        # O(len * max_dist) instead of O(len^2), returning -1 above the
        # bound — the banded-DP trick, exact for every kept pair
        .withColumn(
            "dist",
            F.levenshtein(
                F.col(f"_a_{key_col}"), F.col(f"_b_{key_col}"), max_dist
            ).cast("long"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select(
            F.least(ida, idb).alias("id_a"),
            F.greatest(ida, idb).alias("id_b"),
            "dist",
        )
    )
