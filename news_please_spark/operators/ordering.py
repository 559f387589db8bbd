"""Scalable global ordering primitives.

`Window.orderBy` with no partition key funnels the whole DataFrame
through ONE task — unusable at 10^10-URL scale. `with_global_seq`
implements the standard two-phase pattern instead:

  1. range-repartition on the sort key (cluster-wide ordered partitions),
  2. collect the tiny per-partition row counts to the driver,
  3. per-partition `row_number` + broadcast prefix offsets.

Cost: one range shuffle + one O(num_partitions) collect. The result is
identical to a global `row_number` but every heavy step is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    offset: int = 0,
    out: str = "seq",
    num_partitions: int | None = None,
    materialize: bool = False,
    caches: list[DataFrame] | None = None,
) -> tuple[DataFrame, int]:
    """Attach a dense global sequence number by `order_cols`.

    Returns (df_with_seq, next_offset). The input ordering key must be
    unique per row for a deterministic result. With materialize=True the
    result is localCheckpoint'ed and the internal cache released —
    callers in iterative loops should use this or the per-iteration
    caches pile up in storage memory.

    With materialize=False the internal range-partitioned cache MUST
    stay alive while the result is consumed (repartitionByRange samples
    its boundaries — a recompute would renumber rows), so it cannot be
    released here. Pass `caches`: the persisted intermediate is
    appended to it, and the caller releases it (cacheutil.release_df)
    once the result has been materialized downstream. Without `caches`
    the intermediate lives until context cleanup — fine for one-shot
    jobs, a storage leak in loops.
    """
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    d = df.repartitionByRange(nparts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    d = d.persist()
    if not materialize and caches is not None:
        caches.append(d)
    counts = dict(
        d.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    acc = offset
    cum: dict[int, int] = {}
    for pid in sorted(counts):
        cum[pid] = acc
        acc += counts[pid]
    if not cum:
        return d.withColumn(out, F.lit(0).cast("long")).drop("_pid"), offset
    mapping = F.create_map(
        *[F.lit(x) for kv in cum.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    res = d.withColumn(
        out,
        (mapping[F.col("_pid")] + F.row_number().over(w) - 1).cast("long"),
    ).drop("_pid")
    if materialize:
        res = res.localCheckpoint(eager=True)
        d.unpersist()
    return res, acc


def mark_top_k_by_threshold(
    df: DataFrame,
    key: str,
    order_col: str,
    k: int,
    salt_buckets: int = 16,
    flag: str = "_topk",
    broadcast_threshold: bool = True,
) -> DataFrame:
    """Skew-safe top-k marking WITHOUT sorting the input: requires
    `order_col` values to be unique within each key (true for the
    frontier's disc_key, which embeds a globally unique parent seq).

    Two-level aggregation computes each key's k-th smallest order value
    (map-side combinable; the salt bounds any single buffer at
    ~|group|/salt_buckets), then one join marks rows ≤ threshold.
    This replaces two full window sorts of the frontier with one tiny
    aggregate + a broadcast threshold join — the difference between
    O(frontier·log) per wave and O(frontier).

    The threshold side is ≤ one fixed-width row per key, so it is
    broadcast EXPLICITLY (default): the frontier engine runs this
    inside its AQE-off wave loop, where Catalyst's static estimate of a
    two-level aggregate is schema-default garbage and would otherwise
    plan a sort-merge join that re-sorts the whole frontier — the exact
    cost this variant exists to avoid. Pass broadcast_threshold=False
    only when the key cardinality itself is broadcast-hostile (≳10^8
    distinct keys); the join then shuffles both sides hash-partitioned
    on `key`, still never sorting the full input.
    """
    salted = df.groupBy(
        key, F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets)).alias("_s")
    ).agg(F.slice(F.array_sort(F.collect_list(order_col)), 1, k).alias("_top"))
    thr = (
        salted.groupBy(key)
        .agg(F.array_sort(F.flatten(F.collect_list("_top"))).alias("_all"))
        .select(
            key,
            F.element_at("_all", F.least(F.lit(k), F.size("_all"))).alias("_thr"),
        )
    )
    thr = F.broadcast(thr) if broadcast_threshold else thr.hint("shuffle_hash")
    return (
        df.join(thr, key)
        .withColumn(flag, F.col(order_col) <= F.col("_thr"))
        .drop("_thr")
    )


def mark_top_k_per_key(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    k: int,
    salt_buckets: int = 1,
    salt_on: str | None = None,
    flag: str = "_topk",
) -> DataFrame:
    """Annotate each row with a boolean `flag`: is it in its key's top-k
    by `order_cols`? Returned as ONE DataFrame so callers can checkpoint
    a single plan and split with cheap filters.

    salt_buckets == 1: one `row_number` window — one shuffle.

    salt_buckets > 1 (skew-safe): a plain per-key window sorts the whole
    group in one task; with 40% of the frontier on one host (deliberate
    world skew) that task dominates the wave. Phase 1 takes local top-k
    inside (key, salt) sub-groups — bounding any task at
    ~|group|/salt_buckets rows; phase 2 ranks only the ≤ k·salt_buckets
    survivors per key. Phase-1 losers are provably outside the true
    top-k, so they are flagged false directly.
    """
    if salt_buckets <= 1:
        w = Window.partitionBy(key).orderBy(*order_cols)
        return df.withColumn(
            flag, F.row_number().over(w) <= k
        )
    salt_src = F.col(salt_on if salt_on is not None else order_cols[-1])
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(key, "_salt").orderBy(*order_cols)
    p1 = salted.withColumn("_rn1", F.row_number().over(w1))
    # phase 2 ranks ONLY the ≤ k·salt_buckets survivors per key (the
    # whole point — never sort a full skewed group in one task)
    survivors = p1.filter(F.col("_rn1") <= k)
    losers = p1.filter(F.col("_rn1") > k).withColumn(flag, F.lit(False))
    w2 = Window.partitionBy(key).orderBy(*order_cols)
    ranked = survivors.withColumn(
        flag, F.row_number().over(w2) <= k
    )
    return ranked.unionByName(losers).drop("_salt", "_rn1")


def top_k_per_key(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    k: int,
    salt_buckets: int = 1,
    salt_on: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(top-k rows, remainder rows) per key — see mark_top_k_per_key."""
    marked = mark_top_k_per_key(df, key, order_cols, k, salt_buckets, salt_on)
    return (
        marked.filter(F.col("_topk")).drop("_topk"),
        marked.filter(~F.col("_topk")).drop("_topk"),
    )
