"""Distributed k-means (Lloyd's algorithm, fixed rounds) — integer-exact.

The repo's coarse quantizers (ivf_centroid_rows, PQ codebooks,
SemDeDup cells) all use a single-shot md5-rank sample as the codebook.
This module adds the missing primitive: ITERATIVE Lloyd refinement of
that codebook, the standard way real IVF/PQ/SemDeDup codebooks are
trained (Jégou et al. 2011 §III-A trains the coarse quantizer with
k-means; Abbas et al. 2023 §3 clusters with k-means before per-cell
dedup).

Engine-portability: all arithmetic is over integer-quantized vectors
(floor(x·scale) per element), so distances, argmins, and centroid
means are EXACT in any engine — no float-summation-order divergence.
Centroid means use floor(sum/count) with the division done in DOUBLE
on both sides: |sum| stays far below 2^53, division is correctly
rounded, and the true quotient is either an exact integer or at least
1/count away from one, so the floor is unambiguous cross-engine.

Scale: the codebook is k·dim longs — bounded, independent of corpus
size (the ivf_topk lesson). Per round, the corpus does ONE map-side
fold over the broadcast codebook (no shuffle) plus ONE aggregation
shuffle keyed by (cluster, dim) — k·dim cells, map-side combinable.
The only driver-side state is the k·dim centroid table per round.
Rounds are fixed (training budget), not convergence-polled, so the
job graph is static.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_vec(vec: Column, scale: int = 1000) -> Column:
    """Integer image of a float vector: floor(x·scale) per element.

    The cast to double first makes the product identical to SQL's
    ``embedding::DOUBLE[]`` path (FLOAT→DOUBLE is exact in IEEE)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * scale).cast("long")
    )


def _dist_sq(a: Column, b: Column) -> Column:
    """Exact squared L2 distance between two long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def _assign(e: DataFrame, cents: list[list[int]]) -> DataFrame:
    """Nearest-centroid assignment against a literal codebook.

    One transform scores every centroid once; the fold then compares
    scalars (the _top2 idiom from similarity.py). Strict < keeps the
    smallest cluster id on ties — the deterministic, engine-portable
    rule (the oracle's row_number ORDER BY d, cl). (Unrolling the
    distances to flat element_at chains was tried and REJECTED: flat
    chains evaluate ~8× slower than the fold — OPTIMIZATION_r06.md
    "negative results".)"""
    cents_lit = F.array(
        *[
            F.struct(
                F.lit(i).alias("cl"),
                F.array(*[F.lit(int(v)) for v in cv]).alias("cv"),
            )
            for i, cv in enumerate(cents)
        ]
    )
    scored = F.transform(
        cents_lit,
        lambda c: F.struct(
            c["cl"].alias("cl"), _dist_sq(F.col("qv"), c["cv"]).alias("d")
        ),
    )
    init = F.struct(
        F.lit(-1).alias("cl"),
        F.lit((1 << 62)).cast("long").alias("d"),
    )
    best = F.aggregate(
        scored,
        init,
        lambda acc, s: F.when(s["d"] < acc["d"], s).otherwise(acc),
    )
    return e.select(
        "vid",
        "qv",
        best["cl"].alias("cluster"),
        best["d"].alias("dist_q"),
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Lloyd's k-means with a fixed round budget; returns the final
    assignment (id, cluster, dist_q) under the trained codebook.

    Init: the k vectors with the smallest md5(id) (deterministic
    pseudo-random sample, the ivf_centroid_rows rule); cluster i is
    the i-th in that order. Each round: (1) assign every vector to its
    nearest centroid via a zero-shuffle fold over the broadcast
    codebook, (2) recompute centroids as the element-wise integer mean
    floor(sum/count) via a (cluster, dim)-keyed aggregation — k·dim
    result cells collected to the driver (bounded; this is the
    codebook, it MUST be small). A cluster that lost all members keeps
    its previous centroid.

    At 10^10 vectors each round is one scan + one tiny shuffle; the
    collect is k·dim longs. Reference parity: news-please has no
    clustering; this serves the training-data tier (SemDeDup cell
    training, IVF codebook training)."""
    e = emb.select(
        F.col(id_col).alias("vid"),
        quantize_vec(F.col(vec_col), scale).alias("qv"),
    )
    init_rows = (
        e.orderBy(F.md5(F.col("vid").cast("string")), "vid").limit(k).collect()
    )
    cents = [list(r.qv) for r in init_rows]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = _assign(e, cents)
        sums = (
            assigned.select(
                "cluster", F.posexplode("qv").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
        ).collect()
        new_cents = [list(cv) for cv in cents]
        for r in sums:
            new_cents[r.cluster][r.pos] = math.floor(r.s / r.c)
        cents = new_cents
    return _assign(e, cents).select(
        F.col("vid").alias(id_col), "cluster", "dist_q"
    )


def centroid_outliers(assigned: DataFrame, factor: int = 2) -> DataFrame:
    """Per-cluster centroid-distance outlier flagging over a k-means
    assignment (kmeans_assign output) — the embedding-space pruning
    gate real curation pipelines run after clustering: vectors far
    from every learned mode are OCR garbage, mislabeled scrapes, or
    off-distribution noise, and get routed to review/drop before
    training. Rule: flag iff dist_q > factor * mean(dist_q) of the
    vector's cluster, evaluated integer-exactly by cross-multiplying
    (dist_q * n > factor * sum_dist) — no division, so both engines
    agree bit-for-bit.

    Scale shape: one map-side-combinable (cluster)-keyed agg producing
    k rows, then a broadcast-sized join back onto the assignment —
    the corpus crosses one Exchange only if the assignment itself was
    not already partitioned; no per-row Python, no Window.

    Output: (vec_id, cluster, dist_q, is_outlier)."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    stats = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dist_q").alias("_sd")
    )
    return assigned.join(F.broadcast(stats), "cluster").select(
        "vec_id",
        "cluster",
        "dist_q",
        (
            F.col("dist_q") * F.col("_n")
            > F.lit(int(factor)) * F.col("_sd")
        ).alias("is_outlier"),
    )
