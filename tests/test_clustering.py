"""Lloyd k-means (operators/clustering.py): bit-exact vs a pure-numpy
replication, empty-cluster carry-over, and the nearest-centroid
invariant of the final assignment."""

from __future__ import annotations

import math

import numpy as np

from news_please_spark.operators.clustering import kmeans_assign


def _np_lloyd(ids, vecs, k, iters, scale=1000):
    """Reference Lloyd on integer-quantized vectors, mirroring the
    operator's contract: md5-rank init, strict-< smallest-cluster tie
    rule, floor(sum/count) means, empty clusters keep old centroids."""
    import hashlib

    qv = np.floor(np.asarray(vecs, dtype=np.float64) * scale).astype(np.int64)
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )
    cents = [qv[order[j]].copy() for j in range(k)]

    def assign():
        out = []
        for row in qv:
            dists = [int(((row - c) ** 2).sum()) for c in cents]
            best = min(range(k), key=lambda j: (dists[j], j))
            out.append((best, dists[best]))
        return out

    for _ in range(iters):
        a = assign()
        sums = {j: (np.zeros_like(cents[0]), 0) for j in range(k)}
        for (cl, _), row in zip(a, qv):
            s, c = sums[cl]
            sums[cl] = (s + row, c + 1)
        for j in range(k):
            s, c = sums[j]
            if c:
                cents[j] = np.array(
                    [math.floor(x / c) for x in s], dtype=np.int64
                )
    return {ids[i]: a for i, a in enumerate(assign())}, cents


def _emb_df(spark, ids, vecs):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_matches_numpy_lloyd(spark):
    rng = np.random.RandomState(7)
    ids = list(range(60))
    vecs = rng.randn(60, 6).astype(np.float32)
    df = _emb_df(spark, ids, vecs)
    got = {
        r.vec_id: (r.cluster, r.dist_q)
        for r in kmeans_assign(df, k=4, iters=3).collect()
    }
    want, _ = _np_lloyd(ids, vecs.astype(np.float64), k=4, iters=3)
    assert got == want


def test_kmeans_final_assignment_is_nearest_centroid(spark):
    rng = np.random.RandomState(11)
    ids = list(range(40))
    vecs = rng.randn(40, 5)
    df = _emb_df(spark, ids, vecs)
    rows = kmeans_assign(df, k=3, iters=2).collect()
    _, cents = _np_lloyd(ids, vecs, k=3, iters=2)
    qv = np.floor(np.asarray(vecs) * 1000).astype(np.int64)
    for r in rows:
        row = qv[r.vec_id]
        dists = [int(((row - c) ** 2).sum()) for c in cents]
        best = min(range(3), key=lambda j: (dists[j], j))
        assert (r.cluster, r.dist_q) == (best, dists[best])


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # two tight blobs, k=3: one centroid never wins a member and must
    # carry over unchanged (no crash, no NaN centroid)
    ids = list(range(8))
    vecs = [[0.0, 0.0]] * 4 + [[9.0, 9.0]] * 4
    df = _emb_df(spark, ids, vecs)
    rows = kmeans_assign(df, k=3, iters=2).collect()
    want, _ = _np_lloyd(ids, vecs, k=3, iters=2)
    assert {r.vec_id: (r.cluster, r.dist_q) for r in rows} == want
    assert len(rows) == 8


def test_kmeans_codebook_size_independent_of_corpus(spark):
    # 5x more vectors, same k: the literal codebook in the final plan
    # stays k structs (the bounded-broadcast contract from ivf_topk)
    rng = np.random.RandomState(3)
    small = _emb_df(spark, range(20), rng.randn(20, 4))
    big = _emb_df(spark, range(100), rng.randn(100, 4))
    p_small = kmeans_assign(small, k=4, iters=1)._jdf.queryExecution().toString()
    p_big = kmeans_assign(big, k=4, iters=1)._jdf.queryExecution().toString()
    assert p_small.count("named_struct") == p_big.count("named_struct")


def test_centroid_outliers_flags_far_points(spark):
    """Points at ~mean distance stay; a point beyond factor*mean is
    flagged — exact integer rule, per cluster independently."""
    from news_please_spark.operators.clustering import centroid_outliers

    rows = [
        # cluster 0: dists 10, 10, 10, 100 -> mean 32; 100*4 > 2*130
        (1, 0, 10), (2, 0, 10), (3, 0, 10), (4, 0, 100),
        # cluster 1: uniform dists -> nothing flagged
        (5, 1, 50), (6, 1, 50),
    ]
    df = spark.createDataFrame(rows, "vec_id long, cluster int, dist_q long")
    got = {r.vec_id: r.is_outlier for r in centroid_outliers(df).collect()}
    assert got == {1: False, 2: False, 3: False, 4: True, 5: False, 6: False}


def test_centroid_outliers_boundary_not_flagged(spark):
    """dist == factor * mean exactly is NOT an outlier (strict >)."""
    from news_please_spark.operators.clustering import centroid_outliers

    # dists 1, 1, 4: sum 6, n 3; 4*3 = 12 == 2*6 -> not flagged
    df = spark.createDataFrame(
        [(1, 0, 1), (2, 0, 1), (3, 0, 4)],
        "vec_id long, cluster int, dist_q long",
    )
    got = {r.vec_id: r.is_outlier for r in centroid_outliers(df).collect()}
    assert got == {1: False, 2: False, 3: False}


def test_centroid_outliers_rejects_bad_factor(spark):
    import pytest

    from news_please_spark.operators.clustering import centroid_outliers

    df = spark.createDataFrame([(1, 0, 1)], "vec_id long, cluster int, dist_q long")
    with pytest.raises(ValueError):
        centroid_outliers(df, factor=0)
