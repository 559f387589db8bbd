"""IVF ANN operator: structural invariants + exact equality with the
brute-force baseline when every list is probed (nprobe covers all
centroids ⇒ the approximation is exhaustive and must agree)."""

from pyspark.sql import functions as F

from news_please_spark.operators.similarity import (
    brute_force_topk,
    ivf_centroid_rows,
    ivf_topk,
)


def _vecs(spark, n=40, dim=8):
    """Two deterministic clusters around +e0 and +e1 with small
    per-dimension jitter — separable, no RNG."""
    rows = []
    for i in range(n):
        base = 0 if i % 2 == 0 else 1
        v = [0.05 * ((i * 7 + j * 3) % 11 - 5) for j in range(dim)]
        v[base] += 10.0
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_structure(spark):
    e = _vecs(spark)
    q = e.filter(F.col("vec_id") < 4)
    out = ivf_topk(q, e, k=3, nprobe=2, centroid_stride=10).collect()
    per_q = {}
    for r in out:
        assert r["query_id"] != r["neighbor_id"]
        per_q.setdefault(r["query_id"], []).append(r["sim_q"])
    assert set(per_q) == {0, 1, 2, 3}
    for sims in per_q.values():
        assert len(sims) <= 3
        assert sims == sorted(sims, reverse=True)


def test_ivf_equals_brute_force_when_all_lists_probed(spark):
    # stride 20 over ids 0..39 → exactly 2 centroids (0, 20); nprobe=2
    # probes both lists, so IVF degenerates to exhaustive search
    e = _vecs(spark)
    q = e.filter(F.col("vec_id") % 5 == 0)
    ivf = {
        (r["query_id"], r["neighbor_id"]): r["sim_q"]
        for r in ivf_topk(q, e, k=4, nprobe=2, centroid_stride=20).collect()
    }
    # brute-force ALL sims, then rank on the QUANTIZED value with the
    # same (sim_q desc, neighbor asc) tie-break ivf_topk uses — ranking
    # raw doubles would pick different members inside a quantization tie
    all_sims = brute_force_topk(q, e, k=10**9).collect()
    by_q = {}
    for r in all_sims:
        by_q.setdefault(r["query_id"], []).append(
            (-int(r["cos"] * 10000 // 1), r["neighbor_id"])
        )
    bf = {
        (qid, nid): -negq
        for qid, sims in by_q.items()
        for negq, nid in sorted(sims)[:4]
    }
    assert ivf == bf


def test_ivf_codebook_size_is_bounded(spark):
    # the scale contract: n_lists decouples from corpus size — a 10×
    # larger corpus yields the SAME number of centroids (the broadcast
    # and the per-row assignment fold stay O(n_lists) at any n)
    small, big = _vecs(spark, n=200), _vecs(spark, n=2000)
    assert ivf_centroid_rows(small, n_lists=16).count() == 16
    assert ivf_centroid_rows(big, n_lists=16).count() == 16
    # and the md5-rank sample is deterministic: same corpus, same set
    a = sorted(r["cid"] for r in ivf_centroid_rows(big, n_lists=16).collect())
    b = sorted(r["cid"] for r in ivf_centroid_rows(big, n_lists=16).collect())
    assert a == b


def test_ivf_external_queries_not_dropped(spark):
    # queries whose ids are ABSENT from the corpus must still probe
    # (query cells derive from the queries table, not a corpus semi-join)
    e = _vecs(spark, n=40)
    q = _vecs(spark, n=40).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    ).filter(F.col("vec_id") < 10_004)
    out = ivf_topk(q, e, k=3, nprobe=2, n_lists=4).collect()
    got = {r["query_id"] for r in out}
    assert got == {10_000, 10_001, 10_002, 10_003}
    for r in out:
        assert r["neighbor_id"] < 40  # neighbors come from the corpus


def test_ivf_single_centroid_drops_second_probe(spark):
    # stride larger than any id → only vec_id=0 is a centroid; the
    # second probe slot is the -1 sentinel and must be dropped, with
    # every vector landing in the single list (exhaustive again)
    e = _vecs(spark, n=12)
    q = e.filter(F.col("vec_id") < 2)
    out = ivf_topk(q, e, k=100, nprobe=2, centroid_stride=10_000)
    rows = out.groupBy("query_id").count().collect()
    assert {r["query_id"]: r["count"] for r in rows} == {0: 11, 1: 11}


# ---------------------------------------------------------------------------
# ivf_assign_cells + semantic_dedup (SemDeDup)


def _py_cells(rows, n_lists):
    """Python oracle for ivf_assign_cells: md5-rank codebook, argmax
    cosine with smallest-cid tiebreak."""
    import hashlib
    import math

    cents = sorted(rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest())[
        :n_lists
    ]
    cents = sorted((cid, cv) for cid, cv in cents)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    out = {}
    for vid, v in rows:
        best = (-1, -2.0)
        for cid, cv in cents:
            c = cos(v, cv)
            if c > best[1]:
                best = (cid, c)
        out[vid] = best[0]
    return out


def test_ivf_assign_cells_matches_python_oracle(spark):
    from news_please_spark.operators.similarity import ivf_assign_cells

    e = _vecs(spark, n=30)
    rows = [(r.vec_id, list(r.embedding)) for r in e.collect()]
    got = {r.vec_id: r.cell for r in ivf_assign_cells(e, n_lists=4).collect()}
    assert got == _py_cells(rows, 4)


def test_semantic_dedup_flags_planted_near_dups(spark):
    from news_please_spark.operators.dedup import semantic_dedup

    # two clusters; ids 100/101 duplicate id 0's vector (tiny jitter),
    # id 200 duplicates id 1's
    base = [(i, r) for i, r in enumerate(
        [[10.0, 0.0, 0.1, 0.0], [0.0, 10.0, 0.0, 0.1]] * 5
    )]
    dups = [
        (100, [10.0, 0.001, 0.1, 0.0]),
        (101, [10.0, 0.0, 0.101, 0.0]),
        (200, [0.001, 10.0, 0.0, 0.1]),
    ]
    e = spark.createDataFrame(base + dups, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.is_dup for r in semantic_dedup(e, n_lists=2, threshold=0.999).collect()}
    assert len(out) == 13
    # every doc nearly-identical to a smaller-id doc is flagged
    assert out[100] and out[101] and out[200]
    # the smallest id of each identical group survives
    assert not out[0] and not out[1]
    # identical copies of 0/1 at larger ids are dups of them
    for i in range(2, 10):
        assert out[i]


def test_semantic_dedup_repartition_invariant(spark):
    from news_please_spark.operators.dedup import semantic_dedup

    e = _vecs(spark, n=24)
    a = sorted(map(tuple, semantic_dedup(e, n_lists=3, threshold=0.9).collect()))
    b = sorted(
        map(tuple, semantic_dedup(e.repartition(5), n_lists=3, threshold=0.9).collect())
    )
    assert a == b


def test_semantic_dedup_pre_bucketed_still_flags_identicals(spark):
    """The scale path (cell = LSH bucket x IVF cell): near-identical
    vectors share the full sign signature, so planted dups are still
    flagged; far vectors that merely share an ivf cell now need the
    bucket too (a superset of the plain-cell constraint)."""
    from news_please_spark.operators.dedup import semantic_dedup

    base = [(i, r) for i, r in enumerate(
        [[10.0, 0.0, 0.1, 0.0], [0.0, 10.0, 0.0, 0.1]] * 5
    )]
    dups = [(100, [10.0, 0.001, 0.1, 0.0]), (200, [0.001, 10.0, 0.0, 0.1])]
    e = spark.createDataFrame(base + dups, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.is_dup for r in
           semantic_dedup(e, n_lists=2, threshold=0.999, pre_bucket_planes=6).collect()}
    assert out[100] and out[200] and not out[0] and not out[1]
    # flagged set is a subset of the unbucketed run's
    plain = {r.vec_id: r.is_dup for r in
             semantic_dedup(e, n_lists=2, threshold=0.999).collect()}
    assert all(plain[k] for k, v in out.items() if v)


# ---------------------------------------------------------------------------
# Product quantization + ADC


def _py_pq(vectors, queries, dim, m, n_cents, k):
    import hashlib

    sub = dim // m
    sel = sorted(vectors, key=lambda kv: hashlib.md5(str(kv[0]).encode()).hexdigest())[
        :n_cents
    ]
    cents = [v for _, v in sorted(sel)]  # cid-sorted

    def l2sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def sub_d(v, c, mm):
        return l2sq(v[mm * sub : (mm + 1) * sub], c[mm * sub : (mm + 1) * sub])

    codes = {}
    for vid, v in vectors:
        cs = []
        for mm in range(m):
            ds = [sub_d(v, c, mm) for c in cents]
            cs.append(ds.index(min(ds)) + 1)
        codes[vid] = cs
    out = {}
    for qid, qv in queries:
        luts = [[sub_d(qv, c, mm) for c in cents] for mm in range(m)]
        scored = []
        for vid, _ in vectors:
            if vid == qid:
                continue
            d = 0.0
            for mm in range(m):
                d = d + luts[mm][codes[vid][mm] - 1]
            scored.append((int(__import__("math").floor(d * 1e6)), vid))
        scored.sort()
        for rk, (dq, vid) in enumerate(scored[:k], 1):
            out[(qid, vid)] = (dq, rk)
    return codes, out


def _pq_vectors(n=40, dim=16):
    # deterministic "random" doubles in [-1, 1]
    def val(i, j):
        return (((i * 2654435761 + j * 40503) % 2000) - 1000) / 1000.0

    return [(i, [val(i, j) for j in range(dim)]) for i in range(n)]


def test_pq_adc_matches_python_oracle(spark):
    from news_please_spark.operators.similarity import pq_adc_topk, pq_encode

    vecs = _pq_vectors()
    queries = [v for v in vecs if v[0] % 7 == 0]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(queries, "vec_id long, embedding array<double>")
    py_codes, py_topk = _py_pq(vecs, queries, dim=16, m=4, n_cents=8, k=5)
    got_codes = {
        r.vec_id: list(r.codes)
        for r in pq_encode(df, dim=16, m=4, n_cents=8).collect()
    }
    assert got_codes == py_codes
    got = {
        (r.query_id, r.neighbor_id): (r.dist_q, r.rk)
        for r in pq_adc_topk(qdf, df, dim=16, k=5, m=4, n_cents=8).collect()
    }
    assert got == py_topk


def test_pq_encode_partition_invariant_and_bounded(spark):
    from news_please_spark.operators.similarity import pq_encode

    vecs = _pq_vectors(60)
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    one = sorted(
        (r.vec_id, tuple(r.codes))
        for r in pq_encode(df.coalesce(1), dim=16, m=4, n_cents=8).collect()
    )
    many = sorted(
        (r.vec_id, tuple(r.codes))
        for r in pq_encode(df.repartition(7), dim=16, m=4, n_cents=8).collect()
    )
    assert one == many
    assert all(1 <= c <= 8 for _, cs in one for c in cs)
    assert all(len(cs) == 4 for _, cs in one)


def test_pq_guards(spark):
    import pytest

    from news_please_spark.operators.similarity import pq_adc_topk, pq_encode

    df = spark.createDataFrame(_pq_vectors(5), "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        pq_encode(df, dim=10, m=4)
    with pytest.raises(ValueError):
        pq_adc_topk(df, df, dim=16, m=4, k=0)


# ---------------------------------------------------------------------------
# IVFADC (coarse routing + ADC scoring)


def test_ivfadc_subset_of_full_adc(spark):
    """Every IVFADC hit appears in the full ADC scan with the SAME
    quantized distance (routing changes the candidate set, never the
    estimator), and hits respect the probed-cell structure."""
    from pyspark.sql import functions as F

    from news_please_spark.operators.similarity import (
        ivf_assign_cells,
        ivfadc_topk,
        pq_adc_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 101 == 0)
    ivfadc = ivfadc_topk(q, emb, dim=64, k=10, n_lists=16, nprobe=2)
    full = pq_adc_topk(q, emb, dim=64, k=10**9)  # unranked-complete scan
    got = {(r.query_id, r.neighbor_id): r.dist_q for r in ivfadc.collect()}
    assert got, "no IVFADC results"
    ref = {(r.query_id, r.neighbor_id): r.dist_q for r in full.collect()}
    for pair, d in got.items():
        assert ref[pair] == d, pair
    # structure: every returned neighbor lives in one of the query's cells
    cells = {r.vec_id: r.cell for r in ivf_assign_cells(emb, n_lists=16).collect()}
    probe = {}
    for r in ivfadc.select("query_id").distinct().collect():
        probe[r.query_id] = set()
    for (qid, nid) in got:
        probe[qid].add(cells[nid])
    assert all(len(cs) <= 2 for cs in probe.values())


def test_ivfadc_bad_args(spark):
    import pytest as _pytest

    from news_please_spark.operators.similarity import ivfadc_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with _pytest.raises(ValueError):
        ivfadc_topk(emb, emb, dim=63)
    with _pytest.raises(ValueError):
        ivfadc_topk(emb, emb, dim=64, k=0)


# ---------------------------------------------------------------------------
# Rademacher random projection (JL)


def _np_project(vecs, out_dim, in_dim, scale=1000):
    import hashlib

    import numpy as np

    qv = np.floor(np.asarray(vecs, dtype=np.float64) * scale).astype(np.int64)
    signs = np.array(
        [
            [
                1 if hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0] < "8" else -1
                for i in range(1, in_dim + 1)
            ]
            for j in range(out_dim)
        ],
        dtype=np.int64,
    )
    return qv @ signs.T


def test_random_project_matches_numpy(spark):
    import numpy as np

    from news_please_spark.operators.similarity import random_project

    rng = np.random.RandomState(5)
    vecs = rng.randn(30, 12).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {}
    for r in random_project(df, out_dim=6, in_dim=12).collect():
        got.setdefault(r.vec_id, {})[r.dim] = r.y
    want = _np_project(vecs, 6, 12)
    for vid in range(30):
        assert [got[vid][d] for d in range(6)] == list(want[vid])


def test_random_project_preserves_distance_ordering(spark):
    """JL property smoke: with a 64->16 projection, the NEAREST of two
    candidates (one close, one far) stays nearest in projected space."""
    import numpy as np

    from news_please_spark.operators.similarity import random_project

    rng = np.random.RandomState(9)
    base = rng.randn(64)
    close = base + 0.01 * rng.randn(64)
    far = rng.randn(64) * 3
    df = spark.createDataFrame(
        [(0, [float(x) for x in base]),
         (1, [float(x) for x in close]),
         (2, [float(x) for x in far])],
        "vec_id long, embedding array<float>",
    )
    y = {}
    for r in random_project(df, out_dim=16, in_dim=64).collect():
        y.setdefault(r.vec_id, [0] * 16)[r.dim] = r.y
    d = lambda a, b: sum((x - z) ** 2 for x, z in zip(a, b))
    assert d(y[0], y[1]) < d(y[0], y[2])


def test_random_project_zero_shuffle(spark):
    from news_please_spark.operators.similarity import random_project

    df = spark.createDataFrame(
        [(0, [0.5] * 8)], "vec_id long, embedding array<float>"
    )
    plan = (
        random_project(df, out_dim=4, in_dim=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# hard-negative mining


def test_hard_negatives_band_and_ranking(spark):
    import numpy as np

    from news_please_spark.operators.similarity import hard_negatives

    # construct controlled cosines against the query [1, 0]:
    vecs = {
        0: [1.0, 0.0],     # the query itself (excluded: self)
        1: [1.0, 0.001],   # ~1.0 -> above hi band (near-dup, excluded)
        2: [1.0, 0.5],     # cos ~0.894 -> hard negative
        3: [1.0, 1.0],     # cos ~0.707 -> hard negative
        4: [0.2, 1.0],     # cos ~0.196 -> below lo band (easy, excluded)
        5: [-1.0, 0.0],    # cos -1 -> excluded
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    q = df.filter("vec_id = 0")
    got = [
        (r.neg_id, r.rk)
        for r in hard_negatives(q, df, k=5, lo_q=3000, hi_q=9900)
        .orderBy("rk")
        .collect()
    ]
    assert got == [(2, 1), (3, 2)]
    # numpy cross-check of the band edges
    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert int(cos(vecs[0], vecs[1]) * 10000) >= 9900
    assert int(cos(vecs[0], vecs[4]) * 10000) < 3000


def test_hard_negatives_corpus_never_shuffled_before_band(spark):
    from news_please_spark.operators.similarity import hard_negatives

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    q = df.filter("vec_id = 0")
    plan = (
        hard_negatives(q, df, k=2)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the band filter must sit BELOW the window (on the join output),
    # so only in-band rows reach the ranking shuffle
    win_pos = plan.find("Window")
    filt = [i for i in _find_all_hn(plan, "sim_q#") if i > win_pos]
    assert "Window" in plan
    assert plan.find("Filter", win_pos) != -1  # a filter below the window


def _find_all_hn(s, needle):
    out, i = [], s.find(needle)
    while i != -1:
        out.append(i)
        i = s.find(needle, i + 1)
    return out


# ---------------------------------------------------------------------------
# int8 quantization


def test_vec_quantize_matches_numpy(spark):
    import math

    import numpy as np

    from news_please_spark.operators.similarity import vec_quantize_int8

    rng = np.random.RandomState(13)
    vecs = rng.randn(40, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in vec_quantize_int8(df).collect()}
    for i, v in enumerate(vecs):
        v = v.astype(np.float64)
        scale_q = math.floor(1e6 * float(np.abs(v).max()))
        codes = [
            int(max(-127.0, min(127.0, math.floor(x * 127 * 1e6 / scale_q + 0.5))))
            for x in v
        ]
        err = math.floor(
            1e6 * sum(abs(x - c * scale_q / (127 * 1e6)) for x, c in zip(v, codes))
        )
        r = got[i]
        assert (r.scale_q, list(r.codes), r.err_q) == (scale_q, codes, err)
        assert all(-127 <= c <= 127 for c in r.codes)


def test_vec_quantize_zero_vector_and_reconstruction(spark):
    import numpy as np

    from news_please_spark.operators.similarity import vec_quantize_int8

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -0.5, 0.25])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in vec_quantize_int8(df).collect()}
    assert got[0].scale_q == 0 and list(got[0].codes) == [0, 0, 0]
    assert got[0].err_q == 0
    # reconstruction of a clean power-of-two vector is near-exact
    r = got[1]
    recon = [c * r.scale_q / (127 * 1e6) for c in r.codes]
    assert np.allclose(recon, [1.0, -0.5, 0.25], atol=0.01)


def test_vec_quantize_zero_shuffle(spark):
    from news_please_spark.operators.similarity import vec_quantize_int8

    df = spark.createDataFrame([(0, [0.5, 1.0])], "vec_id long, embedding array<float>")
    plan = vec_quantize_int8(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_margin_mine_hub_suppression_and_exactness(spark):
    """A sharp match gets a high margin; a hub-like query whose
    neighborhood is uniformly similar hovers near 10000 and is
    rejected at threshold 10500."""
    from news_please_spark.operators.similarity import margin_mine

    # query 0: one strong match (cos 1.0) among weak ones
    # query 100: everything equally similar (hub) -> margin ~ 10000
    qs = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (100, [0.5, 0.5, 0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),      # exact match for q0
            (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
            (3, [0.5, 0.5, 0.5, 0.5]),      # hub direction
            (4, [0.5, 0.5, 0.5, 0.49]),     # near-hub
            (5, [0.49, 0.5, 0.5, 0.5]),     # near-hub
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r.query_id: r for r in margin_mine(qs, corpus, k=3).collect()}
    r0 = out[0]
    assert r0.neighbor_id == 1 and r0.cos_q == 10000 and r0.accepted
    assert r0.margin_q > 10500
    rh = out[100]
    assert not rh.accepted
    assert abs(rh.margin_q - 10000) < 200  # uniform neighborhood -> ratio ~1


def test_margin_mine_drops_nonpositive_neighborhoods(spark):
    from news_please_spark.operators.similarity import margin_mine

    qs = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [(1, [-1.0, 0.0]), (2, [-1.0, -0.1])],
        "vec_id long, embedding array<double>",
    )
    assert margin_mine(qs, corpus, k=2).count() == 0


# ---------------------------------------------------------------------------
# dim_truncation_audit


def test_dim_truncation_audit_detects_tail_flip(spark):
    from news_please_spark.operators.similarity import dim_truncation_audit

    # prefix = first 2 dims. q's full-top1 is n1 (tail dims agree);
    # on the prefix alone n2 wins instead -> overlap 0 for k=1.
    rows = [
        (0, [1.0, 0.0, 1.0, 0.0]),       # query
        (1, [0.6, 0.5, 1.0, 0.0]),       # full winner (tail aligned)
        (2, [1.0, 0.0, -1.0, 0.0]),      # prefix winner (tail opposed)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0")
    out = dim_truncation_audit(df, q, k=1, prefix_dims=2).collect()
    assert len(out) == 1
    assert out[0]["n_hits"] == 0 and out[0]["recall_bp"] == 0


def test_dim_truncation_audit_full_recall_when_prefix_suffices(spark):
    from news_please_spark.operators.similarity import dim_truncation_audit

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.1, 0.9, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0")
    out = dim_truncation_audit(df, q, k=2, prefix_dims=2).collect()[0]
    # tail dims are zero: prefix ranking == full ranking
    assert out["n_hits"] == 2 and out["recall_bp"] == 10000


def test_dim_truncation_audit_rejects_bad_args(spark):
    import pytest
    from news_please_spark.operators.similarity import dim_truncation_audit

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        dim_truncation_audit(df, df, k=0)
