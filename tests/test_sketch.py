"""operators/sketch: count-min sketch vs exact counts — overestimate
property, exact equality for isolated tokens, python-oracle parity,
zero-shuffle estimation plan."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from news_please_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_counters,
    cms_estimate,
)


def _py_bucket(token: str, row: int, width: int = CMS_WIDTH) -> int:
    h = hashlib.md5(f"{row}|{token}".encode()).hexdigest()[:8]
    return int(h, 16) % width


def _py_cms(occurrences, depth=CMS_DEPTH, width=CMS_WIDTH):
    counters = {}
    for tok in occurrences:
        for i in range(depth):
            key = (i, _py_bucket(tok, i, width))
            counters[key] = counters.get(key, 0) + 1
    return counters


def _py_estimate(token, counters, depth=CMS_DEPTH, width=CMS_WIDTH):
    return min(
        counters.get((i, _py_bucket(token, i, width)), 0) for i in range(depth)
    )


def test_cms_matches_python_oracle_and_overestimates(spark):
    occurrences = (
        ["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 5 + ["delta"] * 1
        + [f"noise{i}" for i in range(200)]
    )
    df = spark.createDataFrame([(t,) for t in occurrences], "token string")
    counters = cms_counters(df)
    got_counters = {
        (r.row, r.bucket): r.cnt for r in counters.collect()
    }
    assert got_counters == _py_cms(occurrences)
    queries = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",), ("absent",)],
        "token string",
    )
    est = {r.token: r.est for r in cms_estimate(queries, counters).collect()}
    true = {t: occurrences.count(t) for t in ("alpha", "beta", "gamma", "delta")}
    for t, n in true.items():
        assert est[t] >= n  # CMS never underestimates
        assert est[t] == _py_estimate(t, _py_cms(occurrences))
    # absent token: estimate is whatever collisions put there, >= 0
    assert est["absent"] == _py_estimate("absent", _py_cms(occurrences))


def test_cms_estimate_is_query_side_shuffle_free(spark):
    df = spark.createDataFrame([(f"t{i}",) for i in range(50)], "token string")
    counters = cms_counters(df).localCheckpoint()
    q = spark.createDataFrame([("t1",), ("t2",)], "token string")
    plan = (
        cms_estimate(q, counters)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # estimation = broadcast joins + least(): no Exchange on the query path
    assert "Exchange" not in plan.replace("BroadcastExchange", "BX"), plan


# ---------------------------------------------------------------------------
# HyperLogLog


def _py_hll_registers(items, p=8):
    regs = {}
    nbits = 32 - p
    for it in set(items):
        h = int(hashlib.md5(it.encode()).hexdigest()[:8], 16)
        bucket = h >> nbits
        rest = h & ((1 << nbits) - 1)
        rho = nbits + 1 if rest == 0 else nbits + 1 - rest.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_hll_estimate(regs, p=8):
    m = 1 << p
    big_r = (32 - p) + 1
    s = sum(1 << (big_r - rho) for rho in regs.values())
    s += (m - len(regs)) * (1 << big_r)
    return (7213 * m**3 * (1 << big_r)) // ((10000 * m + 10790) * s)


def test_hll_matches_python_oracle(spark):
    from news_please_spark.operators.sketch import hll_estimate, hll_registers

    items = [f"url{i}" for i in range(3000)] + [f"url{i}" for i in range(500)]
    df = spark.createDataFrame([(t,) for t in items], "token string")
    regs = hll_registers(df)
    got = {r.bucket: r.max_rho for r in regs.collect()}
    assert got == _py_hll_registers(items)
    est = hll_estimate(regs).first().hll_est
    assert est == _py_hll_estimate(got)
    # raw-HLL error bound: ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est - 3000) < 0.20 * 3000


def test_hll_merge_equals_union_sketch(spark):
    from news_please_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    a_items = [f"a{i}" for i in range(800)]
    b_items = [f"b{i}" for i in range(600)] + a_items[:300]
    a = spark.createDataFrame([(t,) for t in a_items], "token string")
    b = spark.createDataFrame([(t,) for t in b_items], "token string")
    merged = {
        r.bucket: r.max_rho
        for r in hll_merge(hll_registers(a), hll_registers(b)).collect()
    }
    union = {
        r.bucket: r.max_rho
        for r in hll_registers(a.unionByName(b)).collect()
    }
    assert merged == union  # sketch(A ∪ B) == merge(sketch A, sketch B)


def test_hll_grouped_registers_bounded(spark):
    from news_please_spark.operators.sketch import hll_registers

    rows = [(f"s{i % 3}", f"tok{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "source string, token string")
    regs = hll_registers(df, group_cols=("source",))
    per_group = {
        r.source: r.n for r in
        regs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(per_group) == {"s0", "s1", "s2"}
    assert all(n <= 256 for n in per_group.values())


# --- KMV / bottom-k -------------------------------------------------------

def test_kmv_exact_mode_small_groups(spark):
    """Groups below k are exhaustive: overlap output equals ground
    truth exactly."""
    from news_please_spark.operators.sketch import kmv_overlap_pairs, kmv_sketches

    rows = [("a", f"x{i}") for i in range(30)] + [
        ("b", f"x{i}") for i in range(20, 50)
    ]
    df = spark.createDataFrame(rows, "g string, item string")
    sk = kmv_sketches(df, "item", "g", k=256)
    got = {r.g: (len(r.ks), r.nd) for r in sk.collect()}
    assert got == {"a": (30, 30), "b": (30, 30)}
    out = kmv_overlap_pairs(sk, k=256).collect()[0]
    assert (out.g_a, out.g_b) == ("a", "b")
    assert out.union_est == 50 and out.inter_est == 10
    assert out.jaccard_q == 10000 * 10 // 50


def test_kmv_estimates_within_tolerance(spark):
    """Large disjoint-plus-shared groups: estimates land within ~25%
    of truth at k=128 (deterministic — same input, same sketch)."""
    from news_please_spark.operators.sketch import kmv_overlap_pairs, kmv_sketches

    shared = [f"s{i}" for i in range(2000)]
    rows = (
        [("a", f"a{i}") for i in range(4000)]
        + [("b", f"b{i}") for i in range(4000)]
        + [("a", s) for s in shared]
        + [("b", s) for s in shared]
    )
    df = spark.createDataFrame(rows, "g string, item string").repartition(8)
    sk = kmv_sketches(df, "item", "g", k=128)
    skd = {r.g: r for r in sk.collect()}
    assert skd["a"].nd == 6000 and len(skd["a"].ks) == 128
    out = kmv_overlap_pairs(sk, k=128).collect()[0]
    # truth: union 10000, intersection 2000, jaccard 0.2
    assert abs(out.union_est - 10000) / 10000 < 0.25, out.union_est
    assert abs(out.jaccard_q - 2000) < 1200, out.jaccard_q
    # determinism: rebuilding the sketch yields identical output
    out2 = kmv_overlap_pairs(kmv_sketches(df, "item", "g", k=128), k=128).collect()[0]
    assert out == out2


def test_kmv_merge_equals_sketch_of_union(spark):
    """The mergeability property: per-part sketches merged == the
    sketch built from the union, hash-for-hash (k smallest of a union
    live inside the union of per-part k-smallest sets)."""
    from news_please_spark.operators.sketch import kmv_merge, kmv_sketches
    import pyspark.sql.functions as F

    rows = (
        [("p1", f"x{i}") for i in range(3000)]
        + [("p2", f"y{i}") for i in range(3000)]
        + [("p3", f"z{i}") for i in range(1000)]
    )
    df = spark.createDataFrame(rows, "part string, item string")
    per_part = kmv_sketches(df, "item", "part", k=64)
    merged = kmv_merge(per_part, F.lit("all"), k=64).collect()[0]
    direct = kmv_sketches(
        df.select(F.lit("all").alias("g"), "item"), "item", "g", k=64
    ).collect()[0]
    assert merged.ks == direct.ks
    assert merged.nd == direct.nd == 7000  # disjoint parts: nd adds
