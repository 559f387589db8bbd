"""operators/sampling: deterministic mixture sampling + skew-safe
per-group top-fraction. The key contracts: bit-identical output to the
naive window plan, and invariance under repartitioning."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from news_please_spark.operators.sampling import (
    mixture_sample,
    rate_to_hex8,
    topfrac_per_group,
)


def _naive_topfrac(df, group_col, score_col, frac_pct, id_col):
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    wk = Window.partitionBy(group_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_k", ((F.count(F.lit(1)).over(wk) * frac_pct + 99) / 100).cast("long")
        )
        .filter(F.col("_rn") <= F.col("_k"))
        .drop("_rn", "_k")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_topfrac_matches_naive_window_with_ties(spark):
    # scores engineered so every group has a boundary cell with ties:
    # group g, ids 0..n-1, score = id // 3 (triples share a score)
    rows = [
        (g, i + 100 * gi, (i // 3))
        for gi, (g, n) in enumerate([("a", 10), ("b", 7), ("c", 1), ("d", 3)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "grp string, doc_id long, score long")
    for pct in (10, 30, 50, 100):
        got = _rows(topfrac_per_group(df, "grp", "score", pct, "doc_id"))
        want = _rows(_naive_topfrac(df, "grp", "score", pct, "doc_id"))
        assert got == want, f"pct={pct}"
        # exactly ceil(pct% * n) rows per group
        by_g = {}
        for g, *_ in got:
            by_g[g] = by_g.get(g, 0) + 1
        for g, n in [("a", 10), ("b", 7), ("c", 1), ("d", 3)]:
            assert by_g.get(g, 0) == -(-n * pct // 100)


def test_topfrac_repartition_invariant(spark):
    rows = [("g", i, i % 4) for i in range(50)]
    df = spark.createDataFrame(rows, "grp string, doc_id long, score long")
    a = _rows(topfrac_per_group(df.repartition(1), "grp", "score", 37, "doc_id"))
    b = _rows(topfrac_per_group(df.repartition(13, "score"), "grp", "score", 37, "doc_id"))
    assert a == b and len(a) == 19  # ceil(50*0.37)


def test_mixture_sample_rates_and_determinism(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"),
    )
    rates = {"s0": 1.0, "s1": 0.25}
    out = mixture_sample(df, rates)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["s0"] == 1000  # rate 1.0 keeps everything
    assert 150 <= per["s1"] <= 350  # ~250 expected, hash-uniform
    # deterministic across partitioning: same kept set
    a = _rows(out)
    b = _rows(mixture_sample(df.repartition(17), rates))
    assert a == b
    # sources absent from the rates dict are dropped entirely
    assert mixture_sample(df, {"s0": 0.5}).filter(F.col("source") == "s1").count() == 0


def test_rate_to_hex8_boundaries():
    assert rate_to_hex8(0.0) == "00000000"
    assert rate_to_hex8(1.0) == "ffffffff"
    assert rate_to_hex8(0.5) == "80000000"
    # monotone
    hexes = [rate_to_hex8(r / 20) for r in range(21)]
    assert hexes == sorted(hexes)
