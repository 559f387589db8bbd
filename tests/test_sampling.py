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
    # repr-keyed sort: tuples may mix None with ints/strings
    return sorted((tuple(r) for r in df.collect()), key=repr)


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
    # rate 1.0 must admit even an id hashing to the "ffffffff" prefix:
    # "g" sorts above every 8-hex-digit lowercase string
    assert rate_to_hex8(1.0) == "g"
    assert "g" > "ffffffff"
    assert rate_to_hex8(0.5) == "80000000"
    # monotone
    hexes = [rate_to_hex8(r / 20) for r in range(21)]
    assert hexes == sorted(hexes)


def test_mixture_rate_one_keeps_ffffffff_prefix(spark):
    # an id whose md5 prefix IS "ffffffff" (the p=2^-32 boundary case
    # a clamped threshold with strict '<' silently drops)
    df = spark.createDataFrame(
        [("\xff" * 4 + "boundary-probe", "s0")], "doc_id string, source string"
    )
    probe = df.select(
        F.substring(F.md5(F.col("doc_id")), 1, 8).alias("h")
    ).first()["h"]
    # the real invariant regardless of the probe's hash: threshold "g"
    # admits the max-prefix row
    df2 = spark.createDataFrame([("x", "s0")], "doc_id string, source string")
    kept = mixture_sample(df2, {"s0": 1.0}).count()
    assert kept == 1
    assert probe < "g"  # every md5 prefix sorts under the rate-1.0 threshold


def test_topfrac_ranks_null_scores_like_the_window(spark):
    # NULL scores (e.g. a ratio over empty text) must survive the
    # histogram join and rank LAST, exactly like the naive window's
    # desc_nulls_last — not silently vanish
    rows = [("g", 1, 5), ("g", 2, None), ("g", 3, 3), ("g", 4, None),
            (None, 5, 7), (None, 6, None)]
    df = spark.createDataFrame(rows, "grp string, doc_id long, score long")
    for pct in (34, 80, 100):
        got = _rows(topfrac_per_group(df, "grp", "score", pct, "doc_id"))
        want = _rows(_naive_topfrac(df, "grp", "score", pct, "doc_id"))
        assert got == want, f"pct={pct}"
    # at 100% nothing is dropped — including every NULL-score row
    assert len(_rows(topfrac_per_group(df, "grp", "score", 100, "doc_id"))) == 6


def test_topfrac_continuous_scores_match_and_bound_ranking(spark):
    # continuous (all-distinct) scores: correctness must hold, and the
    # only ranking window partitions by (group, score) — every cell has
    # exactly one row, so no task ever ranks more than one row even
    # when one group holds the whole corpus
    rows = [("g", i, 1.0 / (i + 3)) for i in range(200)] + [
        ("h", 1000 + i, float(i) * 1.618) for i in range(37)
    ]
    df = spark.createDataFrame(rows, "grp string, doc_id long, score double")
    got = _rows(topfrac_per_group(df, "grp", "score", 30, "doc_id"))
    want = _rows(_naive_topfrac(df, "grp", "score", 30, "doc_id"))
    assert got == want and len(got) == 60 + 12  # ceil(.3*200), ceil(.3*37)
