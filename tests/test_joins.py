"""operators/joins: as-of and banded range joins. Contracts: bit-equal
to the obvious python oracle, repartition-invariant, equal-ts ties match
(<= semantics), and the range join never plans a nested loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_please_spark.operators.joins import asof_join, range_join


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def _py_asof(left, right):
    """left/right: (key, ts, payload...) tuples; latest right ts <= left ts."""
    out = []
    for lk, lts, lid in left:
        best = None
        for rk, rts, rid, rval in right:
            if rk == lk and rts <= lts and (best is None or rts > best[0]):
                best = (rts, rid, rval)
        out.append((lid, None if best is None else best[1], None if best is None else best[2]))
    return sorted(out, key=repr)


def test_asof_join_matches_python_oracle(spark):
    left = [(k, t, 100 * k + t) for k in range(5) for t in range(0, 50, 7)]
    right = [(k, t, 1000 * k + t, float(t)) for k in range(4) for t in range(3, 50, 11)]
    l = spark.createDataFrame(left, "k long, ts long, lid long")
    r = spark.createDataFrame(right, "k long, ts long, rid long, rval double")
    got = asof_join(l, r, "k", "k", "ts", "ts", ["rid", "rval"])
    got_rows = sorted(
        ((x.lid, x.rid, x.rval) for x in got.collect()), key=repr
    )
    assert got_rows == _py_asof(left, right)
    # left row count preserved (LEFT semantics)
    assert got.count() == len(left)


def test_asof_join_equal_ts_matches(spark):
    l = spark.createDataFrame([(1, 10, 1)], "k long, ts long, lid long")
    r = spark.createDataFrame(
        [(1, 10, 7, 0.5), (1, 9, 6, 0.4)], "k long, ts long, rid long, rval double"
    )
    row = asof_join(l, r, "k", "k", "ts", "ts", ["rid", "rval"]).first()
    assert (row.rid, row.rval) == (7, 0.5)  # ts == ts counts, latest wins


def test_asof_join_repartition_invariant(spark):
    left = [(k % 3, (k * 17) % 40, k) for k in range(60)]
    right = [(k % 3, (k * 13) % 40, 1000 + k, float(k)) for k in range(30)]
    l = spark.createDataFrame(left, "k long, ts long, lid long")
    # dedup right per (k, ts): keep max rid (the operator's contract)
    r = (
        spark.createDataFrame(right, "k long, ts long, rid long, rval double")
        .groupBy("k", "ts")
        .agg(F.max("rid").alias("rid"), F.max_by("rval", "rid").alias("rval"))
    )
    a = _rows(asof_join(l, r, "k", "k", "ts", "ts", ["rid", "rval"]))
    b = _rows(asof_join(l.repartition(7), r.repartition(5), "k", "k", "ts", "ts", ["rid", "rval"]))
    assert a == b


def _py_range(intervals, points):
    out = []
    for ik, iid, s, e in intervals:
        for pk, pid, t in points:
            if pk == ik and s <= t < e:
                out.append((iid, pid))
    return sorted(out, key=repr)


@pytest.mark.parametrize("band", [1, 3, 10, 1000])
def test_range_join_matches_python_oracle_any_band(spark, band):
    intervals = [(k % 4, 10 * k, (k * 7) % 60, (k * 7) % 60 + (k % 9)) for k in range(40)]
    points = [(k % 4, 1000 + k, (k * 3) % 70) for k in range(80)]
    iv = spark.createDataFrame(intervals, "k long, iid long, s long, e long")
    pt = spark.createDataFrame(points, "pk long, pid long, t long")
    got = range_join(iv, pt, "k", "pk", "s", "e", "t", band=F.lit(band))
    got_rows = sorted(((x.iid, x.pid) for x in got.collect()), key=repr)
    assert got_rows == _py_range(intervals, points)


def test_range_join_boundaries_exclusive_end(spark):
    iv = spark.createDataFrame([(1, 1, 10, 20)], "k long, iid long, s long, e long")
    pt = spark.createDataFrame(
        [(1, 1, 9), (1, 2, 10), (1, 3, 19), (1, 4, 20)], "pk long, pid long, t long"
    )
    got = sorted(r.pid for r in range_join(iv, pt, "k", "pk", "s", "e", "t", F.lit(10)).collect())
    assert got == [2, 3]  # start inclusive, end exclusive


def test_range_join_plans_hash_join_not_nested_loop(spark):
    iv = spark.createDataFrame([(1, 1, 0, 5)], "k long, iid long, s long, e long")
    pt = spark.createDataFrame([(1, 1, 3)], "pk long, pid long, t long")
    plan = (
        range_join(iv, pt, "k", "pk", "s", "e", "t", F.lit(10))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_range_join_timestamp_columns(spark):
    iv = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00.2", "2024-01-01 01:00:00.2")],
        "k long, iid long, s string, e string",
    ).select("k", "iid", F.col("s").cast("timestamp").alias("s"), F.col("e").cast("timestamp").alias("e"))
    pt = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00.1"),   # before start (sub-second)
            (1, 2, "2024-01-01 00:00:00.2"),   # == start: in
            (1, 3, "2024-01-01 00:59:59.9"),   # in
            (1, 4, "2024-01-01 01:00:00.2"),   # == end: out
        ],
        "pk long, pid long, t string",
    ).select("pk", "pid", F.col("t").cast("timestamp").alias("t"))
    got = sorted(
        r.pid
        for r in range_join(
            iv, pt, "k", "pk", "s", "e", "t", band=F.lit(3600 * 1_000_000)
        ).collect()
    )
    assert got == [2, 3]


# ---------------------------------------------------------------------------
# fuzzy_link (blocked edit-distance record linkage)


def test_fuzzy_link_blocks_and_threshold(spark):
    from news_please_spark.operators.joins import fuzzy_link

    recs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "the"),
            (2, "the quick brown fax", "the"),   # dist 1 to id 1
            (3, "the quick green fox", "the"),   # dist 3 to id 1 > max
            (4, "a quick brown fox", "a"),       # other block — excluded
            (5, "the quick brown fox", "the"),   # dist 0 to id 1
        ],
        "id long, key string, block string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_link(recs, max_dist=2).collect()
    }
    assert got == {(1, 2): 1, (1, 5): 0, (2, 5): 1}
    # ordering invariant: every pair a < b exactly once
    assert all(a < b for a, b in got)


def test_fuzzy_link_multi_block_cols(spark):
    from news_please_spark.operators.joins import fuzzy_link

    recs = spark.createDataFrame(
        [
            (1, "abcd", "x", 4),
            (2, "abce", "x", 4),
            (3, "abcf", "x", 3),  # second block col differs — excluded
        ],
        "id long, key string, b1 string, b2 int",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_link(recs, block_cols=["b1", "b2"], max_dist=3).collect()
    }
    assert got == {(1, 2): 1}


def test_syndication_cluster_composition(spark):
    """fuzzy_link pairs -> CC -> source spread: end-to-end on planted
    syndicated headlines."""
    from news_please_spark.operators.graph import connected_components
    from news_please_spark.operators.joins import fuzzy_link

    recs = spark.createDataFrame(
        [
            (1, "storm hits coast tonight", "storm", "reuters"),
            (2, "storm hits coast tonite", "storm", "ap"),
            (3, "storm hits coast tonigth", "storm", "reuters"),
            (4, "market rallies on news", "market", "ap"),
        ],
        "id long, key string, block string, source string",
    )
    pairs = fuzzy_link(recs, max_dist=3)
    labels = connected_components(pairs, src="id_a", dst="id_b")
    out = {
        r["root"]: (r["n_docs"], r["n_sources"])
        for r in labels.join(
            recs.select("id", "source"), "id"
        )
        .groupBy("root")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
        .collect()
    }
    # 1-2-3 one cluster spanning 2 sources; 4 unclustered (no pair)
    assert out == {1: (3, 2)}
