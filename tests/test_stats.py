"""operators/stats: exact group quantiles vs numpy-free python oracle
(discrete/lower quantile at rank ceil(n*q/100)), ties, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_please_spark.operators.stats import group_quantiles


def _py_q(vals, q):
    s = sorted(vals)
    rank = -(-len(s) * q // 100)  # ceil
    return s[rank - 1]


def test_group_quantiles_matches_python_oracle(spark):
    rows = [("a", (i * 17) % 101) for i in range(157)] + [
        ("b", v) for v in [5, 5, 5, 5, 9]          # heavy ties
    ] + [("c", 42)]                                 # singleton group
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r for r in group_quantiles(df, "g", "v", [1, 50, 90, 100]).collect()}
    import collections

    by_g = collections.defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    for g, vals in by_g.items():
        assert got[g].n == len(vals)
        for q in (1, 50, 90, 100):
            assert getattr(got[g], f"p{q}") == _py_q(vals, q), (g, q)


def test_group_quantiles_validates(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "v", [])
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "v", [0])
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "v", [101])


def test_group_quantiles_excludes_nulls(spark):
    rows = [("a", 1), ("a", None), ("a", 3), ("a", None), ("a", 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = group_quantiles(df, "g", "v", [50, 100]).first()
    assert (r.n, r.p50, r.p100) == (3, 3, 5)
