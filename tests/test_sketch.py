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
