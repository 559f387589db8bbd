"""sinks/bucketed: bucketed external tables must (a) round-trip rows,
(b) join exchange-free when both sides share the bucket spec, and
(c) skip the Sort too when written sortBy the key."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from news_please_spark.sinks.bucketed import read_bucketed, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def two_bucketed_tables(spark, tmp_path):
    tag = uuid.uuid4().hex[:8]
    ta, tb = f"bk_a_{tag}", f"bk_b_{tag}"
    a = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("va")
    )
    b = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("vb")
    )
    write_bucketed(a, ta, str(tmp_path / "a"), ["k"], buckets=8)
    write_bucketed(b, tb, str(tmp_path / "b"), ["k"], buckets=8)
    yield ta, tb
    spark.sql(f"DROP TABLE IF EXISTS {ta}")
    spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_bucketed_roundtrip_and_exchange_free_join(spark, two_bucketed_tables):
    ta, tb = two_bucketed_tables
    a, b = read_bucketed(spark, ta), read_bucketed(spark, tb)
    assert a.count() == 500 and b.count() == 300

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "k").select("k", "va", "vb")
        plan = _plan(joined)
        # the whole point: no shuffle on either side, no sort either
        # (both written sortBy k) — the join runs bucket-wise local
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        rows = sorted((r.k, r.va, r.vb) for r in joined.collect())
        assert rows == [(k, 3 * k, 7 * k) for k in range(300)]

        # contrast: the same join on plain path reads DOES shuffle
        pa = spark.read.parquet(
            spark.sql(f"DESCRIBE FORMATTED {ta}")
            .filter(F.col("col_name") == "Location")
            .first()
            .data_type
        )
        plain = pa.join(b, "k")
        assert "Exchange" in _plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_needs_no_exchange(spark, two_bucketed_tables):
    ta, _ = two_bucketed_tables
    a = read_bucketed(spark, ta)
    agg = a.groupBy("k").agg(F.sum("va").alias("s"))
    assert "Exchange" not in _plan(agg)
    assert agg.count() == 500


def test_write_bucketed_validates_args(spark, tmp_path):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        write_bucketed(df, "t_bad", str(tmp_path / "x"), [], buckets=4)
    with pytest.raises(ValueError):
        write_bucketed(df, "t_bad", str(tmp_path / "x"), ["k"], buckets=0)


def test_shipping_priority_plan_is_broadcast_chain(spark):
    """The Q3 shape must broadcast both dim reductions — a SortMerge
    on the fact table would be the 100x-scale regression."""
    from news_please_spark.plans.queries import QUERIES

    df = QUERIES["shipping_priority"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
