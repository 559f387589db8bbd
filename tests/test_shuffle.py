"""operators/shuffle: deterministic two-level epoch shuffle — permutation
properties, determinism, epoch independence, plan shape (one exchange),
and operators/soft404: planted error-template world."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_please_spark.operators.shuffle import epoch_shard_shuffle, shard_manifest
from news_please_spark.operators.soft404 import soft404_cells


def _ids(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_each_epoch_is_a_permutation(spark):
    n, epochs, shards = 257, 3, 8
    out = epoch_shard_shuffle(_ids(spark, n), epochs=epochs, n_shards=shards).collect()
    assert len(out) == n * epochs
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert sorted(by_epoch) == [0, 1, 2]
    for e, rows in by_epoch.items():
        # every id exactly once per epoch
        assert sorted(r.doc_id for r in rows) == sorted(str(i) for i in range(n))
        # positions dense 0..|cell|-1 within each shard
        cells = {}
        for r in rows:
            assert 0 <= r.shard < shards
            cells.setdefault(r.shard, []).append(r.pos)
        for poss in cells.values():
            assert sorted(poss) == list(range(len(poss)))


def test_epochs_give_different_orders_and_reruns_identical(spark):
    df = _ids(spark, 200)
    a = epoch_shard_shuffle(df, epochs=2, n_shards=4)
    rows = a.collect()
    order = {}
    for r in rows:
        order.setdefault(r.epoch, {})[r.doc_id] = (r.shard, r.pos)
    # epoch 0 and 1 orders differ (md5 keyed by epoch)
    assert order[0] != order[1]
    # bit-identical rerun (no RNG, no driver state)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, a.collect()))


def test_salt_changes_order_and_validation(spark):
    df = _ids(spark, 64)
    a = {(r.epoch, r.doc_id): r.pos for r in
         epoch_shard_shuffle(df, epochs=1, n_shards=2, salt="a").collect()}
    b = {(r.epoch, r.doc_id): r.pos for r in
         epoch_shard_shuffle(df, epochs=1, n_shards=2, salt="b").collect()}
    assert a != b
    with pytest.raises(ValueError):
        epoch_shard_shuffle(df, epochs=0)
    with pytest.raises(ValueError):
        epoch_shard_shuffle(df, n_shards=0)


def test_shuffle_plan_single_exchange(spark):
    """The scale contract: one hash exchange on (epoch, shard), no
    global sort, no Python."""
    out = epoch_shard_shuffle(_ids(spark, 100), epochs=2, n_shards=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "Python" not in plan, plan


# -- soft-404 ---------------------------------------------------------------


def _pages(spark):
    rows = []
    # host A: error template under 30 distinct paths + 5 live pages
    for i in range(30):
        rows.append(("a.com", f"/p/{i}", "ERR", 90))
    for i in range(5):
        rows.append(("a.com", f"/live/{i}", f"live-{i}", 3000))
    # host B: dominant template but article-length -> size cap rejects
    for i in range(30):
        rows.append(("b.com", f"/p/{i}", "BIGTMPL", 3000))
    # host C: short template but only 3 distinct paths -> diversity rejects
    for i in range(30):
        rows.append(("c.com", f"/q/{i % 3}", "FEWTMPL", 90))
    # host D: all unique
    for i in range(20):
        rows.append(("d.com", f"/p/{i}", f"u-{i}", 500))
    return spark.createDataFrame(
        rows, "host string, path string, fp string, n_chars long"
    )


def test_soft404_flags_only_the_planted_template(spark):
    out = soft404_cells(_pages(spark), min_paths=10, min_share_bp=2000,
                        max_chars=200)
    flagged = [(r.host, r.fp) for r in out.collect() if r.is_soft404 == 1]
    assert flagged == [("a.com", "ERR")]
    cell = [r for r in out.collect() if r.fp == "ERR"][0]
    assert cell.n_paths == 30 and cell.n_urls == 30 and cell.host_urls == 35
    assert cell.share_q == (10000 * 30) // 35 and cell.chars_max == 90


def test_soft404_share_boundary_is_floor_exact(spark):
    # 2 urls of 10 -> 2000 bp exactly: >= threshold passes (floor, not round)
    rows = [("h", f"/e/{i}", "T", 50) for i in range(2)] + [
        ("h", f"/u/{i}", f"u{i}", 50) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "host string, path string, fp string, n_chars long")
    out = {r.fp: r for r in
           soft404_cells(df, min_paths=2, min_share_bp=2000, max_chars=200).collect()}
    assert out["T"].share_q == 2000 and out["T"].is_soft404 == 1


def test_soft404_plan_cell_grain_exchanges_only(spark):
    """Exchanges ride (host, fp[, path]) keys — never a per-row
    repartition of pages; no Python in the plan."""
    out = soft404_cells(_pages(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    # distinct-count pre-agg + cell agg + host total + join: every
    # hashpartitioning key set contains host
    import re

    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert keys, plan
    for k in keys:
        assert "host" in k, plan


# -- shard manifest ---------------------------------------------------------


def test_shard_manifest_counts_and_order_sensitivity(spark):
    sched = epoch_shard_shuffle(_ids(spark, 120), epochs=2, n_shards=4)
    man = shard_manifest(sched).collect()
    # counts cover every row exactly once
    assert sum(r.n_items for r in man) == 240
    assert all(len(r.digest) == 32 for r in man)
    # digest is order-sensitive: swapping two positions changes it
    one = sched.filter((F.col("epoch") == 0) & (F.col("shard") == sched
        .filter(F.col("epoch") == 0).select("shard").first().shard))
    cell = one.collect()
    swapped = [(r.epoch, r.doc_id, r.shard,
                (1 - r.pos) if r.pos in (0, 1) else r.pos) for r in cell]
    sdf = spark.createDataFrame(
        swapped, "epoch long, doc_id string, shard long, pos long"
    )
    d0 = shard_manifest(one).collect()[0].digest
    d1 = shard_manifest(sdf).collect()[0].digest
    if len(cell) >= 2:
        assert d0 != d1


def test_shard_manifest_stable_across_partitionings(spark):
    sched = epoch_shard_shuffle(_ids(spark, 80), epochs=1, n_shards=4)
    a = {(r.epoch, r.shard): r.digest for r in shard_manifest(sched).collect()}
    b = {(r.epoch, r.shard): r.digest
         for r in shard_manifest(sched.repartition(13)).collect()}
    assert a == b
