"""Crawl-ordering + URL-seen exact-match vs the pure-Python oracle —
the BASELINE.json headline metric."""

from __future__ import annotations

import pytest

from news_please_spark.operators.frontier import FrontierConfig, FrontierEngine
from news_please_spark.oracle import CrawlConfig, CrawlOracle
from news_please_spark.world import World


def run_both(spark, n_pages, budget, max_depth, use_bloom=False, n_seeds=8,
             salt_buckets=1, politeness_impl="window",
             bloom_distribute="broadcast", fuse_seq=True):
    world = World(n_pages=n_pages, n_seeds=n_seeds)
    oracle = CrawlOracle(world, CrawlConfig(budget_per_host=budget, max_depth=max_depth))
    o_order, o_seen = oracle.run()

    engine = FrontierEngine(
        spark,
        world.webgraph_df(spark),
        robots=world.robots_df(spark),
        cfg=FrontierConfig(
            budget_per_host=budget,
            max_depth=max_depth,
            use_bloom=use_bloom,
            salt_buckets=salt_buckets,
            politeness_impl=politeness_impl,
            bloom_distribute=bloom_distribute,
            fuse_seq=fuse_seq,
        ),
    )
    res = engine.run(world.seed_urls())
    e_rows = res.order.select("url", "depth", "seq", "wave").collect()
    e_order = sorted(((r.url, r.depth, r.seq, r.wave) for r in e_rows), key=lambda t: t[2])
    e_seen = {r.url for r in res.seen.collect()}
    return o_order, o_seen, e_order, e_seen, res


@pytest.mark.parametrize(
    "n_pages,budget,max_depth",
    [(300, 8, 4), (500, 8, 3), (150, 2, 5)],
)
def test_order_and_seen_match_oracle(spark, n_pages, budget, max_depth):
    o_order, o_seen, e_order, e_seen, res = run_both(
        spark, n_pages, budget, max_depth
    )
    assert len(o_order) > 20, "oracle crawl unexpectedly tiny"
    assert e_seen == o_seen
    assert e_order == o_order
    assert res.fetched == len(o_order)


def test_bloom_and_salted_topk_are_exact(spark):
    """The scale paths (bloom URL-seen prefilter, skew-salted politeness
    top-k) must not change results by one bit."""
    o_order, o_seen, e_order, e_seen, _ = run_both(
        spark, 400, 8, 3, use_bloom=True, salt_buckets=8
    )
    assert e_seen == o_seen
    assert e_order == o_order


def test_seq_guard_is_byte_keyed(spark):
    """The single-task fetch-order window must be gated on estimated
    BYTES, not just rows — a wave of fat rows (multi-KB URLs) takes the
    scalable two-phase numbering even at a tiny row count, and the
    resulting order is still 0..n-1 in (depth, disc_key, url) order."""
    from news_please_spark.operators.frontier import FrontierConfig, FrontierEngine

    # 400 URLs × ~180 KB ≈ 72 MB of fetch rows > SMALL_SEQ_BYTES (64 MB)
    fat_seeds = spark.range(400).selectExpr(
        "concat('https://h', CAST(id % 50 AS STRING), '.example.com/p/',"
        " repeat('x', 180000), CAST(id AS STRING)) AS url"
    )
    edges = spark.createDataFrame(
        [], "src_url string, dst_url string, link_index long"
    )
    engine = FrontierEngine(
        spark, edges, cfg=FrontierConfig(budget_per_host=100, max_depth=1)
    )
    res = engine.run(fat_seeds)
    assert res.metrics[0]["seq_path"] == "two_phase"
    assert res.fetched == 400
    rows = res.order.select("url", "seq").collect()
    by_seq = sorted((r.seq, r.url) for r in rows)
    assert [s for s, _ in by_seq] == list(range(400))
    assert [u for _, u in by_seq] == sorted(r.url for r in rows)

    # control: thin seeds on the same engine shape stay on the window path
    thin_seeds = spark.range(400).selectExpr(
        "concat('https://h', CAST(id % 50 AS STRING), '.example.com/p/',"
        " CAST(id AS STRING)) AS url"
    )
    res2 = FrontierEngine(
        spark, edges, cfg=FrontierConfig(budget_per_host=100, max_depth=1)
    ).run(thin_seeds)
    # ...and with the predictor satisfied, mark+seq fuse into one job
    assert res2.metrics[0]["seq_path"] == "fused_window"
    assert res2.fetched == 400


def test_fused_seq_matches_unfused(spark):
    """The fused mark+seq checkpoint (one job per wave) must be
    bit-exact vs the oracle AND vs the unfused two-job path; the
    default config actually takes the fused path on small waves."""
    o_order, o_seen, e_order, e_seen, res = run_both(spark, 300, 8, 4)
    assert {m["seq_path"] for m in res.metrics} == {"fused_window"}
    assert e_order == o_order and e_seen == o_seen
    o_order2, o_seen2, u_order, u_seen, res2 = run_both(
        spark, 300, 8, 4, fuse_seq=False
    )
    assert {m["seq_path"] for m in res2.metrics} == {"window"}
    assert u_order == e_order and u_seen == e_seen


def test_bloom_copartition_probe_is_exact(spark):
    """The cogroup (one-blob-per-task) bloom distribution — the
    10^10-URL design point where blobs don't fit one broadcast — must
    be bit-exact too."""
    o_order, o_seen, e_order, e_seen, _ = run_both(
        spark, 400, 8, 3, use_bloom=True, bloom_distribute="copartition"
    )
    assert e_seen == o_seen
    assert e_order == o_order


@pytest.mark.parametrize(
    "n_pages,budget",
    [
        (250, 8),
        # budget < seeds-per-host: waves where deferred seeds and
        # children coexist in the frontier — the regression case for
        # disc_key collisions at the k-th threshold (child keys start at
        # DISC_STRIDE, so ties at the threshold are impossible)
        (300, 2),
    ],
)
def test_threshold_politeness_is_exact(spark, n_pages, budget):
    """The no-sort politeness path (k-th smallest disc_key threshold)
    must match the oracle exactly too."""
    o_order, o_seen, e_order, e_seen, _ = run_both(
        spark, n_pages, budget, 3, salt_buckets=8, politeness_impl="threshold"
    )
    assert e_seen == o_seen
    assert e_order == o_order


def test_shuffle_hash_expansion_is_exact(spark, monkeypatch):
    """Big waves use a shuffle-hash join on src_url-co-partitioned edges
    instead of broadcasting the fetch side (the driver-serial broadcast
    build was every wave's scaling floor). Force that path and require
    bit-exact results."""
    import news_please_spark.operators.frontier as fr

    monkeypatch.setattr(fr, "BROADCAST_FETCH_LIMIT", 0)
    o_order, o_seen, e_order, e_seen, _ = run_both(spark, 300, 8, 3)
    assert e_seen == o_seen
    assert e_order == o_order


def test_politeness_and_filters(spark):
    world = World(n_pages=500)
    engine = FrontierEngine(
        spark,
        world.webgraph_df(spark),
        robots=world.robots_df(spark),
        cfg=FrontierConfig(budget_per_host=3, max_depth=3),
    )
    res = engine.run(world.seed_urls())
    per = (
        res.order.groupBy("wave", "host")
        .count()
        .agg({"count": "max"})
        .collect()[0][0]
    )
    assert per <= 3  # politeness budget respected in every wave

    urls = [r.url for r in res.order.select("url").collect()]
    assert urls
    for u in urls:
        assert not u.startswith("mailto:")   # F3
        assert not u.endswith(".pdf")        # F2
        assert ".other.net" not in u          # F4
        host = u.split("/")[2]
        h = int(host.split(".")[0][1:])
        if h % 3 == 0:                        # F11 robots
            assert "/private/" not in u


def test_threshold_join_broadcasts_under_aqe_off(spark):
    """The wave loop runs with AQE scoped off, where Catalyst's static
    estimate of the two-level threshold aggregate is schema-default
    garbage — the threshold side must be EXPLICITLY broadcast or the
    politeness join re-sorts the whole frontier (the cost the
    threshold variant exists to avoid)."""
    from pyspark.sql import functions as F

    from news_please_spark.operators.ordering import mark_top_k_by_threshold

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = spark.range(10_000).select(
            (F.col("id") % 50).cast("string").alias("host"),
            F.col("id").alias("disc_key"),
        )
        marked = mark_top_k_by_threshold(df, "host", "disc_key", k=4)
        plan = marked._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_storage_released_across_consecutive_runs(spark):
    """Two consecutive crawls on one session must not accrete storage:
    engine.close() + result.release() return the persistent-RDD set to
    its pre-run level (VERDICT r3 wrong #3 — cache lifecycle)."""
    world = World(n_pages=400, n_seeds=8)

    def one_run() -> int:
        engine = FrontierEngine(
            spark,
            world.webgraph_df(spark),
            robots=world.robots_df(spark),
            cfg=FrontierConfig(budget_per_host=8, max_depth=3, checkpoint_every=2),
        )
        res = engine.run(world.seed_urls())
        n = res.order.count()
        res.release()
        engine.close()
        return n

    base = _persistent_rdd_count(spark)
    n1 = one_run()
    after1 = _persistent_rdd_count(spark)
    n2 = one_run()
    after2 = _persistent_rdd_count(spark)
    assert n1 == n2 > 0
    # everything the run persisted or checkpointed is released again
    assert after1 <= base
    assert after2 <= base
