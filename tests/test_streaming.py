"""Streaming: daemon time-queue O4, recency filter F10, Structured
Streaming incremental extraction with checkpointed exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_please_spark.streaming.daemon import DaemonScheduler, recency_filter
from news_please_spark.streaming.stream import run_available_now
from news_please_spark.synth import DocWorld


def test_daemon_scheduler_order_and_collision_bump():
    sched = DaemonScheduler({"siteA": 10, "siteB": 10, "siteC": 25}, start_time=0)
    runs = []
    log = sched.run_until(50, lambda site, t: runs.append((t, site)))
    assert log == runs
    # A and B collide at t=10 → B bumped to 11; re-enqueues keep bumping
    assert runs[0] == (10, "siteA")
    assert runs[1] == (11, "siteB")
    assert (25, "siteC") in runs
    # siteC claims t=50 first (25+25); siteA's 40+10 collides → bumped
    # past the horizon
    assert runs[-1] == (50, "siteC")
    times_a = [t for t, s in runs if s == "siteA"]
    assert times_a == [10, 20, 30, 40]


def test_recency_filter(spark):
    cur = spark.createDataFrame(
        [("u1", "2026-01-01 00:00:00"), ("u2", "2026-01-01 00:00:00")],
        "url string, date_download string",
    ).withColumn("date_download", F.col("date_download").cast("timestamp"))
    new = spark.createDataFrame(
        [
            ("u1", "2026-01-01 03:00:00"),  # 3h later → dropped (< 6h)
            ("u2", "2026-01-01 07:00:00"),  # 7h later → kept
            ("u3", "2026-01-01 00:30:00"),  # unseen → kept
        ],
        "url string, date_download string",
    ).withColumn("date_download", F.col("date_download").cast("timestamp"))
    kept = sorted(r.url for r in recency_filter(new, cur, 6.0).collect())
    assert kept == ["u2", "u3"]


def test_streaming_incremental_extraction(spark, tmp_path):
    world = DocWorld(20)
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = world.responses_df(spark).withColumn(
        "fetched_at", F.lit("2026-08-16 00:00:00").cast("timestamp")
    )
    first = pages.filter(F.col("doc_id").isin([f"doc{i}" for i in range(10)]))
    first.write.mode("append").parquet(inp)
    run_available_now(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 10

    # second batch: 10 new docs + 5 duplicate urls → dups dropped by the
    # watermarked dedup, checkpoint skips already-processed files
    second = pages.filter(
        F.col("doc_id").isin([f"doc{i}" for i in range(5, 20)])
    )
    second.write.mode("append").parquet(inp)
    run_available_now(spark, inp, out, ckpt)
    result = spark.read.parquet(out)
    assert result.count() == 20
    assert result.select("url").distinct().count() == 20
    # articles carry real extraction output, not passthrough
    assert result.filter(F.col("title").isNotNull()).count() == 20
