"""Streaming per-host politeness budget (applyInPandasWithState):
state must hold across micro-batches and match the static twin
bit-for-bat on the same arrival order."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_please_spark.streaming.politeness import (
    budget_admit_batch,
    budgeted_stream,
)

CAND_SCHEMA = "host string, url string, priority long"

BATCH1 = [
    ("a.com", "a/2", 20),
    ("a.com", "a/1", 10),
    ("b.com", "b/1", 5),
]
BATCH2 = [
    ("a.com", "a/5", 1),   # best priority arrives late: only ONE a-slot left
    ("a.com", "a/3", 2),
    ("a.com", "a/4", 3),
    ("b.com", "b/2", 7),
    ("b.com", "b/3", 6),
]
BUDGET = 3


def _run_stream(spark, tmp_path):
    inp = str(tmp_path / "cand")
    out = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")

    def one_pass(rows):
        spark.createDataFrame(rows, CAND_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        stream = spark.readStream.schema(CAND_SCHEMA).parquet(inp)
        q = (
            budgeted_stream(stream, BUDGET)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    one_pass(BATCH1)
    one_pass(BATCH2)
    return {
        (r.host, r.url): (r.priority, r.admitted_seq)
        for r in spark.read.parquet(out).collect()
    }


def test_budget_holds_across_microbatches(spark, tmp_path):
    got = _run_stream(spark, tmp_path)
    # batch 1: both a-urls admitted (priority order), b/1 admitted
    assert got[("a.com", "a/1")] == (10, 1)
    assert got[("a.com", "a/2")] == (20, 2)
    assert got[("b.com", "b/1")] == (5, 1)
    # batch 2: a.com has ONE slot left -> best-priority a/5 only;
    # the state (2 already taken) survived the first query shutdown
    assert got[("a.com", "a/5")] == (1, 3)
    assert ("a.com", "a/3") not in got and ("a.com", "a/4") not in got
    # b.com had two slots left -> both admitted in priority order
    assert got[("b.com", "b/3")] == (6, 2)
    assert got[("b.com", "b/2")] == (7, 3)
    assert len(got) == 6


def test_stream_matches_static_twin(spark, tmp_path):
    got = _run_stream(spark, tmp_path)
    batched = spark.createDataFrame(
        [(1, *r) for r in BATCH1] + [(2, *r) for r in BATCH2],
        "batch int, " + CAND_SCHEMA,
    )
    twin = {
        (r.host, r.url): (r.priority, r.admitted_seq)
        for r in budget_admit_batch(batched, BUDGET, batch_col="batch").collect()
    }
    assert got == twin


def test_static_twin_without_batches_is_plain_topk(spark):
    df = spark.createDataFrame(BATCH1 + BATCH2, CAND_SCHEMA)
    out = budget_admit_batch(df, 2)
    rows = {(r.host, r.url) for r in out.collect()}
    assert rows == {("a.com", "a/5"), ("a.com", "a/3"), ("b.com", "b/1"), ("b.com", "b/3")}


def test_streaming_crawl_restart_matches_batch_admission(spark, tmp_path):
    """End-to-end streaming crawl (candidates -> stateful per-host
    budget -> resolver fetch -> extraction chain) with a RESTART
    mid-stream: the admitted set must equal the batch twin's admission
    on the same arrival order, and the extracted articles must be the
    batch extraction of exactly those urls."""
    from news_please_spark.schemas import RESPONSES
    from news_please_spark.streaming.stream import run_crawl_available_now
    from news_please_spark.synth import DocWorld

    n, budget = 40, 1
    world = DocWorld(n)
    responses = spark.createDataFrame(
        [
            (world.spec(d).url, 200, "text/html; charset=utf-8",
             bytearray(world.html(d).encode("utf-8")), None, None)
            for d in range(n)
        ],
        RESPONSES,
    )

    def cand_rows(docs):
        return [
            (world.spec(d).url.split("/")[2], world.spec(d).url, d)
            for d in docs
        ]

    cand_dir = str(tmp_path / "cand")
    out = str(tmp_path / "articles")
    ckpt = str(tmp_path / "ckpt")
    batches = [list(range(0, 20)), list(range(20, 40))]
    for rows in (cand_rows(batches[0]), cand_rows(batches[1])):
        # each pass is a fresh availableNow query on the same
        # checkpoint — a restart between micro-batches; the per-host
        # budget state must survive it
        spark.createDataFrame(rows, CAND_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(cand_dir)
        run_crawl_available_now(spark, cand_dir, responses, out, ckpt, budget)

    got = {r.url: r for r in spark.read.parquet(out).collect()}

    batched = spark.createDataFrame(
        [(i + 1, *r) for i, b in enumerate(batches) for r in cand_rows(b)],
        "batch int, " + CAND_SCHEMA,
    )
    expected = {
        r.url: r
        for r in budget_admit_batch(batched, budget, batch_col="batch").collect()
    }
    assert set(got) == set(expected)
    for url, r in got.items():
        assert r.admitted_seq == expected[url].admitted_seq, url
        assert r.host == expected[url].host, url
    # and the articles are the same extraction the batch engine produces
    by_url = {world.spec(d).url: d for d in range(n)}
    for url, r in got.items():
        exp = world.expected_article(by_url[url])
        assert r.title == exp["title"], url
        assert r.maintext == exp["maintext"], url
