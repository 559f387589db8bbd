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
