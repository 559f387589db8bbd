"""Streaming fetch-rate anomaly (applyInPandasWithState): trailing
per-host state must span micro-batches AND a query restart, and match
the batch twin (rate_anomaly_on_counts) bit-for-bit on the same rows."""

from __future__ import annotations

from datetime import datetime

from news_please_spark.operators.recrawl import rate_anomaly_on_counts
from news_please_spark.streaming.anomaly import anomaly_stream

SCHEMA = "host string, hour timestamp, n_fetches long"

H = lambda h: datetime(2026, 3, 1, h)  # noqa: E731

BATCH1 = [
    ("A", H(0), 10),
    ("A", H(1), 10),
    ("B", H(0), 4),
]
BATCH2 = [
    # A's storm hour: its 3-hour baseline spans the batch boundary
    ("A", H(2), 10),
    ("A", H(3), 40),
    ("A", H(4), 12),
    ("B", H(1), 4),
    ("B", H(2), 4),
    ("B", H(3), 4),
]


def _run_stream(spark, tmp_path, restart_between=False):
    inp = str(tmp_path / "hourly")
    out = str(tmp_path / "judged")
    ckpt = str(tmp_path / "ckpt")

    def one_pass(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        stream = spark.readStream.schema(SCHEMA).parquet(inp)
        q = (
            anomaly_stream(stream, window_hours=3, threshold_x10=15)
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
        (r.host, r.hour): (r.n_fetches, r.trail_sum, r.trail_n, r.is_anomaly)
        for r in spark.read.parquet(out).collect()
    }


def test_stream_matches_batch_twin_and_state_spans_batches(spark, tmp_path):
    got = _run_stream(spark, tmp_path)
    batch = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    want = {
        (r.host, r.hour): (r.n_fetches, r.trail_sum, r.trail_n, r.is_anomaly)
        for r in rate_anomaly_on_counts(batch, 3, 15).collect()
    }
    assert got == want
    # the judgment that REQUIRED cross-batch state: A's storm at hour 3
    # (baseline hours 0-2 include two batch-1 rows)
    assert got[("A", H(3))] == (40, 30, 3, True)
    assert got[("A", H(4))] == (12, 60, 3, False)
    # B only completes its window in batch 2
    assert got[("B", H(3))] == (4, 12, 3, False)


def test_stream_state_survives_restart(spark, tmp_path):
    # identical to the two-pass run: each one_pass() starts a NEW query
    # against the same checkpoint, so passing at all proves the deque
    # state round-trips the state store; assert the boundary judgment.
    got = _run_stream(spark, tmp_path, restart_between=True)
    assert got[("A", H(3))][3] is True
    assert len(got) == len(BATCH1) + len(BATCH2)
