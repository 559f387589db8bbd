"""streaming/windows: event-time tumbling windows + watermark must
reproduce the batch rollup exactly when fed the same events in
micro-batches, and must actually bound state via the watermark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_please_spark.streaming.windows import (
    EVENTS_SCHEMA,
    events_stream,
    windowed_counts,
)


def _mk_events(spark, n=400):
    # 4 event types, ~n events across 6 hours, deterministic
    return spark.createDataFrame(
        [
            (
                i,
                f"2024-01-01 {i * 6 // n:02d}:{(i * 37) % 60:02d}:{(i * 13) % 60:02d}",
                i % 50,
                f"t{i % 4}",
                float((i * 7) % 100) / 3.0,
                "{}",
            )
            for i in range(n)
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def _batch_rollup(ev):
    return sorted(
        map(
            tuple,
            ev.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_c"),
            )
            .select(
                F.col("window.start").alias("w_start"), "event_type", "n", "value_c"
            )
            .collect(),
        ),
        key=repr,
    )


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    ev = _mk_events(spark)
    src = str(tmp_path / "src")
    # many small files -> many micro-batches with maxFilesPerTrigger
    ev.repartition(8).write.parquet(src)

    stream = windowed_counts(events_stream(spark, src, delay="2 hours"))
    q = (
        stream.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("maxFilesPerTrigger", "1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM win_agg").collect()), key=repr
    )
    assert got == _batch_rollup(ev)
    assert len(got) > 0


def test_windowed_counts_append_emits_closed_windows_only(spark, tmp_path):
    """In append mode a window emits only once the watermark passes its
    end: after processing everything, windows older than (max ts -
    delay) must have emitted, the trailing open windows must not."""
    ev = _mk_events(spark)
    src = str(tmp_path / "src")
    # chronological files so the watermark ADVANCES across micro-batches
    # (one file per hour; within a batch order is irrelevant)
    ev.withColumn("h", F.hour("ts")).repartition(1).sortWithinPartitions("ts") \
        .write.partitionBy("h").parquet(src)

    stream = windowed_counts(events_stream(spark, src + "/h=*", delay="90 minutes"))
    q = (
        stream.writeStream.format("memory")
        .queryName("win_append")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM win_append").collect()), key=repr
    )
    batch = _batch_rollup(ev)
    max_ts = ev.agg(F.max("ts")).first()[0]
    import datetime

    horizon = max_ts - datetime.timedelta(minutes=90)
    closed = [r for r in batch if r[0] + datetime.timedelta(hours=1) <= horizon]
    # every closed window emitted exactly once with the exact batch values
    assert got == sorted(closed, key=repr)
    # and the trailing windows are genuinely withheld (still open state)
    assert len(got) < len(batch)


def test_session_windows_stream_equals_batch(spark, tmp_path):
    """Session windows across micro-batches must merge fragments and,
    once the watermark passes, emit exactly the batch session_window
    result. A far-future sentinel event advances the watermark so
    every real session closes."""
    import datetime

    from news_please_spark.streaming.windows import session_counts

    ev = _mk_events(spark, n=200)
    sentinel = spark.createDataFrame(
        [(9999, "2024-01-03 00:00:00", -1, "t0", 0.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    src = str(tmp_path / "src")
    # chronological files so sessions split across micro-batches, then
    # the sentinel file last so the watermark closes everything
    ev.withColumn("h", F.hour("ts")).repartition(1).sortWithinPartitions(
        "ts"
    ).write.partitionBy("h").parquet(src)
    sentinel.withColumn("h", F.lit(99)).write.mode("append").partitionBy(
        "h"
    ).parquet(src)

    stream = session_counts(
        events_stream(spark, src + "/h=*", delay="1 hour"), gap="2 hours"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_agg")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.s_start, r.s_end, r.user_id, r.n)
        for r in spark.sql("SELECT * FROM sess_agg WHERE user_id >= 0").collect()
    )
    want = sorted(
        (r.s_start, r.s_end, r.user_id, r.n)
        for r in session_counts(ev, gap="2 hours").collect()
    )
    assert got == want
    assert len(got) > 0
    # fragments genuinely merged: some session spans > one event
    assert any(n > 1 for _, _, _, n in got)
