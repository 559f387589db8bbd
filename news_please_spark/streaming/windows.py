"""Event-time windowed aggregation with watermark (SURVEY.md §2.10) —
the streaming twin of the batch `events_hourly` rollup.

Semantics at scale: tumbling event-time windows keyed by
(window, event_type); the watermark bounds state (a window's partial
aggregate is dropped once event time passes window_end + delay) and
defines late-data tolerance — an event older than the watermark is
discarded instead of reopening a finalized window.  State size is
O(open windows × types), independent of stream length, which is what
lets a crawl-metrics stream run for months.

In append output mode a window emits exactly once, when the watermark
passes its end — the mode a downstream table sink wants (no updates,
exactly-once with checkpointing).  The equivalence contract (tested in
test_streaming_windows.py): feeding the batch events table through the
stream in arbitrary micro-batches and unioning the append output with
the still-open windows' state yields bit-for-bit the batch
groupBy(window(...)) result when no event is actually late.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def events_stream(spark: SparkSession, input_dir: str, delay: str = "2 hours") -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(input_dir)
        .withWatermark("ts", delay)
    )


def windowed_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling (window, event_type) rollup: n events + value sum
    quantized to integer cents (the batch events_hourly convention, so
    stream and batch results compare exactly)."""
    return (
        events.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_c"),
        )
        .select(
            F.col("window.start").alias("w_start"),
            "event_type",
            "n",
            "value_c",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session-window rollup: per-user event counts over dynamic
    windows that extend while events keep arriving within `gap` —
    the streaming twin of the batch gaps-and-islands sessionize
    (events_sessionize), but with the window boundaries computed by
    the engine's session-window state store instead of a lag/sum
    window chain.

    Scale/state semantics: state is one open session per active
    (user) key; the watermark closes a session once event time passes
    session_end + gap, so state is bounded by ACTIVE users, not
    stream length. In append mode each session emits exactly once at
    close — the contract a downstream table sink wants. Sessions
    merge across micro-batches: two fragments that land in different
    batches but overlap within `gap` become ONE output row (tested
    against the batch session_window aggregation in
    test_streaming_windows.py)."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "user_id",
            "n",
        )
    )
