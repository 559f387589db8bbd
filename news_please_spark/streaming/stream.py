"""Structured Streaming extraction pipeline (SURVEY.md §2.10).

Continuous mode: fetched pages land as parquet files (the fetch tier's
output); `readStream` picks them up incrementally, the same vectorized
extraction chain runs on the micro-batch, late/duplicate fetches are
dropped with a watermark + dropDuplicatesWithinWatermark on url, and
articles append to the sink with exactly-once checkpointing.

The daemon mode (O4) triggers this with Trigger.AvailableNow per
interval; a long-running cluster would use a processingTime trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FETCHED_SCHEMA = (
    "doc_id string, url string, status int, content_type string, "
    "html string, fetched_at timestamp"
)


def fetched_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(FETCHED_SCHEMA)
        .parquet(input_dir)
        .withWatermark("fetched_at", "1 hour")
        .dropDuplicatesWithinWatermark(["url"])
    )


def streaming_extract(fetched: DataFrame) -> DataFrame:
    """Same operators as batch: F1/F5 native filters → extraction chain."""
    from news_please_spark.extraction.extract import extract_articles

    ok = fetched.filter(
        (F.col("status") == 200) & F.col("content_type").rlike("^text/html")
    )
    return extract_articles(ok, download_ts=F.col("fetched_at"))


def run_available_now(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str
) -> None:
    """One incremental pass over whatever landed since the checkpoint."""
    articles = streaming_extract(fetched_stream(spark, input_dir))
    q = (
        articles.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
