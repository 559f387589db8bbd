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


# -- politeness-admitted streaming crawl ------------------------------------
# The batch frontier and the stream share ONE politeness semantics: the
# stateful per-host budget operator (streaming/politeness.py, bit-exact
# twin of the batch tier's top-k marking) is the ADMISSION tier in
# front of fetch + extraction. Candidate URLs stream in, each host's
# budget holds ACROSS micro-batches and query restarts (GroupState in
# the checkpoint), admitted rows flow through the same pluggable
# resolver join (F1/F5/F6 native filters) and the same vectorized
# extraction chain the batch engine runs.

CANDIDATE_SCHEMA = "host string, url string, priority long"


def candidate_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(CANDIDATE_SCHEMA).parquet(input_dir)


def streaming_crawl_extract(
    candidates: DataFrame,
    responses: DataFrame,
    budget_per_host: int,
) -> DataFrame:
    """candidates (streaming: host, url, priority) → admitted-and-
    extracted article rows, with the admission metadata
    (host, admitted_seq) riding along so the admission set is
    auditable downstream. `responses` is the static resolver table
    (stream-static join — the fetch tier's network stand-in)."""
    from news_please_spark.extraction.extract import extract_articles
    from news_please_spark.sources.fetch import fetch_from_responses
    from news_please_spark.streaming.politeness import budgeted_stream

    admitted = budgeted_stream(candidates, budget_per_host)
    fetched = fetch_from_responses(
        admitted, responses, keep=["host", "priority", "admitted_seq"]
    )
    return extract_articles(
        fetched,
        download_ts=F.col("fetched_at"),
        keep_cols=["host", "priority", "admitted_seq"],
    )


def run_crawl_available_now(
    spark: SparkSession,
    candidate_dir: str,
    responses: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    budget_per_host: int,
) -> None:
    """One incremental politeness-admitted crawl pass: everything that
    landed in candidate_dir since the checkpoint, admitted against the
    per-host budget state (which survives restarts), fetched through
    the resolver, extracted, appended exactly-once."""
    articles = streaming_crawl_extract(
        candidate_stream(spark, candidate_dir), responses, budget_per_host
    )
    q = (
        articles.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
