"""K1/K2 — raw-HTML and JSON article storage (reference
pipeline/pipelines.py:529-572), set-oriented: instead of one file per
article written row-at-a-time, articles land as partitioned datasets
whose layout encodes the reference's save-path DSL (K9)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_please_spark.functions.urls import canonical_host


def write_html_storage(fetched: DataFrame, path: str) -> None:
    """K1: raw html partitioned by source domain (the %domain savepath
    component becomes a partition column → partition pruning on read)."""
    (
        fetched.withColumn("domain", canonical_host(F.col("url")))
        .select("domain", "url", "html")
        .write.mode("append")
        .partitionBy("domain")
        .parquet(path)
    )


def write_json_storage(articles: DataFrame, path: str) -> None:
    """K2: one JSON object per article, date-partitioned."""
    (
        articles.withColumn(
            "dl_date", F.date_format(F.col("date_download"), "yyyy-MM-dd")
        )
        .write.mode("append")
        .partitionBy("dl_date")
        .json(path)
    )
