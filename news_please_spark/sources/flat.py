"""Flat URL sources:
  S8 GDELT — tab-separated export CSV, URL in the last column, set-dedup
             (reference crawler/spiders/gdelt_crawler.py:54-81)
  S10 URL file — one URL per line, blanks dropped
             (reference __init__.py:171-183)
  S5 CC-NEWS WARC index — filename-date window filter + completed-set
             anti-join (reference crawler/commoncrawl_crawler.py:122-236)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def gdelt_urls(spark: SparkSession, csv_path: str) -> DataFrame:
    """export.CSV rows → distinct article URLs (last tab column)."""
    df = spark.read.option("sep", "\t").csv(csv_path)
    last = df.columns[-1]
    return (
        df.select(F.col(last).alias("url"))
        .filter(F.col("url").rlike("^https?://"))
        .dropDuplicates(["url"])
    )


def gdelt_urls_from_zip(spark: SparkSession, zip_glob: str) -> DataFrame:
    """export.CSV.zip files → distinct article URLs. The reference
    downloads GDELT's daily zip and unzips before parsing
    (crawler/spiders/gdelt_crawler.py:54-71); here the zip bytes flow
    through binaryFile → one Arrow batch per archive → vectorized
    last-tab-column split. Distribution: one task per zip file (GDELT
    ships one archive per day — the per-file grain IS the parallel
    grain), then the same filter/dedup as the extracted-CSV path."""
    import io
    import zipfile

    import pandas as pd

    files = spark.read.format("binaryFile").load(zip_glob).select("content")

    def unzip(batches):
        for pdf in batches:
            for content in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for name in zf.namelist():
                        if not name.lower().endswith(".csv"):
                            continue
                        text = zf.read(name).decode("utf-8", "replace")
                        lines = pd.Series(text.splitlines())
                        if lines.empty:
                            continue
                        yield pd.DataFrame(
                            {"url": lines.str.rsplit("\t", n=1).str[-1]}
                        )

    return (
        files.mapInPandas(unzip, "url string")
        .filter(F.col("url").rlike("^https?://"))
        .dropDuplicates(["url"])
    )


def urls_from_file(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .filter(F.length("url") > 0)
    )


def warc_index(
    files: DataFrame,
    start_date: str | None = None,
    end_date: str | None = None,
    completed: DataFrame | None = None,
) -> DataFrame:
    """files(path) → filtered WARC work list. CC-NEWS path shape:
    .../CC-NEWS-20230115123456-00012.warc.gz → date from the filename
    (reference commoncrawl_crawler.py:122-132); already-extracted files
    are anti-joined away (D3, the fully-extracted log)."""
    dated = files.withColumn(
        "dt",
        F.to_timestamp(
            F.regexp_extract(F.col("path"), r"CC-NEWS-(\d{14})-", 1), "yyyyMMddHHmmss"
        ),
    )
    if start_date:
        dated = dated.filter(F.col("dt") >= F.lit(start_date).cast("timestamp"))
    if end_date:
        dated = dated.filter(F.col("dt") <= F.lit(end_date).cast("timestamp"))
    if completed is not None:
        dated = dated.join(completed, "path", "left_anti")
    return dated
