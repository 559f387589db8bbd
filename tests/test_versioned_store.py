"""Versioned MERGE sink (K3-K6 semantics) + savepath DSL (K9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_please_spark.sinks.versioned import VersionedArticleStore, savepath


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, title string, date_download string"
    ).withColumn("date_download", F.col("date_download").cast("timestamp"))


def test_merge_versioning_chain(spark, tmp_path):
    store = VersionedArticleStore(spark, str(tmp_path / "store"), buckets=4)

    store.merge(_batch(spark, [
        ("https://a.com/x", "t1", "2026-01-01 00:00:00"),
        ("https://a.com/y", "u1", "2026-01-01 00:00:00"),
    ]))
    cur = {r.url: r for r in store.current().collect()}
    assert cur["https://a.com/x"].version == 1
    assert cur["https://a.com/x"].ancestor is None
    assert store.archive().count() == 0

    # re-crawl x (new version), first crawl of z
    store.merge(_batch(spark, [
        ("https://a.com/x", "t2", "2026-01-02 00:00:00"),
        ("https://a.com/z", "w1", "2026-01-02 00:00:00"),
    ]))
    cur = {r.url: r for r in store.current().collect()}
    assert cur["https://a.com/x"].version == 2
    assert cur["https://a.com/x"].ancestor == 1
    assert cur["https://a.com/x"].title == "t2"
    assert cur["https://a.com/y"].version == 1
    assert cur["https://a.com/z"].version == 1
    arch = {(r.url, r.version): r for r in store.archive().collect()}
    assert arch[("https://a.com/x", 1)].descendant == 2
    assert arch[("https://a.com/x", 1)].title == "t1"

    # two versions of the same url in ONE batch
    store.merge(_batch(spark, [
        ("https://a.com/x", "t3", "2026-01-03 00:00:00"),
        ("https://a.com/x", "t4", "2026-01-04 00:00:00"),
    ]))
    cur = {r.url: r for r in store.current().collect()}
    assert cur["https://a.com/x"].version == 4
    assert cur["https://a.com/x"].title == "t4"
    assert cur["https://a.com/x"].ancestor == 3
    arch = {(r.url, r.version): r for r in store.archive().collect()}
    assert arch[("https://a.com/x", 2)].descendant == 3
    assert arch[("https://a.com/x", 3)].descendant == 4
    assert arch[("https://a.com/x", 3)].title == "t3"


def test_savepath_templating(spark):
    df = spark.createDataFrame(
        [("https://www.example.com/a/b/story.html", "2026-02-03 10:11:12")],
        "url string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = df.select(
        savepath(
            "/data/%domain/%time_download(yyyy/MM/dd)/%md5_url_%url_file_name",
            F.col("url"),
            F.col("ts"),
        ).alias("p")
    ).first()[0]
    import hashlib

    md5 = hashlib.md5(b"https://www.example.com/a/b/story.html").hexdigest()
    assert out == f"/data/example.com/2026/02/03/{md5}_story.html"
