"""End-to-end CC-style pipeline: warc_index → from_warc → extraction →
versioned MERGE with the completed-WARC log (D3) closing the loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_please_spark.commoncrawl import CompletedWarcLog, extract_commoncrawl
from news_please_spark.sinks.versioned import VersionedArticleStore
from news_please_spark.sources.warc import write_warc
from news_please_spark.synth import DocWorld

N = 12  # docs per warc file


def _write_warcs(tmp_path, world, n_files, t0=20230115120000):
    paths = []
    for i in range(n_files):
        p = tmp_path / f"CC-NEWS-{t0 + i:014d}-{i:05d}.warc.gz"
        write_warc(
            str(p),
            [
                (world.spec(d).url, 200, "text/html", world.html(d).encode("utf-8"))
                for d in range(i * N, (i + 1) * N)
            ],
        )
        paths.append(str(p))
    return paths


def test_incremental_extraction_with_completed_log(spark, tmp_path):
    world = DocWorld(4 * N)
    _write_warcs(tmp_path, world, 3)
    store = VersionedArticleStore(spark, str(tmp_path / "store"), buckets=4)
    log = CompletedWarcLog(spark, str(tmp_path / "done"))
    glob = str(tmp_path / "*.warc.gz")

    r1 = extract_commoncrawl(spark, glob, store, log)
    assert r1["files"] == 3 and r1["articles"] == 3 * N
    # titles come through the real extraction chain
    got = {r.url: r.title for r in store.current().collect()}
    for d in range(3 * N):
        exp = world.expected_article(d)
        assert got[exp["url"]] == exp["title"], d

    # re-run: the completed log anti-joins everything away
    r2 = extract_commoncrawl(spark, glob, store, log)
    assert r2 == {"files": 0, "articles": 0, "snapshot": None}

    # a new file arrives: only IT is processed, store versions advance
    _write_warcs(tmp_path, world, 4)  # writes files 0-3; 0-2 exist (same bytes)
    r3 = extract_commoncrawl(spark, glob, store, log)
    assert r3["files"] == 1
    assert store.current().count() == 4 * N
    assert log.paths().count() == 4


def test_date_window_filters_inventory(spark, tmp_path):
    world = DocWorld(3 * N)
    _write_warcs(tmp_path, world, 3)  # timestamps ...120000/120001/120002
    store = VersionedArticleStore(spark, str(tmp_path / "store"), buckets=4)
    log = CompletedWarcLog(spark, str(tmp_path / "done"))
    r = extract_commoncrawl(
        spark,
        str(tmp_path / "*.warc.gz"),
        store,
        log,
        start_date="2023-01-15 12:00:01",
    )
    assert r["files"] == 2
    assert store.current().count() == 2 * N


def test_completed_log_is_append_only_and_compactable(spark, tmp_path):
    """Each commit writes only its DELTA (O(delta), not O(history));
    compact() folds the deltas into one snapshot and expires the rest."""
    import os

    log = CompletedWarcLog(spark, str(tmp_path / "done"))
    log.append(spark.createDataFrame([("a",), ("b",)], "path string"))
    log.append(spark.createDataFrame([("c",)], "path string"))
    log.append(spark.createDataFrame([("b",), ("d",)], "path string"))  # dup b
    assert {r.path for r in log.paths().collect()} == {"a", "b", "c", "d"}
    # delta layout: snapshot 1 holds ONLY its own path
    d1 = os.path.join(log.catalog.snapshot_dir(1), "paths")
    assert {r.path for r in spark.read.parquet(d1).collect()} == {"c"}
    assert log.catalog.read_meta(2)["n_delta"] == 2

    log.compact()
    assert log.catalog.snapshots() == [3]
    assert log.catalog.read_meta(3) == {"n": 4, "compacted": True}
    assert {r.path for r in log.paths().collect()} == {"a", "b", "c", "d"}
    # appends keep working after compaction
    log.append(spark.createDataFrame([("e",)], "path string"))
    assert log.paths().count() == 5
