"""Exactly-once streaming sink into SnapshotCatalog: one snapshot per
micro-batch, replay-idempotent across restarts, incremental restart
commits only the new data."""

from __future__ import annotations

import pyspark.sql.functions as F

from news_please_spark.state import SnapshotCatalog
from news_please_spark.streaming.sink import (
    commit_batch,
    max_committed_batch,
    read_appended,
    write_stream_to_catalog,
)


def _src_stream(spark, src):
    return (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_stream_commits_once_per_batch_and_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cat_path = str(tmp_path / "cat")
    for i in range(3):
        spark.createDataFrame(
            [(i * 10 + j, f"r{i}-{j}") for j in range(5)], "k long, v string"
        ).coalesce(1).write.mode("append").parquet(src)

    write_stream_to_catalog(_src_stream(spark, src), cat_path, "rows", ckpt)
    cat = SnapshotCatalog(cat_path)
    assert len(cat.snapshots()) == 3  # one snapshot per micro-batch
    assert max_committed_batch(cat) == 2
    got = sorted((r.k, r.v) for r in read_appended(spark, cat_path, "rows").collect())
    assert len(got) == 15 and got[0] == (0, "r0-0") and got[-1] == (24, "r2-4")

    # restart with nothing new: no snapshots added
    write_stream_to_catalog(_src_stream(spark, src), cat_path, "rows", ckpt)
    assert len(cat.snapshots()) == 3

    # restart after one new file: exactly one more snapshot, union exact
    spark.createDataFrame([(100, "new")], "k long, v string").coalesce(1) \
        .write.mode("append").parquet(src)
    write_stream_to_catalog(_src_stream(spark, src), cat_path, "rows", ckpt)
    assert len(cat.snapshots()) == 4
    assert read_appended(spark, cat_path, "rows").count() == 16


def test_commit_batch_replay_is_idempotent(spark, tmp_path):
    cat_path = str(tmp_path / "cat")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    assert commit_batch(cat_path, "rows", df, 0) is True
    # crash-between-commit-and-checkpoint replay: same batch id again
    assert commit_batch(cat_path, "rows", df, 0) is False
    assert len(SnapshotCatalog(cat_path).snapshots()) == 1
    assert commit_batch(cat_path, "rows", df, 1) is True
    assert read_appended(spark, cat_path, "rows").count() == 2


def test_read_appended_schema_evolution(spark, tmp_path):
    """Add-column drift across delta snapshots: evolved reads backfill
    NULL for columns that predate the delta; strict reads refuse."""
    import pytest as _pytest
    from pyspark.sql.utils import AnalysisException

    from news_please_spark.streaming.sink import read_appended

    cat_path = str(tmp_path / "cat")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v2 = spark.createDataFrame(
        [(2, "b", 7)], "id long, name string, score long"
    )
    assert commit_batch(cat_path, "rows", v1, 0) is True
    assert commit_batch(cat_path, "rows", v2, 1) is True

    evolved = read_appended(spark, cat_path, "rows", allow_schema_evolution=True)
    got = {r.id: (r.name, r.score) for r in evolved.collect()}
    assert got == {1: ("a", None), 2: ("b", 7)}
    assert set(evolved.columns) == {"id", "name", "score"}

    with _pytest.raises(AnalysisException):
        read_appended(spark, cat_path, "rows").collect()
