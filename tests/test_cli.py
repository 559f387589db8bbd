"""__main__ CLI: the spark-submit-able job surface. Commands run
in-process against the session fixture's already-running JVM (a
subprocess would boot a second 32-thread Spark just to test argparse
wiring); --cluster inherits exactly this getOrCreate() path."""

from __future__ import annotations

import json
import os

from news_please_spark.__main__ import main

SF_DIR = "/root/testdata/sf0.001"


def _args(extra):
    # --cluster: reuse the session fixture's JVM via getOrCreate()
    return extra + ["--cluster"]


def test_cli_query_writes_parquet(spark, tmp_path, capsys):
    out = str(tmp_path / "q")
    r = main(_args(["query", "--name", "dedup_exact",
                    "--sf-dir", SF_DIR, "--out", out]))
    assert r["out"] == out
    assert json.loads(capsys.readouterr().out.strip())["rows"] == r["rows"]
    assert spark.read.parquet(out).count() == r["rows"]


def test_cli_query_unknown_name_exits(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        main(_args(["query", "--name", "nope", "--sf-dir", SF_DIR]))


def test_cli_clean_roundtrip(spark, tmp_path, capsys):
    out = str(tmp_path / "clean")
    r = main(_args(["clean", "--input", f"{SF_DIR}/documents.parquet",
                    "--out", out]))
    n_in = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    got = spark.read.parquet(out)
    assert 0 < r["rows"] <= n_in
    assert set(got.columns) == set(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").columns
    )


def test_cli_prepare_packs(spark, tmp_path):
    out = str(tmp_path / "packed")
    r = main(_args(["prepare", "--input", f"{SF_DIR}/documents.parquet",
                    "--out", out, "--seq-len", "64"]))
    got = spark.read.parquet(out)
    assert r["rows"] == got.count() > 0
    assert "split" in got.columns


def test_cli_crawl_writes_order_and_metrics(spark, tmp_path):
    out = str(tmp_path / "crawl")
    r = main(_args(["crawl", "--pages", "2000", "--waves", "2",
                    "--budget", "8", "--out", out]))
    assert r["urls_fetched"] > 0
    order = spark.read.parquet(os.path.join(out, "order"))
    assert order.count() == r["urls_fetched"]
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert m["urls_fetched"] == r["urls_fetched"]
    assert len(m["waves"]) >= 1
