"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: the crawl engine's core loop (frontier BFS
with URL-seen anti-join) over the deterministic webgraph derived from
the sf0.001 `documents` table.

`queries()` / `oracle_sql()` — operator registry; implementations live
in news_please_spark.plans.queries (SQL-oracle-checked) plus rows-only
entries for ops DuckDB can't express (the full politeness crawl engine).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from news_please_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["frontier_bfs3"](spark, "/root/testdata/sf0.001")


def _crawl_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full frontier engine (politeness buckets, robots gate, URL-seen)
    on a synthetic world sized from the documents table. Non-SQL (an
    iterative stateful job) → rows-only driver check; exact oracle
    equality is enforced by tests/test_frontier.py."""
    from news_please_spark.operators.frontier import FrontierConfig, FrontierEngine
    from news_please_spark.world import World

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    world = World(n_pages=max(300, 2 * n_docs))
    engine = FrontierEngine(
        spark,
        world.webgraph_df(spark),
        robots=world.robots_df(spark),
        cfg=FrontierConfig(budget_per_host=16, max_depth=3),
    )
    return engine.run(world.seed_urls()).order


def _extract_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1-E5 + V1-V7 extraction chain over synthesized HTML pages
    (vectorized pandas UDFs; golden-oracle equality in
    tests/test_extraction.py). Rows-only driver check."""
    from news_please_spark.extraction.extract import extract_articles
    from news_please_spark.synth import DocWorld

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    return extract_articles(DocWorld(n_docs).responses_df(spark))


def _extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint span documents from extracted articles (span-sequence
    equality enforced in tests/test_extraction.py)."""
    from news_please_spark.extraction.extract import article_to_spans

    return article_to_spans(_extract_articles(spark, sf_dir))


def _heuristics_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 article gate (H1-H7 + condition compiler) over synthesized
    HTML; returns per-page gate verdicts."""
    from pyspark.sql import functions as F

    from news_please_spark.extraction.heuristics import pass_heuristics
    from news_please_spark.synth import DocWorld

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    fetched = DocWorld(n_docs).responses_df(spark)
    return fetched.select(
        "doc_id", pass_heuristics(F.col("html"), F.col("url")).alias("is_article")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(QUERIES)
    qs["crawl_politeness"] = _crawl_politeness
    qs["extract_articles"] = _extract_articles
    qs["extract_spans"] = _extract_spans
    qs["heuristics_gate"] = _heuristics_gate
    return qs


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
