"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: the crawl engine's core loop (frontier BFS
with URL-seen anti-join) over the deterministic webgraph derived from
the sf0.001 `documents` table.

`queries()` / `oracle_sql()` — operator registry; implementations live
in news_please_spark.plans.queries + plans.extraction_queries (all
SQL-oracle-checked) plus ONE rows-only entry for the op DuckDB can't
express in a single statement (the full iterative politeness crawl
engine — exact oracle equality is enforced bit-for-bit by the
pure-Python crawl oracle in tests/test_frontier.py instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import news_please_spark.plans.extraction_queries  # noqa: E402,F401 (registers entries)
from news_please_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["frontier_bfs3"](spark, "/root/testdata/sf0.001")


def _crawl_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full frontier engine (politeness buckets, robots gate, URL-seen)
    on a synthetic world sized from the documents table. Non-SQL (an
    iterative stateful job) → rows-only driver check; exact oracle
    equality is enforced by tests/test_frontier.py.

    The crawl ORDER rides with the engine's per-wave metrics contract
    (wave, fetched, new_urls, seq_path, …) joined on wave, so this
    entry also exercises the metrics the 100-TB operator would monitor
    (the reference's crawler log lines, as a queryable DataFrame)."""
    from pyspark.sql import functions as F

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
    res = engine.run(world.seed_urls())
    metrics = res.metrics_df(spark).select(
        "wave", "fetched", "new_urls", "seen_chunks", "seq_path"
    )
    return res.order.join(F.broadcast(metrics), "wave")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(QUERIES)
    qs["crawl_politeness"] = _crawl_politeness
    return qs


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
