"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: the crawl engine's core loop (frontier BFS
with URL-seen anti-join) over the deterministic webgraph derived from
the sf0.001 `documents` table.

`queries()` / `oracle_sql()` — operator registry; implementations live
in news_please_spark.plans.queries + plans.extraction_queries (all
SQL-oracle-checked) plus rows-only entries for ops DuckDB can't express
(the full iterative politeness crawl engine; the approximate LSH ANN
whose guarantee is a recall bound, tested in pytest).
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


def _lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH approximate top-k (scale path of
    ann_cosine_topk). Rows-only; recall bound tested in pytest."""
    from pyspark.sql import functions as F

    from news_please_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") % 101 == 0)
    return lsh_topk(queries_df, emb, k=5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(QUERIES)
    qs["crawl_politeness"] = _crawl_politeness
    qs["lsh_ann_topk"] = _lsh_ann_topk
    return qs


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
