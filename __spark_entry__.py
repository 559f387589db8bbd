"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: the crawl engine's core loop (frontier BFS
with URL-seen anti-join) over the deterministic webgraph derived from
the sf0.001 `documents` table.

`queries()` / `oracle_sql()` — operator registry; implementations live
in news_please_spark.plans.queries + plans.extraction_queries. EVERY
entry is SQL-oracle-checked, including the full iterative politeness
crawl engine (`crawl_politeness`): its budgeted waves are simulated by
a DuckDB recursive CTE carrying tagged per-wave state rows (the
synthetic world is pure arithmetic, so both engines derive the same
graph), and the same semantics are additionally enforced bit-for-bit
against the pure-Python crawl oracle in tests/test_frontier.py.
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
