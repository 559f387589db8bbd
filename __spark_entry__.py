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


def _simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding near-dup pairs over documents plus planted
    perturbed copies (the raw table has no dups). Rows-only check;
    property tests in tests/test_dedup_similarity.py."""
    from pyspark.sql import functions as F

    from news_please_spark.operators.dedup import simhash_near_dups

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    planted = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    return simhash_near_dups(docs.unionByName(planted), max_hamming=6)


def _lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH approximate top-k (scale path of
    ann_cosine_topk). Rows-only; recall bound tested in pytest."""
    from pyspark.sql import functions as F

    from news_please_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") % 101 == 0)
    return lsh_topk(queries_df, emb, k=5)


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media columns → feature vectors via mapInPandas
    (codec stubbed deterministically; plumbing real). Rows-only."""
    from pyspark.sql import functions as F

    from news_please_spark.operators.multimodal import decode_and_featurize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("data"),
        F.struct(
            F.lit(8).alias("width"), F.lit(8).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("image/png").alias("mime"),
        ).alias("meta"),
    )
    return decode_and_featurize(media)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(QUERIES)
    qs["crawl_politeness"] = _crawl_politeness
    qs["extract_articles"] = _extract_articles
    qs["extract_spans"] = _extract_spans
    qs["heuristics_gate"] = _heuristics_gate
    qs["simhash_near_dup"] = _simhash_near_dup
    qs["lsh_ann_topk"] = _lsh_ann_topk
    qs["multimodal_features"] = _multimodal_features
    return qs


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
