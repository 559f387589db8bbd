"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} plus extra keys
(frontier_urls_per_sec, crawl detail).

Each query is forced end-to-end with a noop write (count() would let
Catalyst prune the very columns we mean to benchmark).

`python bench.py --scaling` additionally re-runs the frontier job at
local[8] vs local[32] in fresh subprocesses and reports throughput at
both + scaling efficiency (the BASELINE.json two-cluster-size rule;
sandbox stand-in for N vs 4N executors).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "frontier_bfs3",
    "url_canonicalize",
    "politeness_topk",
    "dedup_exact",
    "fingerprint",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "doc_quality",
    "token_totals",
    "lang_id",
    "ann_cosine_topk",
    "events_sessionize",
    "recency_filter",
    "versioning_chain",
    "lineitem_agg",
    "segment_revenue",
    "events_props_agg",
]

CRAWL_PAGES = 1_500_000
CRAWL_SEED_PAGES = 150_000
CRAWL_WAVES = 6
CRAWL_BUDGET = 32


def run_crawl(spark, n_pages: int, max_waves: int) -> tuple[float, int]:
    """Frontier throughput: budgeted waves over a spark.range-generated
    webgraph, starting from a pre-loaded large frontier (measuring the
    engine, not BFS warmup). Returns (seconds, urls_fetched)."""
    from news_please_spark.operators.frontier import FrontierConfig, FrontierEngine
    from news_please_spark.world import World

    world = World(n_pages=n_pages, n_hosts=max(64, n_pages // 20), n_seeds=64)
    edges = world.webgraph_df(spark).persist()
    edges.count()
    seeds = world.seeds_range_df(spark, CRAWL_SEED_PAGES)
    engine = FrontierEngine(
        spark,
        edges,
        robots=world.robots_df(spark),
        cfg=FrontierConfig(
            budget_per_host=CRAWL_BUDGET,
            max_depth=4,
            max_waves=max_waves,
            salt_buckets=16,
        ),
    )
    t0 = time.time()
    res = engine.run(seeds)
    # force the order output too
    res.order.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    edges.unpersist()
    return dt, res.fetched


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from news_please_spark.plans.queries import QUERIES
    from news_please_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = QUERIES[name](spark, SF_DIR)
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    crawl_sec, crawl_urls = run_crawl(spark, CRAWL_PAGES, CRAWL_WAVES)
    timings["crawl_frontier"] = round(crawl_sec, 3)
    urls_per_sec = round(crawl_urls / crawl_sec, 1) if crawl_sec else 0.0

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bench_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "frontier_urls_per_sec": urls_per_sec,
        "frontier_urls_fetched": crawl_urls,
        "cpus": CPUS,
    }
    print(json.dumps(out))


def scaling_child(cpus: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from news_please_spark.session import get_spark

    spark = get_spark(f"scaling{cpus}", cpus=cpus, shuffle_partitions=cpus)
    sec, urls = run_crawl(spark, CRAWL_PAGES, CRAWL_WAVES)
    print(json.dumps({"cpus": cpus, "sec": round(sec, 2), "urls": urls}))


def scaling() -> None:
    results = {}
    for cpus in (8, 32):
        p = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cpus)],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8, t32 = results[8]["sec"], results[32]["sec"]
    eff = round((t8 / t32) / 4, 3)
    out = {
        "n_parallelism": 8,
        "n4_parallelism": 32,
        "urls": results[8]["urls"],
        "sec_at_8": t8,
        "sec_at_32": t32,
        "urls_per_sec_at_8": round(results[8]["urls"] / t8, 1),
        "urls_per_sec_at_32": round(results[32]["urls"] / t32, 1),
        "scaling_efficiency": eff,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--scaling-child":
        scaling_child(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        scaling()
    else:
        main()
