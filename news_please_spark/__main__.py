"""spark-submit-able job entry points (`python -m news_please_spark ...`).

The reference ships CLI entry points (`news-please`, its commoncrawl
scripts — reference newsplease/__main__.py and
newsplease/examples/commoncrawl.py); this module is the engine's
equivalent surface, thin argparse wiring over the library facade so the
SAME jobs run three ways:

    python -m news_please_spark <cmd> ...            # local[N] dev run
    spark-submit --py-files news_please_spark.zip \
        -m ...  news_please_spark/__main__.py <cmd>  # a real cluster
    library calls                                    # tests, notebooks

On a cluster pass ``--cluster``: the session comes from
SparkSession.builder.getOrCreate() and inherits every spark-submit conf
(master, executors, memory) instead of forcing local[N].

Commands:
    crawl         budgeted politeness crawl of the synthetic world →
                  crawl-order parquet + metrics JSON (the bench job)
    extract-warc  incremental CommonCrawl-style pass: WARC glob →
                  extraction chain → versioned store + completed log
    clean         corpus hygiene (exact dedup → near-dup → decontam →
                  quality gate) over a documents parquet
    prepare       hygiene → split → pack: training-data preparation
    query         run one registry query (plans/queries.py) to parquet
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession


def _session(args) -> SparkSession:
    if getattr(args, "cluster", False):
        return SparkSession.builder.appName(args.app_name).getOrCreate()
    from news_please_spark.session import get_spark

    return get_spark(args.app_name, cpus=args.cpus)


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--cpus", type=int, default=None,
                   help="local[N] cores (default $SPARK_GRAFT_CPUS or 32)")
    p.add_argument("--cluster", action="store_true",
                   help="inherit the spark-submit session instead of local[N]")
    p.add_argument("--app-name", default="news_please_spark")


def cmd_crawl(args) -> dict:
    from news_please_spark.operators.frontier import FrontierConfig, FrontierEngine
    from news_please_spark.world import World

    spark = _session(args)
    world = World(
        n_pages=args.pages, n_hosts=max(64, args.pages // 20), n_seeds=64
    )
    seeds = (
        world.seeds_range_df(spark, args.seed_pages)
        if args.seed_pages
        else world.seeds_df(spark)
    )
    engine = FrontierEngine(
        spark,
        world.webgraph_df(spark),
        robots=world.robots_df(spark),
        cfg=FrontierConfig(
            budget_per_host=args.budget,
            max_depth=args.depth,
            max_waves=args.waves,
            salt_buckets=16,
        ),
    )
    engine.prepare()
    res = engine.run(seeds)
    res.order.write.mode("overwrite").parquet(os.path.join(args.out, "order"))
    out = {"urls_fetched": res.fetched, "out": args.out}
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump({**out, "waves": res.metrics}, f, default=str)
    res.release()
    engine.close()
    return out


def cmd_extract_warc(args) -> dict:
    from news_please_spark.commoncrawl import CompletedWarcLog, extract_commoncrawl
    from news_please_spark.sinks.versioned import VersionedArticleStore

    spark = _session(args)
    store = VersionedArticleStore(
        spark, os.path.join(args.store, "articles"), buckets=args.buckets
    )
    log = CompletedWarcLog(spark, os.path.join(args.store, "done"))
    return extract_commoncrawl(
        spark, args.warc, store, log,
        start_date=args.start_date, end_date=args.end_date,
    )


def cmd_clean(args) -> dict:
    from news_please_spark.pipeline import clean_corpus

    spark = _session(args)
    docs = spark.read.parquet(args.input)
    benchmark = spark.read.parquet(args.benchmark) if args.benchmark else None
    cleaned = clean_corpus(
        docs, benchmark, jaccard_threshold=args.jaccard_threshold
    )
    cleaned.write.mode("overwrite").parquet(args.out)
    return {"rows": spark.read.parquet(args.out).count(), "out": args.out}


def cmd_prepare(args) -> dict:
    import news_please_spark as nps

    spark = _session(args)
    docs = spark.read.parquet(args.input)
    benchmark = spark.read.parquet(args.benchmark) if args.benchmark else None
    packed = nps.prepare_training_data(
        docs, benchmark, seq_len=args.seq_len, render=args.render
    )
    packed.write.mode("overwrite").parquet(args.out)
    return {"rows": spark.read.parquet(args.out).count(), "out": args.out}


def cmd_query(args) -> dict:
    import news_please_spark.plans.extraction_queries  # noqa: F401 (registers)
    from news_please_spark.plans.queries import QUERIES

    spark = _session(args)
    if args.name not in QUERIES:
        raise SystemExit(
            f"unknown query {args.name!r}; known: {', '.join(sorted(QUERIES))}"
        )
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        return {"rows": spark.read.parquet(args.out).count(), "out": args.out}
    return {"rows": df.count()}


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="news_please_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("crawl", help="budgeted politeness crawl → order parquet")
    p.add_argument("--pages", type=int, default=150_000)
    p.add_argument("--waves", type=int, default=6)
    p.add_argument("--budget", type=int, default=32)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--seed-pages", type=int, default=0,
                   help="preload a fat frontier of N pages (0 = seed list only)")
    p.add_argument("--out", required=True)
    _add_common(p)
    p.set_defaults(fn=cmd_crawl)

    p = sub.add_parser("extract-warc", help="incremental WARC extraction pass")
    p.add_argument("--warc", required=True, help="WARC path glob")
    p.add_argument("--store", required=True, help="store root dir")
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--start-date", default=None)
    p.add_argument("--end-date", default=None)
    _add_common(p)
    p.set_defaults(fn=cmd_extract_warc)

    p = sub.add_parser("clean", help="corpus hygiene over a documents parquet")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--benchmark", default=None)
    p.add_argument("--jaccard-threshold", type=float, default=0.5)
    _add_common(p)
    p.set_defaults(fn=cmd_clean)

    p = sub.add_parser("prepare", help="hygiene → split → pack")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--benchmark", default=None)
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--render", action="store_true")
    _add_common(p)
    p.set_defaults(fn=cmd_prepare)

    p = sub.add_parser("query", help="run one registry query")
    p.add_argument("--name", required=True)
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--out", default=None)
    _add_common(p)
    p.set_defaults(fn=cmd_query)
    return ap


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    if args.cmd == "crawl":
        os.makedirs(args.out, exist_ok=True)
    result = args.fn(args)
    print(json.dumps(result, default=str))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
