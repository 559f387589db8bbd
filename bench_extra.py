"""Ad-hoc per-query profiling harness for the optimization round.

NOT the driver bench (bench.py is frozen). Runs named queries from the
registry with the noop sink (guide §1.4), prints per-query seconds and
optionally writes .explain("formatted") to plans/r06/.

Usage:
  python bench_extra.py <query> [<query> ...] [--sf-dir DIR] [--explain TAG]
  python bench_extra.py --all          # full suite, same method as bench.py
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import news_please_spark.plans.extraction_queries  # noqa: F401
    from news_please_spark.plans.queries import QUERIES
    from news_please_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    sf_dir = SF_DIR
    explain_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--explain":
            explain_tag = args[i + 1]
            i += 2
        elif args[i] == "--all":
            names = list(QUERIES)
            i += 1
        else:
            names.append(args[i])
            i += 1

    spark = get_spark("bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    # warm prologue, same as bench.py
    _warm = spark.createDataFrame([(1, [0.5, 1.0])], "id long, v array<double>")
    _warm.mapInPandas(lambda it: it, "id long, v array<double>").selectExpr(
        "id", "aggregate(v, 0.0D, (a, x) -> a + x) s"
    ).write.mode("overwrite").format("noop").save()
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(32).write.mode(
        "overwrite"
    ).format("noop").save()

    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        if explain_tag:
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_{explain_tag}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
        df.write.mode("overwrite").format("noop").save()
        el = time.time() - t0
        print(f"{name}: {el:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
