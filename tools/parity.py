"""Targeted oracle-parity check at any SF (same methodology as
tests/test_entry_oracle.py, which pins sf0.001 in pytest): run named
entries on Spark and their frozen oracle SQL on DuckDB over the same
parquet and compare column-sorted, value-normalized row multisets.

Usage: python tools/parity.py <query> [...] [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def as_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> None:
    import __spark_entry__ as entrymod
    from news_please_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("parity", cpus=cpus, shuffle_partitions=cpus)
    fails = 0
    for name in names:
        q = entrymod.queries()[name]
        sql = entrymod.oracle_sql()[name]
        sdf = q(spark, sf_dir)
        scols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(sql)
        dcols = [c.lower() for c in rel.columns]
        drows = rel.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        sms = as_multiset(scols, srows)
        dms = as_multiset(dcols, drows)
        ok = ok_cols and sms == dms
        print(f"{name}: {'OK' if ok else 'FAIL'} "
              f"(spark={len(srows)} oracle={len(drows)})", flush=True)
        if not ok:
            fails += 1
            if not ok_cols:
                print(f"  cols spark={scols} duck={dcols}")
            diff_s = [r for r in sms if r not in dms][:3]
            diff_d = [r for r in dms if r not in sms][:3]
            print(f"  spark-only: {diff_s}\n  oracle-only: {diff_d}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
