"""Small-file compaction planning for snapshot tables.

Every long-running ingest (the frontier's per-wave commits, the CC
pipeline's per-WARC appends, streaming sinks) accretes small files;
scan cost then scales with FILE COUNT, not bytes.  Lakehouse table
formats solve it with a periodic compaction pass that rewrites groups
of small files into ~target-sized ones.  This module is the PLANNER:
given the current file inventory it emits deterministic rewrite
groups; executing a group is one read-concat-write task, and the
commit goes through state.SnapshotCatalog's CAS like any other writer.

Packing policy: NEXT-FIT DECREASING per table partition — files sorted
(size desc, name), each either joins the currently-open bin or seals
it and opens a new one.  Next-fit (vs first/best-fit) is the policy a
DISTRIBUTED compactor actually wants: one sequential pass, O(1) state,
no bin search — and with the decreasing sort its waste is bounded
(every sealed bin except the last is > half full when files <= target:
a file that didn't fit is no larger than everything already in the
bin, so load > target/2).  Oversized files (> target) seal a bin alone
and are left for a split pass, never grouped.

Spark shape: files collect into ONE array per partition key
(compaction inventories are metadata — 10^3-10^5 rows per partition,
kilobytes; the contract documented here and enforced by the planner
being keyed on the table partition), sorted with a comparator lambda,
then the whole sequential policy runs inside one codegen'd F.aggregate
fold — the sentence_chunks/pack discipline: order-dependence lives
inside a row, zero extra shuffle beyond the per-partition collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    target_bytes: int = 128 * 1024 * 1024,
    part_col: str = "part",
    file_col: str = "file",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Plan rewrite groups: (part, file, size_bytes, bin_id), bin_id
    0-based per partition.  Deterministic: ties in size break on file
    name.  A bin with one oversized file is a split candidate; a bin
    with one file AND load <= target is already compact (executors
    skip single-file bins)."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    t = F.lit(int(target_bytes))
    rows = files.select(
        F.col(part_col).alias("part"),
        F.struct(
            F.col(size_col).cast("long").alias("size"),
            F.col(file_col).alias("file"),
        ).alias("_fs"),
    )
    per_part = rows.groupBy("part").agg(F.collect_list("_fs").alias("_l"))
    # size DESC, file ASC — comparator returns negative when left first
    ordered = F.array_sort(
        F.col("_l"),
        lambda a, b: F.when(a["size"] > b["size"], F.lit(-1))
        .when(a["size"] < b["size"], F.lit(1))
        .when(a["file"] < b["file"], F.lit(-1))
        .when(a["file"] > b["file"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    init = F.struct(
        F.array().cast("array<struct<file:string,size:bigint,bin:int>>").alias(
            "out"
        ),
        F.lit(-1).alias("bin"),
        F.lit(0).cast("long").alias("load"),
    )

    def step(acc, fs):
        fits = (acc["bin"] >= 0) & (acc["load"] + fs["size"] <= t)
        nbin = F.when(fits, acc["bin"]).otherwise(acc["bin"] + 1)
        nload = F.when(fits, acc["load"] + fs["size"]).otherwise(fs["size"])
        entry = F.struct(
            fs["file"].alias("file"),
            fs["size"].alias("size"),
            nbin.cast("int").alias("bin"),
        )
        return F.struct(
            F.concat(acc["out"], F.array(entry)).alias("out"),
            nbin.alias("bin"),
            nload.alias("load"),
        )

    packed = per_part.select(
        "part",
        F.aggregate(ordered, init, step, lambda acc: acc["out"]).alias("_p"),
    )
    ex = packed.select("part", F.explode("_p").alias("_e"))
    return ex.select(
        "part",
        F.col("_e.file").alias("file"),
        F.col("_e.size").alias("size_bytes"),
        F.col("_e.bin").cast("int").alias("bin_id"),
    )
