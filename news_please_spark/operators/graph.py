"""Connected components over an edge table — transitive closure for
dup clusters, the step that turns pairwise near-dup verdicts into
dedup GROUPS (a≈b and b≈c must put a, b, c in ONE cluster even when
a≉c pairwise; keeping min-id per cluster is then exemplar selection,
not a per-pair coin flip).

Algorithm: iterative min-label propagation (the "hash-to-min" family,
Kiveris et al. 2014, "Connected Components in MapReduce and Beyond"):
every node starts labeled with itself; each round it takes the min of
its own label and its neighbors' labels; fixpoint = every node holds
its component's min id.  Convergence is O(graph diameter) rounds —
near-dup clusters are dense stars/cliques with tiny diameters, so this
runs 2-4 rounds in practice (the paper's large-star/small-star variant
is the O(log n) upgrade path for adversarially long chains).

Distribution: one hash-shuffle join per round on node id, labels
localCheckpoint'ed each round (plan stays flat, superseded checkpoints
released deterministically — the frontier's wave-loop discipline).
The driver loop carries only the single changed-row COUNT per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_please_spark.operators.cacheutil import release_df


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 50,
) -> DataFrame:
    """(id, root) for every node appearing in `edges`, root = the
    smallest node id in its connected component.  Deterministic;
    isolated nodes never appear (feed them separately if singletons
    should carry their own label).  Raises after `max_iters` rounds
    without convergence — diameter that large means the input is not a
    dup graph."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    und = und.localCheckpoint()
    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("root", F.col("id"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iters):
            neigh = (
                und.join(labels, und["b"] == labels["id"])
                .groupBy("a")
                .agg(F.min("root").alias("_nr"))
            )
            stepped = (
                labels.join(neigh, labels["id"] == neigh["a"], "left")
                .select(
                    "id",
                    "root",
                    F.least(
                        F.col("root"), F.coalesce(F.col("_nr"), F.col("root"))
                    ).alias("_new"),
                )
                .localCheckpoint()
            )
            changed = stepped.filter(F.col("_new") != F.col("root")).count()
            prev = labels
            labels = stepped.select("id", F.col("_new").alias("root")).localCheckpoint()
            release_df(prev)
            release_df(stepped)
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    finally:
        release_df(und)
