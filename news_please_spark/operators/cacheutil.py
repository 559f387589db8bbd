"""Deterministic release of cached / locally-checkpointed DataFrames.

Spark's ContextCleaner eventually drops the blocks behind an
unreferenced `persist()` or `localCheckpoint()` — but "eventually"
means "after driver GC notices", which on a long-lived session lets
superseded state (replaced URL-seen chunks, consumed seed caches)
transiently double storage usage. At the 10^10-URL design point a
seen-set fold that briefly holds 2× the seen bytes is the difference
between fitting executor storage and spilling every wave, so the
engine releases superseded state explicitly instead of waiting for GC.

`release_df` is deliberately best-effort and type-checked:

* a persisted DataFrame unpersists directly;
* a locally-checkpointed DataFrame's blocks belong to the RDD inside
  its root `LogicalRDD` node — reachable via the JVM plan, verified
  against Spark 4.x internals;
* anything else (e.g. a projection OVER someone else's checkpoint,
  whose blocks the owner may still need) is left alone and the call
  returns False.

The LogicalRDD path matters: `df.rdd.unpersist()` would build a NEW
derived RDD and unpersist that, leaving the checkpoint blocks cached.
NEVER release a localCheckpoint that might still be recomputed —
localCheckpoint truncates lineage, so dropped blocks are gone for good.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LOGICAL_RDD = "org.apache.spark.sql.execution.LogicalRDD"


def release_df(df: DataFrame | None) -> bool:
    """Release the storage behind `df` if this DataFrame exclusively
    owns it. Returns True when blocks were actually freed."""
    if df is None:
        return False
    try:
        lvl = df.storageLevel
        if lvl.useMemory or lvl.useDisk:
            df.unpersist(blocking=False)
            return True
    except Exception:
        pass
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName() != _LOGICAL_RDD:
            return False  # not a checkpoint root — blocks aren't ours
        plan.rdd().unpersist(False)
        return True
    except Exception:
        return False
