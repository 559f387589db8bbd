"""Streaming per-host politeness budget — the custom STATEFUL operator
of the streaming tier (SURVEY.md §2.10 / task brief:
applyInPandasWithState for operators watermarks can't express).

A streaming crawler admits fetch candidates per host up to a budget,
and the budget must hold ACROSS micro-batches: dropDuplicates knows
nothing of counts, windowed aggregation resets per window, and a
stream-static join can't see what earlier batches admitted. This is
exactly keyed process-time state: group by host, keep (admitted so
far) as GroupState, admit the in-batch prefix that still fits, update
the state.

Determinism contract (mirrors the batch politeness tier): within one
micro-batch a host's candidates are admitted in (priority, url) order;
across batches, arrival order governs — the same rule the reference's
serial scheduler applies to its queue.

Batch-side twin: `budget_admit_batch` computes the identical admission
on a static DataFrame (window row_number over the same ordering), so
the stateful operator is testable against a bit-exact oracle the same
way the frontier engine is tested against the pure-Python crawl
simulator.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ADMIT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("priority", LongType()),
        StructField("admitted_seq", IntegerType()),  # 1-based per host
    ]
)

STATE_SCHEMA = StructType([StructField("taken", IntegerType())])


def _admit_fn(budget_per_host: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (taken,) = state.get if state.exists else (0,)
        remaining = budget_per_host - taken
        # concat before sorting: the iterator chunks one group's batch,
        # and admitting per-chunk prefixes would break the documented
        # whole-batch (priority, url) ordering. One host's per-batch
        # candidates are the same grain the batch tier's politeness
        # window buffers, so materializing them here is design-scale.
        batch = pd.concat(list(pdfs), ignore_index=True)
        if remaining > 0 and len(batch):
            batch = batch.sort_values(["priority", "url"], kind="mergesort")
            admit = batch.iloc[:remaining][["host", "url", "priority"]].copy()
            n = len(admit)
            admit["admitted_seq"] = range(taken + 1, taken + n + 1)
            state.update((taken + n,))
            return iter([admit])
        state.update((taken,))
        return iter([])

    return fn


def budgeted_stream(
    candidates: DataFrame, budget_per_host: int
) -> DataFrame:
    """candidates (streaming): host, url, priority → the admitted rows,
    with a per-host admitted_seq that is stable across micro-batches.
    State per host is ONE int — at 10^8 hosts that is a few GB across
    the cluster's state store, the design-scale grain."""
    return candidates.groupBy("host").applyInPandasWithState(
        _admit_fn(budget_per_host),
        outputStructType=ADMIT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def budget_admit_batch(
    candidates: DataFrame, budget_per_host: int, batch_col: str | None = None
) -> DataFrame:
    """The static twin: identical admission semantics on a batch table.
    With batch_col, ordering is (batch, priority, url) — the arrival
    order the stream sees; without, one global batch."""
    order = ([F.col(batch_col)] if batch_col else []) + [
        F.col("priority"),
        F.col("url"),
    ]
    w = Window.partitionBy("host").orderBy(*order)
    return (
        candidates.withColumn("admitted_seq", F.row_number().over(w).cast("int"))
        .filter(F.col("admitted_seq") <= budget_per_host)
        .select("host", "url", "priority", "admitted_seq")
    )


__all__ = ["budgeted_stream", "budget_admit_batch", "ADMIT_SCHEMA", "STATE_SCHEMA"]
