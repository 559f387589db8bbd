"""Streaming exact-dedup LEDGER — first-arrival-wins dedup with
duplicate accounting, stateful across micro-batches.

Native `dropDuplicates` on a watermarked stream already suppresses
re-arrivals, but it can only DROP: an ingestion pipeline also needs
the ledger — which document became the canonical copy for a
fingerprint, how many duplicates followed, and each duplicate's rank —
because downstream retractions ("canonical got DMCA'd, promote the
next copy") and dup-rate monitoring read that trail. That is keyed
state native operators don't expose, so this is the second
applyInPandasWithState operator of the streaming tier (beside the
politeness budget; same design rules).

Semantics (mirrors the batch dedup tier's deterministic tie-break):
within one micro-batch a fingerprint's rows are ordered by id ASC;
across batches, arrival order governs. The first row ever seen for a
fingerprint is canonical (dup_rank 1); every later row carries
dup_rank = its position in the fingerprint's arrival history and the
canonical id it duplicates.

State per fingerprint is (n_seen: long, canonical_id: string) — tens
of bytes; at 10^10 fingerprints that is the RocksDB-state-store grain
a production cluster provisions for streaming dedup, and the
fingerprint is the GROUP KEY, so state lookups are hash-partitioned,
never broadcast.

Batch-side twin `dedup_ledger_batch` computes the identical ledger on
a static table (one window over (fp) ordered by arrival), so the
stateful operator is testable bit-exact against a static oracle — the
politeness tier's testing pattern.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LEDGER_SCHEMA = StructType(
    [
        StructField("fp", StringType()),
        StructField("doc_id", StringType()),
        StructField("canonical_id", StringType()),
        StructField("dup_rank", LongType()),  # 1 = canonical
        StructField("is_canonical", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        StructField("canonical_id", StringType()),
    ]
)


def _ledger_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n_seen, canonical = state.get if state.exists else (0, None)
        # concat before sorting: one fingerprint's per-batch rows are
        # the grain the batch twin's window buffers — design-scale
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            state.update((n_seen, canonical))
            return iter([])
        batch = batch.sort_values("doc_id", kind="mergesort")
        out = batch[["fp", "doc_id"]].copy()
        ranks = range(n_seen + 1, n_seen + len(batch) + 1)
        out["dup_rank"] = list(ranks)
        if canonical is None:
            canonical = out.iloc[0]["doc_id"]
        out["canonical_id"] = canonical
        out["is_canonical"] = out["dup_rank"] == 1
        state.update((n_seen + len(batch), canonical))
        return iter([out[["fp", "doc_id", "canonical_id", "dup_rank", "is_canonical"]]])

    return fn


def dedup_ledger_stream(docs: DataFrame) -> DataFrame:
    """docs (streaming): fp, doc_id → the dedup ledger, stable across
    micro-batches and query restarts (state lives in the checkpoint)."""
    return docs.groupBy("fp").applyInPandasWithState(
        _ledger_fn(),
        outputStructType=LEDGER_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_ledger_batch(
    docs: DataFrame, batch_col: str | None = None
) -> DataFrame:
    """The static twin: identical ledger on a batch table. With
    batch_col, ordering is (batch, doc_id) — the arrival order the
    stream sees; without, one global batch."""
    order = ([F.col(batch_col)] if batch_col else []) + [F.col("doc_id")]
    w = Window.partitionBy("fp").orderBy(*order)
    return (
        docs.withColumn("dup_rank", F.row_number().over(w).cast("long"))
        .withColumn("canonical_id", F.first("doc_id").over(w))
        .select(
            "fp",
            "doc_id",
            "canonical_id",
            "dup_rank",
            (F.col("dup_rank") == 1).alias("is_canonical"),
        )
    )


__all__ = [
    "dedup_ledger_stream",
    "dedup_ledger_batch",
    "LEDGER_SCHEMA",
    "STATE_SCHEMA",
]
