"""Streaming fetch-rate anomaly — the stateful twin of
operators/recrawl.py::rate_anomaly_on_counts (SURVEY.md §2.10's
applyInPandasWithState tier, beside the politeness budget operator).

A live crawl wants the fetch-storm alarm ON the stream, not in
tomorrow's batch report.  The trailing baseline ("previous W observed
hours for this host") is exactly what watermarked window aggregation
cannot express — each tumbling window closes independently — and what
keyed state expresses in one int-pair deque: per host, keep the last W
closed-hour counts; each arriving closed hour is judged against their
sum, then pushed.

Input grain: CLOSED hourly counts (host, hour, n_fetches) — the output
of an upstream watermarked window count (or the batch aggregate in
replay).  Contract, same as the batch twin's window: a host's hours
are judged in hour order; within a micro-batch rows are sorted, and
across batches arrival must be non-decreasing per host (closed-window
emission order guarantees this upstream).

State per host: W longs + W hour stamps — tens of bytes, the same
design-scale grain as the politeness operator's one int.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("hour", TimestampType()),
        StructField("n_fetches", LongType()),
        StructField("trail_sum", LongType()),
        StructField("trail_n", LongType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

STATE_SCHEMA = StructType([StructField("recent", ArrayType(LongType()))])


def _anomaly_fn(window_hours: int, threshold_x10: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (recent,) = state.get if state.exists else ([],)
        recent = list(recent or [])
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            state.update((recent,))
            return iter([])
        batch = batch.sort_values("hour", kind="mergesort")
        out = []
        for _, row in batch.iterrows():
            n = int(row["n_fetches"])
            trail_sum, trail_n = sum(recent), len(recent)
            flag = trail_n == window_hours and (
                10 * n * trail_n > threshold_x10 * trail_sum
            )
            out.append(
                (row["host"], row["hour"], n, trail_sum, trail_n, flag)
            )
            recent.append(n)
            if len(recent) > window_hours:
                recent = recent[-window_hours:]
        state.update((recent,))
        return iter(
            [
                pd.DataFrame(
                    out,
                    columns=[
                        "host",
                        "hour",
                        "n_fetches",
                        "trail_sum",
                        "trail_n",
                        "is_anomaly",
                    ],
                )
            ]
        )

    return fn


def anomaly_stream(
    hourly: DataFrame, window_hours: int = 3, threshold_x10: int = 15
) -> DataFrame:
    """hourly (streaming): host, hour, n_fetches -> one judged row per
    input row, trailing state held across micro-batches and restarts
    (checkpointed GroupState)."""
    return hourly.groupBy("host").applyInPandasWithState(
        _anomaly_fn(window_hours, threshold_x10),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
