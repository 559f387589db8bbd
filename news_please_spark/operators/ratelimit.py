"""GCRA (token-bucket) fetch admission — burst-aware rate limiting.

The politeness tiers so far cap COUNTS per cycle (top-k, byte budgets)
or space fetches evenly (fetch_timetable). Real servers advertise
burst-tolerant rates ("1 req/s, burst 5") — the Generic Cell Rate
Algorithm is the standard one-pass formulation (ATM Forum / RFC 2697's
token bucket equivalently): per key keep one scalar, the theoretical
arrival time TAT, and for each arrival t in time order

    admit  iff  t >= TAT - tau          (tau = burst tolerance)
    on admit:   TAT = max(t, TAT) + T   (T = emission interval)

All integer microseconds, so the admission sequence replays
bit-for-bit cross-engine (the DuckDB oracle walks the same recurrence
as a recursive CTE).

The recurrence is inherently sequential PER KEY (admission feeds back
into state), so this runs as one Arrow-batched applyInPandas per host
cell — the same documented grain as the streaming politeness state and
the crawl oracle: a host's arrivals in one wave/window are bounded by
the planner, and hosts are the parallel unit. The per-cell walk is a
tight numpy-array loop over longs, not per-row Spark Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "host string, event_id long, t_us long, admitted long, tat_after long"
)


def gcra_admission(
    events: DataFrame,
    rate_interval_us: int,
    burst_us: int,
    host_col: str = "host",
    ts_col: str = "t_us",
    id_col: str = "event_id",
) -> DataFrame:
    """Admit arrivals per host under GCRA(T=rate_interval_us,
    tau=burst_us). Input: host, event_id (BIGINT, tie-break), t_us
    (BIGINT microseconds). Output one row per arrival: admitted (0/1)
    and the post-decision TAT (state observability / resume point).

    The first arrival of a host is always admitted (TAT starts at its
    own t). Plan: ONE exchange on host + a partition-streaming walk —
    mapInPandas over hash(host)-partitioned, (host, t, id)-sorted rows
    with the TAT carried across batch/host boundaries in the
    generator. The per-GROUP applyInPandas it replaces built a pandas
    frame per host cell; with 10^4-10^5 tiny cells (one per host) that
    fixed per-group overhead WAS the operator's cost. Identical rows:
    hash partitioning keeps each host in one partition and the
    partition sort is the same (t, id) order the per-cell sort
    produced."""
    if rate_interval_us <= 0:
        raise ValueError("rate_interval_us must be > 0")
    if burst_us < 0:
        raise ValueError("burst_us must be >= 0")
    T = int(rate_interval_us)
    tau = int(burst_us)

    def gen(batches):
        cur_host = None
        tat = None
        for pdf in batches:
            hosts = pdf[host_col].to_numpy()
            ts = pdf[ts_col].to_numpy()
            ids = pdf[id_col].to_numpy()
            n = len(ts)
            admitted = [0] * n
            tat_after = [0] * n
            for i in range(n):
                h = hosts[i]
                if h != cur_host:
                    cur_host = h
                    tat = None
                t = int(ts[i])
                if tat is None or t >= tat - tau:
                    admitted[i] = 1
                    tat = (t if tat is None else max(t, tat)) + T
                tat_after[i] = tat
            yield pd.DataFrame(
                {
                    "host": hosts,
                    "event_id": ids,
                    "t_us": ts,
                    "admitted": admitted,
                    "tat_after": tat_after,
                }
            )

    cols = events.select(
        F.col(host_col).alias(host_col),
        F.col(id_col).cast("long").alias(id_col),
        F.col(ts_col).cast("long").alias(ts_col),
    )
    part = cols.repartition(F.col(host_col)).sortWithinPartitions(
        host_col, ts_col, id_col
    )
    return part.mapInPandas(gen, _OUT_SCHEMA)
