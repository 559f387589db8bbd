"""Adaptive recrawl scheduling — change-frequency estimation.

A continuous crawler re-fetches pages at a cadence matched to how often
they actually change (Cho & Garcia-Molina 2003, "Estimating Frequency
of Change"): news frontpages hourly, archive pages monthly.  The
reference crawls on a fixed daemon interval per site
(newsplease config `daemonize`); this operator derives the interval
from observed fetch history instead.

Estimator (deterministic integer form of the classic one): for each
URL with `n` recorded fetches spanning `span` microseconds, in which
the content hash changed `c` times between consecutive fetches, the
mean time-between-changes is estimated as `span div (c + 1)` and
clamped to [min_interval, max_interval].  `next_due = last_fetch +
interval`.  All integer arithmetic (epoch micros, `div`) so results
are bit-identical across engines — the oracle entry hash-checks it
against DuckDB.

Scale shape: ONE shuffle total.  The lag window partitions by url, and
the follow-up per-url aggregate reuses that partitioning (same key),
so Catalyst plans a single Exchange for history tables of any size.
Per-url history is short (tens of fetches), so no window skew; the
output is one row per url — the frontier joins it back on url to gate
admission (`next_due_us <= now`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000
DAY_US = 24 * HOUR_US


def recrawl_schedule(
    history: DataFrame,
    key: str = "url",
    ts: str = "fetch_ts",
    content: str = "content_hash",
    tiebreak: str | None = None,
    min_interval_us: int = HOUR_US,
    max_interval_us: int = 30 * DAY_US,
) -> DataFrame:
    """Per-url fetch cadence from observed change history.

    Returns (key, n_visits, n_changes, interval_us, next_due_us).
    `tiebreak` orders equal-timestamp fetches deterministically (pass
    a unique column when timestamps can collide)."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    x = history.select(
        key,
        us.alias("_us"),
        F.when(
            F.lag(F.col(content)).over(w).isNotNull()
            & (F.lag(F.col(content)).over(w) != F.col(content)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_chg"),
    )
    agg = x.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum("_chg").cast("long").alias("n_changes"),
        F.min("_us").alias("_first"),
        F.max("_us").alias("_last"),
    )
    raw = F.expr("(_last - _first) div (n_changes + 1)")
    interval = F.least(
        F.greatest(raw, F.lit(min_interval_us)), F.lit(max_interval_us)
    )
    return agg.select(
        key,
        F.col("n_visits").cast("long").alias("n_visits"),
        "n_changes",
        interval.cast("long").alias("interval_us"),
        (F.col("_last") + interval).cast("long").alias("next_due_us"),
    )
