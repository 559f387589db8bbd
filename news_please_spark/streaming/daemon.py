"""O4 — daemonized re-crawl scheduling + F10 recency filter.

The reference keeps a min-heap of (next_run_time, site) with a +1 s bump
on collisions and re-enqueues after each run (reference
__main__.py:615-705 DaemonList.add_execution/get_next_item). Here the
heap drives *incremental Spark batches*; the RSS recency window is a
stream-static join against the versioned store's `current` table
(reference pipeline/pipelines.py:110-131, default 6 h config.cfg:51).
"""

from __future__ import annotations

import heapq
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DaemonScheduler:
    """Deterministic time-queue of per-site re-crawl runs."""

    def __init__(self, intervals: dict[str, int], start_time: int = 0):
        self.intervals = dict(intervals)
        self._heap: list[tuple[int, str]] = []
        self._scheduled: set[int] = set()
        for site in sorted(intervals):
            self._push(start_time + intervals[site], site)

    def _push(self, t: int, site: str) -> None:
        # collision bump: one site per timestamp (reference
        # __main__.py:662-678 add_execution)
        while t in self._scheduled:
            t += 1
        self._scheduled.add(t)
        heapq.heappush(self._heap, (t, site))

    def run_until(
        self, t_end: int, run_fn: Callable[[str, int], None]
    ) -> list[tuple[int, str]]:
        """Pop-and-run every due (time, site) up to t_end; each run is
        re-enqueued at time+interval. Returns the run log."""
        log: list[tuple[int, str]] = []
        while self._heap and self._heap[0][0] <= t_end:
            t, site = heapq.heappop(self._heap)
            self._scheduled.discard(t)
            run_fn(site, t)
            log.append((t, site))
            self._push(t + self.intervals[site], site)
        return log


def recency_filter(
    new_items: DataFrame,
    current_versions: DataFrame | None,
    delta_hours: float = 6.0,
    ts_col: str = "date_download",
) -> DataFrame:
    """Drop re-downloads younger than delta vs the stored current
    version (keyed on url). NULL-safe: unseen urls always pass."""
    if current_versions is None:
        return new_items
    prev = current_versions.select(
        "url", F.col(ts_col).alias("_prev_ts")
    )
    delta_us = int(delta_hours * 3600 * 1_000_000)
    return (
        new_items.join(prev, "url", "left")
        .filter(
            F.col("_prev_ts").isNull()
            | (
                F.unix_micros(F.col(ts_col).cast("timestamp"))
                - F.unix_micros(F.col("_prev_ts").cast("timestamp"))
                > delta_us
            )
        )
        .drop("_prev_ts")
    )
