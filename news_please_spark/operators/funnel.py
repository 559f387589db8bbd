"""Ordered funnel analysis over an event stream — the classic product-
analytics operator (which users progressed view → click → purchase, in
order, within a conversion window) that took a per-user ordered scan in
the reference-era engines.

Spark-first shape: ONE shuffle total.  Events are filtered to the
funnel's step types (the predicate reaches the scan), grouped by user,
sorted per user with ``sort_array`` (no secondary-sort machinery), and
the step times fall out of a single native-HOF fold whose accumulator
is the array of step timestamps — no UDF, no window functions, no
self-joins per step (the textbook SQL formulation joins the event
table once PER STEP; this is one pass regardless of funnel length).

Semantics (deterministic, tie-safe): step 1's time is the user's
earliest step-1 event; step k's time is the earliest step-k event
STRICTLY after step k-1's time (same-timestamp events do not chain)
and, when a window is set, at most ``window_seconds`` after step 1.
Because progression compares timestamps — not sort positions — the
result is independent of how ties are ordered, and equals the
min-per-step join chain the DuckDB oracle runs.

Skew contract: per-user state is one array of N timestamps; per-user
work is O(events · N) with N = funnel length (tiny constant).  The one
heavy key is a user with enormous event counts — the same grain every
sessionizer shares (events_sessionize documents it); the filter to
step types runs before the shuffle, so off-funnel event volume never
moves.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    window_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, steps, t1..tN): furthest funnel stage per user and the
    per-stage completion times (NULL beyond the reached stage).  Users
    with no step-1 event are absent (they have no funnel presence).
    ``window_seconds`` bounds steps 2..N to that horizon after t1."""
    n = len(steps)
    if n < 2:
        raise ValueError(f"a funnel needs at least 2 steps, got {n}")
    if len(set(steps)) != n:
        raise ValueError(f"funnel steps must be distinct: {steps!r}")
    idx_map = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i + 1))]
    )
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("ts"),
            idx_map[F.col(type_col)].cast("int").alias("s"),
        ).alias("_e"),
    )
    grouped = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list("_e")).alias("_evs")
    )
    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(n)])

    def upd(acc, e):
        if window_seconds is None:
            win_ok = F.lit(True)
        else:
            win_ok = e["ts"] <= F.element_at(acc, 1) + F.expr(
                f"INTERVAL {int(window_seconds)} SECONDS"
            )
        chain_ok = F.when(e["s"] == 1, F.lit(True)).otherwise(
            F.element_at(acc, e["s"] - 1).isNotNull()
            & (e["ts"] > F.element_at(acc, e["s"] - 1))
            & win_ok
        )
        return F.transform(
            acc,
            lambda cur, i: F.when(
                (i == e["s"] - 1) & cur.isNull() & chain_ok, e["ts"]
            ).otherwise(cur),
        )

    times = F.aggregate("_evs", init, upd)
    out = grouped.select(F.col(user_col), times.alias("_t"))
    return out.select(
        user_col,
        F.size(F.filter("_t", lambda x: x.isNotNull()))
        .cast("int")
        .alias("steps"),
        *[F.element_at("_t", i + 1).alias(f"t{i + 1}") for i in range(n)],
    ).filter(F.col("steps") >= 1)


def funnel_counts(per_user: DataFrame, n: int) -> DataFrame:
    """(step, users): how many users reached at least each stage — the
    drop-off curve, a tiny aggregation over funnel_steps' output."""
    return (
        per_user.select(F.explode(F.sequence(F.lit(1), F.col("steps"))).alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
    )
