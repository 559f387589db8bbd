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

from pyspark.sql import DataFrame, Window
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


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams — the "where do users go next" table behind every product
    flow diagram, and (for the crawl tier) the same shape as
    page-type transition analysis on a browsing/fetch log.

    Per ordered user stream, each consecutive pair contributes one
    (from_type, to_type) observation; output rows carry n (the count)
    and p_bp (row-normalized probability in basis points:
    n·10⁴ DIV Σ_to n — integer-exact). One lag() window keyed by user
    (the only data-sized shuffle; a user's stream is one cell), one
    map-side-combinable pair count, and the normalizing totals join
    is |event types|² at most — broadcast-sized by construction."""
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.select(
            F.col(user_col),
            F.lag(type_col).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .withColumn("p_bp", F.expr("n * 10000 DIV _tot"))
        .drop("_tot")
    )
