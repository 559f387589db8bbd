"""Cohort retention analysis — the second canonical event-stream
analytics operator next to the funnel (operators/funnel.py): group
users into signup cohorts and measure what fraction is still active k
periods later.

Spark-first shape, all relational (no per-user state at all):

  1. cohorts:  signup events → min ts per user → date_trunc(period)
  2. activity: (user, period) DISTINCT — the only corpus-sized
     shuffle, map-side combinable and prunable to the active-type set
  3. one equi-join on user (both sides are per-user grain, hash join
     co-partitions; no broadcast assumption — 10^9 users works)
  4. offsets + a tiny (cohort, k) aggregation

Retention is reported in integer basis points (active·10⁴ // cohort
size) — the repo's integer-surrogate convention, bit-exact across
engines.  Periods are engine-portable: ``date_trunc('week', ts)``
lands on the ISO Monday in both Spark and DuckDB, and offsets are
exact day-diffs divided by the period length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIOD_DAYS = {"week": 7, "day": 1}


def cohort_retention(
    events: DataFrame,
    cohort_type: str = "signup",
    active_types: list[str] | None = None,
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(cohort, k, n_active, n_cohort, retention_bp): for each signup
    cohort (period of the user's FIRST ``cohort_type`` event) and each
    period offset k ≥ 0, how many cohort members had any qualifying
    activity in that period.  k = 0 is the signup period itself;
    pre-signup activity is excluded.  ``active_types`` restricts what
    counts as active (default: any event)."""
    if period not in _PERIOD_DAYS:
        raise ValueError(f"period must be one of {sorted(_PERIOD_DAYS)}")
    plen = _PERIOD_DAYS[period]
    cohorts = (
        events.filter(F.col(type_col) == cohort_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_first"))
        .select(
            F.col(user_col),
            F.date_trunc(period, F.col("_first")).cast("date").alias("cohort"),
        )
    )
    act = events
    if active_types is not None:
        act = act.filter(F.col(type_col).isin(list(active_types)))
    activity = act.select(
        F.col(user_col),
        F.date_trunc(period, F.col(ts_col)).cast("date").alias("_p"),
    ).distinct()
    joined = activity.join(cohorts, user_col).withColumn(
        "k",
        (F.datediff(F.col("_p"), F.col("cohort")) / plen).cast("int"),
    )
    counts = (
        joined.filter(F.col("k") >= 0)
        .groupBy("cohort", "k")
        .agg(F.countDistinct(user_col).cast("long").alias("n_active"))
    )
    sizes = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    return counts.join(sizes, "cohort").select(
        "cohort",
        "k",
        "n_active",
        "n_cohort",
        # integer DIV, not double division + cast: float rounding could
        # straddle the floor boundary and diverge from the oracle's //
        F.expr("(n_active * 10000) DIV n_cohort").alias("retention_bp"),
    )
