"""Cohort retention vs a pure-Python reference (ISO-Monday weeks,
first-signup cohorts, distinct active periods)."""

from __future__ import annotations

from datetime import date, datetime, timedelta

import pytest

from news_please_spark.operators.retention import cohort_retention


def monday(d: date) -> date:
    return d - timedelta(days=d.weekday())


# (user, datetime, type). Weeks: 2024-01-01 is a Monday.
EVENTS = [
    # u1 signs up week 0, active weeks 0, 1, 3
    (1, datetime(2024, 1, 2, 10), "signup"),
    (1, datetime(2024, 1, 4, 11), "view"),
    (1, datetime(2024, 1, 9, 9), "click"),
    (1, datetime(2024, 1, 22, 8), "view"),
    # u2 signs up week 0, never returns
    (2, datetime(2024, 1, 3, 12), "signup"),
    # u3 signs up TWICE (weeks 0 and 2) — first signup wins
    (3, datetime(2024, 1, 5, 9), "signup"),
    (3, datetime(2024, 1, 16, 9), "signup"),
    (3, datetime(2024, 1, 17, 10), "purchase"),
    # u4 has activity BEFORE signup (excluded) and after (week 1 of its
    # own cohort, which starts week 1)
    (4, datetime(2024, 1, 2, 7), "view"),
    (4, datetime(2024, 1, 10, 7), "signup"),
    (4, datetime(2024, 1, 18, 7), "view"),
    # u5 never signs up — not in any cohort
    (5, datetime(2024, 1, 2, 6), "view"),
    # duplicate same-week activity must count once
    (1, datetime(2024, 1, 5, 18), "error"),
]


def py_retention(events, active_types=None):
    first = {}
    for u, t, ty in events:
        if ty == "signup" and (u not in first or t < first[u]):
            first[u] = t
    cohort = {u: monday(t.date()) for u, t in first.items()}
    act = set()
    for u, t, ty in events:
        if u not in cohort:
            continue
        if active_types is not None and ty not in active_types:
            continue
        k = (monday(t.date()) - cohort[u]).days // 7
        if k >= 0:
            act.add((cohort[u], k, u))
    sizes = {}
    for u, c in cohort.items():
        sizes[c] = sizes.get(c, 0) + 1
    out = {}
    for c, k, _ in act:
        out[(c, k)] = out.get((c, k), 0) + 1
    return {
        (c, k): (n, sizes[c], n * 10000 // sizes[c])
        for (c, k), n in out.items()
    }


@pytest.fixture(scope="module")
def ev_df(spark):
    return spark.createDataFrame(
        EVENTS, "user_id long, ts timestamp, event_type string"
    )


def test_matches_python(ev_df):
    got = {
        (r.cohort, r.k): (r.n_active, r.n_cohort, r.retention_bp)
        for r in cohort_retention(ev_df).collect()
    }
    assert got == py_retention(EVENTS)


def test_active_type_restriction(ev_df):
    got = {
        (r.cohort, r.k): (r.n_active, r.n_cohort, r.retention_bp)
        for r in cohort_retention(
            ev_df, active_types=["view", "click", "purchase"]
        ).collect()
    }
    assert got == py_retention(EVENTS, {"view", "click", "purchase"})


def test_semantics_pins(ev_df):
    got = {
        (str(r.cohort), r.k): r
        for r in cohort_retention(ev_df).collect()
    }
    w0 = "2024-01-01"
    # cohort week 0 has u1, u2, u3; all active at k=0 (signup counts)
    assert got[(w0, 0)].n_active == 3 and got[(w0, 0)].n_cohort == 3
    assert got[(w0, 0)].retention_bp == 10000
    # k=1: u1 (click) and u3 (nothing week 1? u3's 2nd signup is week 2)
    assert got[(w0, 1)].n_active == 1
    # k=2: u3's duplicate signup + purchase — counted once
    assert got[(w0, 2)].n_active == 1
    # k=3: u1's late view
    assert got[(w0, 3)].n_active == 1
    # u4's own cohort starts week 1; pre-signup view excluded
    w1 = "2024-01-08"
    assert got[(w1, 0)].n_cohort == 1
    assert (w1, -1) not in got and ("2024-01-01", -1) not in got


def test_rejects_bad_period(ev_df):
    with pytest.raises(ValueError):
        cohort_retention(ev_df, period="fortnight")


def test_partitioning_invariance(ev_df):
    a = sorted(map(tuple, cohort_retention(ev_df).collect()))
    b = sorted(map(tuple, cohort_retention(ev_df.repartition(9)).collect()))
    assert a == b
