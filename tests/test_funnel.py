"""Funnel fold vs a pure-Python min-per-step reference, including the
tie/window/out-of-order edge cases."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from news_please_spark.operators.funnel import funnel_counts, funnel_steps

T0 = datetime(2024, 1, 1, 12, 0, 0)


def ts(minutes):
    return T0 + timedelta(minutes=minutes)


# (user, minutes, type) — deliberately out of insertion order
EVENTS = [
    # u1: clean completion
    (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
    # u2: purchase BEFORE click — stops at click (purchase must follow)
    (2, 0, "view"), (2, 5, "purchase"), (2, 10, "click"),
    # u3: click at the SAME timestamp as the first view — strict >
    (3, 0, "view"), (3, 0, "click"),
    # u4: completion outside a 30-minute window
    (4, 0, "view"), (4, 10, "click"), (4, 45, "purchase"),
    # u5: no view at all — absent from output
    (5, 3, "click"), (5, 7, "purchase"),
    # u6: several candidates per step — earliest valid wins
    (6, 8, "view"), (6, 2, "view"), (6, 5, "click"), (6, 6, "click"),
    (6, 9, "purchase"),
    # u7: off-funnel noise only
    (7, 1, "error"), (7, 2, "signup"),
]
STEPS = ("view", "click", "purchase")


def py_funnel(events, steps, window_minutes=None):
    out = {}
    users = {u for u, _, _ in events}
    for u in users:
        evs = [(ts(m), t) for uu, m, t in events if uu == u]
        t_prev, times = None, []
        for k, s in enumerate(steps):
            cand = [
                t for t, typ in evs
                if typ == s
                and (k == 0 or (t_prev is not None and t > t_prev))
                and (
                    k == 0
                    or window_minutes is None
                    or t <= times[0] + timedelta(minutes=window_minutes)
                )
            ]
            if not cand:
                break
            t_prev = min(cand)
            times.append(t_prev)
        if times:
            out[u] = times + [None] * (len(steps) - len(times))
    return out


@pytest.fixture(scope="module")
def ev_df(spark):
    rows = [(u, ts(m), t) for u, m, t in EVENTS]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def check(df, want):
    got = {
        r.user_id: [r.t1, r.t2, r.t3, r.steps] for r in df.collect()
    }
    want_full = {
        u: v + [sum(1 for x in v if x is not None)] for u, v in want.items()
    }
    assert got == want_full


def test_unwindowed_matches_python(ev_df):
    check(funnel_steps(ev_df, STEPS), py_funnel(EVENTS, STEPS))


def test_windowed_matches_python(ev_df):
    check(
        funnel_steps(ev_df, STEPS, window_seconds=30 * 60),
        py_funnel(EVENTS, STEPS, window_minutes=30),
    )


def test_edge_semantics(ev_df):
    got = {r.user_id: r for r in funnel_steps(ev_df, STEPS).collect()}
    assert got[1].steps == 3
    assert got[2].steps == 2  # purchase preceded click
    assert got[3].steps == 1  # same-ts click does not chain
    assert 5 not in got  # never viewed
    assert 7 not in got  # only off-funnel events
    assert got[6].t1 == ts(2) and got[6].t2 == ts(5) and got[6].t3 == ts(9)


def test_window_cuts_late_purchase(ev_df):
    got = {
        r.user_id: r
        for r in funnel_steps(ev_df, STEPS, window_seconds=30 * 60).collect()
    }
    assert got[4].steps == 2 and got[4].t3 is None


def test_counts_dropoff(ev_df):
    per_user = funnel_steps(ev_df, STEPS)
    got = {r.step: r.users for r in funnel_counts(per_user, 3).collect()}
    assert got == {1: 5, 2: 4, 3: 3}  # u1/u2/u4/u6 clicked; u1/u4/u6 bought


def test_single_shuffle_plan(ev_df):
    plan = (
        funnel_steps(ev_df, STEPS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_partitioning_invariance(ev_df):
    a = sorted(map(tuple, funnel_steps(ev_df, STEPS).collect()))
    b = sorted(
        map(tuple, funnel_steps(ev_df.repartition(13), STEPS).collect())
    )
    assert a == b


def test_rejects_bad_steps(ev_df):
    with pytest.raises(ValueError):
        funnel_steps(ev_df, ("view",))
    with pytest.raises(ValueError):
        funnel_steps(ev_df, ("view", "view"))


# ---------------------------------------------------------------------------
# event transition matrix


def test_event_transitions_counts_and_probabilities(spark):
    from news_please_spark.operators.funnel import event_transitions

    rows = [
        # user 1: a -> b -> a -> c
        (1, 10, "a", 1), (1, 20, "b", 2), (1, 30, "a", 3), (1, 40, "c", 4),
        # user 2: a -> b (streams never cross users)
        (2, 10, "a", 5), (2, 20, "b", 6),
        # user 3: single event contributes nothing
        (3, 10, "z", 7),
        # equal timestamps tie-broken by event_id: b -> a, not a -> b
        (4, 10, "b", 8), (4, 10, "a", 9),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string, event_id long")
    got = {
        (r.from_type, r.to_type): (r.n, r.p_bp)
        for r in event_transitions(df, tiebreak_col="event_id").collect()
    }
    assert got == {
        ("a", "b"): (2, 6666),   # a -> b twice, a -> c once
        ("a", "c"): (1, 3333),
        ("b", "a"): (2, 10000),  # user 1's b->a and user 4's tie-broken b->a
    }
    assert ("z", "z") not in got


def test_event_transitions_single_window_broadcast_totals(spark):
    from news_please_spark.operators.funnel import event_transitions

    df = spark.createDataFrame(
        [(1, 10, "a", 1), (1, 20, "b", 2)],
        "user_id long, ts long, event_type string, event_id long",
    )
    d = event_transitions(df, tiebreak_col="event_id")
    d.collect()
    plan = d._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Window [") == 1
    assert "BroadcastHashJoin" in plan
