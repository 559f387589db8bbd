"""operators/ratelimit: GCRA token-bucket admission vs a hand-walked
python oracle — burst consumption, refill, per-host independence."""

from __future__ import annotations

import pytest

from news_please_spark.operators.ratelimit import gcra_admission


def _py_gcra(arrivals, T, tau):
    out = []
    tat = None
    for t in arrivals:
        if tat is None or t >= tat - tau:
            tat = (t if tat is None else max(t, tat)) + T
            out.append(1)
        else:
            out.append(0)
    return out


def test_gcra_matches_python_oracle_burst_and_refill(spark):
    T, tau = 10, 25  # 1 per 10us, burst ~2.5 extra
    # host a: a burst of 5 at t=0..4 (first + 2-3 burst admits), then
    # spaced arrivals that refill; host b independent
    a_ts = [0, 1, 2, 3, 4, 50, 51, 120]
    b_ts = [5, 6, 100]
    rows = [("a", i, t) for i, t in enumerate(a_ts)] + [
        ("b", 100 + i, t) for i, t in enumerate(b_ts)
    ]
    df = spark.createDataFrame(rows, "host string, event_id long, t_us long")
    got = {
        (r.host, r.event_id): (r.admitted, r.tat_after)
        for r in gcra_admission(df, T, tau).collect()
    }
    exp_a = _py_gcra(a_ts, T, tau)
    exp_b = _py_gcra(b_ts, T, tau)
    assert [got[("a", i)][0] for i in range(len(a_ts))] == exp_a
    assert [got[("b", 100 + i)][0] for i in range(len(b_ts))] == exp_b
    # burst actually fired: more than one admit inside the initial burst
    assert sum(exp_a[:5]) >= 2 and 0 in exp_a[:5]


def test_gcra_zero_burst_enforces_strict_spacing(spark):
    rows = [("h", i, t) for i, t in enumerate([0, 5, 10, 14, 20])]
    df = spark.createDataFrame(rows, "host string, event_id long, t_us long")
    got = [r.admitted for r in sorted(
        gcra_admission(df, 10, 0).collect(), key=lambda r: r.event_id)]
    assert got == [1, 0, 1, 0, 1]


def test_gcra_validation(spark):
    df = spark.createDataFrame([("h", 0, 0)], "host string, event_id long, t_us long")
    with pytest.raises(ValueError):
        gcra_admission(df, 0, 5)
    with pytest.raises(ValueError):
        gcra_admission(df, 5, -1)
