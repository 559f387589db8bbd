"""operators/recrawl: change-frequency estimator vs a pure-Python
oracle — clamping, single-visit urls, tie-broken equal timestamps,
one-Exchange plan shape."""

from __future__ import annotations

from datetime import datetime, timezone

import pyspark.sql.functions as F

from news_please_spark.operators.recrawl import HOUR_US, recrawl_schedule


def _ts(s):
    return datetime.fromisoformat(s)


def _py_schedule(rows, min_i=HOUR_US, max_i=30 * 24 * HOUR_US):
    from collections import defaultdict

    by_url = defaultdict(list)
    for url, ts, eid, h in rows:
        us = int(ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        by_url[url].append((us, eid, h))
    out = {}
    for url, vs in by_url.items():
        vs.sort()
        n = len(vs)
        changes = sum(
            1 for a, b in zip(vs, vs[1:]) if a[2] != b[2]
        )
        span = vs[-1][0] - vs[0][0]
        ivl = min(max(span // (changes + 1), min_i), max_i)
        out[url] = (n, changes, ivl, vs[-1][0] + ivl)
    return out


def test_recrawl_schedule_matches_python_oracle(spark):
    rows = [
        # hot page: changes every fetch, 4 fetches over 3 hours
        ("hot", _ts("2026-01-01 00:00:00"), 1, "a"),
        ("hot", _ts("2026-01-01 01:00:00"), 2, "b"),
        ("hot", _ts("2026-01-01 02:00:00"), 3, "c"),
        ("hot", _ts("2026-01-01 03:00:00"), 4, "d"),
        # cold page: never changes over 90 days -> clamped to max
        ("cold", _ts("2026-01-01 00:00:00"), 5, "x"),
        ("cold", _ts("2026-04-01 00:00:00"), 6, "x"),
        # single fetch -> span 0 -> clamped to min
        ("once", _ts("2026-01-01 00:00:00"), 7, "y"),
        # equal timestamps, tie-broken by event_id: change is counted
        ("tie", _ts("2026-01-01 00:00:00"), 8, "p"),
        ("tie", _ts("2026-01-01 00:00:00"), 9, "q"),
        ("tie", _ts("2026-01-02 00:00:00"), 10, "q"),
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts timestamp, event_id long, content_hash string"
    )
    got = {
        r.url: (r.n_visits, r.n_changes, r.interval_us, r.next_due_us)
        for r in recrawl_schedule(df, tiebreak="event_id").collect()
    }
    assert got == _py_schedule(rows)
    # hot page recrawls hourly (span 3h / 4 change-intervals = 1h exactly)
    assert got["hot"][2] == HOUR_US
    # cold page clamped to the 30-day max
    assert got["cold"][2] == 30 * 24 * HOUR_US
    assert got["once"][2] == HOUR_US


def test_recrawl_schedule_single_exchange(spark):
    df = spark.createDataFrame(
        [("u", _ts("2026-01-01 00:00:00"), 1, "a")],
        "url string, fetch_ts timestamp, event_id long, content_hash string",
    )
    plan = (
        recrawl_schedule(df, tiebreak="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the groupBy reuses the window's hash partitioning on url: one
    # Exchange in the whole plan
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# crawl-delay conformance audit


def test_crawl_delay_audit_semantics(spark):
    from news_please_spark.operators.recrawl import crawl_delay_audit

    log = spark.createDataFrame(
        [
            # gaps 5, 15 vs delay 10 -> one violation, min_gap 5
            ("a", 100), ("a", 105), ("a", 120),
            # gaps 10 vs delay 10 -> gap == delay is NOT a violation
            ("b", 0), ("b", 10),
            # single fetch -> no gap, no violation
            ("c", 7),
            # no declared delay -> audits clean whatever the gaps
            ("d", 0), ("d", 1),
        ],
        "host string, ts long",
    )
    delays = spark.createDataFrame(
        [("a", 10), ("b", 10), ("c", 10)], "host string, crawl_delay long"
    )
    got = {
        r.host: (r.fetches, r.violations, r.min_gap, r.crawl_delay)
        for r in crawl_delay_audit(log, delays).collect()
    }
    assert got == {
        "a": (3, 1, 5, 10),
        "b": (2, 0, 10, 10),
        "c": (1, 0, None, 10),
        "d": (2, 0, 1, None),
    }


def test_crawl_delay_audit_plan_single_window(spark):
    from news_please_spark.operators.recrawl import crawl_delay_audit

    log = spark.createDataFrame([("a", 1)], "host string, ts long")
    delays = spark.createDataFrame([("a", 5)], "host string, crawl_delay long")
    df = crawl_delay_audit(log, delays)
    df.collect()  # let AQE finalize the join strategy
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    assert plan.count("Window [") == 1
    assert "SortMergeJoin" not in plan  # AQE/broadcast routes the tiny delay side


# ---------------------------------------------------------------------------
# host coverage vs sitemap inventory


def test_host_coverage_semantics(spark):
    from news_please_spark.operators.recrawl import host_coverage

    sitemap = spark.createDataFrame(
        [("a", "u1"), ("a", "u2"), ("a", "u3"), ("a", "u4"),
         ("b", "v1"),
         ("c", "w1"), ("c", "w1")],  # duplicate inventory rows collapse
        "host string, url string",
    )
    crawled = spark.createDataFrame(
        [("a", "u1"), ("a", "u2"), ("a", "u2"),  # refetches collapse
         ("a", "zz"),                            # uninventoried fetch
         ("d", "q1")],                           # host with no sitemap at all
        "host string, url string",
    )
    got = {
        r.host: (r.known, r.crawled_known, r.coverage_bp, r.missing, r.extra)
        for r in host_coverage(sitemap, crawled).collect()
    }
    assert got == {
        "a": (4, 2, 5000, 2, 1),
        "b": (1, 0, 0, 1, 0),
        "c": (1, 0, 0, 1, 0),
        "d": (0, 0, None, 0, 1),
    }


def test_host_coverage_no_window_one_join(spark):
    from news_please_spark.operators.recrawl import host_coverage

    s = spark.createDataFrame([("a", "u")], "host string, url string")
    c = spark.createDataFrame([("a", "u")], "host string, url string")
    plan = host_coverage(s, c)._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Join FullOuter") == 1


# ---------------------------------------------------------------------------
# exponential-backoff retry planner


def _py_retry(log, max_retries, base, cap):
    from collections import defaultdict

    per = defaultdict(list)
    for url, att, st in log:
        per[url].append((att, st))
    out = {}
    for url, atts in per.items():
        n = len(atts)
        last = max(atts)[1]
        retryable = last in (408, 429, 500, 502, 503, 504, 522, 524)
        if 200 <= last < 400:
            out[url] = (n, last, "done", None)
        elif retryable and n <= max_retries:
            out[url] = (n, last, "retry", min(base << (n - 1), cap))
        else:
            out[url] = (n, last, "give_up", None)
    return out


def test_retry_schedule_matches_python_oracle(spark):
    from news_please_spark.operators.recrawl import retry_schedule

    log = []
    statuses = [200, 500, 503, 404, 429, 302, 408, 403, 522]
    for i in range(90):
        n = i % 4 + 1
        for a in range(1, n + 1):
            st = 503 if a < n else statuses[i % len(statuses)]
            log.append((f"u{i}", a, st))
    df = spark.createDataFrame(log, "url string, attempt int, status int")
    got = {
        r.url: (r.n_attempts, r.last_status, r.action, r.next_delay_ms)
        for r in retry_schedule(df, max_retries=3, base_delay_ms=250,
                                max_delay_ms=1_000).collect()
    }
    assert got == _py_retry(log, 3, 250, 1_000)


def test_retry_schedule_delay_doubles_then_caps(spark):
    from news_please_spark.operators.recrawl import retry_schedule

    rows = [("u", a, 503) for a in range(1, 5)]
    for n, want in [(1, 100), (2, 200), (3, 400), (4, 800)]:
        df = spark.createDataFrame(rows[:n], "url string, attempt int, status int")
        got = retry_schedule(df, max_retries=9, base_delay_ms=100,
                             max_delay_ms=500).collect()[0]
        assert got.action == "retry"
        assert got.next_delay_ms == min(want, 500)


def test_retry_schedule_unordered_attempts_pick_latest_status(spark):
    from news_please_spark.operators.recrawl import retry_schedule

    # rows arrive out of order; max_by(status, attempt) must pick attempt 3
    df = spark.createDataFrame(
        [("u", 3, 200), ("u", 1, 503), ("u", 2, 500)],
        "url string, attempt int, status int",
    )
    got = retry_schedule(df).collect()[0]
    assert (got.action, got.last_status, got.n_attempts) == ("done", 200, 3)


def test_fetch_rate_anomaly_flags_storm_and_gates_on_full_window(spark):
    from datetime import datetime

    from news_please_spark.operators.recrawl import fetch_rate_anomaly

    rows = []
    # host A: 3 calm hours of 10 fetches, then a 40-fetch storm hour,
    # then a calm hour that must NOT alarm (window absorbs the storm:
    # 10*12*3=360 > 15*60=900? no)
    for h, n in [(0, 10), (1, 10), (2, 10), (3, 40), (4, 12)]:
        rows += [("A", datetime(2026, 1, 1, h, m % 60)) for m in range(n)]
    # host B: only 2 hours of history -> trail_n < 3, never alarms
    for h, n in [(0, 1), (1, 50)]:
        rows += [("B", datetime(2026, 1, 1, h, m % 60)) for m in range(n)]
    df = spark.createDataFrame(rows, "host string, ts timestamp")
    got = {
        (r.host, r.hour.hour): (r.n_fetches, r.trail_sum, r.trail_n, r.is_anomaly)
        for r in fetch_rate_anomaly(df, window_hours=3, threshold_x10=15).collect()
    }
    assert got[("A", 3)] == (40, 30, 3, True)    # 10*40*3 > 15*30
    assert got[("A", 4)] == (12, 60, 3, False)   # 10*12*3=360 <= 15*60=900
    assert got[("A", 0)] == (10, 0, 0, False)    # no history
    assert got[("B", 1)][3] is False             # partial window gates


def test_fetch_rate_anomaly_exact_threshold_boundary(spark):
    from datetime import datetime

    from news_please_spark.operators.recrawl import fetch_rate_anomaly

    rows = []
    # baseline 10/hour x3; a 15-fetch hour is EXACTLY 1.5x -> not anomalous
    for h, n in [(0, 10), (1, 10), (2, 10), (3, 15), (4, 10), (5, 10), (6, 10), (7, 16)]:
        rows += [("C", datetime(2026, 2, 1, h, m % 60)) for m in range(n)]
    df = spark.createDataFrame(rows, "host string, ts timestamp")
    got = {
        r.hour.hour: r.is_anomaly
        for r in fetch_rate_anomaly(df, window_hours=3, threshold_x10=15).collect()
    }
    assert got[3] is False  # 10*15*3 = 450 == 15*30: strict inequality
    assert got[7] is True   # 10*16*3 = 480 > 450


def test_revalidation_plan_all_action_classes(spark):
    from datetime import datetime

    from news_please_spark.operators.recrawl import revalidation_plan

    now = "2026-06-01 00:00:00"
    t0 = datetime(2026, 5, 31, 23, 30)  # 30 min before now
    old = datetime(2026, 1, 1)
    rows = [
        # fresh: age 1800 < 3600
        ("u1", t0, 3600, None, None),
        # stale with etag -> revalidate via etag (preferred over LM)
        ("u2", old, 3600, 'W/"x"', old),
        # stale with only last-modified
        ("u3", old, 3600, None, old),
        # stale, no validator
        ("u4", old, 3600, None, None),
        # no max-age at all: never fresh, validator present
        ("u5", t0, None, 'W/"y"', None),
        # max-age 0: never fresh, no validator
        ("u6", t0, 0, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, fetched_at timestamp, max_age_s long, etag string, last_modified timestamp",
    )
    got = {r.url: (r.action, r.validator) for r in revalidation_plan(df, now).collect()}
    assert got == {
        "u1": ("fresh", None),
        "u2": ("revalidate", "etag"),
        "u3": ("revalidate", "last-modified"),
        "u4": ("refetch", None),
        "u5": ("revalidate", "etag"),
        "u6": ("refetch", None),
    }


def test_revalidation_plan_zero_shuffle(spark):
    from datetime import datetime

    from news_please_spark.operators.recrawl import revalidation_plan

    df = spark.createDataFrame(
        [("u", datetime(2026, 1, 1), 10, None, None)],
        "url string, fetched_at timestamp, max_age_s long, etag string, last_modified timestamp",
    )
    plan = (
        revalidation_plan(df, "2026-06-01 00:00:00")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
