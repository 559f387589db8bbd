"""CDX revisit indexing (operators/cdx.py): revisit semantics vs a
pure-python oracle, the orig_ts pointer contract, tie-breaking, and
the single-(urlkey, digest)-window plan shape."""

from __future__ import annotations

from news_please_spark.operators.cdx import cdx_index, revisit_stats


def _caps(spark, rows):
    return spark.createDataFrame(
        rows, "url string, ts long, digest string, cap int"
    )


def test_cdx_revisit_semantics(spark):
    rows = [
        # same URL, payload never changes: captures 2 and 3 are revisits
        ("http://a.test/x", 10, "d1", 0),
        ("http://a.test/x", 20, "d1", 1),
        ("http://a.test/x", 30, "d1", 2),
        # same URL, payload changes every time: no revisits
        ("http://a.test/y", 10, "e1", 0),
        ("http://a.test/y", 20, "e2", 1),
        # same digest on DIFFERENT urls: NOT a revisit (keying is per-URL)
        ("http://b.test/x", 10, "d1", 0),
        # URL variants that SURT-collapse: www + unsorted query
        ("http://www.c.test/p?b=2&a=1", 10, "f1", 0),
        ("http://c.test/p?a=1&b=2", 20, "f1", 1),
    ]
    idx = {
        (r.url, r.ts): (r.urlkey, r.revisit, r.orig_ts)
        for r in cdx_index(_caps(spark, rows), tiebreak_col="cap").collect()
    }
    assert idx[("http://a.test/x", 10)] == ("test,a)/x", 0, 10)
    assert idx[("http://a.test/x", 20)] == ("test,a)/x", 1, 10)
    assert idx[("http://a.test/x", 30)] == ("test,a)/x", 1, 10)
    assert idx[("http://a.test/y", 10)][1] == 0
    assert idx[("http://a.test/y", 20)][1] == 0
    assert idx[("http://b.test/x", 10)] == ("test,b)/x", 0, 10)
    # SURT collapse makes the second capture a revisit of the first
    assert idx[("http://www.c.test/p?b=2&a=1", 10)] == ("test,c)/p?a=1&b=2", 0, 10)
    assert idx[("http://c.test/p?a=1&b=2", 20)] == ("test,c)/p?a=1&b=2", 1, 10)


def test_cdx_equal_ts_tiebreak_deterministic(spark):
    rows = [
        ("http://a.test/x", 10, "d1", 1),
        ("http://a.test/x", 10, "d1", 0),
    ]
    got = sorted(
        (r.cap, r.revisit)
        for r in cdx_index(_caps(spark, rows), tiebreak_col="cap").collect()
    )
    assert got == [(0, 0), (1, 1)]


def test_revisit_stats_rollup(spark):
    rows = [
        ("http://a.test/x", 10, "d1", 0),
        ("http://a.test/x", 20, "d1", 1),
        ("http://a.test/x", 30, "d2", 2),
        ("http://b.test/x", 10, "e1", 0),
    ]
    stats = {
        r.urlkey: (r.captures, r.payloads, r.revisits)
        for r in revisit_stats(
            cdx_index(_caps(spark, rows), tiebreak_col="cap")
        ).collect()
    }
    assert stats == {"test,a)/x": (3, 2, 1), "test,b)/x": (1, 1, 0)}


def test_cdx_plan_single_window_exchange(spark):
    rows = [("http://a.test/x", 10, "d1", 0)]
    plan = (
        cdx_index(_caps(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one hash partition (the window) — no join, no second shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_snapshot_diff_all_four_statuses(spark):
    from news_please_spark.operators.cdx import snapshot_diff

    old = spark.createDataFrame(
        [("k1", "d1"), ("k2", "d2"), ("k3", "d3")], "urlkey string, digest string"
    )
    new = spark.createDataFrame(
        [("k1", "d1"), ("k2", "dX"), ("k4", "d4")], "urlkey string, digest string"
    )
    got = {r.urlkey: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {"k1": "same", "k2": "changed", "k3": "gone", "k4": "new"}


def test_snapshot_diff_custom_columns_and_empty_sides(spark):
    from news_please_spark.operators.cdx import snapshot_diff

    old = spark.createDataFrame([], "k string, h string")
    new = spark.createDataFrame([("a", "x")], "k string, h string")
    rows = snapshot_diff(old, new, key_col="k", digest_col="h").collect()
    assert [(r.urlkey, r.status) for r in rows] == [("a", "new")]


def test_segment_diff_classes(spark):
    from news_please_spark.operators.cdx import segment_diff

    old = spark.createDataFrame(
        [("u1", "Alpha beta. Gamma delta. Shared tail."),
         ("u2", "Gone page one. Gone page two.")],
        "urlkey string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "Alpha beta. Fresh sentence! Shared tail."),
         ("u3", "Brand new page.")],
        "urlkey string, text string",
    )
    out = segment_diff(old, new).collect()
    by = {}
    for r in out:
        by.setdefault((r.urlkey, r.status), []).append(r)
    # u1: one kept pair stays kept twice (Alpha beta., Shared tail.),
    # Gamma delta. removed, Fresh sentence! added
    assert len(by[("u1", "kept")]) == 2
    assert len(by[("u1", "removed")]) == 1
    assert len(by[("u1", "added")]) == 1
    # whole-page classes
    assert all(r.n_new == 0 for r in by[("u2", "removed")]) and len(by[("u2", "removed")]) == 2
    assert all(r.n_old == 0 for r in by[("u3", "added")]) and len(by[("u3", "added")]) == 1
    # counts are occurrence multiplicities
    assert all(r.n_old == 1 and r.n_new == 1 for r in by[("u1", "kept")])


def test_segment_diff_repeated_sentence_counts(spark):
    from news_please_spark.operators.cdx import segment_diff

    old = spark.createDataFrame([("u", "Same. Same. Other.")], "urlkey string, text string")
    new = spark.createDataFrame([("u", "Same.")], "urlkey string, text string")
    out = {r.status: r for r in segment_diff(old, new).collect() if True}
    rows = segment_diff(old, new).collect()
    same = [r for r in rows if r.n_old == 2][0]
    assert same.n_new == 1 and same.status == "kept"
