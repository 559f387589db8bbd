"""URL templating + crawl-trap fan-out detection (operators/traps.py)."""

from pyspark.sql import functions as F

from news_please_spark.functions.urls import url_template
from news_please_spark.operators.traps import template_fanout


def test_url_template(spark):
    rows = [
        (0, "https://a.test/cal/2024/01/02"),
        (1, "https://a.test/cal/1999/12/31"),
        (2, "https://a.test/view?sid=abc123&page=4"),
        (3, "https://a.test/view?page=9&sid=zzz"),
        (4, "https://a.test/about/team"),
        (5, "https://b.test/item/42"),
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {
        r.i: r.t
        for r in df.select("i", url_template(F.col("url")).alias("t")).collect()
    }
    assert got[0] == got[1] == "a.test/cal/N/N/N"
    assert got[2] == got[3] == "a.test/view?page&sid"
    assert got[4] == "a.test/about/team"
    assert got[5] == "b.test/item/N"


def test_template_fanout_flags(spark):
    # trap.test: 30 calendar URLs (one template) + 10 singles;
    # ok.test: 40 URLs spread over 40 distinct static paths
    rows = [(f"https://trap.test/cal/{i}/{i % 7}",) for i in range(30)]
    rows += [(f"https://trap.test/page-{chr(97 + i)}",) for i in range(10)]
    rows += [(f"https://ok.test/s{chr(97 + i // 26)}{chr(97 + i % 26)}",) for i in range(40)]
    df = spark.createDataFrame(rows, "url string")
    got = {(r.host, r.template): r for r in template_fanout(df).collect()}
    trap = got[("trap.test", "trap.test/cal/N/N")]
    assert trap.n_urls == 30 and trap.host_urls == 40
    assert trap.share_q == 7500 and trap.is_trap == 1
    assert all(
        r.is_trap == 0 for k, r in got.items() if k[0] == "ok.test"
    )
    # per-host totals are consistent
    assert sum(r.n_urls for k, r in got.items() if k[0] == "ok.test") == 40


def test_crawl_traps_entry_semantics(spark):
    from news_please_spark.plans.queries import QUERIES

    from collections import Counter

    rows = QUERIES["crawl_traps"](spark, "/root/testdata/sf0.001").collect()
    n_hosts = len({r.host for r in rows})
    flagged = Counter(
        r.template.split(".test", 1)[1] for r in rows if r.is_trap == 1
    )
    # only the two generator classes ever flag; the calendar generator
    # flags on every host, the session one on all but boundary hosts
    # (its share hovers at the 20% threshold by construction)
    assert set(flagged) == {"/cal/N/N", "/view?page&sid"}
    assert flagged["/cal/N/N"] == n_hosts
    assert flagged["/view?page&sid"] >= n_hosts - 2


def test_template_fanout_empty(spark):
    empty = spark.createDataFrame([], "url string")
    assert template_fanout(empty).count() == 0


# ---------------------------------------------------------------------------
# domain-blocklist suffix matching (operators/blocklist.py)


def _bl(spark, domains):
    return spark.createDataFrame([(d,) for d in domains], "domain string")


def test_host_suffixes(spark):
    from news_please_spark.functions.urls import host_suffixes

    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.com",), ("localhost",)], "h string"
    )
    got = {
        r.h: r.s
        for r in df.select("h", host_suffixes(F.col("h")).alias("s")).collect()
    }
    assert got["a.b.example.com"] == [
        "a.b.example.com", "b.example.com", "example.com",
    ]
    assert got["example.com"] == ["example.com"]
    assert got["localhost"] == ["localhost"]  # no phantom descending seq


def test_blocked_hosts_semantics(spark):
    from news_please_spark.operators.blocklist import blocked_hosts

    hosts = spark.createDataFrame(
        [
            ("cdn.tracker.net",),     # parent match
            ("tracker.net",),         # exact match
            ("ads.sub.tracker.net",), # matches both entries: longest wins
            ("nottracker.net",),      # suffix labels, NOT substring match
            ("clean.example.org",),
        ],
        "host string",
    )
    bl = _bl(spark, ["tracker.net", "sub.tracker.net"])
    got = {r.host: r.matched_domain for r in blocked_hosts(hosts, bl).collect()}
    assert got == {
        "cdn.tracker.net": "tracker.net",
        "tracker.net": "tracker.net",
        "ads.sub.tracker.net": "sub.tracker.net",
    }


def test_strip_blocked(spark):
    from news_please_spark.operators.blocklist import strip_blocked

    urls = spark.createDataFrame(
        [("u1", "bad.net"), ("u2", "ok.net"), ("u3", "x.bad.net")],
        "url string, host string",
    )
    kept = strip_blocked(urls, _bl(spark, ["bad.net"])).collect()
    assert [r.url for r in kept] == ["u2"]


def test_blocklist_empty(spark):
    from news_please_spark.operators.blocklist import blocked_hosts

    hosts = spark.createDataFrame([("a.net",)], "host string")
    assert blocked_hosts(hosts, _bl(spark, [])).count() == 0
    empty = spark.createDataFrame([], "host string")
    assert blocked_hosts(empty, _bl(spark, ["a.net"])).count() == 0
