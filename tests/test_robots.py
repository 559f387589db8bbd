"""robots.txt parser + allow evaluator (sources/robots.py) against a
pure-Python RFC 9309 oracle and hand-pinned fixtures."""

from __future__ import annotations

import re

import pytest

ROBOTS = {
    "a.example.com": (
        "# policy\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/pub\n"
    ),
    "b.example.com": (
        "User-agent: newsbot\r\n"
        "User-agent: archiver\r\n"
        "Disallow: /tmp/*\r\n"
        "Allow: /tmp/*.html$\r\n"
        "\r\n"
        "User-agent: *\r\n"
        "Disallow: /\r\n"
    ),
    "c.example.com": "User-agent: *\nDisallow:\n",
    # rules before any group are ignored; second group reopens
    "d.example.com": (
        "Disallow: /ignored\n"
        "User-agent: *\n"
        "Disallow: /x\n"
        "User-agent: other\n"
        "Disallow: /\n"
    ),
}

PATHS = [
    "/",
    "/p/1",
    "/private/1",
    "/private/pub/2",
    "/tmp/a.html",
    "/tmp/a.htmlx",
    "/tmp/b",
    "/x/deep",
    "/ignored/z",
]


def _py_match(rule: str, path: str) -> bool:
    anchored = rule.endswith("$")
    core = rule[:-1] if anchored else rule
    pat = "".join(".*" if c == "*" else re.escape(c) for c in core)
    return re.match(pat + ("$" if anchored else ""), path) is not None


def _py_allowed(robots_txt: str, agent: str, path: str) -> bool:
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    in_header = False
    for raw in robots_txt.splitlines():
        line = raw.split("#")[0].strip()
        if ":" not in line:
            continue
        field, _, val = line.partition(":")
        field, val = field.strip().lower(), val.strip()
        if field == "user-agent":
            if not in_header:
                cur_agents = []
                groups.append((cur_agents, []))
                in_header = True
            cur_agents.append(val.lower())
        elif field in ("allow", "disallow"):
            in_header = False
            if val and groups:
                groups[-1][1].append((field == "allow", val))
        else:
            in_header = False
    a = agent.lower()
    specific = [
        r
        for agents, rs in groups
        for g in agents
        if g != "*" and g in a
        for r in rs
    ]
    star = [r for agents, rs in groups if "*" in agents for r in rs]
    rules = specific if specific else star
    best = None
    for allow, rule in rules:
        if _py_match(rule, path):
            key = (len(rule), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def _tables(spark):
    from pyspark.sql import functions as F

    robots = spark.createDataFrame(
        list(ROBOTS.items()), "host string, robots_txt string"
    )
    urls = spark.createDataFrame(
        [(h, p) for h in list(ROBOTS) + ["norobots.example.com"] for p in PATHS],
        "host string, path string",
    )
    return robots, urls, F


@pytest.mark.parametrize("agent", ["newsbot", "archiver v2.1", "somebot", "*"])
def test_robots_allowed_matches_python_oracle(spark, agent):
    from news_please_spark.sources.robots import parse_robots, robots_allowed

    robots, urls, F = _tables(spark)
    rules = parse_robots(robots)
    got = {
        (r.host, r.path): r.allowed
        for r in robots_allowed(urls, rules, agent=agent).collect()
    }
    assert len(got) == urls.count()
    for (h, p), allowed in got.items():
        want = _py_allowed(ROBOTS.get(h, ""), agent, p)
        assert allowed == want, (h, p, agent)


def test_parse_robots_group_model(spark):
    from news_please_spark.sources.robots import parse_robots

    robots, _, F = _tables(spark)
    rules = parse_robots(robots)
    b = {
        (r.agent, r.allow, r.path)
        for r in rules.filter(F.col("host") == "b.example.com").collect()
    }
    # both header agents got both rules; star group got the lone Disallow
    assert b == {
        ("newsbot", False, "/tmp/*"),
        ("newsbot", True, "/tmp/*.html$"),
        ("archiver", False, "/tmp/*"),
        ("archiver", True, "/tmp/*.html$"),
        ("*", False, "/"),
    }
    # empty Disallow value emits no rule; pre-group rules are dropped
    assert rules.filter(F.col("host") == "c.example.com").count() == 0
    d = {
        (r.agent, r.path)
        for r in rules.filter(F.col("host") == "d.example.com").collect()
    }
    assert d == {("*", "/x"), ("other", "/")}


def test_disallow_prefixes_bridge(spark):
    from news_please_spark.sources.robots import disallow_prefixes_for, parse_robots

    robots, _, F = _tables(spark)
    rules = parse_robots(robots)
    got = {
        (r.host, r.disallow_prefix)
        for r in disallow_prefixes_for(rules, agent="newsbot").collect()
    }
    # wildcard rules are excluded (conservative-permissive bridge);
    # star groups apply only on hosts with no newsbot group
    assert got == {
        ("a.example.com", "/private/"),
        ("d.example.com", "/x"),
    }


def test_robots_like_metachars_are_literal(spark):
    from news_please_spark.sources.robots import parse_robots, robots_allowed

    robots = spark.createDataFrame(
        [("e.example.com", "User-agent: *\nDisallow: /a_b%c\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("e.example.com", "/a_b%c/d"), ("e.example.com", "/aXb%c/d"),
         ("e.example.com", "/a_bYc/d")],
        "host string, path string",
    )
    got = {
        r.path: r.allowed
        for r in robots_allowed(urls, parse_robots(robots)).collect()
    }
    assert got == {"/a_b%c/d": False, "/aXb%c/d": True, "/a_bYc/d": True}


def test_crawl_delay_selection_and_group_split(spark):
    from news_please_spark.sources.robots import crawl_delay_of

    robots = spark.createDataFrame(
        [
            # specific group shadows star; two applicable delays -> max
            ("a.example.com",
             "User-agent: newsbot\nCrawl-delay: 7\n"
             "User-agent: newsbot\nCrawl-delay: 3\n"
             "User-agent: *\nCrawl-delay: 99\n"),
            # a Crawl-delay closes the header: second UA opens a NEW
            # group, so bot2's group has no delay
            ("b.example.com",
             "User-agent: bot1\nCrawl-delay: 5\nUser-agent: bot2\nDisallow: /\n"),
            # star fallback; junk value ignored
            ("c.example.com", "User-agent: *\nCrawl-delay: 4\n"),
            ("d.example.com", "User-agent: *\nCrawl-delay: soon\n"),
        ],
        "host string, robots_txt string",
    )
    got = {
        r.host: r.crawl_delay_s for r in crawl_delay_of(robots, "newsbot").collect()
    }
    assert got == {"a.example.com": 7, "c.example.com": 4}
    got2 = {
        r.host: r.crawl_delay_s for r in crawl_delay_of(robots, "bot2").collect()
    }
    # b absent: the Crawl-delay line closed bot1's header, so bot2's own
    # group declares no delay and b has no star group. a/c fall back to
    # their star groups (bot2 matches no specific token there).
    assert got2 == {"a.example.com": 99, "c.example.com": 4}


def test_sitemaps_are_cross_group(spark):
    from news_please_spark.sources.robots import sitemaps_of

    robots = spark.createDataFrame(
        [
            ("a.example.com",
             "Sitemap: https://a.example.com/sm.xml\n"
             "User-agent: x\nDisallow: /\n"
             "Sitemap: https://a.example.com/news.xml\n"
             "Sitemap: https://a.example.com/sm.xml\n"),  # dup collapses
            ("b.example.com", "User-agent: *\nDisallow: /\n"),
        ],
        "host string, robots_txt string",
    )
    got = sorted(
        (r.host, r.sitemap_url) for r in sitemaps_of(robots).collect()
    )
    assert got == [
        ("a.example.com", "https://a.example.com/news.xml"),
        ("a.example.com", "https://a.example.com/sm.xml"),
    ]


# ---------------------------------------------------------------------------
# robots policy drift


def test_robots_diff_flip_semantics(spark):
    from news_please_spark.sources.robots import parse_robots, robots_diff

    urls = spark.createDataFrame(
        [
            ("a.test", "/sec/1"), ("a.test", "/sec/2"), ("a.test", "/pub/1"),
            ("b.test", "/sec/1"), ("b.test", "/pub/1"),
            ("c.test", "/anything"),  # no robots at all in either snapshot
        ],
        "host string, path string",
    )
    old = parse_robots(spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /sec"),
         ("b.test", "User-agent: *\nDisallow:")],
        "host string, robots_txt string",
    ))
    new = parse_robots(spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow:"),
         ("b.test", "User-agent: *\nDisallow: /sec")],
        "host string, robots_txt string",
    ))
    got = {
        r.host: (r.n_urls, r.to_deny, r.to_allow)
        for r in robots_diff(urls, old, new).collect()
    }
    assert got == {
        "a.test": (3, 0, 2),  # /sec urls freed, /pub unchanged
        "b.test": (2, 1, 0),  # /sec url newly denied
        "c.test": (1, 0, 0),  # absent rules: allowed both times
    }
