"""operators/robots: RFC 9309 wildcard matching, longest-match
precedence, allow-wins ties — pinned to the RFC's/Google's documented
interpretation examples."""

from __future__ import annotations

from news_please_spark.operators.robots import rep_match


def _gate(spark, rules, urls):
    r = spark.createDataFrame(rules, "host string, directive string, pattern string")
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {
        row.url: (row.rep_allowed, row.rep_verdict, row.rep_pattern)
        for row in rep_match(u, r).collect()
    }


def test_rep_longest_match_wins_over_order(spark):
    rules = [("e.test", "allow", "/p"), ("e.test", "disallow", "/")]
    got = _gate(spark, rules, ["https://e.test/page", "https://e.test/other"])
    assert got["https://e.test/page"] == (True, "allow", "/p")
    assert got["https://e.test/other"] == (False, "disallow", "/")


def test_rep_equal_length_tie_allows(spark):
    rules = [("e.test", "disallow", "/folder"), ("e.test", "allow", "/folder")]
    got = _gate(spark, rules, ["https://e.test/folder/page"])
    assert got["https://e.test/folder/page"][0] is True


def test_rep_wildcard_and_end_anchor(spark):
    rules = [
        ("e.test", "allow", "/page"),
        ("e.test", "disallow", "/*.htm"),
        ("e.test", "disallow", "/*.php$"),
    ]
    got = _gate(
        spark,
        [*rules],
        [
            "https://e.test/page.htm",       # /*.htm (len 6) > /page (5)
            "https://e.test/file.php",       # $ anchors: blocked
            "https://e.test/file.php?x=1",   # query breaks the $ anchor
            "https://e.test/pageX",          # only /page matches
        ],
    )
    assert got["https://e.test/page.htm"][0] is False
    assert got["https://e.test/file.php"][0] is False
    assert got["https://e.test/file.php?x=1"][0] is True  # no rule matches ('/page' doesn't either)
    assert got["https://e.test/pageX"] == (True, "allow", "/page")


def test_rep_root_dollar_allows_only_root(spark):
    rules = [("e.test", "allow", "/$"), ("e.test", "disallow", "/")]
    got = _gate(spark, rules, ["https://e.test/", "https://e.test", "https://e.test/x"])
    assert got["https://e.test/"][0] is True
    assert got["https://e.test"][0] is True  # empty path normalizes to "/"
    assert got["https://e.test/x"][0] is False


def test_rep_no_rules_for_host_allows_and_specials_are_literal(spark):
    rules = [("a.test", "disallow", "/x(y)+z.d")]
    got = _gate(
        spark,
        rules,
        [
            "https://other.test/x",      # no rules for host
            "https://a.test/x(y)+z.d",   # literal match
            "https://a.test/xyyz_d",     # would match if + and . were regex
        ],
    )
    assert got["https://other.test/x"] == (True, None, None)
    assert got["https://a.test/x(y)+z.d"][0] is False
    assert got["https://a.test/xyyz_d"][0] is True


def test_rep_query_is_matchable(spark):
    rules = [("a.test", "disallow", "/*?sid=*")]
    got = _gate(
        spark,
        rules,
        ["https://a.test/p?sid=9", "https://a.test/p?id=9"],
    )
    assert got["https://a.test/p?sid=9"][0] is False
    assert got["https://a.test/p?id=9"][0] is True


def test_rep_duplicate_urls_get_one_verdict_each(spark):
    rules = [("a.test", "disallow", "/x")]
    r = _gate(spark, rules, ["https://a.test/x"])
    u = spark.createDataFrame(
        [("https://a.test/x", 1), ("https://a.test/x", 2)], "url string, n int"
    )
    rr = spark.createDataFrame(rules, "host string, directive string, pattern string")
    rows = rep_match(u, rr).collect()
    assert len(rows) == 2 and all(row.rep_allowed is False for row in rows)
    assert r["https://a.test/x"][0] is False
