"""operators/dust: DUST rule mining (irrelevant-query-param discovery)
and rule application — planted evidence classes, conflict detection,
min_support gating, and the strip rewrite's stability."""

from __future__ import annotations

from news_please_spark.operators.dust import apply_dust_rules, dust_param_rules


def _mine(spark, rows, min_support=2):
    df = spark.createDataFrame(rows, "url string, content_fp string")
    out = dust_param_rules(df, min_support=min_support)
    return {(r.host, r.param): (r.n_support, r.n_conflict, r.is_dust)
            for r in out.collect()}


def test_dust_session_param_supported_content_param_conflicts(spark):
    rows = []
    # two residual classes (pages /a and /b); sid varies, content fixed
    for path in ("/a", "/b"):
        for sid in ("s1", "s2", "s3"):
            rows.append((f"https://x.test{path}?id=1&sid={sid}", f"fp{path}"))
    # 'id' varies on /c and the content varies WITH it -> conflict
    rows.append(("https://x.test/c?id=1&sid=s1", "fpc1"))
    rows.append(("https://x.test/c?id=2&sid=s1", "fpc2"))
    got = _mine(spark, rows)
    assert got[("x.test", "sid")] == (2, 0, True)
    n_sup, n_conf, is_dust = got[("x.test", "id")]
    assert n_conf == 1 and not is_dust


def test_dust_min_support_gates_single_experiment(spark):
    rows = [
        ("https://y.test/p?sid=a", "f1"),
        ("https://y.test/p?sid=b", "f1"),
    ]
    # one supporting group only: below min_support=2
    got = _mine(spark, rows, min_support=2)
    assert got[("y.test", "sid")] == (1, 0, False)
    got1 = _mine(spark, rows, min_support=1)
    assert got1[("y.test", "sid")] == (1, 0, True)


def test_dust_rules_are_per_host(spark):
    rows = [
        ("https://a.test/p?sid=1", "f"),
        ("https://a.test/p?sid=2", "f"),
        ("https://a.test/q?sid=1", "g"),
        ("https://a.test/q?sid=2", "g"),
        # same param name on b.test carries content
        ("https://b.test/p?sid=1", "h1"),
        ("https://b.test/p?sid=2", "h2"),
    ]
    got = _mine(spark, rows)
    assert got[("a.test", "sid")][2] is True
    assert got[("b.test", "sid")][2] is False


def test_dust_value_with_equals_sign_and_no_query_urls(spark):
    rows = [
        ("https://z.test/p?tok=a=b&id=1", "f"),
        ("https://z.test/p?tok=c=d&id=1", "f"),
        ("https://z.test/p?tok=e=f&id=1", "f"),
        ("https://z.test/plain", "g"),  # no query: contributes nothing
    ]
    got = _mine(spark, rows, min_support=1)
    assert got[("z.test", "tok")] == (1, 0, True)
    assert ("z.test", "") not in got


def test_apply_dust_rules_strips_and_preserves_order(spark):
    urls = spark.createDataFrame(
        [
            ("https://x.test/a?sid=s1&id=9&utm=u7",),
            ("https://x.test/a?sid=s2&id=9&utm=u8",),
            ("https://x.test/b?sid=s1",),
            ("https://other.test/a?sid=s1&id=9",),
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [
            ("x.test", "sid", 3, 0, True),
            ("x.test", "utm", 3, 0, True),
            ("x.test", "id", 0, 2, False),
        ],
        "host string, param string, n_support long, n_conflict long, is_dust boolean",
    )
    got = {r.url: r.canon_url for r in apply_dust_rules(urls, rules).collect()}
    # DUST params stripped, surviving param kept, two variants collapse
    assert got["https://x.test/a?sid=s1&id=9&utm=u7"] == "https://x.test/a?id=9"
    assert got["https://x.test/a?sid=s2&id=9&utm=u8"] == "https://x.test/a?id=9"
    # all params stripped -> bare base URL
    assert got["https://x.test/b?sid=s1"] == "https://x.test/b"
    # rules are host-scoped: other.test untouched
    assert got["https://other.test/a?sid=s1&id=9"] == "https://other.test/a?sid=s1&id=9"


def test_mirror_hosts_detects_pure_mirror_and_rejects_near_mirror(spark):
    from news_please_spark.operators.dust import mirror_hosts

    rows = []
    # a.test and b.test: identical content on 4 shared paths
    for p in ("/1", "/2", "/3", "/4"):
        rows.append((f"https://a.test{p}", f"fp{p}"))
        rows.append((f"https://b.test{p}", f"fp{p}"))
    # c.test shares 3 paths with a.test but one conflicts
    rows.append(("https://c.test/1", "fp/1"))
    rows.append(("https://c.test/2", "fp/2"))
    rows.append(("https://c.test/3", "DIFFERENT"))
    df = spark.createDataFrame(rows, "url string, content_fp string")
    got = {
        (r.host_a, r.host_b): (r.n_agree, r.n_conflict, r.is_mirror)
        for r in mirror_hosts(df, min_support=3).collect()
    }
    assert got[("a.test", "b.test")] == (4, 0, True)
    assert got[("a.test", "c.test")] == (2, 1, False)
    assert got[("b.test", "c.test")] == (2, 1, False)
    # no agreement -> pair absent entirely
    assert all(k[0] != k[1] for k in got)


def test_mirror_hosts_min_support_and_capture_history_canonicalized(spark):
    from news_please_spark.operators.dust import mirror_hosts

    rows = [
        # two captures of the same (host, path): max(fp) wins on both
        ("https://x.test/a", "v1"),
        ("https://x.test/a", "v2"),
        ("https://y.test/a", "v2"),
        ("https://y.test/a", "v1"),
        ("https://x.test/b", "w"),
        ("https://y.test/b", "w"),
    ]
    df = spark.createDataFrame(rows, "url string, content_fp string")
    got = {
        (r.host_a, r.host_b): (r.n_agree, r.n_conflict, r.is_mirror)
        for r in mirror_hosts(df, min_support=3).collect()
    }
    # both paths agree after max-canonicalization, but support 2 < 3
    assert got[("x.test", "y.test")] == (2, 0, False)


def test_hreflang_alternates_markup_variants(spark):
    from pyspark.sql import functions as F

    from news_please_spark.functions.urls import hreflang_alternates_of

    htmls = [
        (0, '<link rel="alternate" hreflang="de" href="https://x/de"/>'),
        (1, "<link hreflang='FR' href='https://x/fr' rel='alternate'>"),
        (2, '<LINK REL="alternate" HREF="https://x/es" HREFLANG="es">'),
        (3, '<link rel="stylesheet" href="https://x/s.css">'),
        (4, '<link rel="alternate" hreflang="" href="https://x/z">'),
        (5, "no links here"),
    ]
    df = spark.createDataFrame(htmls, "i long, html string")
    rows = {
        r.i: r.alts
        for r in df.select(
            "i", hreflang_alternates_of(F.col("html")).alias("alts")
        ).collect()
    }
    assert [(a.lang, a.href) for a in rows[0]] == [("de", "https://x/de")]
    assert [(a.lang, a.href) for a in rows[1]] == [("fr", "https://x/fr")]
    assert [(a.lang, a.href) for a in rows[2]] == [("es", "https://x/es")]
    assert rows[3] == [] and rows[4] == [] and rows[5] == []


def test_hreflang_reciprocity_confirms_and_flags(spark):
    """A linking B back is confirmed; a one-way declaration is not;
    self-references are trivially reciprocal."""
    from news_please_spark.operators.dust import hreflang_reciprocity

    def page(url, alts):
        return (
            url,
            "".join(
                f'<link rel="alternate" hreflang="{l}" href="{h}"/>'
                for l, h in alts
            ),
        )

    pages = spark.createDataFrame(
        [
            page("A", [("en", "A"), ("de", "B"), ("fr", "C")]),
            page("B", [("en", "A"), ("de", "B")]),  # reciprocates A only
            page("C", []),  # declares nothing back
        ],
        "url string, html string",
    )
    got = {r.url: r for r in hreflang_reciprocity(pages).collect()}
    assert set(got) == {"A", "B"}  # C declares no alternates -> no row
    assert (got["A"].n_declared, got["A"].n_confirmed) == (3, 2)
    assert got["A"].reciprocal_ok is False
    assert (got["B"].n_declared, got["B"].n_confirmed) == (2, 2)
    assert got["B"].reciprocal_ok is True


# ---------------------------------------------------------------------------
# url_pattern_stats


def test_url_pattern_stats_flags_enumeration(spark):
    from news_please_spark.operators.dust import url_pattern_stats

    rows = [("h", f"/p/{i}") for i in range(60)] + [
        ("h", "/about"),
        ("h", "/about"),
        ("h", "/a/1"),
        ("h", "/a/1"),
        ("h", "/a/2"),
    ]
    df = spark.createDataFrame(rows, "host string, path string")
    got = {
        r["pattern"]: (r["n_urls"], r["n_leaves"], r["trappy"])
        for r in url_pattern_stats(df, min_urls=50).collect()
    }
    assert got["/p/N"] == (60, 60, True)       # fresh leaf every URL
    assert got["/about"] == (2, 1, False)      # repeated leaf
    # populous threshold: /a/N is injective-ish but small
    assert got["/a/N"][2] is False


def test_url_pattern_stats_repeating_leaves_not_trappy(spark):
    from news_please_spark.operators.dust import url_pattern_stats

    # popular pattern, only 3 distinct leaves -> template, not a trap
    rows = [("h", f"/cat/{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "host string, path string")
    r = url_pattern_stats(df, min_urls=50).collect()[0]
    assert r["pattern"] == "/cat/N" and r["n_leaves"] == 3
    assert r["trappy"] is False
