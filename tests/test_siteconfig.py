"""Per-site config layer: sitelist.hjson parsing, the defaults+override
merge, and per-host gate/filter/crawler/daemon behavior (reference
config.py:257-299, heuristics_manager.py:69-110,219-245,
__main__.py:172-176)."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_please_spark.siteconfig import SiteConfigs, parse_hjson
from news_please_spark.sources.dispatch import choose_crawler

SITELIST = """
# comment line
{
  // another comment
  "base_urls": [
    {
      "url": "http://www.keyword-site.example.com/",
      "crawler": "RecursiveCrawler",
      "overwrite_heuristics": {
        "meta_contains_article_keyword": true,
        "og_type": false,
        "linked_headlines": false,
        "self_linked_headlines": false,
      },
      "pass_heuristics_condition": "meta_contains_article_keyword",
    },
    {
      url: "http://www.strict-site.example.com",
      overwrite_heuristics: {"linked_headlines": "<=0.2",
                             "self_linked_headlines": "<=0.2"},
      ignore_regex: "/blog/",
      daemonize: 3600,
    },
    {"url": "https://rss-site.example.com", "additional_rss_daemon": 1800},
  ],
}
"""


def _cfg() -> SiteConfigs:
    return SiteConfigs.from_sitelist(SITELIST)


def test_parse_hjson_subset():
    doc = parse_hjson(SITELIST)
    assert len(doc["base_urls"]) == 3
    assert doc["base_urls"][0]["crawler"] == "RecursiveCrawler"
    assert doc["base_urls"][1]["daemonize"] == 3600


def test_effective_gate_merge():
    cfg = _cfg()
    # override site: condition replaced, disabled heuristics → "True"
    cond, comps = cfg.effective_gate("keyword-site.example.com")
    assert cond == "meta_contains_article_keyword"
    assert comps["og_type"] == "True"
    assert comps["linked_headlines"] == "True"
    # strict site: default condition, tightened comparator
    cond, comps = cfg.effective_gate("strict-site.example.com")
    assert cond == cfg.default_condition
    assert comps["linked_headlines"] == "<=0.2"
    # unknown host: pure defaults
    cond, comps = cfg.effective_gate("other.example.com")
    assert (cond, comps["linked_headlines"]) == (cfg.default_condition, "<=0.65")


OG_ARTICLE = '<meta property="og:type" content="article">'


def _self_linked(host: str, n_linked: int, n_plain: int) -> str:
    """n_linked self-linking headlines + n_plain bare ones — linked AND
    self-linked ratios both equal n_linked/(n_linked+n_plain)."""
    return (
        "".join(
            f'<h2><a href="https://{host}/{i}">t</a></h2>'
            for i in range(n_linked)
        )
        + "<h2>plain</h2>" * n_plain
    )


def test_per_host_gate_verdicts(spark):
    """Two hosts, different gate conditions, one DataFrame — each host
    gets ITS verdict (the done-criterion for the site-config layer)."""
    cfg = _cfg()
    rows = [
        # keyword site: no og:type, but a meta mentioning 'article' →
        # passes ITS override condition, would FAIL the default gate
        ("https://keyword-site.example.com/a",
         '<html><meta name="kind" content="article-page"><p>x</p></html>', True),
        # same html on an unconfigured host → default gate → fail
        ("https://plain.example.com/a",
         '<html><meta name="kind" content="article-page"><p>x</p></html>', False),
        # og:type=article + self-linked ratio 1.0: fails both default
        # branches → og_type and (F or F) → False
        ("https://plain.example.com/b",
         f"<html>{OG_ARTICLE}{_self_linked('plain.example.com', 5, 0)}</html>",
         False),
        # og:type=article, no headlines → ratio 0.0 → default passes
        ("https://plain.example.com/c", f"<html>{OG_ARTICLE}<p>x</p></html>", True),
        # strict site tightened to <=0.2: ratios 0.2 → passes
        ("https://strict-site.example.com/a",
         f"<html>{OG_ARTICLE}{_self_linked('strict-site.example.com', 1, 4)}</html>",
         True),
        # strict site ratios 0.4 → fails <=0.2 although the default
        # <=0.65 would pass — proves the override is applied
        ("https://strict-site.example.com/b",
         f"<html>{OG_ARTICLE}{_self_linked('strict-site.example.com', 2, 3)}</html>",
         False),
        # the SAME 0.4-ratio markup on an unconfigured host → default
        # <=0.65 → passes (the per-host contrast case)
        ("https://plain.example.com/d",
         f"<html>{OG_ARTICLE}{_self_linked('plain.example.com', 2, 3)}</html>",
         True),
    ]
    df = spark.createDataFrame(
        [(u, h) for u, h, _ in rows], "url string, html string"
    )
    got = {
        r.url: r.ok
        for r in df.withColumn(
            "ok", cfg.gate_column(F.col("html"), F.col("url"))
        ).collect()
    }
    for url, _, want in rows:
        assert got[url] is want, url


def test_ignore_column_per_host(spark):
    cfg = _cfg()
    df = spark.createDataFrame(
        [
            ("https://strict-site.example.com/blog/post",),  # blocked
            ("https://strict-site.example.com/news/post",),  # fine
            ("https://plain.example.com/blog/post",),        # no site regex
        ],
        "url string",
    )
    got = [
        r.keep
        for r in df.withColumn("keep", cfg.ignore_column(F.col("url")))
        .orderBy("url")
        .collect()
    ]
    # order: plain/blog (no site regex), strict/blog (blocked), strict/news
    assert got == [True, False, True]


def test_crawler_override_and_fallback():
    cfg = _cfg()
    assert cfg.crawler_for("http://keyword-site.example.com/x") == "RecursiveCrawler"
    assert cfg.crawler_for("http://other.example.com/") == cfg.default_crawler
    # the override feeds the O5 fallback walk unchanged
    picked = choose_crawler(
        cfg.crawler_for("http://other.example.com/"),
        {"RecursiveSitemapCrawler": lambda: False,
         "RecursiveCrawler": lambda: True},
    )
    assert picked == "RecursiveCrawler"


def test_daemon_intervals():
    cfg = _cfg()
    iv = cfg.daemon_intervals()
    assert iv["http://www.strict-site.example.com"] == 3600
    assert iv["https://rss-site.example.com::rss"] == 1800
    assert len(iv) == 2


def test_frontier_respects_site_ignore_regex(spark):
    """The per-site ignore_regex ANDs into the frontier's URL gate."""
    from news_please_spark.operators.frontier import FrontierConfig, FrontierEngine

    cfg = SiteConfigs.from_sitelist(
        '{"base_urls": [{"url": "https://h0.example.com",'
        ' "ignore_regex": "/p/1"}]}'
    )
    edges = spark.createDataFrame(
        [
            ("https://h0.example.com/p/0", "https://h0.example.com/p/1", 0),
            ("https://h0.example.com/p/0", "https://h0.example.com/p/2", 1),
            ("https://h0.example.com/p/0", "https://h1.example.com/p/1", 2),
        ],
        "src_url string, dst_url string, link_index long",
    )
    engine = FrontierEngine(
        spark, edges, cfg=FrontierConfig(budget_per_host=8, max_depth=2),
        site_configs=cfg,
    )
    res = engine.run(["https://h0.example.com/p/0"])
    urls = {r.url for r in res.order.collect()}
    # /p/1 on h0 is site-blocked; the SAME path on h1 is not
    assert urls == {
        "https://h0.example.com/p/0",
        "https://h0.example.com/p/2",
        "https://h1.example.com/p/1",
    }
