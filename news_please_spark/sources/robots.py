"""robots.txt parsing + allow evaluation as declarative columns.

The reference respects robots.txt by delegating to its crawler
framework's middleware (reference newsplease/crawler/spiders/*.py set
ROBOTSTXT_OBEY; the parsing itself lives outside the repo in
scrapy/Protego). This module is the engine-side equivalent: raw
robots.txt BYTES (as fetched into a (host, robots_txt) table) are
parsed into a rules table and evaluated against URL tables entirely
with native expressions — no per-row Python, reproducible in any SQL
engine, so the robots gate can be oracle-checked like every other
operator.

Semantics implemented (RFC 9309, the bits that affect admission):

* line model: ``field: value`` with ``#`` comments stripped, unknown
  fields ignored, CRLF tolerated;
* group model: consecutive ``User-agent`` lines open a group; the
  rules that follow belong to every agent named in the header; a
  ``User-agent`` line AFTER rules starts a new group; rules before
  any group are ignored;
* agent selection: a group applies when its agent token is a
  case-insensitive substring of the client product token, or is
  ``*``; if ANY specific group applies on a host, its ``*`` groups
  are ignored (RFC: most specific user-agent match wins);
* rule matching: ``Allow``/``Disallow`` values are path patterns
  where ``*`` matches any span and a trailing ``$`` anchors the end;
  empty values match nothing (``Disallow:`` means allow-all);
* precedence: the longest (most octets) matching pattern wins; on a
  length tie ``Allow`` wins; no matching rule (or no robots.txt at
  all) means allowed.

Scale shape: parsing is one explode over lines + two windows keyed by
host (robots files are KB-sized — per-host line counts are bounded,
never a skew bomb); evaluation is one equi-join of the URL table
against the per-host applicable rules (a crawl frontier holds ~10^2
rules/host worst case) followed by a max_by per URL — group-bounded,
shuffle only on host/url keys. Wildcard matching compiles each rule
ONCE (plan-side string algebra) to a SQL LIKE pattern, so the per-pair
test is the engine's native matcher, not a regex compile per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lines(robots: DataFrame, host_col: str, text_col: str) -> DataFrame:
    """(host, pos, field, val) per non-empty directive-shaped line,
    comments stripped, field lowercased."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias("pos", "_raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace(F.col("_raw"), r"#.*$", "")).alias("_line"),
    )
    return lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract(F.col("_line"), r"^([A-Za-z-]+)\s*:", 1)).alias(
            "field"
        ),
        F.trim(
            F.regexp_extract(F.col("_line"), r"^[A-Za-z-]+\s*:\s*(.*)$", 1)
        ).alias("val"),
    )


# the per-group directive fields the group machinery recognizes; a
# non-UA member line closes an open User-agent header, so e.g. a
# Crawl-delay between two UA lines splits them into two groups.
# Sitemap (cross-group by spec) and unknown fields never join or split
# groups.
_GROUP_FIELDS = ("allow", "disallow", "crawl-delay")


def _directives(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, grp, agent, field, val) — every recognized in-group
    directive, one row per agent named in its group's header."""
    tagged = _lines(robots, host_col, text_col).select(
        "host",
        "pos",
        (F.col("field") == "user-agent").alias("_is_ua"),
        "field",
        "val",
    ).filter(
        (F.col("field") == "user-agent")
        | (F.col("field").isin(*_GROUP_FIELDS) & (F.col("val") != ""))
    )
    w = Window.partitionBy("host").orderBy("pos")
    opened = tagged.withColumn(
        "_opens",
        (
            F.col("_is_ua") & ~F.coalesce(F.lag("_is_ua").over(w), F.lit(False))
        ).cast("int"),
    )
    grouped = opened.select(
        "host",
        "_is_ua",
        "field",
        "val",
        F.sum("_opens")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("grp"),
    )
    agents = grouped.filter("_is_ua").select(
        "host", "grp", F.lower(F.col("val")).alias("agent")
    )
    return (
        grouped.filter(~F.col("_is_ua"))
        .select("host", "grp", "field", "val")
        .join(agents, ["host", "grp"])
        .select("host", "grp", "agent", "field", "val")
    )


def parse_robots(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, grp, agent, allow, path, spec) — one row per (agent in
    group header) × (Allow/Disallow rule in group). ``spec`` is the
    rule's pattern length (its RFC specificity); ``agent`` is
    lowercased."""
    return _directives(robots, host_col, text_col).filter(
        F.col("field").isin("allow", "disallow")
    ).select(
        "host",
        "grp",
        "agent",
        (F.col("field") == "allow").alias("allow"),
        F.col("val").alias("path"),
        F.length("val").cast("long").alias("spec"),
    )


def _like_pattern(path):
    """Compile a robots path pattern to (LIKE pattern, anchored) —
    ``*`` → ``%``, trailing ``$`` anchors (no trailing ``%``), LIKE
    metacharacters escaped with ``\\``."""
    anchored = path.endswith("$")
    core = F.when(anchored, F.expr("substring(path, 1, length(path) - 1)")).otherwise(
        path
    )
    esc = F.replace(
        F.replace(
            F.replace(core, F.lit("\\"), F.lit("\\\\")),
            F.lit("%"),
            F.lit("\\%"),
        ),
        F.lit("_"),
        F.lit("\\_"),
    )
    pat = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, pat).otherwise(F.concat(pat, F.lit("%")))


def applicable_rules(rules: DataFrame, agent: str) -> DataFrame:
    """The per-host subset of a (host, grp, agent, ...) directive table
    governing ``agent``: rows of groups whose token is a substring of
    the agent (specific), or of ``*`` groups on hosts with NO specific
    group. Output columns = input columns, filtered."""
    a = agent.lower()
    cols = rules.columns
    r = rules.withColumn(
        "_specific",
        (F.col("agent") != "*") & (F.instr(F.lit(a), F.col("agent")) > 0),
    ).filter(F.col("_specific") | (F.col("agent") == "*"))
    has = r.groupBy("host").agg(F.max("_specific").alias("_has_specific"))
    return (
        r.join(has, "host")
        .filter(F.col("_specific") == F.col("_has_specific"))
        .select(*cols)
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Adds ``allowed`` to ``urls``: RFC 9309 longest-match decision of
    the parsed rules for ``agent``. URLs on hosts without robots rules
    (or matching no rule) are allowed. The decision regroups on the
    URL table's full row, so rows should be distinct (identical rows
    collapse to one, like any relational projection of them would)."""
    appl = applicable_rules(rules, agent).select(
        F.col("host").alias("_rh"),
        "allow",
        "spec",
        _like_pattern(F.col("path")).alias("_pat"),
    )
    joined = urls.join(
        appl, F.col(host_col) == F.col("_rh"), "left"
    ).withColumn(
        "_hit",
        F.when(
            F.col("_pat").isNotNull()
            & F.expr(f"{path_col} LIKE _pat ESCAPE '\\\\'"),
            F.struct(F.col("spec"), F.col("allow").cast("int").alias("_a")),
        ),
    )
    # max over (spec, allow): longest rule wins, Allow wins length ties
    return (
        joined.groupBy(*urls.columns)
        .agg(F.max("_hit").alias("_best"))
        .withColumn(
            "allowed", F.coalesce(F.col("_best._a") == 1, F.lit(True))
        )
        .drop("_best")
    )


def disallow_prefixes_for(rules: DataFrame, agent: str = "*") -> DataFrame:
    """Bridge to the frontier engine's gate: the PLAIN-PREFIX disallow
    rules (no ``*``, no ``$`` — the only shape robots_blocked's
    startswith test understands) governing ``agent``, as the
    (host, disallow_prefix) table FrontierEngine consumes. Hosts whose
    robots use wildcards need the full robots_allowed evaluator;
    filtering them out here is conservative-permissive and documented
    rather than silently wrong (a prefix truncated at the first ``*``
    could block URLs the file allows)."""
    return (
        applicable_rules(rules, agent)
        .filter(
            ~F.col("allow")
            & ~F.col("path").contains("*")
            & ~F.col("path").endswith("$")
        )
        .select("host", F.col("path").alias("disallow_prefix"))
        .distinct()
    )


def crawl_delay_of(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, crawl_delay_s) — the Crawl-delay governing ``agent`` on
    each host that declares one (the de-facto directive RFC 9309 left
    out but crawlers honor; the reference honors it through scrapy's
    AutoThrottle/DOWNLOAD_DELAY). Agent selection is the same
    specific-shadows-star rule as paths; if the applicable groups
    declare several delays the LARGEST wins (the polite reading).
    Non-numeric values are ignored. Feed this into the politeness
    tier's per-host budgets (operators/ordering.py) to derive
    fetches-per-window caps."""
    d = _directives(robots, host_col, text_col).filter(
        F.col("field") == "crawl-delay"
    )
    delays = applicable_rules(d, agent).select(
        "host", F.col("val").try_cast("long").alias("_delay")
    ).filter(F.col("_delay").isNotNull() & (F.col("_delay") >= 0))
    return delays.groupBy("host").agg(
        F.max("_delay").alias("crawl_delay_s")
    )


def sitemaps_of(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap_url) — every ``Sitemap:`` line (a cross-group
    directive: it belongs to no User-agent group and applies to all).
    This is how news sitemaps are actually discovered — the reference's
    sitemap crawler lets scrapy read robots.txt for sitemap URLs
    (reference newsplease/crawler/spiders/sitemap_crawler.py); pipe
    this table into sources/sitemap.py's recursive expansion."""
    return (
        _lines(robots, host_col, text_col)
        .filter((F.col("field") == "sitemap") & (F.col("val") != ""))
        .select("host", F.col("val").alias("sitemap_url"))
        .distinct()
    )


def robots_diff(
    urls: DataFrame,
    rules_old: DataFrame,
    rules_new: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Robots policy drift between two snapshots — the report a crawl
    operator reads after a refetch sweep of robots.txt: per host, how
    many of OUR known URLs flipped verdict (newly denied URLs must
    leave the frontier and the store's serving set; newly allowed
    ones become crawl candidates). Evaluates BOTH rule snapshots with
    the same RFC 9309 longest-match engine (robots_allowed) and
    aggregates flips per host.

    Output: (host, n_urls, to_deny, to_allow). Plan: two
    rule-table joins (rules are robots-sized, AQE/broadcast-routed) +
    one map-side-combinable per-host agg; the URL table shuffles only
    for the verdict regroup robots_allowed already performs."""
    a = robots_allowed(urls, rules_old, agent, host_col, path_col).withColumnRenamed(
        "allowed", "_old"
    )
    b = robots_allowed(urls, rules_new, agent, host_col, path_col).withColumnRenamed(
        "allowed", "_new"
    )
    j = a.join(b, list(urls.columns))
    return j.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(
            F.when(F.col("_old") & ~F.col("_new"), 1).otherwise(0)
        ).cast("long").alias("to_deny"),
        F.sum(
            F.when(~F.col("_old") & F.col("_new"), 1).otherwise(0)
        ).cast("long").alias("to_allow"),
    )
