"""RFC 9309 (Google REP) robots.txt matching — wildcard patterns,
longest-match precedence, allow-wins ties.

The reference delegates robots to scrapy's RobotsTxtMiddleware (python
stdlib urllib.robotparser under the hood), which implements the
pre-RFC prefix dialect; the frontier engine's gate
(operators/frontier.py::robots_blocked) reproduces exactly that, so
crawl ordering stays bit-compatible with the reference oracle.  Real
sites, however, publish RFC 9309 rules — `*` wildcards, `$`
end-anchors, Allow overrides — and a crawler that reads them as plain
prefixes either over-fetches (politeness violation) or over-blocks
(coverage loss).  This module is the standards-complete matcher,
usable as a drop-in stricter gate ahead of the frontier.

Semantics implemented (RFC 9309 §2.2.2 + Google's documented
extensions):
  * a pattern matches the URL's path-with-query as a prefix;
  * `*` matches any run of characters (including `/` and none);
  * a trailing `$` anchors the match to the END of the path;
  * among all matching allow/disallow rules for a host, the one with
    the LONGEST pattern (octet length of the raw pattern) wins;
  * equal length and conflicting verdicts -> allow (the RFC's "least
    restrictive" tiebreak);
  * no matching rule -> allowed.

Everything is native Columns: patterns compile to anchored regexes
with two regexp_replace passes (escape specials, then `*` -> `.*`) and
match via regexp_like with a COLUMN pattern — no Python, no UDF.

Scale shape: verdicts are computed once per DISTINCT (host, path)
pair, not per input row (crawl logs repeat URLs); the rules join is
host-keyed (rule tables are host x rule-count — broadcast-sized for
any real robots corpus, and statistics will route it so), and the
winner-per-URL window partitions on the fixed-width url key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from news_please_spark.functions.urls import url_host

# path + optional query (REP matches against both), '#fragment' excluded
_PATHQ_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^#]*)"


def rep_regex(pattern: Column) -> Column:
    """Compile an RFC 9309 pattern Column to an anchored regex Column.
    `*` -> `.*`; a trailing `$` becomes a real end anchor; every other
    regex metacharacter is escaped."""
    ends = pattern.endswith("$")
    body = F.when(
        ends, F.substring(pattern, 1, F.length(pattern) - F.lit(1))
    ).otherwise(pattern)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    wild = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), wild, F.when(ends, F.lit("$")).otherwise(F.lit(""))
    )


def rep_match(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    directive_col: str = "directive",
    pattern_col: str = "pattern",
) -> DataFrame:
    """Gate every URL through an RFC 9309 rule table.

    urls: any DataFrame with `url_col`.
    rules: (host, directive in {'allow','disallow'}, pattern) — one
    row per rule line, already scoped to the crawler's user-agent
    group (user-agent selection is a parse-time concern; this operator
    is the match-time hot path).

    Returns the input columns plus (rep_verdict, rep_pattern,
    rep_allowed): the winning directive and pattern (null when no rule
    matched) and the boolean gate."""
    r = rules.select(
        F.col(host_col).alias("_rhost"),
        F.col(directive_col).alias("_dir"),
        F.col(pattern_col).alias("_pat"),
    ).withColumn("_rx", rep_regex(F.col("_pat")))

    u = urls.withColumns(
        {
            "_host": url_host(F.col(url_col)),
            "_path": F.when(
                F.regexp_extract(F.col(url_col), _PATHQ_RE, 1) == "", F.lit("/")
            ).otherwise(F.regexp_extract(F.col(url_col), _PATHQ_RE, 1)),
        }
    )
    # verdicts per DISTINCT (host, path): crawl logs repeat URLs
    hp = u.select("_host", "_path").distinct()
    matched = hp.join(r, hp["_host"] == r["_rhost"]).filter(
        F.regexp_like(F.col("_path"), F.col("_rx"))
    )
    # total order: longest pattern, then allow-before-disallow (the RFC
    # tiebreak), then pattern text so the REPORTED pattern is stable
    # when two same-length same-directive rules both match
    w = Window.partitionBy("_host", "_path").orderBy(
        F.length("_pat").desc(), F.col("_dir").asc(), F.col("_pat").asc()
    )
    winner = (
        matched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_host", "_path", "_dir", "_pat")
    )
    out = u.join(winner, ["_host", "_path"], "left")
    return (
        out.withColumns(
            {
                "rep_verdict": F.col("_dir"),
                "rep_pattern": F.col("_pat"),
                "rep_allowed": F.coalesce(
                    F.col("_dir") == "allow", F.lit(True)
                ),
            }
        )
        .drop("_dir", "_pat")
        .withColumnsRenamed({"_host": "host", "_path": "path"})
    )
