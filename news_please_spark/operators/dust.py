"""DUST rule mining — "Different URLs with Similar Text" (Bar-Yossef,
Keidar & Schonfeld, WWW 2009, "Do Not Crawl in the DUST").

A crawler that canonicalizes only syntax (lowercase host, strip
fragments — functions/urls.py) still fetches the same page many times
through session ids, tracking params, and mirror paths.  DUST mining
learns the SITE-SPECIFIC rewrite rules from evidence the crawl already
collected: if URLs that differ ONLY in parameter p consistently carry
the SAME content fingerprint, then "strip p on this host" is a safe
canonicalization rule — every future fetch it saves is a politeness
slot returned to the frontier.  The reference engine has no such
learner (its ignore rules are hand-written regexes per site,
config/sitelist.hjson); this operator produces those rules from data.

This implementation mines the highest-value rule class, irrelevant
QUERY PARAMETERS, which subsumes the session-id/tracking-param traps
operators/traps.py flags heuristically:

  1. every URL is parsed to (host, path, [name=value...] params);
  2. each param occurrence becomes a candidate: the row is keyed by
     its RESIDUAL — md5(host | path | the other params, sorted) — so
     URLs that agree on everything but the candidate land in one group;
  3. a residual group where the candidate takes >= 2 distinct values
     is an experiment: all content fingerprints equal -> the param
     provably didn't matter there (support); fingerprints differ ->
     the param carries content (conflict);
  4. per (host, param): is_dust = support groups >= min_support AND
     zero conflict groups.

Determinism: groups are sets, counts are exact; no sampling, no RNG.

Scale shape: one hash shuffle on the fixed-width md5 residual key
(partial aggregation applies; URL strings themselves never shuffle —
only (residual, value-hash, fp) triples), then a host+param-sized
aggregate.  Per-URL work is linear in its param count.  Skewed hosts
spread across residual keys by construction (the residual embeds the
path), so a 10^8-URL host does not become one reduce cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
QUERY_RE = r"\?([^#]*)"


def dust_param_rules(
    urls: DataFrame,
    url_col: str = "url",
    fp_col: str = "content_fp",
    min_support: int = 2,
) -> DataFrame:
    """Mine per-(host, param) DUST verdicts from (url, content_fp)
    observations.  Input rows: one per fetched URL with a content
    fingerprint (e.g. fingerprint() over the extracted main text —
    NOT the raw HTML, which embeds the session id being tested).

    Returns (host, param, n_support, n_conflict, is_dust):
      n_support  — residual groups where the param varied (>= 2
                   values) and content did not (1 fingerprint);
      n_conflict — residual groups where the param varied AND content
                   varied with it;
      is_dust    — n_support >= min_support and n_conflict == 0:
                   safe to strip `param` on `host`.

    Params that never vary within any residual group produce a row
    with n_support = n_conflict = 0 (no evidence, not a rule)."""
    u = urls.select(
        F.col(url_col).alias("_url"), F.col(fp_col).alias("_fp")
    ).withColumns(
        {
            "_host": F.regexp_extract(F.col("_url"), HOST_RE, 1),
            "_path": F.regexp_extract(F.col("_url"), PATH_RE, 1),
            "_query": F.regexp_extract(F.col("_url"), QUERY_RE, 1),
        }
    )
    parsed = u.withColumn(
        "_params",
        F.filter(F.split(F.col("_query"), "&"), lambda x: x != F.lit("")),
    ).filter(F.size("_params") >= 1)
    cand = parsed.select(
        "_host",
        "_fp",
        "_path",
        "_params",
        F.posexplode("_params").alias("_pos", "_cand"),
    ).select(
        "_host",
        "_fp",
        F.substring_index(F.col("_cand"), "=", 1).alias("param"),
        # value = everything after the first '=' (may itself contain '=')
        F.expr("substring(_cand, instr(_cand, '=') + 1)").alias("_value"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("_host"),
                F.col("_path"),
                F.array_join(
                    F.array_sort(
                        F.expr("filter(_params, (x, i) -> i != _pos)")
                    ),
                    "&",
                ),
            )
        ).alias("_residual"),
    )
    groups = cand.groupBy("_host", "param", "_residual").agg(
        F.countDistinct("_value").alias("_nv"),
        F.countDistinct("_fp").alias("_nf"),
    )
    out = groups.groupBy(F.col("_host").alias("host"), "param").agg(
        F.sum(
            F.when((F.col("_nv") >= 2) & (F.col("_nf") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_support"),
        F.sum(
            F.when((F.col("_nv") >= 2) & (F.col("_nf") >= 2), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_conflict"),
    )
    return out.withColumn(
        "is_dust",
        (F.col("n_support") >= F.lit(int(min_support)))
        & (F.col("n_conflict") == 0),
    )


def apply_dust_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Canonicalize URLs under mined is_dust rules: strip every query
    parameter the host's rule set marks irrelevant, keeping the
    remaining params in their original order (stable rewrite — two
    URLs equal after stripping iff they were DUST of each other).

    Plan: the rule table aggregates to one small (host, array<param>)
    row per host — broadcast-joined (rule tables are O(hosts x params),
    kilobytes per million URLs); the rewrite itself is a native
    filter-over-split, no Python.  Adds `canon_url`."""
    strip = rules.filter(F.col("is_dust")).groupBy(
        F.col("host").alias("_rhost")
    ).agg(F.collect_set("param").alias("_strip"))
    u = urls.withColumns(
        {
            "_host": F.regexp_extract(F.col(url_col), HOST_RE, 1),
            "_base": F.regexp_extract(F.col(url_col), r"^([^?#]*)", 1),
            "_query": F.regexp_extract(F.col(url_col), QUERY_RE, 1),
        }
    )
    joined = u.join(
        F.broadcast(strip), u["_host"] == strip["_rhost"], "left"
    )
    kept = F.filter(
        F.filter(F.split(F.col("_query"), "&"), lambda x: x != F.lit("")),
        lambda p: ~F.array_contains(
            F.coalesce(F.col("_strip"), F.array().cast("array<string>")),
            F.substring_index(p, "=", 1),
        ),
    )
    canon = F.when(
        F.size(kept) > 0,
        F.concat(F.col("_base"), F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.col("_base"))
    return joined.withColumn("canon_url", canon).drop(
        "_host", "_base", "_query", "_rhost", "_strip"
    )


def mirror_hosts(
    urls: DataFrame,
    url_col: str = "url",
    fp_col: str = "content_fp",
    min_support: int = 3,
) -> DataFrame:
    """Host-alias detection — the other DUST rule class (WWW'09 §2):
    mirror hosts (m.example.com, amp.example.com, CDN vanity names)
    that serve the SAME paths with the SAME content.  A crawler that
    learns "host A == host B" halves its fetch budget on that site and
    stops double-counting its documents in dedup statistics.

    Evidence model (one fingerprint per (host, path) — inputs with
    capture history are canonicalized to max(fp), deterministic):
      n_agree    — shared paths with EQUAL fingerprints;
      n_conflict — shared paths with DIFFERENT fingerprints;
      is_mirror  — n_agree >= min_support AND n_conflict == 0.

    Scale containment: candidate pairs come from the (path, fp)
    equi-join — the fingerprint spreads that key, so the '/' page
    shared by 10^8 hosts does NOT create a quadratic cell (only hosts
    with IDENTICAL content there pair up).  The conflict count, which
    WOULD need the skew-prone path-only join, is computed only for
    candidate pairs, and only over candidate hosts' rows (left_semi
    prefilter) — work is bounded by the mirror-suspect subgraph, not
    the corpus.  Output rows are candidate pairs only (n_agree >= 1).
    """
    u = (
        urls.select(
            F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host"),
            F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/?#]+([^#]*)", 1).alias(
                "pathq"
            ),
            F.col(fp_col).alias("fp"),
        )
        .groupBy("host", "pathq")
        .agg(F.max("fp").alias("fp"))
    )
    a = u.select(
        F.col("host").alias("host_a"), "pathq", F.col("fp").alias("fp_a")
    )
    b = u.select(
        F.col("host").alias("host_b"), "pathq", F.col("fp").alias("fp_b")
    )
    agree = (
        a.join(
            b,
            (a["pathq"] == b["pathq"])
            & (a["fp_a"] == b["fp_b"])
            & (a["host_a"] < b["host_b"]),
        )
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_agree"))
    )
    cand_hosts = (
        agree.select(F.col("host_a").alias("host"))
        .unionByName(agree.select(F.col("host_b").alias("host")))
        .distinct()
    )
    ac = a.join(cand_hosts, a["host_a"] == cand_hosts["host"], "left_semi")
    bc = b.join(cand_hosts, b["host_b"] == cand_hosts["host"], "left_semi")
    common = (
        ac.join(
            bc, (ac["pathq"] == bc["pathq"]) & (ac["host_a"] < bc["host_b"])
        )
        .join(agree.select("host_a", "host_b"), ["host_a", "host_b"], "left_semi")
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    out = agree.join(common, ["host_a", "host_b"])
    return out.select(
        "host_a",
        "host_b",
        "n_agree",
        (F.col("n_common") - F.col("n_agree")).cast("long").alias("n_conflict"),
        (
            (F.col("n_agree") >= F.lit(int(min_support)))
            & (F.col("n_common") == F.col("n_agree"))
        ).alias("is_mirror"),
    )


def hreflang_reciprocity(pages: DataFrame) -> DataFrame:
    """Reciprocal-confirmation audit of hreflang alternate clusters —
    the trust rule search engines apply to hreflang annotations: page
    A's declared variant B counts only if B declares A back
    (unconfirmed links are ignored, because anyone can claim to be the
    'en' variant of a popular page). For the crawler this is the
    variant-dedup gate: a confirmed cluster is fetched once per
    language and grouped; an unconfirmed declaration is just an
    outlink.

    Plan shape: hreflang parsing is a per-row regexp transform riding
    the page scan (functions/urls.py::hreflang_alternates_of) — HTML
    never crosses an Exchange; the audit shuffles only distinct
    (url, href) string pairs: one composite-key left_semi equi-join
    for back-edge existence and two map-side-combinable counts. At
    10^10 pages the edge table is bounded by declared alternates per
    page (single digits on real sites), so this is strictly cheaper
    than one crawl wave.

    pages: (url, html). Output: (url, n_declared, n_confirmed,
    reciprocal_ok) — one row per page that declares at least one
    alternate; self-referencing declarations are trivially
    reciprocal (the edge joins itself), matching the published rule."""
    from news_please_spark.functions.urls import hreflang_alternates_of

    alt = (
        pages.select(
            "url", F.explode(hreflang_alternates_of(F.col("html"))).alias("_a")
        )
        .select("url", F.col("_a.lang").alias("lang"), F.col("_a.href").alias("href"))
        .distinct()
        # three consumers (back-edge set, semi-join probe, declared
        # count) — persist so the page scan + regexp parse runs once
        .persist()
    )
    back = alt.select(
        F.col("url").alias("_b_url"), F.col("href").alias("_b_href")
    ).distinct()
    confirmed = alt.join(
        back,
        (alt["href"] == back["_b_url"]) & (alt["url"] == back["_b_href"]),
        "left_semi",
    )
    n_dec = alt.groupBy("url").agg(F.count(F.lit(1)).alias("n_declared"))
    n_conf = confirmed.groupBy("url").agg(F.count(F.lit(1)).alias("n_confirmed"))
    return (
        n_dec.join(n_conf, "url", "left")
        .select(
            "url",
            "n_declared",
            F.coalesce(F.col("n_confirmed"), F.lit(0)).alias("n_confirmed"),
        )
        .withColumn(
            "reciprocal_ok", F.col("n_declared") == F.col("n_confirmed")
        )
    )


def url_pattern_stats(
    urls: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    min_urls: int = 50,
    distinct_bp: int = 9000,
) -> DataFrame:
    """URL template mining: collapse every digit run in the path to
    'N' and aggregate per (host, pattern) — the shape view that finds
    enumeration traps (calendars, pagination, session-id paths) the
    link-graph trap detectors see only after crawling into them.  A
    pattern is flagged trappy when it is BOTH populous (n_urls >=
    min_urls) and near-injective in its leaf segment
    (distinct leaves / urls >= distinct_bp basis points): a /p/N
    family where every URL has a fresh number is an unbounded
    enumeration; a popular pattern whose leaves repeat is just a
    well-trodden template.  This is the aggregate behind the
    reference's hand-written per-site regex ignore lists
    (config/sitelist.hjson) — it GENERATES the candidates those rules
    encode by hand.

    Returns (host, pattern, n_urls, n_leaves, leaf_bp, trappy).

    Scale shape: the collapse and leaf split are map-side Columns; ONE
    exchange on (host, pattern) with a count + distinct-leaf agg
    (two-level: exact distinct via the (host, pattern, leaf) pre-agg,
    both map-side combinable).  Hot patterns are hot keys — AQE skew
    handles the one /p/N family with 10^8 URLs."""
    segs = F.filter(F.split(F.col(path_col), "/"), lambda s: s != F.lit(""))
    base = urls.select(
        F.col(host_col).alias("host"),
        F.regexp_replace(F.col(path_col), "[0-9]+", "N").alias("pattern"),
        F.element_at(segs, -1).alias("_leaf"),
    )
    pre = base.groupBy("host", "pattern", "_leaf").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    return (
        pre.groupBy("host", "pattern")
        .agg(
            F.sum("_c").cast("long").alias("n_urls"),
            F.count(F.lit(1)).cast("long").alias("n_leaves"),
        )
        .withColumn(
            "leaf_bp", F.expr("(10000 * n_leaves) div n_urls").cast("long")
        )
        .withColumn(
            "trappy",
            (F.col("n_urls") >= min_urls)
            & (F.col("leaf_bp") >= distinct_bp),
        )
    )
