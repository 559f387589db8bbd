"""Domain-blocklist matching with parent-suffix semantics.

The reference filters URLs with per-site regex ignores (F2/F3,
config.cfg url_ignore_regex); at corpus scale the standard admission
filter is a DOMAIN blocklist (spam/adult/malware lists run 10^6-10^7
entries) where an entry blocks the domain AND every subdomain:
'tracker.net' must block 'cdn.tracker.net'. Naive contains-matching is
a cross join; the scalable form is exact equi-joins on exploded
parent-domain suffixes (a host has ≤ ~6), which is what
``blocked_hosts`` does:

    hosts --distinct--> explode(host_suffixes) --equi-join--> blocklist
          --groupBy host--> most-specific matched domain

Everything is per-HOST, never per-URL: the frontier admission tier
anti-joins its URL table against the (small relative to URLs) blocked-
host result on the host key. The suffix join is a plain equi-join —
AQE broadcasts genuinely small blocklists and shuffle-hash-joins the
10^7-entry ones; nothing here assumes the list fits one node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_please_spark.functions.urls import host_suffixes


def blocked_hosts(
    hosts: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    domain_col: str = "domain",
) -> DataFrame:
    """(host, matched_domain) for every distinct host blocked by the
    list; matched_domain is the MOST SPECIFIC (longest) matching entry
    for auditability. Suffix semantics: an entry matches the host
    itself or any parent domain with ≥ 2 labels."""
    sufs = (
        hosts.select(F.col(host_col).alias("host"))
        .distinct()
        .select("host", F.explode(host_suffixes(F.col("host"))).alias("_suf"))
    )
    entries = blocklist.select(F.col(domain_col).alias("_suf")).distinct()
    return (
        sufs.join(entries, "_suf")
        .groupBy("host")
        .agg(F.max_by("_suf", F.length("_suf")).alias("matched_domain"))
    )


def strip_blocked(
    urls: DataFrame,
    blocklist: DataFrame,
    url_host_col: str = "host",
    domain_col: str = "domain",
) -> DataFrame:
    """Admission-tier composition: drop every URL row whose host is
    blocked (left_anti on the per-host match table)."""
    bl = blocked_hosts(
        urls.select(F.col(url_host_col).alias("host")),
        blocklist,
        domain_col=domain_col,
    )
    return urls.join(
        bl.select(F.col("host").alias(url_host_col)), url_host_col, "left_anti"
    )
