"""Per-site config layer: the sitelist.hjson + INI-defaults merge as a
broadcastable table of per-host overrides, compiled into native Columns.

Reference semantics: newsplease loads an INI (`[Heuristics]
enabled_heuristics` + `pass_heuristics_condition`, config/config.cfg:118,
128) plus `sitelist.hjson` whose per-site entries may override the
crawler, individual heuristics (`overwrite_heuristics` merged OVER the
defaults, helper_classes/sub_classes/heuristics_manager.py:219-245), the
whole gate condition (`pass_heuristics_condition`,
heuristics_manager.py:69-110 — heuristics that end up disabled are
substituted with literal True in the condition), and daemon scheduling
(`daemonize` / `additional_rss_daemon`, __main__.py:172-176).

Spark-first shape: per-site overrides are driver-side metadata (a
sitelist is human-curated — thousands of rows at most), so the gate is
compiled into ONE boolean Column: hosts are grouped by their effective
(condition, comparators) and dispatched with a chained
`when(host.isin(group), gate_i)…otherwise(default_gate)`. Everything
stays in whole-stage codegen — no join, no UDF, no per-row Python; the
site table never touches the data path as data.

`ignore_regex` per site is an extension over the reference (which only
has the global [Crawler] ignore_regex, config.cfg:78); it composes the
same way.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from news_please_spark.extraction.heuristics import (
    DEFAULT_COMPARATORS,
    DEFAULT_CONDITION,
    ConditionParser,
    heuristic_columns,
)
from news_please_spark.functions.urls import canonical_host


# -- hjson subset parser ----------------------------------------------------
# The reference uses the hjson package; this accepts the subset its own
# example sitelist uses — '#' and '//' comments, trailing commas, and
# unquoted object keys — then delegates to the stdlib json parser.

_LINE_COMMENT = re.compile(r'^\s*(#|//).*$')
_TRAILING_COMMA = re.compile(r",(\s*[}\]])")
_UNQUOTED_KEY = re.compile(r'([{,]\s*)([A-Za-z_][A-Za-z0-9_-]*)(\s*:)')


def parse_hjson(text: str) -> dict:
    """Parse the hjson subset the reference sitelist format uses."""
    lines = []
    for ln in text.splitlines():
        if _LINE_COMMENT.match(ln):
            continue
        # strip a trailing '# …' comment only when no quote follows it
        # on the line (a '#' inside a quoted string must survive)
        for marker in ("#", "//"):
            i = ln.find(marker)
            if i >= 0 and '"' not in ln[i:] and "'" not in ln[i:]:
                ln = ln[:i]
        lines.append(ln)
    s = "\n".join(lines)
    s = _UNQUOTED_KEY.sub(r'\1"\2"\3', s)
    s = _TRAILING_COMMA.sub(r"\1", s)
    return json.loads(s)


# -- site entries ------------------------------------------------------------

def _host_of(url: str) -> str:
    m = re.match(r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", url.strip(), re.I)
    host = (m.group(1) if m else url.strip()).lower()
    return re.sub(r"^www\.", "", host)


@dataclass
class SiteEntry:
    """One sitelist entry, keyed by canonical (www-stripped) host."""

    url: str
    host: str
    crawler: str | None = None
    overwrite_heuristics: dict[str, object] = field(default_factory=dict)
    condition: str | None = None
    daemonize: int | None = None
    additional_rss_daemon: int | None = None
    ignore_regex: str | None = None


@dataclass
class SiteConfigs:
    """The merged defaults + per-site override table."""

    default_condition: str = DEFAULT_CONDITION
    default_comparators: dict[str, object] = field(
        default_factory=lambda: dict(DEFAULT_COMPARATORS)
    )
    default_crawler: str = "RecursiveSitemapCrawler"
    sites: dict[str, SiteEntry] = field(default_factory=dict)

    # -- construction -------------------------------------------------------
    @classmethod
    def from_sitelist(
        cls,
        text: str,
        default_condition: str = DEFAULT_CONDITION,
        default_comparators: dict[str, object] | None = None,
        default_crawler: str = "RecursiveSitemapCrawler",
    ) -> "SiteConfigs":
        """Build from a sitelist.hjson document (config.py:282-289
        get_site_objects reads base_urls the same way)."""
        doc = parse_hjson(text)
        cfg = cls(
            default_condition=default_condition,
            default_comparators=dict(
                default_comparators
                if default_comparators is not None
                else DEFAULT_COMPARATORS
            ),
            default_crawler=default_crawler,
        )
        for site in doc.get("base_urls", []):
            url = site["url"]
            entry = SiteEntry(
                url=url,
                host=_host_of(url),
                crawler=site.get("crawler"),
                overwrite_heuristics=dict(site.get("overwrite_heuristics", {})),
                condition=site.get("pass_heuristics_condition"),
                daemonize=site.get("daemonize"),
                additional_rss_daemon=site.get("additional_rss_daemon"),
                ignore_regex=site.get("ignore_regex"),
            )
            cfg.sites[entry.host] = entry
        return cfg

    # -- effective per-host gate -------------------------------------------
    def effective_gate(self, host: str | None) -> tuple[str, dict[str, str]]:
        """(condition, comparators) after the reference's merge:
        site overwrite_heuristics over the defaults; value False disables
        the heuristic, which substitutes literal True wherever the
        condition mentions it (heuristics_manager.py:100-107); value
        True enables it as a bare boolean; a string is a comparator."""
        entry = self.sites.get(host) if host else None
        merged: dict[str, object] = dict(self.default_comparators)
        condition = self.default_condition
        if entry is not None:
            merged.update(entry.overwrite_heuristics)
            if entry.condition is not None:
                condition = entry.condition
        comparators: dict[str, str] = {}
        for name, val in merged.items():
            if val is False:
                comparators[name] = "True"  # disabled → vacuous pass
            elif val is True:
                continue  # enabled, bare boolean column
            elif isinstance(val, (int, float)):
                # bare number = equality (heuristics_manager.py:198-200)
                comparators[name] = f"=={val}"
            else:
                comparators[name] = str(val)
        return condition, comparators

    def gate_column(
        self,
        html: Column,
        url: Column,
        source_type: Column | None = None,
    ) -> Column:
        """F7 with per-site overrides as ONE codegen'd Column: hosts
        sharing an effective (condition, comparators) are dispatched
        together via host.isin(...); everything else takes the default
        gate. Plan shape: CASE WHEN … END over native predicates."""
        cols = heuristic_columns(html, url, source_type)

        def compile_gate(cond: str, comps: dict[str, str]) -> Column:
            return ConditionParser(cond, cols, comps).parse()

        # group hosts by effective gate so N sites with one shared
        # override compile to one branch
        groups: dict[tuple[str, tuple[tuple[str, str], ...]], list[str]] = {}
        for host in self.sites:
            cond, comps = self.effective_gate(host)
            key = (cond, tuple(sorted(comps.items())))
            groups.setdefault(key, []).append(host)

        default_cond, default_comps = self.effective_gate(None)
        out = compile_gate(default_cond, default_comps)
        host_col = canonical_host(url)
        for (cond, comps), hosts in sorted(groups.items()):
            if (cond, dict(comps)) == (default_cond, default_comps):
                continue
            out = F.when(
                host_col.isin(*hosts), compile_gate(cond, dict(comps))
            ).otherwise(out)
        return out

    # -- frontier-side filters ---------------------------------------------
    def ignore_column(self, url: Column) -> Column:
        """True when `url` survives its host's extra ignore_regex (sites
        without one always pass). Composes with the global allowed_url
        gate by AND."""
        host_col = canonical_host(url)
        out = F.lit(True)
        for host, entry in sorted(self.sites.items()):
            if entry.ignore_regex:
                out = F.when(
                    host_col == host, ~url.rlike(entry.ignore_regex)
                ).otherwise(out)
        return out

    # -- crawler dispatch ---------------------------------------------------
    def crawler_for(self, seed_url: str) -> str:
        """Requested crawler for a seed: the site's override, else the
        default (single_crawler.py:189-205 get_crawler reads
        site['crawler'] or cfg default). Feed the result to
        sources.dispatch.choose_crawler for the fallback walk."""
        entry = self.sites.get(_host_of(seed_url))
        return entry.crawler if entry and entry.crawler else self.default_crawler

    # -- daemon schedule -----------------------------------------------------
    def daemon_intervals(self) -> dict[str, int]:
        """site-url → re-crawl period in seconds for DaemonScheduler.
        `daemonize` daemonizes the site's own crawler;
        `additional_rss_daemon` adds a SECOND RssCrawler daemon beside
        the one-shot crawl (__main__.py:172-176) — keyed url::rss so
        both can coexist in one time-queue."""
        out: dict[str, int] = {}
        for entry in self.sites.values():
            if entry.daemonize is not None:
                out[entry.url] = int(entry.daemonize)
            if entry.additional_rss_daemon is not None:
                out[f"{entry.url}::rss"] = int(entry.additional_rss_daemon)
        return out
