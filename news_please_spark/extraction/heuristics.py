"""Article heuristics H1-H7 as native Column expressions, plus a safe
boolean-condition compiler (no eval) replacing the reference's
sandboxed-eval gate (reference heuristics_manager.py:36-67,69-110;
heuristic functions reference helper_classes/heuristics.py).

All regex counting runs JVM-side (`rlike`, `regexp_count`) — the gate
filters BEFORE the expensive extraction UDFs, mirroring the reference's
pipeline ordering (cheap predicates first; SURVEY.md §4).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from news_please_spark.functions.urls import canonical_host, url_host

# Tag and attribute NAMES match case-insensitively ((?i:…) scopes) —
# the reference goes through lxml, which lowercases both before its
# case-sensitive value regexes run. Values stay case-sensitive.
_H_ALL = r"(?i)<h[1-6][^>]*>"
_H_LINKED = r"(?i)<h[1-6][^>]*>\s*<a\s"


def og_type(html: Column) -> Column:
    """H1: page declares og:type=article (heuristics.py:63-80). The
    reference reads the parsed attribute (bs4), so attribute order AND
    quote style (double/single/unquoted) must all match — both orders ×
    optional quotes are covered, with a delimiter class after each value
    so og:typefoo / articlefoo can't false-positive."""
    return html.rlike(
        r'(?i:<meta)[^>]*(?i:property)=["\']?og:type["\'\s][^>]*(?i:content)=["\']?article(["\'\s/>]|$)'
    ) | html.rlike(
        r'(?i:<meta)[^>]*(?i:content)=["\']?article["\'\s][^>]*(?i:property)=["\']?og:type(["\'\s/>]|$)'
    )


def meta_contains_article_keyword(html: Column) -> Column:
    """H2: any meta attribute mentions 'article' (heuristics.py:45-61;
    the keyword itself is a value — case-sensitive like the
    reference's)."""
    return html.rlike(r"(?i:<meta)[^>]*article")


def headline_counts(html: Column) -> tuple[Column, Column]:
    all_h = F.regexp_count(html, F.lit(_H_ALL))
    linked = F.regexp_count(html, F.lit(_H_LINKED))
    return all_h, linked


def linked_headlines_ratio(html: Column, min_headlines: int = 5) -> Column:
    """H3: ratio linked/all h1-h6; pages with fewer than
    `min_headlines` headlines auto-pass with ratio 0.0
    (heuristics.py:82-118, min_headlines config.cfg:135)."""
    all_h, linked = headline_counts(html)
    return F.when(all_h < min_headlines, F.lit(0.0)).otherwise(
        linked.cast("double") / all_h
    )


def self_linked_headlines_ratio(html: Column, url: Column, min_headlines: int = 5) -> Column:
    """H4: like H3 but counts only links to the same canonical host."""
    all_h = F.regexp_count(html, F.lit(_H_ALL))
    self_linked = F.regexp_count(
        html,
        F.concat(
            # href value may be double-/single-/un-quoted (bs4 parity);
            # (?i) also covers scheme + host case (both are
            # case-insensitive per RFC 3986, and canonical_host is
            # already lowercased)
            F.lit(r"(?i)<h[1-6][^>]*>\s*<a\s[^>]*href=[\"']?[a-z]+://(www\.)?"),
            canonical_host(url),
        ),
    )
    return F.when(all_h < min_headlines, F.lit(0.0)).otherwise(
        self_linked.cast("double") / all_h
    )


def main_content_linked_headlines_ratio(html: Column, min_headlines: int = 5) -> Column:
    """H7: the H3 ratio computed over the main content block only
    (reference heuristics.py:144-167 runs it on the newspaper-extracted
    body; here the <article> element stands in for the extracted body)."""
    body = F.regexp_extract(html, r"(?si)<article[^>]*>(.*?)</article>", 1)
    all_h = F.regexp_count(body, F.lit(_H_ALL))
    linked = F.regexp_count(body, F.lit(_H_LINKED))
    return F.when(all_h < min_headlines, F.lit(0.0)).otherwise(
        linked.cast("double") / all_h
    )


def is_not_from_subdomain(url: Column) -> Column:
    """H5: response host is the registered domain itself
    (heuristics.py:131-142). Heuristic: ≤ 2 labels after www-strip."""
    return F.size(F.split(canonical_host(url), r"\.")) <= 2


def crawler_only_extracts_articles(source_type: Column) -> Column:
    """H6: source kind guarantees article-like pages (sitemap/rss/gdelt
    declare only_extracts_articles; heuristics.py:27-43)."""
    return source_type.isin("sitemap", "rss", "gdelt")


def heuristic_columns(html: Column, url: Column, source_type: Column | None = None) -> dict[str, Column]:
    cols = {
        "og_type": og_type(html),
        "meta_contains_article_keyword": meta_contains_article_keyword(html),
        "linked_headlines": linked_headlines_ratio(html),
        "self_linked_headlines": self_linked_headlines_ratio(html, url),
        "main_content_linked_headlines": main_content_linked_headlines_ratio(html),
        "is_not_from_subdomain": is_not_from_subdomain(url),
    }
    if source_type is not None:
        cols["crawler_contains_only_article_alikes"] = (
            crawler_only_extracts_articles(source_type)
        )
    return cols


# ---------------------------------------------------------------------------
# condition compiler: "og_type and (linked_headlines or
# self_linked_headlines)" + per-heuristic comparators {"linked_headlines":
# "<=0.65"} → one boolean Column. Replaces the reference's string
# substitution + eval (heuristics_manager.py:58-66) with a real parser.

_TOKEN_RE = re.compile(r"\s*(\(|\)|and\b|or\b|not\b|[A-Za-z_][A-Za-z0-9_]*)")
_CMP_RE = re.compile(r"^(<=|>=|<|>|==|!=)\s*([0-9.]+)$")

DEFAULT_CONDITION = "og_type and (linked_headlines or self_linked_headlines)"
DEFAULT_COMPARATORS = {
    "linked_headlines": "<=0.65",
    "self_linked_headlines": "<=0.65",
}


class ConditionParser:
    def __init__(self, cond: str, columns: dict[str, Column], comparators: dict[str, str]):
        self.tokens = self._lex(cond)
        self.pos = 0
        self.columns = columns
        self.comparators = comparators

    @staticmethod
    def _lex(cond: str) -> list[str]:
        out, i = [], 0
        while i < len(cond):
            m = _TOKEN_RE.match(cond, i)
            if not m:
                if cond[i].isspace():
                    i += 1
                    continue
                raise ValueError(f"bad condition near: {cond[i:]}")
            out.append(m.group(1))
            i = m.end()
        return out

    def _peek(self) -> str | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def _eat(self, tok: str | None = None) -> str:
        t = self._peek()
        if t is None or (tok is not None and t != tok):
            raise ValueError(f"expected {tok}, got {t}")
        self.pos += 1
        return t

    def parse(self) -> Column:
        c = self._or()
        if self._peek() is not None:
            raise ValueError(f"trailing tokens: {self.tokens[self.pos:]}")
        return c

    def _or(self) -> Column:
        c = self._and()
        while self._peek() == "or":
            self._eat("or")
            c = c | self._and()
        return c

    def _and(self) -> Column:
        c = self._not()
        while self._peek() == "and":
            self._eat("and")
            c = c & self._not()
        return c

    def _not(self) -> Column:
        if self._peek() == "not":
            self._eat("not")
            return ~self._not()
        return self._atom()

    def _atom(self) -> Column:
        t = self._eat()
        if t == "(":
            c = self._or()
            self._eat(")")
            return c
        if t not in self.columns:
            raise ValueError(f"unknown heuristic: {t}")
        col = self.columns[t]
        cmp_spec = self.comparators.get(t)
        if cmp_spec is None:
            return col.cast("boolean")
        m = _CMP_RE.match(cmp_spec.strip())
        if not m:
            if cmp_spec.strip() in ("True", "true"):
                return F.lit(True)
            if cmp_spec.strip() in ("False", "false"):
                return F.lit(False)
            raise ValueError(f"bad comparator for {t}: {cmp_spec}")
        op, val = m.group(1), float(m.group(2))
        return {
            "<=": col <= val,
            ">=": col >= val,
            "<": col < val,
            ">": col > val,
            "==": col == val,
            "!=": col != val,
        }[op]


def pass_heuristics(
    html: Column,
    url: Column,
    condition: str | None = None,
    comparators: dict[str, str] | None = None,
    source_type: Column | None = None,
) -> Column:
    """F7: the composed article gate as one boolean Column."""
    cols = heuristic_columns(html, url, source_type)
    return ConditionParser(
        condition or DEFAULT_CONDITION,
        cols,
        comparators if comparators is not None else DEFAULT_COMPARATORS,
    ).parse()
