"""K9 savepath DSL — the full reference token catalog compiled into ONE
native Column expression (reference helper_classes/savepath_parser.py:
13-34 token regexes, 110-216 substitution, 95-108 append_md5_if_too_long,
295-316 max_url_file_name sizing; URL components reference
helper_classes/url_extractor.py:39-66, 249-287).

Tokens (n = length argument):
  %working_path, %time_execution(fmt), %timestamp_execution   (compile time)
  %time_download(fmt), %timestamp_download
  %domain(n), %appendmd5_domain(n), %md5_domain(n)            (registered domain)
  %full_domain(n), %appendmd5_full_domain(n), %md5_full_domain(n)
  %subdomains(n), %appendmd5_subdomains(n), %md5_subdomains(n)
  %url_directory_string(n), %appendmd5_url_directory_string(n),
  %md5_url_directory_string(n)
  %url_file_name(n), %md5_url_file_name(n)
  %max_url_file_name, %appendmd5_max_url_file_name            (260-char budget)
plus the engine's legacy argless forms (%domain, %md5_url,
%url_file_name) kept for pipeline configs written against round 1.

time formats: strftime-style (contains '%') is translated to the Java
pattern date_format needs; anything else is passed through as a Java
pattern directly.
"""

from __future__ import annotations

import re
import time

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_FILE_EXTENSION_LENGTH = 9  # reference url_extractor.py:26 (".markdown")

_STRFTIME_TO_JAVA = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%M", "mm"), ("%S", "ss"), ("%j", "DDD"),
]


def _java_fmt(fmt: str) -> str:
    if "%" not in fmt:
        return fmt  # already a Java pattern (legacy configs)
    for a, b in _STRFTIME_TO_JAVA:
        fmt = fmt.replace(a, b)
    return fmt


# --- URL components (reference url_extractor.py semantics, as Columns) ----

def full_domain(url: Column) -> Column:
    """get_allowed_domain(url): first host-looking run, www-stripped
    (reference url_extractor.py:39-50; note the reference's `^(www.)`
    has an unescaped dot — mirrored)."""
    return F.regexp_replace(
        F.regexp_extract(url, r"[^/]+\.[^/]+", 0), r"^(www.)", ""
    )


def registered_domain(url: Column) -> Column:
    """get_allowed_domain(url, False): last two labels."""
    return F.regexp_extract(full_domain(url), r"[^/.]+\.[^/.]+$", 0)


def subdomains(url: Column) -> Column:
    """get_subdomain: the full domain minus the registered domain
    (reference url_extractor.py:53-63)."""
    fd = full_domain(url)
    return F.substring(fd, F.lit(1), F.length(fd) - F.length(registered_domain(url)))


def url_directory_string(url: Column) -> Column:
    """get_url_directory_string: path segments between host and file
    name joined by '_' (reference url_extractor.py:249-272; for
    scheme-qualified URLs the host is always split-index 2, and the
    reference's trailing-slash branch drops one extra segment —
    mirrored)."""
    parts = F.split(url, "/")
    n = F.size(parts)
    take = F.when(F.element_at(parts, -1) == "", n - 5).otherwise(n - 4)
    return F.array_join(F.slice(parts, F.lit(4), F.greatest(take, F.lit(0))), "_")


def url_file_name(url: Column) -> Column:
    """get_url_file_name: last path segment, extension stripped when it
    is ≤ 9 chars (reference url_extractor.py:275-287)."""
    last = F.element_at(F.split(url, "/"), -1)
    ext = F.regexp_extract(last, r"(\.[^./]*)$", 1)
    return F.when(
        (F.length(ext) > 0) & (F.length(ext) <= MAX_FILE_EXTENSION_LENGTH),
        F.substring(last, F.lit(1), F.length(last) - F.length(ext)),
    ).otherwise(last)


def _truncate(col: Column, n: int) -> Column:
    return F.substring(col, 1, n)


def _md5_n(col: Column, n: int) -> Column:
    return F.substring(F.md5(col), 1, n)


def _append_md5_if_too_long(col: Column, n) -> Column:
    """append_md5_if_too_long (reference savepath_parser.py:95-108):
    component longer than n → trim to n-33 and append '_' + md5 (n>32),
    else md5 prefix. n may be an int or a Column."""
    n_col = F.lit(n) if isinstance(n, int) else n
    md = F.md5(col)
    return (
        F.when(F.length(col) <= n_col, col)
        .when(
            n_col > 32,
            F.concat(
                F.substring(col, F.lit(1), (n_col - 33).cast("int")),
                F.lit("_"),
                md,
            ),
        )
        .otherwise(F.substring(md, F.lit(1), n_col.cast("int") if isinstance(n, Column) else n))
    )


_COMPONENTS = {
    "domain": registered_domain,
    "full_domain": full_domain,
    "subdomains": subdomains,
    "url_directory_string": url_directory_string,
    "url_file_name": url_file_name,
}

_TOKEN_RE = re.compile(
    r"%(?:"
    r"(?P<sized>(?:appendmd5_|md5_)?(?:domain|full_domain|subdomains|"
    r"url_directory_string|url_file_name))\((?P<n>\d+)\)"
    r"|(?P<maxfile>(?:appendmd5_)?max_url_file_name)"
    r"|time_download\((?P<dlfmt>[^)]*)\)"
    r"|(?P<ts_dl>timestamp_download)"
    r"|(?P<legacy>domain|md5_url|url_file_name)"
    r")"
)


def savepath(
    template: str,
    url: Column,
    download_ts: Column,
    working_path: str = "",
    execution_ts: int | None = None,
) -> Column:
    """Compile the save-path DSL into one Column (applied per article
    row, fully codegen'd — the reference re-runs ~20 regex substitutions
    per downloaded page on the driver thread)."""
    # compile-time tokens (reference substitutes these once in __init__)
    ts_exec = int(execution_ts if execution_ts is not None else time.time())
    template = re.sub(
        r"%time_execution\(([^)]+)\)",
        lambda m: time.strftime(m.group(1), time.gmtime(ts_exec)),
        template,
    )
    template = template.replace("%timestamp_execution", str(ts_exec))
    template = template.replace("%working_path", working_path)

    # tokenize: (is_max_token, column) parts; max tokens resolved after
    # the non-max length is known (reference savepath_parser.py:295-316)
    parts: list[tuple[str | None, Column]] = []
    pos = 0
    for m in _TOKEN_RE.finditer(template):
        if m.start() > pos:
            parts.append((None, F.lit(template[pos:m.start()])))
        if m.group("sized"):
            tok, n = m.group("sized"), int(m.group("n"))
            if tok.startswith("appendmd5_"):
                comp = _COMPONENTS[tok[len("appendmd5_"):]](url)
                parts.append((None, _append_md5_if_too_long(comp, n)))
            elif tok.startswith("md5_"):
                parts.append((None, _md5_n(_COMPONENTS[tok[4:]](url), n)))
            else:
                parts.append((None, _truncate(_COMPONENTS[tok](url), n)))
        elif m.group("maxfile"):
            parts.append((m.group("maxfile"), F.lit("")))
        elif m.group("dlfmt") is not None:
            parts.append((None, F.date_format(download_ts, _java_fmt(m.group("dlfmt")))))
        elif m.group("ts_dl"):
            parts.append((None, F.unix_timestamp(download_ts).cast("string")))
        elif m.group("legacy") == "domain":
            from news_please_spark.functions.urls import canonical_host

            parts.append((None, canonical_host(url)))
        elif m.group("legacy") == "md5_url":
            parts.append((None, F.md5(url)))
        elif m.group("legacy") == "url_file_name":
            from news_please_spark.functions.urls import url_filename

            parts.append((None, url_filename(url)))
        pos = m.end()
    if pos < len(template):
        parts.append((None, F.lit(template[pos:])))

    n_max = sum(1 for kind, _ in parts if kind)
    if n_max:
        # per-row budget: (260 - 1 - len(everything else)) / occurrences
        other_len = None
        for kind, col in parts:
            if kind:
                continue
            ln = F.length(col)
            other_len = ln if other_len is None else other_len + ln
        budget = F.floor((F.lit(259) - F.coalesce(other_len, F.lit(0))) / n_max).cast("int")
        fname = url_file_name(url)
        parts = [
            (
                kind,
                col
                if not kind
                else (
                    _append_md5_if_too_long(fname, budget)
                    if kind.startswith("appendmd5_")
                    else F.substring(fname, F.lit(1), F.greatest(budget, F.lit(0)))
                ),
            )
            for kind, col in parts
        ]

    out = F.concat(*[c for _, c in parts]) if parts else F.lit(template)
    # remove_not_allowed_chars (reference savepath_parser.py:218-230)
    return F.regexp_replace(out, r'<|>|:|"|\||\?|\*', "_")
