"""Deterministic span-document world (FIXTURES.md §1/§4).

One arithmetic spec, two views:
  * pure-Python: expected spans / expected article per doc (the
    extraction oracle — golden fixtures, SURVEY.md §5.3/§5.4),
  * Spark: distributed HTML rendering via mapInPandas over spark.range
    (generation scales with the cluster; nothing is built on the driver).

Every document embeds its metadata in a different HTML shape so the
extraction cascades are exercised:
  * date markup rotates through 17 variants of the reference
    DateExtractor's catalog (JSON-LD, article:published_time, meta
    name=date/pubdate/sailthru.date/published-date, bt:pubDate,
    itemprop datePublished/dcterms.date, <time datetime>,
    <span class="article_date">, URL path date, RFC-1123,
    'Month D, YYYY', dotted D.M.YYYY, compact YYYYMMDDHHMM,
    slash YYYY/MM/DD; reference date_extractor.py:99-254),
  * language markup rotates through the LangExtractor cascade
    (html@lang → xml:lang → meta name=language → og:locale → text
    fallback; reference lang_detect_extractor.py:30-68). Fallback docs
    (v_lang==4) carry language-specific stopword filler (en/de/es) so
    the multi-language text detector is exercised,
  * og:type and linked-headline counts vary for the heuristics H1-H7.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from news_please_spark.world import _mix_py as mix

WORDS = [
    "news", "market", "election", "storm", "science", "city", "health",
    "game", "culture", "travel", "energy", "court", "film", "music",
    "space", "tech", "food", "art", "trade", "policy",
]
LANGS = ["en", "de", "es", "fr", "it"]
EPOCH = datetime(2020, 1, 1)

# ---------------------------------------------------------------------------
# markup permutation axis: every tag's attribute ORDER (deterministic
# rotation) and per-attribute QUOTE STYLE (double / single / unquoted
# when legal) vary per document, so the extraction regexes are forced to
# behave like the reference's real HTML parser (bs4 reads parsed
# attributes; <meta content=... property=og:title> is as common on the
# web as the canonical order). The EXPECTED values never change — only
# the markup shape — so the golden/SQL oracles exercise the robustness.

import re as _re

_UNQUOTABLE = _re.compile(r"[\s\"'`=<>]")

# open/close tag names (anchored at '<' / '</') for the markup-case axis
_TAG_NAME_RE = _re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)")


def _attr_str(k: str, v: str, style: int) -> str:
    if style == 2 and v and not _UNQUOTABLE.search(v):
        return f"{k}={v}"
    if style == 1 and "'" not in v:
        return f"{k}='{v}'"
    return f'{k}="{v}"'


def _render_tag(
    d: int,
    salt: int,
    name: str,
    attrs: list[tuple[str, str]],
    inner: str | None = None,
) -> str:
    rot = mix(d, 9000 + salt) % len(attrs) if attrs else 0
    ordered = attrs[rot:] + attrs[:rot]
    parts = [name] + [
        _attr_str(k, v, mix(d, 9100 + salt * 16 + i) % 3)
        for i, (k, v) in enumerate(ordered)
    ]
    open_tag = "<" + " ".join(parts) + ">"
    return open_tag if inner is None else f"{open_tag}{inner}</{name}>"


def _words(d: int, salt: int, n: int) -> list[str]:
    return [WORDS[mix(d, salt * 100 + i) % len(WORDS)] for i in range(n)]


# entity-axis suffixes (spec stores the DECODED form; html() encodes)
TITLE_SUFFIX = " – Q&A"
DESC_SUFFIX = " … “word” & more’s"

# char → (named, numeric) entity forms; '&' FIRST so later replacements'
# own ampersands are never re-encoded (single-pass, bs4-compatible)
_ENC_PAIRS = [
    ("&", ("&amp;", "&#38;")),
    ("–", ("&ndash;", "&#8211;")),
    ("…", ("&hellip;", "&#8230;")),
    ("“", ("&ldquo;", "&#8220;")),
    ("”", ("&rdquo;", "&#8221;")),
    ("’", ("&rsquo;", "&#8217;")),
]


def _enc(text: str, d: int, salt: int) -> str:
    """Entity-encode the special characters of the entity axis, choosing
    named vs numeric form per (doc, site, char) deterministically."""
    for i, (ch, forms) in enumerate(_ENC_PAIRS):
        if ch in text:
            text = text.replace(ch, forms[mix(d, 9500 + salt * 8 + i) % 2])
    return text


# locale-independent name tables (strftime %a/%b vary with locale)
_WDAYS = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_MONS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MONS_FULL = ["January", "February", "March", "April", "May", "June",
              "July", "August", "September", "October", "November", "December"]


def _rfc1123(date_publish: str) -> str:
    """'YYYY-MM-DD HH:MM:SS' → 'Tue, 04 Mar 2021 05:06:07 GMT'."""
    dt = datetime.strptime(date_publish, "%Y-%m-%d %H:%M:%S")
    return (
        f"{_WDAYS[dt.weekday()]}, {dt.day:02d} {_MONS[dt.month - 1]} "
        f"{dt.year} {dt.hour:02d}:{dt.minute:02d}:{dt.second:02d} GMT"
    )


def _human_date(date_publish: str) -> str:
    """'YYYY-MM-DD ...' → 'March 4, 2021' (date only)."""
    dt = datetime.strptime(date_publish[:10], "%Y-%m-%d")
    return f"{_MONS_FULL[dt.month - 1]} {dt.day}, {dt.year}"


def _dotted_date(date_publish: str) -> str:
    """'YYYY-MM-DD ...' → '4.3.2021' (date only, no zero padding)."""
    dt = datetime.strptime(date_publish[:10], "%Y-%m-%d")
    return f"{dt.day}.{dt.month}.{dt.year}"


def _compact_date(date_publish: str) -> str:
    """'YYYY-MM-DD HH:MM:SS' → 'YYYYMMDDHHMM' (the reference's
    publishdate catalog shape '201511261006', minute precision)."""
    dt = datetime.strptime(date_publish, "%Y-%m-%d %H:%M:%S")
    return dt.strftime("%Y%m%d%H%M")


def _slash_date(date_publish: str) -> str:
    """'YYYY-MM-DD ...' → 'YYYY/MM/DD' (date only)."""
    dt = datetime.strptime(date_publish[:10], "%Y-%m-%d")
    return f"{dt.year}/{dt.month:02d}/{dt.day:02d}"


@dataclass
class DocSpec:
    doc_id: str
    url: str
    title: str
    description: str
    paragraphs: list[str]
    image_path: str | None   # relative; absolute form in image_url
    image_url: str | None
    authors: list[str]
    date_publish: str        # 'YYYY-MM-DD HH:MM:SS'
    language: str
    v_date: int
    v_lang: int
    og_article: bool
    n_headlines: int
    n_linked: int
    host: str


class DocWorld:
    def __init__(self, n_docs: int):
        self.n_docs = n_docs

    # ---- spec -----------------------------------------------------------
    N_DATE_VARIANTS = 17
    URL_DATE_VARIANT = 5  # the only variant whose date lives in the URL
    # variants whose markup carries only a calendar date (URL path date,
    # 'March 4, 2021' span, D.M.YYYY meta, YYYY/MM/DD meta) — expected
    # timestamp is midnight
    DATE_ONLY_VARIANTS = (5, 13, 14, 16)
    # compact numeric publishdate (YYYYMMDDHHMM) drops seconds —
    # expected timestamp truncates to the minute
    MINUTE_ONLY_VARIANTS = (15,)

    # html(d) re-derives the spec and pipeline callers also ask for it
    # (url), so the render path paid spec() twice per page — profiled at
    # ~30% of the whole extraction chain. Specs are pure functions of d;
    # a bounded per-instance cache halves that. (Keyed by (self, d):
    # worlds are worker-lifetime objects, the retained self is fine.)
    @lru_cache(maxsize=8192)
    def spec(self, d: int) -> DocSpec:
        host = f"h{mix(d, 21) % 20}.news-example.org"
        v_date = d % self.N_DATE_VARIANTS
        v_lang = d % 5
        # v_lang==4 has no lang markup → detector falls back to the
        # multi-language stopword vote (en/de/es vocabularies); the
        # paragraph filler word carries the language signal
        lang = ("en", "de", "es")[mix(d, 24) % 3] if v_lang == 4 else LANGS[mix(d, 24) % 5]
        filler = {"en": "the", "de": "der", "es": "el"}[lang] if v_lang == 4 else "the"
        dt = EPOCH + timedelta(
            days=mix(d, 22) % 1500, seconds=mix(d, 23) % 86400
        )
        date_str = dt.strftime("%Y-%m-%d %H:%M:%S")
        title_words = _words(d, 1, 4 + d % 3)
        title = " ".join(w.capitalize() for w in title_words)
        description = " ".join(_words(d, 2, 8))
        # entity axis: every fourth doc carries punctuation that real
        # pages ship entity-encoded (en dash, ellipsis, curly quotes,
        # ampersand); html() encodes these (named or numeric form per
        # site, mix-chosen), the EXPECTED text stays decoded — so the
        # golden + SQL oracles exercise the cleaner's entity catalog
        if mix(d, 62) % 4 == 0:
            title = title + TITLE_SUFFIX
            description = description + DESC_SUFFIX
        n_para = 2 + mix(d, 25) % 3
        paragraphs = [
            " ".join([filler] + _words(d, 3 + i, 24 + mix(d, 30 + i) % 16))
            for i in range(n_para)
        ]
        image_path = f"/media/img{d}.jpg" if d % 4 == 0 else None
        image_url = f"https://{host}{image_path}" if image_path else None
        # 1-3 authors; every third doc carries them as a JSON-LD author
        # array instead of <meta name=author> tags (both shapes are
        # common; newspaper4k reads either)
        n_auth = 1 + mix(d, 26) % 3
        # stride 7 is coprime with 20 → the names are always DISTINCT
        # (the JSON-LD author path dedups, so the spec must too)
        authors = [
            f"Alex {WORDS[(mix(d, 27) + i * 7) % 20].capitalize()}"
            for i in range(n_auth)
        ]
        slug = "-".join(title_words)
        if v_date == self.URL_DATE_VARIANT:
            path = f"/{dt.year}/{dt.month:02d}/{dt.day:02d}/{slug}.html"
        else:
            path = f"/articles/{slug}-{d}.html"
        url = f"https://{host}{path}"
        n_headlines = 2 + d % 7
        n_linked = mix(d, 28) % (n_headlines + 1)
        return DocSpec(
            doc_id=f"doc{d}",
            url=url,
            title=title,
            description=description,
            paragraphs=paragraphs,
            image_path=image_path,
            image_url=image_url,
            authors=authors,
            date_publish=date_str,
            language=lang,
            v_date=v_date,
            v_lang=v_lang,
            og_article=(d % 7 != 0),
            n_headlines=n_headlines,
            n_linked=n_linked,
            host=host,
        )

    # ---- oracle views ----------------------------------------------------
    def expected_spans(self, d: int) -> list[tuple[str, str, str, int]]:
        s = self.spec(d)
        spans: list[tuple[str, str, str, int]] = []
        spans.append(("title", s.title, "", 0))
        spans.append(("description", s.description, "", 1))
        off = 2
        if s.image_url:
            spans.append(("media", "", s.image_url, off))
            off += 1
        for p in s.paragraphs:
            spans.append(("text", p, "", off))
            off += 1
        return spans

    def expected_article(self, d: int) -> dict:
        s = self.spec(d)
        # date-only variants carry just the calendar date (URL path,
        # human 'Month D, YYYY', dotted D.M.YYYY, YYYY/MM/DD), so the
        # expected timestamp is midnight; the compact numeric variant
        # carries minute precision — seconds truncate to :00
        if s.v_date in self.DATE_ONLY_VARIANTS:
            date = s.date_publish[:10] + " 00:00:00"
        elif s.v_date in self.MINUTE_ONLY_VARIANTS:
            date = s.date_publish[:16] + ":00"
        else:
            date = s.date_publish
        return {
            "url": s.url,
            "source_domain": s.host,
            "title": s.title,
            "description": s.description,
            "maintext": "\n".join(s.paragraphs),
            "authors": s.authors,
            "date_publish": date,
            "image_url": s.image_url,
            "language": s.language,
        }

    # ---- html rendering ----------------------------------------------------
    def html(self, d: int) -> str:
        s = self.spec(d)
        iso = s.date_publish.replace(" ", "T")
        meta = lambda salt, *attrs: _render_tag(d, salt, "meta", list(attrs))  # noqa: E731
        head: list[str] = []
        html_attrs: list[tuple[str, str]] = []
        if s.v_lang == 0:
            html_attrs = [("lang", s.language)]
        elif s.v_lang == 1:
            html_attrs = [("xml:lang", s.language)]
        elif s.v_lang == 2:
            head.append(meta(2, ("name", "language"), ("content", s.language)))
        elif s.v_lang == 3:
            head.append(
                meta(3, ("property", "og:locale"), ("content", f"{s.language}_XX"))
            )
        head.append(f"<title>{_enc(s.title, d, 0)} - Example Site</title>")
        head.append(meta(5, ("property", "og:title"), ("content", _enc(s.title, d, 1))))
        head.append(
            meta(6, ("name", "description"), ("content", _enc(s.description, d, 2)))
        )
        if mix(d, 29) % 3 == 0:
            payload = ", ".join(f'{{"name": "{a}"}}' for a in s.authors)
            head.append(
                _render_tag(
                    d, 15, "script",
                    [("type", "application/ld+json")],
                    f'{{"@type": "Article", "author": [{payload}]}}',
                )
            )
        else:
            for i, a in enumerate(s.authors):
                head.append(meta(70 + i, ("name", "author"), ("content", a)))
        if s.og_article:
            head.append(meta(8, ("property", "og:type"), ("content", "article")))
        if s.image_path:
            head.append(meta(9, ("property", "og:image"), ("content", s.image_path)))
        time_tag = ""
        date_span = ""
        if s.v_date == 0:
            head.append(
                _render_tag(
                    d, 10, "script",
                    [("type", "application/ld+json")],
                    f'{{"@type": "NewsArticle", "datePublished": "{iso}"}}',
                )
            )
        elif s.v_date == 1:
            head.append(
                meta(11, ("property", "article:published_time"), ("content", iso))
            )
        elif s.v_date == 2:
            head.append(meta(11, ("name", "date"), ("content", iso)))
        elif s.v_date == 3:
            time_tag = _render_tag(d, 12, "time", [("datetime", iso)], "published")
        elif s.v_date == 4:
            head.append(meta(11, ("itemprop", "datePublished"), ("content", iso)))
        # v_date == 5: only the URL carries the date
        elif s.v_date == 6:
            head.append(meta(11, ("name", "pubdate"), ("content", iso)))
        elif s.v_date == 7:
            head.append(meta(11, ("name", "sailthru.date"), ("content", iso)))
        elif s.v_date == 8:
            head.append(meta(11, ("property", "bt:pubDate"), ("content", iso)))
        elif s.v_date == 9:
            head.append(meta(11, ("itemprop", "dcterms.date"), ("content", iso)))
        elif s.v_date == 10:
            date_span = _render_tag(d, 13, "span", [("class", "article_date")], iso)
        elif s.v_date == 11:
            head.append(meta(11, ("name", "published-date"), ("content", iso)))
        elif s.v_date == 12:
            # RFC-1123 (the wire format of RSS pubDate / Last-Modified)
            head.append(meta(11, ("name", "date"), ("content", _rfc1123(s.date_publish))))
        elif s.v_date == 13:
            # human US form, date-only → expected midnight
            date_span = _render_tag(
                d, 13, "span", [("class", "article_date")], _human_date(s.date_publish)
            )
        elif s.v_date == 14:
            # European dotted D.M.YYYY, date-only → expected midnight
            head.append(meta(11, ("name", "pubdate"), ("content", _dotted_date(s.date_publish))))
        elif s.v_date == 15:
            # compact numeric YYYYMMDDHHMM (reference publishdate
            # example, date_extractor.py:112-115) → minute precision
            head.append(meta(11, ("name", "publishdate"), ("content", _compact_date(s.date_publish))))
        elif s.v_date == 16:
            # slash textual YYYY/MM/DD, date-only → expected midnight
            head.append(meta(11, ("name", "date"), ("content", _slash_date(s.date_publish))))
        # malformed-markup axis (every third doc): the real-web breakage
        # classes a regex pipeline must survive like lxml does —
        # commented-out markup (with a NESTED comment opener: HTML5 ends
        # the comment at the FIRST -->), CDATA sections, an unclosed
        # <div>, and a '>' inside a quoted attribute value. EXPECTED
        # values never change: a real parser surfaces none of these to
        # the extractors, so neither may the extraction chain.
        malformed = mix(d, 63) % 3 == 0
        if malformed:
            # decoy date FIRST in head: a first-wins meta scan that fails
            # to strip comments picks 1999 over the real date
            head.insert(
                0,
                '<!-- <meta name="date" content="1999-09-09T09:09:09">'
                "<!-- nested opener -->",
            )
        body: list[str] = [f"<h1>{_enc(s.title, d, 3)}</h1>", time_tag, date_span]
        if malformed:
            body.insert(0, '<div class="promo-banner">')  # never closed
        for i in range(s.n_headlines):
            h = f"section {WORDS[mix(d, 40 + i) % 20]}"
            if i < s.n_linked:
                a = _render_tag(d, 20 + i, "a", [("href", f"https://{s.host}/s/{i}")], h)
                body.append(f"<h2>{a}</h2>")
            else:
                body.append(f"<h2>{h}</h2>")
        if malformed:
            # '>' inside a quoted attribute value: a naive <article[^>]*>
            # scan ends the tag mid-attribute and leaks `y">` residue
            # into maintext
            body.append(
                _render_tag(d, 16, "article", [("data-note", "x > y")])
            )
        else:
            body.append("<article>")
        if s.image_path:
            body.append(_render_tag(d, 14, "img", [("src", s.image_path), ("alt", "")]))
        for p in s.paragraphs:
            body.append(f"<p>{p}</p>")
        if malformed:
            # commented-out and CDATA'd paragraphs INSIDE the article
            # block: unless stripped, both leak into maintext
            body.append("<!-- <p>subscribe decoy paragraph</p> -->")
            body.append("<![CDATA[ <p>cdata decoy paragraph</p> ]]>")
        body.append("</article>")
        doc = (
            f"{_render_tag(d, 1, 'html', html_attrs)}<head>{''.join(head)}</head>"
            f"<body>{''.join(body)}</body></html>"
        )
        if mix(d, 61) % 5 == 0:
            # markup-case axis: every fifth doc UPPERCASES its tag names
            # (values and text untouched) — real pages mix <META>/<TITLE>
            # shapes, and the reference's lxml lowercases them before any
            # extractor runs. Safe textual transform: '<' never occurs in
            # DocWorld attr values or text, so the pattern only ever hits
            # real open/close tags.
            doc = _TAG_NAME_RE.sub(lambda m: "<" + m.group(1) + m.group(2).upper(), doc)
        return doc

    # ---- spark generation ----------------------------------------------
    def responses_df(self, spark: SparkSession, num_partitions: int | None = None) -> DataFrame:
        """Distributed render: one fetched-page row per doc."""
        n = self.n_docs
        world = self

        def render(batches):
            for pdf in batches:
                ids = pdf["id"].tolist()
                yield pd.DataFrame(
                    {
                        "doc_id": [f"doc{d}" for d in ids],
                        "url": [world.spec(d).url for d in ids],
                        "status": [200] * len(ids),
                        "content_type": ["text/html"] * len(ids),
                        "html": [world.html(d) for d in ids],
                    }
                )

        rng = spark.range(0, n, 1, num_partitions or max(4, n // 5000))
        return rng.mapInPandas(
            render,
            "doc_id string, url string, status int, content_type string, html string",
        )

    def spans_df(self, spark: SparkSession) -> DataFrame:
        """The input_hint `documents` table: (doc_id, spans array<struct>)."""
        from news_please_spark.schemas import SPAN_DOCUMENTS

        rows = [
            (f"doc{d}", self.expected_spans(d)) for d in range(self.n_docs)
        ]
        return spark.createDataFrame(rows, SPAN_DOCUMENTS)
