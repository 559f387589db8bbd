"""E5 Cleaner — tag-strip + entity + whitespace normalization as native
Column expressions (reference pipeline/extractor/cleaner.py:22-99; its
five compiled regexes become a regexp_replace chain, codegen'd JVM-side,
applied to every candidate field via a higher-order `transform` over the
candidates array — no Python in the loop)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Entity catalog shared by the native chain and the fused-path Python
# mirror (extract.py imports THIS list — one source of truth).  Ordered
# so `&amp;` decodes LAST: bs4 (the reference's parser) decodes in a
# single pass, so `&amp;lt;` means the literal text `&lt;`, not `<` —
# replacing `&amp;` first would double-decode.  Covers the named +
# numeric forms that dominate real pages (curly quotes, dashes,
# ellipsis, nbsp) beyond the XML five.
_ENTITIES = [
    ("&quot;", '"'), ("&#34;", '"'),
    ("&#39;", "'"), ("&#x27;", "'"), ("&apos;", "'"),
    ("&nbsp;", " "), ("&#160;", " "),
    ("&lt;", "<"), ("&#60;", "<"),
    ("&gt;", ">"), ("&#62;", ">"),
    ("&lsquo;", "‘"), ("&#8216;", "‘"),
    ("&rsquo;", "’"), ("&#8217;", "’"), ("&#x2019;", "’"),
    ("&ldquo;", "“"), ("&#8220;", "“"),
    ("&rdquo;", "”"), ("&#8221;", "”"),
    ("&ndash;", "–"), ("&#8211;", "–"),
    ("&mdash;", "—"), ("&#8212;", "—"),
    ("&hellip;", "…"), ("&#8230;", "…"),
    ("&amp;", "&"), ("&#38;", "&"),
]


def ws_trim(c: Column) -> Column:
    """Strip leading/trailing whitespace INCLUDING newlines — the exact
    Column image of Python str.strip() (F.trim strips spaces only, which
    would diverge from the fused path on newline-framed fields)."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def clean_text(c: Column) -> Column:
    """strip tags → decode common entities → collapse whitespace → trim."""
    out = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, r"[ \t\x0b\r\f]+", " ")       # horizontal ws
    out = F.regexp_replace(out, r" ?\n ?", "\n")              # tidy newlines
    out = F.regexp_replace(out, r"\n{2,}", "\n")              # collapse blank lines
    return ws_trim(out)


def empty_to_null(c: Column) -> Column:
    """P1 projection rule: empty string → NULL (reference
    pipelines.py:298-330)."""
    return F.when(F.length(c) == 0, F.lit(None)).otherwise(c)


def clean_candidates(cands: Column) -> Column:
    """Apply the cleaner to every text field of every candidate struct —
    one `transform`, still a single codegen stage."""
    return F.transform(
        cands,
        lambda c: F.struct(
            c["extractor"].alias("extractor"),
            clean_text(c["title"]).alias("title"),
            clean_text(c["description"]).alias("description"),
            clean_text(c["text"]).alias("text"),
            ws_trim(c["topimage"]).alias("topimage"),
            F.transform(c["author"], lambda a: ws_trim(a)).alias("author"),
            ws_trim(c["publish_date"]).alias("publish_date"),
            ws_trim(c["language"]).alias("language"),
        ),
    )
