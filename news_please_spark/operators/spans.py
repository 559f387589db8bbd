"""Operators over the interleaved span-document table — the exact
input shape of BASELINE.json's input_hint:

    (doc_id: string, spans: array<struct<kind: string, text: string,
     media_ref: string, offset: int>>)

The extraction chain PRODUCES this shape (extract.article_to_spans);
these operators CONSUME it — the steps a training-data pipeline runs
over interleaved text + media documents after extraction:

* ``synth_spans``          — deterministic spans table from (doc_id,
                             text) rows, for tests/benchmarks (chunked
                             text spans with media spans interleaved
                             after every 2nd chunk, plus a planted
                             boilerplate banner on every 4th doc). The
                             DuckDB oracle re-derives the identical
                             table from the same arithmetic.
* ``span_stats``           — per-doc interleave statistics (span
                             counts by kind, text chars, kind
                             transitions in offset order). Zero
                             shuffle: one fold per row.
* ``render_interleaved``   — the training-sample view: text spans
                             joined in offset order with <kind>
                             placeholders where media sits. Zero
                             shuffle.
* ``boilerplate_spans``    — cross-doc duplicate span texts (the
                             "subscribe banner in 40k pages" signal):
                             explode text spans, md5 keys, doc-freq
                             with map-side combine — only fixed-width
                             hashes cross the shuffle.
* ``strip_boilerplate``    — drop flagged spans from every doc without
                             exploding the corpus: broadcast the (few)
                             flagged hashes and filter INSIDE the
                             spans array per row.

Expression discipline (see operators/repetition.py): every HOF lambda
here touches only its element values / accumulator — token arrays are
materialized to real columns before any per-element slicing, so
nothing is re-evaluated per element in interpreted eval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from news_please_spark.functions.text import tokens

SPAN_SCHEMA = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"

CHUNK_TOKENS = 10          # text-span width in tokens
MEDIA_EVERY = 2            # a media span after every 2nd text chunk
BANNER_EVERY = 4           # planted boilerplate banner on doc_id % 4 == 0
BANNER = "subscribe to our newsletter for daily updates"


def _span(kind, text, media_ref, offset) -> F.Column:
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        offset.cast("int").alias("offset"),
    )


def synth_spans(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, text) → (id, spans) in the input_hint shape, deterministic
    pure arithmetic (no RNG) so DuckDB rebuilds the SAME table:

      text chunks of CHUNK_TOKENS tokens at offsets i-1 + (i-1)//2,
      an image span after every MEDIA_EVERY-th chunk at offset 3j-1,
      and on every BANNER_EVERY-th doc the fixed BANNER text span at
      the end — the cross-doc duplicate that boilerplate_spans exists
      to find.
    """
    ns = F.lit(None).cast("string")
    d = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_toks"),
    ).select(
        id_col,
        "_toks",
        F.ceil(F.size("_toks") / CHUNK_TOKENS).cast("int").alias("_nc"),
    )
    # _toks is referenced by the chunk lambda below AND by _nc's
    # consumer projection — multiple references keep CollapseProject
    # from inlining the split into the per-element slice.
    text_spans = F.transform(
        F.sequence(F.lit(1), F.col("_nc")),
        lambda i: _span(
            F.lit("text"),
            F.array_join(F.slice(F.col("_toks"), (i - 1) * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "),
            ns,
            (i - 1) + F.floor((i - 1) / MEDIA_EVERY),
        ),
    )
    # guard: sequence(1, 0) generates DESCENDING [1, 0] in Spark — a
    # doc with fewer than MEDIA_EVERY chunks must get NO media spans,
    # not two phantom ones (j=0 lands at offset -1 and sorts first)
    n_media = F.floor(F.col("_nc") / MEDIA_EVERY).cast("int")
    media_spans = F.when(
        n_media > 0,
        F.transform(
            F.sequence(F.lit(1), n_media),
            lambda j: _span(
                F.lit("image"),
                ns,
                F.concat(
                    F.lit("img://"), F.col(id_col).cast("string"), F.lit("/"), j.cast("string")
                ),
                (MEDIA_EVERY + 1) * j - 1,
            ),
        ),
    ).otherwise(F.array().cast(SPAN_SCHEMA))
    # next free offset = total spans so far = nc text + nc//MEDIA_EVERY media
    banner_off = F.col("_nc") + F.floor(F.col("_nc") / MEDIA_EVERY)
    banner = F.when(
        F.col(id_col) % BANNER_EVERY == 0,
        F.array(_span(F.lit("text"), F.lit(BANNER), ns, banner_off)),
    ).otherwise(F.array().cast(SPAN_SCHEMA))
    unordered = F.concat(text_spans, media_spans, banner)
    spans = F.array_sort(unordered, lambda a, b: a["offset"] - b["offset"])
    return d.select(id_col, spans.alias("spans"))


def span_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-doc interleave statistics over the spans array — one pass,
    zero shuffle. n_transitions counts adjacent kind changes in offset
    order (the interleaving degree a multimodal sampler cares about)."""
    kinds = F.transform("spans", lambda s: s["kind"])
    stats = df.select(
        F.col(id_col),
        F.size("spans").alias("n_spans"),
        F.size(F.filter("spans", lambda s: s["kind"] == "text")).alias("n_text"),
        F.size(F.filter("spans", lambda s: s["kind"] != "text")).alias("n_media"),
        F.aggregate(
            "spans",
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
        ).alias("text_chars"),
        # both slices are length size-1: zip_with pads unequal lengths
        # with nulls, which would poison the sum
        F.aggregate(
            F.zip_with(
                F.slice(kinds, 1, F.greatest(F.size("spans") - 1, F.lit(0))),
                F.slice(kinds, 2, F.greatest(F.size("spans") - 1, F.lit(0))),
                lambda a, b: (a != b).cast("int"),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("n_transitions"),
    )
    return stats.select(
        id_col,
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_text").cast("long").alias("n_text"),
        F.col("n_media").cast("long").alias("n_media"),
        "text_chars",
        F.col("n_transitions").cast("long").alias("n_transitions"),
    )


def render_interleaved(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """spans → the flat training-sample string: text spans in offset
    order, media spans as <kind> placeholders. Assumes spans are
    already offset-ordered (synth_spans and article_to_spans both
    emit them ordered); zero shuffle."""
    piece = lambda s: F.when(  # noqa: E731 - tiny local expression
        s["kind"] == "text", s["text"]
    ).otherwise(F.concat(F.lit("<"), s["kind"], F.lit(">")))
    return df.select(
        F.col(id_col),
        F.array_join(F.transform("spans", piece), " ").alias("rendered"),
        F.size(F.filter("spans", lambda s: s["kind"] != "text"))
        .cast("long")
        .alias("n_media"),
    )


def boilerplate_spans(
    df: DataFrame, min_docs: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """(span_md5, n_docs) for every text-span content appearing in at
    least min_docs distinct docs. Only md5 keys cross the shuffle and
    the doc-frequency count is map-side combinable."""
    hashes = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.filter("spans", lambda s: s["kind"] == "text"),
                    lambda s: F.md5(F.lower(F.trim(s["text"]))),
                )
            )
        ).alias("span_md5"),
    )
    return (
        hashes.groupBy("span_md5")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


# above this many flagged hashes the broadcast-array path stops being
# safe: a single array cell approaches the 2 GB column-value limit at
# ~60M md5 strings and the per-span linear array_contains scan becomes
# the hot loop — route to the exploded anti-join instead
BROADCAST_MAX_FLAGS = 65_536


def strip_boilerplate(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    impl: str = "auto",
    broadcast_max_flags: int = BROADCAST_MAX_FLAGS,
) -> DataFrame:
    """Remove flagged boilerplate text spans from every doc. Two
    bit-identical plans, routed by MEASURED flag count (impl='auto'):

    impl='broadcast' — collect the flagged hashes into one sorted array
    and filter INSIDE each row's spans column. Right when the flagged
    set is genuinely small (no corpus explode, zero shuffle on the
    corpus side); wrong at design scale, where min_docs=2 over 10^10
    web docs flags a set no driver cell can hold.

    impl='exploded' — the scale shape: posexplode spans to
    (doc, pos, span) rows, left_anti the text spans against the flagged
    hash table on span_md5 (nulls — media spans — never match, so they
    survive), re-aggregate by doc sorting on pos, and left-join back to
    the doc-id spine so empty and fully-stripped docs keep their empty
    arrays. Everything is hash-partitioned narrow rows; no fat
    array cells, no driver collect.

    'auto' measures the flag count with a LIMIT-bounded job (scans stop
    at broadcast_max_flags+1 rows) — the same engine-held-statistics
    routing the frontier uses for its seen-set joins."""
    flagged = boilerplate_spans(df, min_docs, id_col).select("span_md5")
    if impl == "auto":
        n = flagged.limit(broadcast_max_flags + 1).count()
        impl = "broadcast" if n <= broadcast_max_flags else "exploded"
    if impl == "broadcast":
        flags = flagged.agg(F.sort_array(F.collect_list("span_md5")).alias("f"))
        return df.crossJoin(F.broadcast(flags)).select(
            F.col(id_col),
            F.filter(
                "spans",
                lambda s: (s["kind"] != "text")
                | ~F.array_contains(F.col("f"), F.md5(F.lower(F.trim(s["text"])))),
            ).alias("spans"),
        )
    ex = df.select(
        F.col(id_col), F.posexplode("spans").alias("pos", "s")
    ).withColumn(
        "_h",
        F.when(
            F.col("s.kind") == "text", F.md5(F.lower(F.trim(F.col("s.text"))))
        ),
    )
    kept = ex.join(flagged, ex["_h"] == flagged["span_md5"], "left_anti")
    agged = (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("s")))
            ).alias("_ps")
        )
        .select(
            id_col,
            F.transform("_ps", lambda x: x["s"]).alias("spans"),
        )
    )
    # docs whose spans were empty (posexplode drops them) or entirely
    # stripped (every row anti-joined away) must survive with []
    return df.select(id_col).join(agged, id_col, "left").select(
        id_col,
        F.coalesce(F.col("spans"), F.array().cast(SPAN_SCHEMA)).alias("spans"),
    )


def caption_pairs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Image-text pairing over the interleaved span table: for every
    media span, the nearest text span BEFORE it and the nearest AFTER
    it in offset order — the caption-candidate extraction that feeds
    image-caption training pairs out of interleaved web documents
    (input_hint shape; multimodal pairing is the training-data tier,
    no reference analogue).

    Plan: one posexplode (spans are per-doc bounded), one window
    partitioned by doc ordered by offset carrying last(text) /
    first(text) with ignorenulls over the before/after frames — a
    single Exchange on doc id, no self-join of the span table.  Media
    spans with no text neighbor on a side yield NULL for that side.

    Output: (id, media_ref, offset, caption_before, caption_after).
    """
    from pyspark.sql import Window

    ex = df.select(
        F.col(id_col), F.explode("spans").alias("s")
    ).select(
        id_col,
        F.col("s.kind").alias("_kind"),
        F.col("s.text").alias("_text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    txt = F.when(F.col("_kind") == "text", F.col("_text"))
    w = Window.partitionBy(id_col).orderBy("offset")
    before = w.rowsBetween(Window.unboundedPreceding, -1)
    after = w.rowsBetween(1, Window.unboundedFollowing)
    return (
        ex.withColumn("caption_before", F.last(txt, ignorenulls=True).over(before))
        .withColumn("caption_after", F.first(txt, ignorenulls=True).over(after))
        .filter(F.col("_kind") != "text")
        .select(id_col, "media_ref", "offset", "caption_before", "caption_after")
    )


def pack_interleaved(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    packer_hex: int = 2,
) -> DataFrame:
    """Pack interleaved span-documents into fixed ``seq_len``-token
    training windows — the multimodal twin of
    ``sampling.pack_sequences`` (same md5 packer shards, same window
    prefix-sum + integer-DIV chunk math), operating on the input_hint
    span table instead of flat text.

    Token convention: a text span contributes its whitespace token
    count (the convention shared with ``token_totals`` /
    ``pack_sequences``); a media span contributes exactly ONE
    placeholder token — ``render_interleaved``'s grain, so a packed
    chunk's token count equals the rendered sample's. Media atomicity
    is structural at this grain: a 1-token span can never straddle a
    chunk boundary, so images are never cut in half; text spans may
    split across chunks like any document tail.

    Output: one row per (span × chunk it occupies) —
    ``(packer, chunk, id, span_idx, kind, media_ref, n_tok, tok_start,
    tok_end, span_off)`` where ``[tok_start, tok_end)`` is the slice of
    the chunk the span fills and ``span_off`` is the first packed
    token's offset inside the span. Ordering is md5(id) inside 16^k
    packer shards (deterministic, partitioning-independent, no global
    sort task); spans keep their offset order inside each document, so
    every chunk is a valid interleaved sample prefix/suffix.

    Plan: one fold per row for the in-doc prefix sums (array HOFs, no
    explode before the window), ONE shuffle for the per-packer doc
    window, then posexplode + chunk sequence — the same shape that
    holds at the 10^10-doc design point with packer_hex=4.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    key = F.md5(F.col(id_col).cast("string"))
    spans = F.array_sort(
        F.col("spans"), lambda a, b: a["offset"] - b["offset"]
    )
    n_toks = F.transform(
        spans,
        lambda s: F.when(
            s["kind"] == "text",
            F.size(F.split(F.trim(s["text"]), r"\s+")).cast("long"),
        ).otherwise(F.lit(1).cast("long")),
    )
    base = df.select(
        F.col(id_col),
        key.alias("_key"),
        F.substring(key, 1, packer_hex).alias("packer"),
        spans.alias("_spans"),
        n_toks.alias("_ntoks"),
    )
    # in-doc start offset per span: one fold building the prefix-sum
    # array (acc struct carries the array + running total)
    zero = F.struct(
        F.array().cast("array<long>").alias("arr"),
        F.lit(0).cast("long").alias("tot"),
    )
    pref = F.aggregate(
        F.col("_ntoks"),
        zero,
        lambda acc, x: F.struct(
            F.concat(acc["arr"], F.array(acc["tot"])).alias("arr"),
            (acc["tot"] + x).alias("tot"),
        ),
    )
    staged = base.select(
        id_col, "_key", "packer", "_spans", "_ntoks",
        pref["arr"].alias("_offs"),
        pref["tot"].alias("_doc_tok"),
    )
    w = (
        Window.partitionBy("packer")
        .orderBy("_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    started = staged.select(
        id_col, "packer", "_spans", "_ntoks", "_offs",
        F.coalesce(F.sum("_doc_tok").over(w), F.lit(0)).alias("_start"),
    )
    rows = started.select(
        id_col,
        "packer",
        "_start",
        F.posexplode(F.arrays_zip("_spans", "_ntoks", "_offs")).alias(
            "span_idx", "z"
        ),
    ).select(
        id_col,
        "packer",
        F.col("span_idx").cast("long").alias("span_idx"),
        F.col("z._spans.kind").alias("kind"),
        F.col("z._spans.media_ref").alias("media_ref"),
        F.col("z._ntoks").alias("n_tok"),
        (F.col("_start") + F.col("z._offs")).alias("_g0"),
        (F.col("_start") + F.col("z._offs") + F.col("z._ntoks")).alias("_g1"),
    )
    L = F.lit(int(seq_len)).cast("long")
    chunked = rows.select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"_g0 DIV {int(seq_len)}"),
                F.expr(f"(_g1 - 1) DIV {int(seq_len)}"),
            )
        ).alias("chunk"),
    )
    lo = F.greatest(F.col("_g0"), F.col("chunk") * L)
    hi = F.least(F.col("_g1"), (F.col("chunk") + 1) * L)
    return chunked.select(
        "packer",
        F.col("chunk").cast("long").alias("chunk"),
        F.col(id_col),
        "span_idx",
        "kind",
        "media_ref",
        "n_tok",
        (lo - F.col("chunk") * L).alias("tok_start"),
        (hi - F.col("chunk") * L).alias("tok_end"),
        (lo - F.col("_g0")).alias("span_off"),
    )


def redact_spans(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """PII redaction INSIDE the interleaved span table: every text
    span's content goes through the same fixed-order regexp chain as
    ``decontam.redact_pii`` (email → ip → phone, each kind counted on
    the text as already redacted of earlier kinds); media spans pass
    through untouched, offsets and interleave order are preserved — the
    hygiene step for multimodal training data where flattening to one
    string would lose the media structure.

    Output: id, spans (redacted, same schema/order), n_email / n_ip /
    n_phone per-doc counts. Pure per-row Column expressions (array
    HOFs over the spans), zero shuffle.
    """
    from news_please_spark.operators.decontam import _PII

    def chain(text):
        """(redacted_text, [count per kind]) as Columns."""
        counts = []
        t = text
        for kind, pat in _PII:
            counts.append(
                F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("long")
            )
            t = F.regexp_replace(t, pat, f"<{kind.upper()}>")
        return t, counts

    def span_clean(s):
        t, _ = chain(s["text"])
        return F.struct(
            s["kind"].alias("kind"),
            F.when(s["kind"] == "text", t).otherwise(s["text"]).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        )

    def kind_total(i):
        def per_span(acc, s):
            _, counts = chain(s["text"])
            return acc + F.when(s["kind"] == "text", counts[i]).otherwise(
                F.lit(0).cast("long")
            )

        return F.aggregate(F.col("spans"), F.lit(0).cast("long"), per_span)

    return df.select(
        F.col(id_col),
        F.transform(F.col("spans"), span_clean).alias("spans"),
        *[
            kind_total(i).alias(f"n_{kind}") for i, (kind, _) in enumerate(_PII)
        ],
    )


def media_dedup(
    df: DataFrame,
    content_key=None,
    id_col: str = "doc_id",
    min_docs: int = 1,
) -> DataFrame:
    """Cross-doc duplicate MEDIA detection over the interleaved span
    table — the media twin of `boilerplate_spans`: site logos, stock
    photos, and tracking pixels repeat across documents, and a
    multimodal sampler wants them deduplicated (or at least counted)
    before image-text pairs are drawn.

    Media spans (kind != 'text', media_ref set) are keyed by a content
    identity: ``content_key`` is a callable Column→Column over
    media_ref (default md5 — in production the media store's content
    hash, which travels on the ref).  Per key:

        n_docs            distinct documents embedding the asset
        n_spans           total occurrences
        canonical_doc/    the lexicographically smallest (doc, offset)
        canonical_offset  occurrence — the copy a dedup pass keeps

    Scale shape: one explode of per-doc-bounded span arrays, then a
    single aggregation where only (key, doc, offset) rows cross the
    shuffle — counts are map-side combinable and the canonical pick is
    one `min(struct(doc, offset))` in the same aggregate (no window, no
    self-join).  ``min_docs >= 2`` restricts output to actual
    cross-doc duplicates, keeping the result at shared-asset
    cardinality rather than corpus cardinality."""
    keyfn = content_key or (lambda ref: F.md5(ref))
    m = df.select(
        F.col(id_col), F.explode("spans").alias("s")
    ).filter(
        (F.col("s.kind") != F.lit("text")) & F.col("s.media_ref").isNotNull()
    ).select(
        keyfn(F.col("s.media_ref")).alias("media_key"),
        F.col(id_col),
        F.col("s.offset").alias("_off"),
    )
    g = m.groupBy("media_key").agg(
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.min(F.struct(F.col(id_col), F.col("_off"))).alias("_c"),
    )
    out = g.select(
        "media_key",
        "n_docs",
        "n_spans",
        F.col(f"_c.{id_col}").alias("canonical_doc"),
        F.col("_c._off").cast("long").alias("canonical_offset"),
    )
    if min_docs > 1:
        out = out.filter(F.col("n_docs") >= min_docs)
    return out


def span_integrity(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Span-sequence integrity audit — the per-row invariant the engine
    contracts to preserve (BASELINE.json input_hint: span-sequence
    equality on kind, text, media_ref, order) checked as data-quality
    counters per document over the spans ARRAY:

      dup_offsets   spans sharing an offset slot (n_spans − distinct
                    offsets) — order is undefined under duplicates
      gaps          missing slots in 0..max(offset) — a dangling
                    offset far beyond the sequence shows up here
      media_no_ref  media-kind spans with a NULL/empty media_ref
      text_with_ref text spans carrying a media_ref
      empty_text    text spans with NULL/empty text
      ok            every counter zero

    Zero shuffle — size/filter/array_distinct folds riding the scan
    (the spans table arrives array-shaped; no explode, no groupBy).
    Run it before pack/render: both assume well-formed offset order."""
    offs = F.transform("spans", lambda s: s["offset"])
    nd = F.size(F.array_distinct(offs))
    blank = lambda c: c.isNull() | (F.length(c) == 0)  # noqa: E731
    out = df.select(
        F.col(id_col),
        F.size("spans").cast("long").alias("n_spans"),
        (F.size("spans") - nd).cast("long").alias("dup_offsets"),
        F.when(F.size("spans") > 0, F.array_max(offs) + 1 - nd)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("gaps"),
        F.size(
            F.filter("spans", lambda s: (s["kind"] != "text") & blank(s["media_ref"]))
        ).cast("long").alias("media_no_ref"),
        F.size(
            F.filter("spans", lambda s: (s["kind"] == "text") & ~blank(s["media_ref"]))
        ).cast("long").alias("text_with_ref"),
        F.size(
            F.filter("spans", lambda s: (s["kind"] == "text") & blank(s["text"]))
        ).cast("long").alias("empty_text"),
    )
    ok = (
        (F.col("dup_offsets") == 0)
        & (F.col("gaps") == 0)
        & (F.col("media_no_ref") == 0)
        & (F.col("text_with_ref") == 0)
        & (F.col("empty_text") == 0)
    )
    return out.withColumn("ok", ok)


def host_template_spans(
    spans_df: DataFrame,
    hosts: DataFrame,
    min_docs: int = 2,
    min_share_bp: int = 2000,
    id_col: str = "doc_id",
    host_col: str = "source",
) -> DataFrame:
    """Per-host template mining — the site-template grain of
    boilerplate_spans.  A global doc-frequency threshold over-flags at
    corpus scale (any two docs quoting the same sentence) and
    under-flags real site chrome (a nav bar unique to one small host);
    the real-world criterion is RELATIVE: a text span present in at
    least `min_share_bp`/10^4 of ITS HOST's documents (and at least
    `min_docs` of them) is that host's template.

    hosts: one row per document, (id_col, host_col) — the denominator
    is ALL of the host's docs, including empty/template-free ones.

    Returns (source, span_md5, n_docs, host_docs, share_bp),
    share_bp = (10^4 * n_docs) // host_docs.

    Scale shape: explode text spans → distinct (doc, md5) → one hash
    join to the doc→host spine → per-(host, md5) count with map-side
    combine; only fixed-width hashes and host keys cross the shuffle,
    and the per-host doc counts are a host-cardinality table joined on
    its own key.  No corpus-proportional broadcast, no driver state."""
    ex = spans_df.select(
        F.col(id_col), F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "text")
    dm = ex.select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col("s.text")))).alias("span_md5"),
    ).distinct()
    spine = hosts.select(F.col(id_col), F.col(host_col))
    ag = (
        dm.join(spine, id_col)
        .groupBy(host_col, "span_md5")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    hd = spine.groupBy(host_col).agg(
        F.count(F.lit(1)).cast("long").alias("host_docs")
    )
    return (
        ag.join(hd, host_col)
        .withColumn("share_bp", F.expr("(10000 * n_docs) DIV host_docs"))
        .filter(
            (F.col("n_docs") >= min_docs)
            & (F.col("share_bp") >= min_share_bp)
        )
        .select(host_col, "span_md5", "n_docs", "host_docs", "share_bp")
    )


def dangling_media_refs(
    spans: DataFrame,
    manifest: DataFrame,
    ref_col: str = "media_ref",
) -> DataFrame:
    """Media spans whose reference is absent from the blob manifest —
    the integrity audit that runs BEFORE any media fetch/decode job,
    turning would-be per-row decode failures into one re-fetch queue
    (the interleaved-payload analogue of the WARC completed-set check:
    never start a 10^10-row decode pass against storage you haven't
    reconciled).

    Returns the dangling span rows unchanged (join back to docs for
    per-source rates).

    Scale shape: ONE left_anti equi-join on the fixed-width ref key;
    the manifest side is statistics-free here — at blob-store scale
    both sides are huge, so the anti-join hash-partitions on ref (the
    clean_corpus size-routing applies if a caller knows the manifest
    is small)."""
    m = manifest.select(F.col(ref_col).alias("_ref")).distinct()
    return spans.filter(F.col(ref_col).isNotNull()).join(
        m, spans[ref_col] == m["_ref"], "left_anti"
    )
