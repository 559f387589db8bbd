"""Interleaved span-document operators (input_hint shape) vs pure-Python
oracles, plus the guard rails: sub-chunk docs (no media spans), empty
text, banner planting, boilerplate stripping."""

from pyspark.sql import functions as F

from news_please_spark.operators.spans import (
    BANNER,
    boilerplate_spans,
    render_interleaved,
    span_stats,
    strip_boilerplate,
    synth_spans,
)

DOCS = [
    (0, " ".join(f"w{i}" for i in range(25))),   # 3 chunks, 1 media, banner
    (1, "short doc only"),                        # 1 chunk, no media
    (2, ""),                                      # empty text -> 1 empty chunk
    (3, " ".join(f"x{i}" for i in range(40))),    # 4 chunks, 2 media
    (4, " ".join(f"w{i}" for i in range(25))),    # same text as 0 + banner
]


def _py_spans(doc_id, text):
    toks = text.strip().split() if text.strip() else [""]
    nc = -(-len(toks) // 10)
    spans = []
    for i in range(1, nc + 1):
        spans.append(("text", " ".join(toks[(i - 1) * 10 : (i - 1) * 10 + 10]),
                      None, (i - 1) + (i - 1) // 2))
    for j in range(1, nc // 2 + 1):
        spans.append(("image", None, f"img://{doc_id}/{j}", 3 * j - 1))
    if doc_id % 4 == 0:
        spans.append(("text", BANNER, None, nc + nc // 2))
    return sorted(spans, key=lambda s: s[3])


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_synth_spans_matches_python(spark):
    rows = synth_spans(_df(spark)).collect()
    got = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in rows}
    for d, t in DOCS:
        assert got[d] == _py_spans(d, t), d
    # doc 1 has ONE chunk: no phantom media from sequence(1, 0)
    assert all(s[0] == "text" for s in got[1])


def test_span_stats_matches_python(spark):
    rows = span_stats(synth_spans(_df(spark))).collect()
    for r in rows:
        spans = _py_spans(r["doc_id"], dict(DOCS)[r["doc_id"]])
        kinds = [s[0] for s in spans]
        assert r["n_spans"] == len(spans)
        assert r["n_text"] == sum(k == "text" for k in kinds)
        assert r["n_media"] == sum(k != "text" for k in kinds)
        assert r["text_chars"] == sum(len(s[1]) for s in spans if s[1] is not None)
        assert r["n_transitions"] == sum(
            a != b for a, b in zip(kinds, kinds[1:])
        ), r["doc_id"]


def test_render_interleaved(spark):
    rows = {r["doc_id"]: r for r in render_interleaved(synth_spans(_df(spark))).collect()}
    for d, t in DOCS:
        want = " ".join(
            s[1] if s[0] == "text" else f"<{s[0]}>" for s in _py_spans(d, t)
        )
        assert rows[d]["rendered"] == want, d
    assert rows[3]["n_media"] == 2 and rows[1]["n_media"] == 0


def test_boilerplate_and_strip(spark):
    df = synth_spans(_df(spark))
    flagged = boilerplate_spans(df, min_docs=2).collect()
    # banner (docs 0 and 4) + the identical chunk texts of docs 0 and 4
    assert all(r["n_docs"] == 2 for r in flagged)
    assert len(flagged) == 1 + 3  # banner + 3 shared chunks

    stripped = {r["doc_id"]: r["spans"] for r in strip_boilerplate(df, 2).collect()}
    # docs 0/4 lose banner + all 3 chunks, keep only the media span
    assert [s["kind"] for s in stripped[0]] == ["image"]
    assert [s["kind"] for s in stripped[4]] == ["image"]
    # untouched docs keep every span
    for d in (1, 2, 3):
        assert len(stripped[d]) == len(_py_spans(d, dict(DOCS)[d])), d


def test_strip_boilerplate_impls_bit_identical(spark):
    # the broadcast-array path and the exploded anti-join scale path
    # must agree exactly — including the edge docs the exploded path
    # has to rebuild: fully-stripped docs and empty-span docs
    extra = [
        (8, BANNER),                 # banner-only text -> fully stripped
        (12, BANNER),                # its duplicate (doc_id % 4 == 0 too)
    ]
    df = synth_spans(
        spark.createDataFrame(DOCS + extra, "doc_id long, text string")
    )
    by_impl = {}
    for impl in ("broadcast", "exploded"):
        rows = strip_boilerplate(df, 2, impl=impl).collect()
        by_impl[impl] = {
            r["doc_id"]: [tuple(s) for s in r["spans"]] for r in rows
        }
    assert by_impl["broadcast"] == by_impl["exploded"]
    # same doc spine on both sides; fully-stripped docs survive with []
    assert set(by_impl["exploded"]) == {0, 1, 2, 3, 4, 8, 12}
    assert by_impl["exploded"][8] == []


def test_strip_boilerplate_auto_routes_by_flag_count(spark):
    df = synth_spans(_df(spark))
    # 4 flagged hashes: auto with a generous cap -> broadcast result,
    # auto with cap 0 -> forced onto the exploded path; both identical
    hi = strip_boilerplate(df, 2, impl="auto", broadcast_max_flags=100)
    lo = strip_boilerplate(df, 2, impl="auto", broadcast_max_flags=0)
    a = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in hi.collect()}
    b = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in lo.collect()}
    assert a == b


def test_span_ops_zero_shuffle(spark):
    df = synth_spans(_df(spark))
    for op in (span_stats, render_interleaved):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, op.__name__


# ---------------------------------------------------------------------------
# caption pairing


def test_caption_pairs_nearest_text_neighbors(spark):
    from news_please_spark.operators.spans import SPAN_SCHEMA, caption_pairs

    rows = [
        # doc 0: text, media, text  -> both sides present
        (0, [("text", "intro words", None, 0),
             ("image", None, "img://0/1", 1),
             ("text", "closing words", None, 2)]),
        # doc 1: media first (no caption_before), then text
        (1, [("image", None, "img://1/1", 0),
             ("text", "only after", None, 1)]),
        # doc 2: trailing media (no caption_after); NEAREST text wins
        (2, [("text", "far text", None, 0),
             ("text", "near text", None, 1),
             ("video", None, "vid://2/1", 5)]),
        # doc 3: no media at all -> no rows
        (3, [("text", "alone", None, 0)]),
    ]
    df = spark.createDataFrame(rows, f"doc_id long, spans {SPAN_SCHEMA}")
    got = {
        (r.doc_id, r.media_ref): (r.caption_before, r.caption_after)
        for r in caption_pairs(df).collect()
    }
    assert got == {
        (0, "img://0/1"): ("intro words", "closing words"),
        (1, "img://1/1"): (None, "only after"),
        (2, "vid://2/1"): ("near text", None),
    }


# ---------------------------------------------------------------------------
# pack_interleaved


def _ntok(kind, text):
    # whitespace token convention shared with token_totals: split of a
    # trimmed empty string is [''] — empty text counts ONE token
    return max(1, len(text.strip().split())) if kind == "text" else 1


def _py_pack(spans_by_doc, seq_len, packer_hex=2):
    """Pure-Python twin of pack_interleaved (md5 order, concat+chunk)."""
    import hashlib

    out = []
    keyed = sorted(
        spans_by_doc, key=lambda d: hashlib.md5(str(d).encode()).hexdigest()
    )
    starts = {}
    totals = {}
    for d in keyed:
        tot = 0
        for kind, text, _, _ in spans_by_doc[d]:
            tot += _ntok(kind, text)
        totals[d] = tot
    acc = {}
    for d in keyed:
        p = hashlib.md5(str(d).encode()).hexdigest()[:packer_hex]
        starts[d] = acc.get(p, 0)
        acc[p] = starts[d] + totals[d]
    for d in keyed:
        p = hashlib.md5(str(d).encode()).hexdigest()[:packer_hex]
        off = 0
        for idx, (kind, text, ref, _) in enumerate(spans_by_doc[d]):
            n = _ntok(kind, text)
            g0, g1 = starts[d] + off, starts[d] + off + n
            for c in range(g0 // seq_len, (g1 - 1) // seq_len + 1):
                lo, hi = max(g0, c * seq_len), min(g1, (c + 1) * seq_len)
                out.append(
                    (p, c, d, idx, kind, ref, n, lo - c * seq_len,
                     hi - c * seq_len, lo - g0)
                )
            off += n
    return sorted(out)


def test_pack_interleaved_matches_python(spark):
    from news_please_spark.operators.spans import pack_interleaved

    spans_by_doc = {d: _py_spans(d, t) for d, t in DOCS}
    got = sorted(
        tuple(r)
        for r in pack_interleaved(synth_spans(_df(spark)), seq_len=16).collect()
    )
    assert got == _py_pack(spans_by_doc, 16)


def test_pack_interleaved_invariants(spark):
    from collections import defaultdict

    from news_please_spark.operators.spans import pack_interleaved

    rows = pack_interleaved(synth_spans(_df(spark)), seq_len=16).collect()
    # media spans are atomic: exactly one chunk row, one token
    media = [r for r in rows if r.kind != "text"]
    assert media and all(
        r.n_tok == 1 and r.tok_end - r.tok_start == 1 for r in media
    )
    per_media = defaultdict(int)
    for r in media:
        per_media[(r.doc_id, r.span_idx)] += 1
    assert all(v == 1 for v in per_media.values())
    # chunks tile [0, seq_len) with no gaps/overlaps; all but the last
    # chunk of each packer are exactly full
    by_chunk = defaultdict(list)
    for r in rows:
        by_chunk[(r.packer, r.chunk)].append((r.tok_start, r.tok_end))
    for (p, c), segs in by_chunk.items():
        segs.sort()
        assert segs[0][0] == 0
        for (a0, a1), (b0, b1) in zip(segs, segs[1:]):
            assert a1 == b0, (p, c, segs)
        last = max(c for (pp, c) in by_chunk if pp == p)
        if c < last:
            assert segs[-1][1] == 16, (p, c, segs)
    # every span's slices reassemble the span exactly
    per_span = defaultdict(list)
    for r in rows:
        per_span[(r.doc_id, r.span_idx)].append((r.span_off, r.tok_end - r.tok_start, r.n_tok))
    for (d, i), parts in per_span.items():
        parts.sort()
        assert parts[0][0] == 0
        covered = 0
        for off, ln, n in parts:
            assert off == covered
            covered += ln
        assert covered == parts[0][2]


def test_pack_interleaved_empty_and_bad_args(spark):
    import pytest as _pytest

    from news_please_spark.operators.spans import SPAN_SCHEMA, pack_interleaved

    empty = spark.createDataFrame([], f"doc_id long, spans {SPAN_SCHEMA}")
    assert pack_interleaved(empty, seq_len=8).count() == 0
    with _pytest.raises(ValueError):
        pack_interleaved(empty, seq_len=0)


# ---------------------------------------------------------------------------
# redact_spans


def test_redact_spans(spark):
    from news_please_spark.operators.spans import SPAN_SCHEMA, redact_spans

    spans = [
        ("text", "write to a@b.co or c@d.org now", None, 0),
        ("image", None, "img://1/1", 1),
        ("text", "host 10.0.0.1 phone +1-555-0100-1234", None, 2),
    ]
    df = spark.createDataFrame(
        [(1, spans)], f"doc_id long, spans {SPAN_SCHEMA}"
    )
    row = redact_spans(df).collect()[0]
    assert (row.n_email, row.n_ip, row.n_phone) == (2, 1, 1)
    texts = [s.text for s in row.spans]
    assert texts[0] == "write to <EMAIL> or <EMAIL> now"
    assert texts[1] is None  # media untouched
    assert texts[2] == "host <IP> phone <PHONE>"
    assert [s.kind for s in row.spans] == ["text", "image", "text"]
    assert [s.offset for s in row.spans] == [0, 1, 2]


def test_redact_spans_zero_shuffle(spark):
    from news_please_spark.plans.queries import QUERIES

    plan = (
        QUERIES["span_pii_redact"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the spread() test-input repartition is the only allowed exchange
    assert plan.count("Exchange") <= 1, plan


def test_span_integrity_clean_and_violations(spark):
    from news_please_spark.operators.spans import span_integrity

    rows = [
        # doc 1: clean interleave
        (1, "text", "hello world", None, 0),
        (1, "image", None, "img://1/1", 1),
        (1, "text", "more", None, 2),
        # doc 2: duplicate offset + gap (offset 3 missing) + empty text
        (2, "text", "a", None, 0),
        (2, "text", "b", None, 0),
        (2, "text", "", None, 1),
        (2, "image", None, "img://2/1", 2),
        (2, "text", "tail", None, 4),
        # doc 3: media without ref, text with ref
        (3, "image", None, None, 0),
        (3, "text", "x", "img://3/9", 1),
    ]
    rows_df = spark.createDataFrame(
        rows, "doc_id long, kind string, text string, media_ref string, offset int"
    )
    df = rows_df.groupBy("doc_id").agg(
        F.collect_list(
            F.struct("kind", "text", "media_ref", "offset")
        ).alias("spans")
    )
    got = {r.doc_id: r for r in span_integrity(df).collect()}
    assert got[1].ok and got[1].n_spans == 3
    r2 = got[2]
    assert (r2.dup_offsets, r2.gaps, r2.empty_text, r2.ok) == (1, 1, 1, False)
    r3 = got[3]
    assert (r3.media_no_ref, r3.text_with_ref, r3.ok) == (1, 1, False)


def test_dangling_media_refs_anti_join(spark):
    from news_please_spark.operators.spans import dangling_media_refs

    spans = spark.createDataFrame(
        [(1, "img://a"), (1, "img://b"), (2, None), (3, "img://c")],
        "doc_id long, media_ref string",
    )
    manifest = spark.createDataFrame([("img://a",), ("img://x",)], "media_ref string")
    got = sorted(
        r["media_ref"] for r in dangling_media_refs(spans, manifest).collect()
    )
    # b and c missing from the store; the NULL-ref row is not a media ref
    assert got == ["img://b", "img://c"]
