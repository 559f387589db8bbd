"""Library facade: from_html / from_url / from_urls / from_file drive
the full fetch → extract chain in one call (reference NewsPlease
__init__.py:65-183 analogues)."""

from __future__ import annotations

from pyspark.sql import functions as F

import news_please_spark as nps
from news_please_spark.schemas import RESPONSES
from news_please_spark.synth import DocWorld

N = 12


def _responses(spark, world):
    rows = [
        (
            world.spec(d).url,
            200,
            "text/html; charset=utf-8",
            bytearray(world.html(d).encode("utf-8")),
            None,
            None,
        )
        for d in range(N)
    ]
    return spark.createDataFrame(rows, RESPONSES)


def test_from_html_and_from_url(spark):
    world = DocWorld(N)
    pages = [(world.spec(d).url, world.html(d)) for d in range(N)]
    arts = {r.url: r for r in nps.from_html(spark, pages).collect()}
    for d in range(N):
        exp = world.expected_article(d)
        assert arts[exp["url"]].title == exp["title"], d
        assert arts[exp["url"]].maintext == exp["maintext"], d

    one = nps.from_url(
        spark, world.spec(0).url, _responses(spark, world)
    ).collect()
    assert len(one) == 1 and one[0].title == world.expected_article(0)["title"]


def test_from_warc_end_to_end(spark, tmp_path):
    from news_please_spark.sources.warc import write_warc

    world = DocWorld(N)
    warc = tmp_path / "pages.warc.gz"
    write_warc(
        str(warc),
        [
            (world.spec(d).url, 200, "text/html", world.html(d).encode("utf-8"))
            for d in range(N)
        ]
        + [("https://h0.news-example.org/gone", 404, "text/html", b"nope")],
    )
    got = {r.url: r for r in nps.from_warc(spark, str(warc)).collect()}
    assert len(got) == N  # the 404 record is filtered out
    for d in range(N):
        exp = world.expected_article(d)
        assert got[exp["url"]].title == exp["title"], d
        assert got[exp["url"]].maintext == exp["maintext"], d


def test_from_file_end_to_end(spark, tmp_path):
    world = DocWorld(N)
    url_file = tmp_path / "urls.txt"
    url_file.write_text(
        "\n".join(world.spec(d).url for d in range(N)) + "\n\n"
    )
    arts = nps.from_file(spark, str(url_file), _responses(spark, world))
    got = {r.url: r for r in arts.collect()}
    assert len(got) == N
    for d in range(N):
        exp = world.expected_article(d)
        a = got[exp["url"]]
        assert a.title == exp["title"], d
        assert a.language == exp["language"], d
        assert list(a.authors) == exp["authors"], d


def test_prepare_training_data_one_call(spark):
    import news_please_spark as nps

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range((i * 11) % 60 + 5)))
         for i in range(40)]
        + [(100, " ".join(f"tok3_{j}" for j in range(38)))],  # exact dup of doc 3
        "doc_id long, text string",
    )
    packed = nps.prepare_training_data(docs, seq_len=32, packer_hex=1)
    rows = packed.collect()
    assert rows and set(packed.columns) == {
        "split", "packer", "chunk", "doc_id", "n_tok", "tok_start", "tok_end", "doc_off"
    }
    assert 100 not in {r.doc_id for r in rows}  # hygiene fired
    rendered = nps.prepare_training_data(docs, seq_len=32, packer_hex=1, render=True)
    r0 = rendered.first()
    assert r0.chunk_text and r0.split in ("train", "val", "test")


def test_corpus_report_semantics(spark):
    from news_please_spark.pipeline import corpus_report

    docs = spark.createDataFrame(
        [
            ("a", "en", "the cat sat"),
            ("a", "en", "THE  CAT   SAT"),  # exact dup after normalize
            ("a", "de", "der hund lief schnell heute"),
            ("b", "fr", "le chat"),
        ],
        "source string, lang string, text string",
    )
    got = {r.source: r for r in corpus_report(docs).collect()}
    a = got["a"]
    assert a.n_docs == 3 and a.n_uniq == 2
    assert a.dup_bp == (3 - 2) * 10000 // 3
    assert a.total_tokens == 3 + 3 + 5
    assert a.top_lang == "en"
    b = got["b"]
    assert (b.n_docs, b.n_uniq, b.dup_bp, b.top_lang) == (1, 1, 0, "fr")


def test_corpus_report_lang_tiebreak(spark):
    from news_please_spark.pipeline import corpus_report

    docs = spark.createDataFrame(
        [("s", "en", "one doc"), ("s", "de", "two doc")],
        "source string, lang string, text string",
    )
    (row,) = corpus_report(docs).collect()
    assert row.top_lang == "de"  # tie on count -> lang ASC
