"""Fetch tier semantics: F1/F5/F6 filters, S3 decode, D4 redirect keying,
K1/K2 file sinks."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_please_spark.schemas import RESPONSES
from news_please_spark.sinks.files import write_html_storage, write_json_storage
from news_please_spark.sources.fetch import fetch_from_responses


def _responses(spark):
    rows = [
        ("https://a.com/ok", 200, "text/html; charset=utf-8",
         bytearray("héllo wörld page body".encode()), None, None),
        ("https://a.com/latin", 200, "text/html",
         bytearray("caf\xe9 body text here".encode("latin-1")), None, None),
        ("https://a.com/404", 404, "text/html", bytearray(b"gone gone gone"), None, None),
        ("https://a.com/pdf", 200, "application/pdf", bytearray(b"%PDF-1.4 xxxxx"), None, None),
        ("https://a.com/tiny", 200, "text/html", bytearray(b"x"), None, None),
        ("https://a.com/redir", 200, "text/html",
         bytearray(b"redirected body content"), "https://a.com/final", None),
    ]
    return spark.createDataFrame(rows, RESPONSES)


def test_fetch_filters_decode_redirect(spark):
    urls = spark.createDataFrame(
        [(u,) for u in [
            "https://a.com/ok", "https://a.com/latin", "https://a.com/404",
            "https://a.com/pdf", "https://a.com/tiny", "https://a.com/redir",
            "https://a.com/missing",
        ]],
        "url string",
    )
    got = {r.url: r for r in fetch_from_responses(urls, _responses(spark)).collect()}
    assert set(got) == {"https://a.com/ok", "https://a.com/latin", "https://a.com/redir"}
    assert got["https://a.com/ok"].html == "héllo wörld page body"       # utf-8
    assert got["https://a.com/latin"].html == "café body text here"      # latin-1 fallback
    assert got["https://a.com/redir"].final_url == "https://a.com/final" # D4
    assert got["https://a.com/ok"].final_url == "https://a.com/ok"


def test_file_sinks(spark, tmp_path):
    fetched = spark.createDataFrame(
        [("https://www.x.com/a", "<html>A</html>"), ("https://y.org/b", "<html>B</html>")],
        "url string, html string",
    )
    hdir = str(tmp_path / "html")
    write_html_storage(fetched, hdir)
    back = spark.read.parquet(hdir)
    assert back.count() == 2
    assert set(r.domain for r in back.select("domain").collect()) == {"x.com", "y.org"}
    # partition pruning: reading one domain touches one partition dir
    assert back.filter(F.col("domain") == "x.com").count() == 1

    arts = spark.createDataFrame(
        [("https://x.com/a", "T", "2026-08-16 10:00:00")],
        "url string, title string, date_download string",
    ).withColumn("date_download", F.col("date_download").cast("timestamp"))
    jdir = str(tmp_path / "json")
    write_json_storage(arts, jdir)
    j = spark.read.json(jdir)
    assert j.count() == 1 and j.first().title == "T"


def test_charset_detection_tree():
    """S3 charset guess (cchardet-free image of response_decoder.py:19-48):
    utf-8 → shift_jis/gbk/cp1251 evidence → latin-1 last resort."""
    from news_please_spark.sources.fetch import detect_and_decode

    cases = [
        ("utf-8", "Привет мир — 日本語テキスト"),
        ("cp1251", "Привет мир это тест новостей сегодня вечером"),
        ("cp1251", "В Москве сегодня прошла выставка, сообщает агентство."),
        ("shift_jis", "これはニュースのテストです。記事の本文がここにあります。"),
        ("shift_jis", "東京で新しい展示会が開幕しました。詳細は記事をご覧ください。"),
        ("gbk", "这是新闻测试内容，文章正文在这里。"),
        ("gbk", "北京今天举行了新的展览会，详情请看报道。"),
        ("latin-1", "Müller in der Straße trinkt Kaffee täglich früh"),
        ("latin-1", "L'été à Paris: des cafés, des musées et des balades"),
        ("latin-1", "plain ascii only text with no accents at all"),
    ]
    for enc, text in cases:
        assert detect_and_decode(text.encode(enc)) == text, enc


def test_charset_undecodable_cp1251_falls_to_latin1():
    """Byte 0x98 is UNDEFINED in cp1251 — a windows-1252-ish body that
    reaches the cp1251 branch must fall through to the latin-1 last
    resort (reference response_decoder.py always falls back), never
    raise inside the decode UDF."""
    from news_please_spark.sources.fetch import detect_and_decode

    # word-spaced (skips the gbk gate), non-utf8, contains 0x98
    raw = b"some words here \x98 and more plain words after that"
    assert detect_and_decode(raw) == raw.decode("latin-1")
    # unspaced stream with 0x98 must decode without raising whichever
    # branch claims it
    raw2 = bytes([0x98, 0x20, 0x98, 0xFF]) * 40
    assert isinstance(detect_and_decode(raw2), str)
