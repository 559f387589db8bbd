"""S4 — WARC record scan (reference __init__.py:29-63 from_warc +
crawler/commoncrawl_extractor.py:217-289 record iteration; the reference
delegates to warcio — here the record framing is parsed from scratch).

`spark.read.format("binaryFile")` → one row per .warc(.gz) file →
mapInPandas splits each file into response records: one output row per
record with the target URI, HTTP status, content type and decoded body
(S3 encoding detection via the shared fetch.detect_and_decode tree —
mirrors crawler/response_decoder.py:19-48 without cchardet).

Scale note: CC-NEWS WARCs are ~1 GB; one file = one task is the right
granularity (the reference uses one process per WARC). Partition count
= file count; `repartition` upstream if files are few and fat.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RECORD_SCHEMA = (
    "path string, record_index int, warc_type string, target_uri string, "
    "warc_date string, http_status int, content_type string, body string"
)


def parse_warc_bytes(raw: bytes) -> list[dict]:
    """Sequentially parse WARC records (Content-Length framed)."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    out: list[dict] = []
    buf = io.BytesIO(raw)
    idx = 0
    while True:
        line = buf.readline()
        if not line:
            break
        if not line.startswith(b"WARC/"):
            continue
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.decode("ascii", "replace").strip().lower()] = v.decode(
                    "ascii", "replace"
                ).strip()
        length = int(headers.get("content-length", "0"))
        block = buf.read(length)
        rec = {
            "record_index": idx,
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "http_status": None,
            "content_type": None,
            "body": None,
        }
        if rec["warc_type"] == "response" and block[:5] == b"HTTP/":
            head, _, payload = block.partition(b"\r\n\r\n")
            lines = head.split(b"\r\n")
            try:
                rec["http_status"] = int(lines[0].split()[1])
            except (IndexError, ValueError):
                pass
            for hl in lines[1:]:
                if hl.lower().startswith(b"content-type:"):
                    rec["content_type"] = (
                        hl.split(b":", 1)[1].strip().decode("ascii", "replace")
                    )
            # S3: shared charset-detection tree (fetch.detect_and_decode)
            from news_please_spark.sources.fetch import detect_and_decode

            rec["body"] = detect_and_decode(payload)
        out.append(rec)
        idx += 1
    return out


def split_warc_records(binary_files: DataFrame) -> DataFrame:
    """binaryFile rows (path, content) → one row per WARC record."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    rec["path"] = path
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_index", "warc_type", "target_uri",
                    "warc_date", "http_status", "content_type", "body",
                ],
            )

    return binary_files.select("path", "content").mapInPandas(split, RECORD_SCHEMA)


def write_warc(path: str, records: list, compress: bool = True) -> None:
    """Minimal WARC writer for tests/fixtures:
    records = [(url, status, content_type, body_bytes)] or the same
    tuple with a 5th element, the WARC-Date string."""
    buf = io.BytesIO()
    for rec in records:
        url, status, ctype, body = rec[:4]
        wdate = rec[4] if len(rec) > 4 else ""
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("ascii") + body
        date_line = f"WARC-Date: {wdate}\r\n" if wdate else ""
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"{date_line}"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode("ascii")
        buf.write(head + http + b"\r\n\r\n")
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
