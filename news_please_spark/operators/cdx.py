"""CDX capture indexing with revisit deduplication.

Web archives store every fetch of a URL as a capture; the CDX index
(the lookup structure behind Wayback/Common Crawl's URL index, keyed
by SURT — functions/urls.py::surt_key) marks a capture whose payload
digest already appeared in an EARLIER capture of the same URL as a
``revisit`` record: the payload is not stored again, the record
points at the original capture's timestamp instead. That is payload
dedup at the archive layer — typically 30-60% of a recrawl's bytes.

This operator computes the index rows declaratively: one
``row_number`` window over (urlkey, digest) ordered by capture time.
rank 1 is the original, every later rank is a revisit pointing at the
group's first timestamp. The only shuffle is the window's hash
partition on (urlkey, digest) — fixed-width keys, no payload bytes
move — and it scales to any capture count because a URL's captures
with the SAME digest land in one partition cell while distinct
digests of a hot URL spread across cells (no per-URL skew pile-up,
unlike a naive partition-by-urlkey formulation).

Reference parity: news-please's CommonCrawl path consumes these
indexes (reference commoncrawl_extractor reads WARCs the CDX index
locates); the reference does not BUILD them — this is the missing
write-side half, in the training-data tier because recrawl payload
dedup is the first dedup a web corpus sees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from news_please_spark.functions.urls import surt_key


def cdx_index(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Index rows: input columns + (urlkey, revisit, orig_ts).

    ``revisit`` is 1 when an earlier capture of the same urlkey carries
    the same payload digest; ``orig_ts`` is the timestamp of the
    group's original capture (equal to ts on originals). Ordering
    within a (urlkey, digest) group is by ``ts_col`` with
    ``tiebreak_col`` (when given) breaking equal timestamps
    deterministically."""
    order: list[Column] = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    keyed = captures.withColumn("urlkey", surt_key(F.col(url_col)))
    w = Window.partitionBy("urlkey", digest_col).orderBy(*order)
    return keyed.select(
        "*",
        F.when(F.row_number().over(w) > 1, 1).otherwise(0).alias("revisit"),
        F.min(ts_col).over(w).alias("orig_ts"),
    )


def revisit_stats(index: DataFrame) -> DataFrame:
    """Per-urlkey dedup effectiveness: captures, distinct payloads,
    revisits — the 'how much did payload dedup save on this site'
    rollup an archive operator reads. One map-side-combinable agg."""
    return index.groupBy("urlkey").agg(
        F.count(F.lit(1)).alias("captures"),
        F.count_distinct("digest").alias("payloads"),
        F.sum("revisit").alias("revisits"),
    )


def cdx_index_incremental(
    captures: DataFrame,
    history: DataFrame | None,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Index a NEW batch of captures against the archive's existing
    index: a capture is a revisit when its digest matched an earlier
    capture of the same urlkey either IN THIS BATCH or anywhere in
    `history` (rows carrying urlkey, digest, orig_ts — e.g. the union
    of previously committed index deltas). orig_ts points at the
    earliest capture across both.

    This is how CDX shards are actually built: per-fetch-batch deltas
    that consult the merged prior index, so payload storage can be
    skipped at WRITE time. Only the new batch is windowed; history
    contributes one aggregated (urlkey, digest) row per group to an
    equi-join — the archive's full capture list is never re-shuffled."""
    idx = cdx_index(captures, url_col, ts_col, digest_col, tiebreak_col)
    if history is None:
        return idx
    h = history.groupBy("urlkey", digest_col).agg(
        F.min("orig_ts").alias("_hist_ts")
    )
    return (
        idx.join(h, ["urlkey", digest_col], "left")
        .withColumn(
            "revisit",
            F.when(F.col("_hist_ts").isNotNull(), F.lit(1)).otherwise(
                F.col("revisit")
            ),
        )
        .withColumn(
            "orig_ts",
            F.when(
                F.col("_hist_ts").isNotNull(),
                F.least("_hist_ts", "orig_ts"),
            ).otherwise(F.col("orig_ts")),
        )
        .drop("_hist_ts")
    )


def cdx_from_warc_records(records: DataFrame) -> DataFrame:
    """WARC response records (sources/warc.py::split_warc_records
    schema) → CDX capture rows ready for indexing: urlkey source =
    target_uri, ts = the WARC-Date header (ISO-8601 strings order
    lexicographically; record_index breaks same-second ties within a
    file), digest = md5 of the decoded payload."""
    return records.filter(
        (F.col("warc_type") == "response") & F.col("body").isNotNull()
    ).select(
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("ts"),
        F.md5(F.col("body")).alias("digest"),
        "path",
        "record_index",
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "urlkey",
    digest_col: str = "digest",
) -> DataFrame:
    """Classify every URL between two crawl snapshots: 'new' (only in
    the newer capture set), 'gone' (dropped out), 'changed' (present
    in both, payload digest flipped), 'same' (present, identical) —
    the per-URL ledger behind recrawl-rate planning (recrawl_schedule
    estimates cadence from it), coverage-regression alarms (a
    thousand-URL 'gone' burst on one host is a site migration or a
    robots flip — robots_diff tells which), and CC-style index deltas
    (cdx_index_incremental produces the inputs).

    Inputs are one row per urlkey per snapshot (dedupe upstream if a
    snapshot captures a URL twice; cdx_index's revisit collapse does).

    Distribution: ONE full-outer hash join on the urlkey — fixed-width
    SURT keys, no payloads shuffle; status is a codegen'd CASE.  At
    10^10 URLs both sides hash-partition on the same key, so AQE's
    skew split applies if one host dominates a snapshot.

    Output: (urlkey, old_digest, new_digest, status)."""
    o = old.select(
        F.col(key_col).alias("urlkey"), F.col(digest_col).alias("old_digest")
    )
    n = new.select(
        F.col(key_col).alias("urlkey"), F.col(digest_col).alias("new_digest")
    )
    j = o.join(n, "urlkey", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("new"))
        .when(F.col("new_digest").isNull(), F.lit("gone"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return j.withColumn("status", status)


def segment_diff(
    old: DataFrame,
    new: DataFrame,
    urlkey_col: str = "urlkey",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-segment content delta between two captures of the same
    URL population — the incremental-crawl step BELOW snapshot_diff's
    whole-page digest: a re-indexer wants only the changed sentences,
    not a 'changed' bit for the page.

    Each side splits into trimmed sentences (same RE2-safe regex as
    sentence_chunks), keyed by md5; per (urlkey, seg_md5) occurrence
    counts full-outer join into added / removed / kept rows with both
    counts. Scale: pages explode to fixed-width (urlkey, md5) keys,
    aggregate once per side, and one equi-join on those keys — the
    page text itself never shuffles."""
    sent_re = r"[^.!?]+[.!?]*"

    def segs(df: DataFrame, n_col: str) -> DataFrame:
        sents = F.filter(
            F.transform(
                F.regexp_extract_all(F.col(text_col), F.lit(sent_re), 0),
                lambda x: F.trim(x),
            ),
            lambda x: x != "",
        )
        return (
            df.select(F.col(urlkey_col).alias("urlkey"), F.explode(sents).alias("_s"))
            .groupBy("urlkey", F.md5("_s").alias("seg_md5"))
            .agg(F.count(F.lit(1)).cast("long").alias(n_col))
        )

    a = segs(old, "n_old")
    b = segs(new, "n_new")
    j = a.join(b, ["urlkey", "seg_md5"], "full_outer")
    status = (
        F.when(F.col("n_old").isNull(), F.lit("added"))
        .when(F.col("n_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("kept"))
    )
    return j.select(
        "urlkey",
        "seg_md5",
        F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        status.alias("status"),
    )
