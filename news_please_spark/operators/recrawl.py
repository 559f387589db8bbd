"""Adaptive recrawl scheduling — change-frequency estimation.

A continuous crawler re-fetches pages at a cadence matched to how often
they actually change (Cho & Garcia-Molina 2003, "Estimating Frequency
of Change"): news frontpages hourly, archive pages monthly.  The
reference crawls on a fixed daemon interval per site
(newsplease config `daemonize`); this operator derives the interval
from observed fetch history instead.

Estimator (deterministic integer form of the classic one): for each
URL with `n` recorded fetches spanning `span` microseconds, in which
the content hash changed `c` times between consecutive fetches, the
mean time-between-changes is estimated as `span div (c + 1)` and
clamped to [min_interval, max_interval].  `next_due = last_fetch +
interval`.  All integer arithmetic (epoch micros, `div`) so results
are bit-identical across engines — the oracle entry hash-checks it
against DuckDB.

Scale shape: ONE shuffle total.  The lag window partitions by url, and
the follow-up per-url aggregate reuses that partitioning (same key),
so Catalyst plans a single Exchange for history tables of any size.
Per-url history is short (tens of fetches), so no window skew; the
output is one row per url — the frontier joins it back on url to gate
admission (`next_due_us <= now`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000
DAY_US = 24 * HOUR_US


def recrawl_schedule(
    history: DataFrame,
    key: str = "url",
    ts: str = "fetch_ts",
    content: str = "content_hash",
    tiebreak: str | None = None,
    min_interval_us: int = HOUR_US,
    max_interval_us: int = 30 * DAY_US,
) -> DataFrame:
    """Per-url fetch cadence from observed change history.

    Returns (key, n_visits, n_changes, interval_us, next_due_us).
    `tiebreak` orders equal-timestamp fetches deterministically (pass
    a unique column when timestamps can collide)."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    x = history.select(
        key,
        us.alias("_us"),
        F.when(
            F.lag(F.col(content)).over(w).isNotNull()
            & (F.lag(F.col(content)).over(w) != F.col(content)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_chg"),
    )
    agg = x.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum("_chg").cast("long").alias("n_changes"),
        F.min("_us").alias("_first"),
        F.max("_us").alias("_last"),
    )
    raw = F.expr("(_last - _first) div (n_changes + 1)")
    interval = F.least(
        F.greatest(raw, F.lit(min_interval_us)), F.lit(max_interval_us)
    )
    return agg.select(
        key,
        F.col("n_visits").cast("long").alias("n_visits"),
        "n_changes",
        interval.cast("long").alias("interval_us"),
        (F.col("_last") + interval).cast("long").alias("next_due_us"),
    )


def sitemap_stale(
    sitemap: DataFrame,
    fetch_log: DataFrame | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Sitemap-lastmod-driven refetch seeding: which sitemap URLs does
    the crawl store need to (re)fetch?  The reference expands sitemaps
    into a flat fetch list every daemon cycle (sources/sitemap.py);
    a continuous crawler instead diffs the sitemap's ``lastmod_us``
    against the store's last successful fetch and refetches only what
    moved — on news sitemaps (which carry lastmod near-universally)
    this cuts daemon-cycle fetch volume by the site's non-change rate.

        reason = 'new'    url absent from the fetch log
                 'stale'  lastmod_us > fetched_us
                 'nolastmod'  sitemap carries no lastmod — refetch
                              conservatively (can't prove freshness)
        fresh URLs (lastmod_us <= fetched_us) are dropped.

    Epoch-microsecond integers end-to-end.  Scale shape: one per-URL
    equi-join (both sides URL grain, unhinted — AQE routes), no window,
    no broadcast assumption; output cardinality = changed ∪ new, which
    on a steady-state news crawl is a sliver of the sitemap.

    ``sitemap`` columns: (url, lastmod_us nullable); ``fetch_log``:
    (url, fetched_us).  A NULL fetch_log (bootstrap crawl) marks every
    URL 'new' or 'nolastmod' respectively."""
    s = sitemap.select(
        F.col(url_col), F.col("lastmod_us").cast("long").alias("_lm")
    )
    if fetch_log is None:
        return s.select(
            url_col,
            F.col("_lm").alias("lastmod_us"),
            F.lit(None).cast("long").alias("fetched_us"),
            F.when(F.col("_lm").isNull(), F.lit("nolastmod"))
            .otherwise(F.lit("new"))
            .alias("reason"),
        )
    fl = fetch_log.select(
        F.col(url_col), F.col("fetched_us").cast("long").alias("_f")
    )
    j = s.join(fl, on=url_col, how="left")
    reason = (
        F.when(F.col("_f").isNull(), F.lit("new"))
        .when(F.col("_lm").isNull(), F.lit("nolastmod"))
        .when(F.col("_lm") > F.col("_f"), F.lit("stale"))
    )
    return (
        j.withColumn("reason", reason)
        .filter(F.col("reason").isNotNull())
        .select(
            url_col,
            F.col("_lm").alias("lastmod_us"),
            F.col("_f").alias("fetched_us"),
            "reason",
        )
    )


def crawl_delay_audit(
    fetch_log: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts",
    delay_col: str = "crawl_delay",
) -> DataFrame:
    """Politeness conformance audit: did the crawler honor each host's
    robots Crawl-delay? The report an operator pulls when a webmaster
    complains — and the regression gate a scheduler change runs
    against its own fetch timetable (fetch_schedule/autothrottle
    produce one; this closes the loop by auditing it).

    Per host: fetches, declared delay, gaps below it (violations),
    and the worst (minimum) observed gap. A host with a single fetch
    has no gap: min_gap NULL, violations 0. A host absent from the
    delay table audits with delay NULL and violations 0 (nothing
    declared, nothing violated).

    Plan: ONE lag() window keyed by host (the only data-sized
    shuffle), one AQE-routed join against the robots-sized delay
    table, one map-side-combinable agg (the per-host delay is a
    constant, echoed via min). All-integer timestamps."""
    w = Window.partitionBy(host_col).orderBy(ts_col)
    gaps = fetch_log.select(
        F.col(host_col),
        (F.col(ts_col) - F.lag(ts_col).over(w)).alias("_gap"),
    )
    return (
        gaps.join(delays, host_col, "left")
        .groupBy(host_col)
        .agg(
            F.count(F.lit(1)).alias("fetches"),
            F.sum(
                F.when(F.col("_gap") < F.col(delay_col), 1).otherwise(0)
            ).cast("long").alias("violations"),
            F.min("_gap").alias("min_gap"),
            F.min(delay_col).alias(delay_col),
        )
    )


def host_coverage(
    sitemap: DataFrame,
    crawled: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """Per-host crawl completeness vs the site's own inventory — the
    "did we actually get everything the sitemap lists?" report, and
    its inverse (URLs we fetched that the sitemap never declared —
    calendar traps and infinite facets show up here first, next to
    crawl_traps' pattern detector).

    Output per host: known (sitemap URLs), crawled_known (their
    fetched subset), coverage_bp (10⁴·crawled_known DIV known),
    missing (known − crawled_known), extra (fetched URLs not in the
    inventory). A host that appears only in the crawl log reports
    known = 0, coverage_bp NULL (no inventory to cover).

    Plan: ONE full-outer equi-join on (host, url) — both sides
    pre-distinct map-side — then a map-side-combinable per-host agg.
    No window, no skew cell (a hot host's URLs hash across
    partitions; only the agg sees the host key)."""
    s = sitemap.select(host_col, url_col).distinct().withColumn("_s", F.lit(1))
    c = crawled.select(host_col, url_col).distinct().withColumn("_c", F.lit(1))
    j = s.join(c, [host_col, url_col], "full_outer")
    agg = j.groupBy(host_col).agg(
        F.sum(F.coalesce("_s", F.lit(0))).alias("known"),
        F.sum(
            F.when(F.col("_s").isNotNull() & F.col("_c").isNotNull(), 1).otherwise(0)
        ).alias("crawled_known"),
        F.sum(
            F.when(F.col("_s").isNull() & F.col("_c").isNotNull(), 1).otherwise(0)
        ).alias("extra"),
    )
    return agg.select(
        host_col,
        F.col("known").cast("long").alias("known"),
        F.col("crawled_known").cast("long").alias("crawled_known"),
        F.when(F.col("known") > 0, F.expr("crawled_known * 10000 DIV known"))
        .cast("long")
        .alias("coverage_bp"),
        (F.col("known") - F.col("crawled_known")).cast("long").alias("missing"),
        F.col("extra").cast("long").alias("extra"),
    )


# HTTP statuses worth another attempt: transient server errors,
# rate-limits, and timeouts (scrapy's RETRY_HTTP_CODES, the middleware
# the reference crawls through — reference newsplease/config/config.cfg
# scrapy defaults; 4xx client errors are permanent by definition).
RETRYABLE_STATUSES = (408, 429, 500, 502, 503, 504, 522, 524)


def retry_schedule(
    fetch_log: DataFrame,
    max_retries: int = 2,
    base_delay_ms: int = 1_000,
    max_delay_ms: int = 60_000,
    url_col: str = "url",
    attempt_col: str = "attempt",
    status_col: str = "status",
) -> DataFrame:
    """Exponential-backoff retry planner over a fetch-attempt log — the
    set-oriented image of scrapy's RetryMiddleware (RETRY_TIMES /
    RETRY_HTTP_CODES), which the reference relies on per-response.

    Per url: n_attempts, the status of the LATEST attempt, and a
    verdict --
      * done     — last status 2xx/3xx,
      * retry    — last status retryable AND retries so far
                   (n_attempts - 1) < max_retries; next_delay_ms =
                   min(base_delay_ms << retries_so_far, max_delay_ms),
      * give_up  — permanent 4xx, or retry budget exhausted.
    next_delay_ms is NULL except on retry rows.  All integer shift/
    compare arithmetic — bit-identical cross-engine.

    Scale shape: one groupBy(url) whose aggregates (count + max_by)
    are map-side combinable; attempt history per url is bounded by
    max_retries + 1 rows, so there is no key skew by construction.
    The frontier left_semi-joins the retry rows back on url when the
    per-host politeness tier admits the next wave."""
    n_att = F.count(F.lit(1)).alias("n_attempts")
    last = F.max_by(status_col, attempt_col).alias("last_status")
    per = fetch_log.groupBy(F.col(url_col).alias("url")).agg(n_att, last)
    ok = (F.col("last_status") >= 200) & (F.col("last_status") < 400)
    retryable = F.col("last_status").isin(*RETRYABLE_STATUSES)
    may_retry = retryable & (F.col("n_attempts") <= F.lit(int(max_retries)))
    delay = F.least(
        # python F.shiftleft insists on a literal shift amount; the SQL
        # form takes a column
        F.expr(
            f"shiftleft(cast({int(base_delay_ms)} as bigint), "
            "cast(n_attempts - 1 as int))"
        ),
        F.lit(int(max_delay_ms)).cast("long"),
    ).cast("long")
    action = (
        F.when(ok, F.lit("done"))
        .when(may_retry, F.lit("retry"))
        .otherwise(F.lit("give_up"))
    )
    return per.select(
        "url",
        F.col("n_attempts").cast("long").alias("n_attempts"),
        F.col("last_status").cast("long").alias("last_status"),
        action.alias("action"),
        F.when(action == "retry", delay).alias("next_delay_ms"),
    )


def fetch_rate_anomaly(
    fetches: DataFrame,
    window_hours: int = 3,
    threshold_x10: int = 15,
    host_col: str = "host",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-host hourly fetch-rate anomaly detection — the crawl-ops
    alarm that catches a trap-triggered fetch storm (calendar
    generators, redirect loops) or a runaway scheduler BEFORE a host
    gets hammered past its politeness contract.  The reference's only
    safeguard here is scrapy's static per-domain cap; this closes the
    loop from the fetch LOG side: an hour is anomalous when its fetch
    count exceeds (threshold_x10/10)x the mean of the host's previous
    `window_hours` OBSERVED hours (hours with zero fetches produce no
    log rows, so the baseline is over observed hours — the documented
    grain; a host must accumulate a full window before it can alarm).

    Integer-exact: the comparison is cross-multiplied
        10 * n * trail_n  >  threshold_x10 * trail_sum
    so no float ratio is materialized and the verdict hash-compares
    cross-engine.

    Distribution: ONE shuffle — the (host, hour) count aggregate is
    map-side combinable, and the trailing window rides the same
    host-hash partitioning (hours per host are bounded, so no skew
    cell; a million-host log spreads by host hash).

    Output: (host, hour, n_fetches, trail_sum, trail_n, is_anomaly)."""
    hourly = (
        fetches.select(
            F.col(host_col).alias("host"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .groupBy("host", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_fetches"))
    )
    return rate_anomaly_on_counts(hourly, window_hours, threshold_x10)


def rate_anomaly_on_counts(
    hourly: DataFrame,
    window_hours: int = 3,
    threshold_x10: int = 15,
) -> DataFrame:
    """The counts-level core of fetch_rate_anomaly: input is already
    (host, hour, n_fetches) — the grain a streaming window aggregation
    emits, which is why this layer exists separately (the stateful
    streaming twin in streaming/anomaly.py must be bit-comparable to
    EXACTLY this computation on the same closed-hour rows)."""
    if window_hours <= 0:
        raise ValueError("window_hours must be positive")
    w = (
        Window.partitionBy("host")
        .orderBy("hour")
        .rowsBetween(-window_hours, -1)
    )
    out = hourly.withColumns(
        {
            "trail_sum": F.coalesce(F.sum("n_fetches").over(w), F.lit(0)).cast("long"),
            "trail_n": F.count(F.lit(1)).over(w).cast("long"),
        }
    )
    return out.withColumn(
        "is_anomaly",
        (F.col("trail_n") == window_hours)
        & (
            F.lit(10) * F.col("n_fetches") * F.col("trail_n")
            > F.lit(int(threshold_x10)) * F.col("trail_sum")
        ),
    )


def revalidation_plan(
    fetches: DataFrame,
    now,
    url_col: str = "url",
    fetched_col: str = "fetched_at",
    max_age_col: str = "max_age_s",
    etag_col: str = "etag",
    last_mod_col: str = "last_modified",
) -> DataFrame:
    """HTTP-cache-aware recrawl planning (RFC 9111 freshness, the
    crawler's side of it): classify every known URL into the cheapest
    correct next action —

      'fresh'      — age < max-age: serve from store, send NOTHING
                     (politeness budget returned whole);
      'revalidate' — stale but a validator exists: conditional GET
                     (If-None-Match when an ETag is held, else
                     If-Modified-Since) — a 304 costs headers, not body;
      'refetch'    — stale, no validator: full GET.

    The reference refetches unconditionally (its RSS recency filter is
    time-based only); at 10^10 URLs the 304 ratio IS the crawl budget,
    which is why the planner is a first-class operator.  ETag is
    preferred over Last-Modified (RFC 9110 §13.1.1's strong-validator
    preference).  max-age NULL means no freshness lifetime was granted
    (always at least revalidate); max-age 0 likewise.

    `now` is an explicit parameter (a timestamp literal/Column), never
    wall-clock inside the plan — determinism and replay.

    Zero shuffle: one codegen'd CASE over the fetch-metadata scan.

    Output: input keys + (age_s, action, validator)."""
    age = (
        F.unix_timestamp(F.lit(now)) - F.unix_timestamp(F.col(fetched_col))
    ).cast("long")
    has_etag = F.col(etag_col).isNotNull()
    has_lm = F.col(last_mod_col).isNotNull()
    fresh = F.col(max_age_col).isNotNull() & (age < F.col(max_age_col))
    action = (
        F.when(fresh, F.lit("fresh"))
        .when(has_etag | has_lm, F.lit("revalidate"))
        .otherwise(F.lit("refetch"))
    )
    validator = F.when(
        ~fresh & has_etag, F.lit("etag")
    ).when(~fresh & has_lm, F.lit("last-modified"))
    return fetches.select(
        F.col(url_col).alias("url"),
        age.alias("age_s"),
        action.alias("action"),
        validator.alias("validator"),
    )
