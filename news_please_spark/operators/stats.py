"""Exact distributed quantiles by group — rank statistics without a
per-group sort of the data.

approxQuantile is Spark's built-in answer, but a corpus audit wants the
EXACT p50/p90/p99 (and an oracle-checkable one).  The naive exact plan
sorts every group's rows through one task (the same skew bomb as the
naive top-fraction window).  This implementation reuses the histogram
trick topfrac_per_group established: aggregate to (group, value) counts
(map-side combinable, the only pass over the data), run the cumulative
sum over the HISTOGRAM (bounded by distinct values, not rows), and read
each quantile as the smallest value whose cumulative count reaches the
rank.  Quantiles are integer percents and ranks are ceil(n*q/100) in
exact integer arithmetic, so any engine reproduces the result
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percents: list[int],
) -> DataFrame:
    """(group, n, p<q> for each q): exact q-th percentile per group,
    where p<q> = the value at ascending rank ceil(n*q/100) (the
    discrete/lower quantile — SQL's quantile_disc).  percents are
    integers in (0, 100].  NULL values are excluded before ranking
    (engines disagree on NULL sort position — Spark ASC puts them
    first, DuckDB last — so including them would make the result
    engine-dependent); n counts non-null values only."""
    if not percents:
        raise ValueError("percents must be non-empty")
    if any(not (0 < q <= 100) for q in percents):
        raise ValueError(f"percents must be in (0, 100], got {percents}")
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    wc = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wg = Window.partitionBy(group_col)
    hist = hist.select(
        group_col,
        value_col,
        F.sum("_cnt").over(wc).alias("_cum"),
        F.sum("_cnt").over(wg).alias("_n"),
    )
    # every percentile reads off the SAME cumulative histogram in one
    # aggregation (min of value where cum reaches the rank) — one
    # window, one final groupBy, however many percentiles are asked
    aggs = [F.max("_n").alias("n")] + [
        F.min(
            F.when(
                F.col("_cum") >= F.expr(f"(_n * {int(q)} + 99) DIV 100"),
                F.col(value_col),
            )
        ).alias(f"p{int(q)}")
        for q in percents
    ]
    return hist.groupBy(group_col).agg(*aggs)


def ngram_diversity(
    df: DataFrame,
    n: int = 2,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group lexical diversity of a corpus slice — the health
    metric a curation team reads before weighting a source into a
    training mixture (a templated/spun source shows low diversity long
    before eyeballing finds it):

      * ``slots``      total n-gram slots in the group
      * ``types``      distinct n-grams
      * ``ttr_bp``     type-token ratio in basis points
        (types·10⁴ DIV slots)
      * ``simpson_bp`` Simpson diversity 10⁴ − 10⁴·Σc(c−1) DIV T(T−1):
        the probability (bp) that two random slots hold DIFFERENT
        grams. Rational in the counts, so exact integer arithmetic
        end-to-end (the terms.py lesson: no transcendentals inside an
        oracle-gated score; Shannon entropy's log is the knife-edge
        this metric family avoids at no analytical cost). A group
        with a single slot reports 10⁴ (no pair to collide).

    Scale: explode to (group, md5(gram)) counts — map-side combinable,
    fixed-width keys, ONE data-sized shuffle; the per-group reduce is
    |distinct grams| rows, never raw text."""
    from news_please_spark.operators.repetition import ngrams

    counts = (
        df.select(
            F.col(group_col),
            F.explode(ngrams(F.lower(F.col(text_col)), n)).alias("_g"),
        )
        .select(group_col, F.md5("_g").alias("_g"))
        .groupBy(group_col, "_g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = counts.groupBy(group_col).agg(
        F.sum("c").alias("slots"),
        F.count(F.lit(1)).alias("types"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("_coll"),
    )
    t = F.col("slots")
    return agg.select(
        group_col,
        t.alias("slots"),
        F.col("types"),
        F.expr("types * 10000 DIV slots").alias("ttr_bp"),
        F.when(t > 1, 10000 - F.expr("_coll * 10000 DIV (slots * (slots - 1))"))
        .otherwise(F.lit(10000).cast("long"))
        .alias("simpson_bp"),
    )


def vocab_drift(
    old_docs: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Distribution-shift audit between two corpus snapshots (last
    month's crawl vs this month's): per-term occurrence RATES (parts
    per million of each side's token mass) and their difference,
    top_k terms by |drift| — the cheap early-warning that a source
    changed template, language mix, or topic profile before a
    training run bakes the shift in. Integer-exact: rates are
    floor(1e6 * count / total) so the ranking reproduces cross-engine
    (no log-ratio floats); terms below min_count on BOTH sides are
    noise and dropped.

    Scale shape: one map-side-combinable term count per side (the
    vocab-sized shuffle every corpus stat here pays), totals ride a
    1-row broadcast, final top-k is a global sort of the
    min_count-filtered vocab (vocab-sized, not corpus-sized)."""
    from news_please_spark.functions.text import tokens

    def counts(df):
        return (
            df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    old_c = counts(old_docs)
    new_c = counts(new_docs)
    tot_old = old_c.agg(F.sum("n").alias("t_old"))
    tot_new = new_c.agg(F.sum("n").alias("t_new"))
    joined = (
        old_c.withColumnsRenamed({"n": "n_old"})
        .join(new_c.withColumnsRenamed({"n": "n_new"}), "term", "full_outer")
        .select(
            "term",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .filter((F.col("n_old") >= min_count) | (F.col("n_new") >= min_count))
        .crossJoin(F.broadcast(tot_old))
        .crossJoin(F.broadcast(tot_new))
    )
    rate_old = F.floor(F.lit(1_000_000) * F.col("n_old") / F.col("t_old")).cast("long")
    rate_new = F.floor(F.lit(1_000_000) * F.col("n_new") / F.col("t_new")).cast("long")
    scored = joined.select(
        "term",
        F.col("n_old").cast("long").alias("n_old"),
        F.col("n_new").cast("long").alias("n_new"),
        rate_old.alias("rate_old_ppm"),
        rate_new.alias("rate_new_ppm"),
        (rate_new - rate_old).alias("drift_ppm"),
    )
    return scored.orderBy(
        F.abs(F.col("drift_ppm")).desc(), F.col("term")
    ).limit(top_k)


def tokenizer_fertility(
    docs: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility audit per corpus slice — the
    budget-planning numbers a training pipeline reads before fixing a
    token budget: subtokens-per-word ("fertility", Ács 2019's metric
    for how much a tokenizer fragments a language) and
    bytes-per-subtoken (compression rate).  A slice whose fertility is
    2x the corpus mean either needs tokenizer retraining or is
    mojibake/OCR junk that slipped the quality gates — both are
    per-(source, lang) decisions, which is why the grain is the slice,
    not the corpus.

    Uses the same whitespace-word and BPE-ish subtoken definitions as
    token_totals/bpe_token_totals (functions/text.py) so the three
    reports reconcile.  Ratios are integer-exact: floor((10^4 * a) DIV
    b) on BIGINT sums — no float division crosses the engine boundary.

    Distribution: one map-side-combinable aggregate over per-row
    native column expressions (codegen'd, zero Python); the group key
    cardinality is sources x langs — a broadcast-sized result at any
    corpus scale."""
    from news_please_spark.functions.text import bpe_ish_tokens, tokens

    t = F.col(text_col)
    per_row = docs.select(
        *group_cols,
        F.size(tokens(t)).cast("long").alias("_w"),
        F.size(bpe_ish_tokens(t)).cast("long").alias("_st"),
        F.octet_length(t).cast("long").alias("_b"),
    )
    agg = per_row.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_w").cast("long").alias("n_words"),
        F.sum("_st").cast("long").alias("n_subtokens"),
        F.sum("_b").cast("long").alias("n_bytes"),
    )
    return agg.withColumns(
        {
            "fertility_q": F.when(
                F.col("n_words") > 0,
                F.expr("(10000 * n_subtokens) DIV n_words"),
            )
            .otherwise(F.lit(None))
            .cast("long"),
            "bytes_per_subtoken_q": F.when(
                F.col("n_subtokens") > 0,
                F.expr("(10000 * n_bytes) DIV n_subtokens"),
            )
            .otherwise(F.lit(None))
            .cast("long"),
        }
    )


def lang_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Code-switch segmentation — per-SENTENCE language id merged into
    maximal same-language runs.  A document whose tail is boilerplate
    in another language (embedded share widgets, translated footers,
    quoted sources) poisons doc-level lang-id and monolingual training
    mixes; the per-run view is what lets a pipeline keep the dominant-
    language segments and drop (or reroute) the switched ones — the
    cleaning axis doc-level lang_id cannot express.

    Same sentence regex as sentence_chunks (RE2-safe), same stopword-
    vote scorer as lang_id (functions/text.py::predict_lang) applied
    INSIDE a transform lambda, and the run-length merge is the same
    codegen'd per-document F.aggregate fold — zero shuffle, zero
    Python; sequential logic stays inside the row.

    Output: (doc_id, seg_id 0-based, lang, n_sentences, seg_text)."""
    from news_please_spark.functions.text import predict_lang

    raw = F.regexp_extract_all(F.col(text_col), F.lit(r"[^.!?]+[.!?]*"), 0)
    sents = F.transform(
        F.filter(raw, lambda s: F.trim(s) != F.lit("")), lambda s: F.trim(s)
    )
    pairs = F.transform(
        sents,
        lambda s: F.struct(s.alias("txt"), predict_lang(s).alias("lang")),
    )
    init = F.struct(
        F.array()
        .cast("array<struct<lang:string,n:int,txt:string>>")
        .alias("segs")
    )

    def step(acc, p):
        segs = acc["segs"]
        last = F.element_at(segs, -1)
        same = (F.size(segs) > 0) & (last["lang"] == p["lang"])
        merged = F.concat(
            F.slice(segs, 1, F.size(segs) - 1),
            F.array(
                F.struct(
                    last["lang"].alias("lang"),
                    (last["n"] + 1).cast("int").alias("n"),
                    F.concat(last["txt"], F.lit(" "), p["txt"]).alias("txt"),
                )
            ),
        )
        opened = F.concat(
            segs,
            F.array(
                F.struct(
                    p["lang"].alias("lang"),
                    F.lit(1).cast("int").alias("n"),
                    p["txt"].alias("txt"),
                )
            ),
        )
        return F.struct(
            F.when(same, merged).otherwise(opened).alias("segs")
        )

    segs = F.aggregate(pairs, init, step, lambda acc: acc["segs"])
    return (
        docs.select(F.col(id_col).alias("doc_id"), segs.alias("_s"))
        .select("doc_id", F.posexplode("_s").alias("seg_id", "_e"))
        .select(
            "doc_id",
            "seg_id",
            F.col("_e.lang").alias("lang"),
            F.col("_e.n").cast("long").alias("n_sentences"),
            F.col("_e.txt").alias("seg_text"),
        )
    )


def first_discovery(
    disc: DataFrame,
    channel_rank: dict[str, int],
    url_col: str = "url",
) -> DataFrame:
    """Discovery-source attribution: for every URL, the EARLIEST
    discovery record — by wave, then by channel preference (e.g. a
    sitemap listing outranks an incidental link seen the same wave),
    then by source id for a total order. The provenance table behind
    crawl-acquisition dashboards ("how do we find our pages?") and
    channel-budget decisions.

    One map-side-combinable min(struct) aggregation on url — no
    window, no sort of the full discovery log; the channel-rank map
    rides as a literal expression."""
    if not channel_rank:
        raise ValueError("channel_rank is empty")
    rank = F.create_map(
        *[F.lit(x) for kv in channel_rank.items() for x in kv]
    )[F.col("channel")]
    best = F.min(
        F.struct(
            F.col("wave").cast("long").alias("wave"),
            rank.cast("long").alias("crank"),
            F.col("src").alias("src"),
            F.col("channel").alias("channel"),
        )
    ).alias("_b")
    return (
        disc.groupBy(F.col(url_col).alias("url"))
        .agg(best)
        .select(
            "url",
            F.col("_b.wave").alias("first_wave"),
            F.col("_b.channel").alias("channel"),
            F.col("_b.src").alias("src"),
        )
    )


def lang_mismatch_audit(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Declared-vs-detected language audit per (source, declared lang)
    slice: how often does the stopword-vote detector (the oracle-gated
    predict_lang) disagree with the metadata? High mismatch_bp flags a
    feed whose lang tags are wrong — the signal that routes a slice to
    re-detection before language-balanced sampling trusts its labels.

    Counts: n_docs, n_det (detector reached a verdict, pred != 'und'),
    n_mismatch (verdict differs from the declared tag), mismatch_bp =
    floor(10000 * n_mismatch / n_det) (NULL when the detector never
    fired). ONE map-side-combinable aggregation; the detector is a
    codegen'd Column, no Python."""
    from news_please_spark.functions.text import predict_lang

    pred = predict_lang(F.col(text_col))
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        pred.alias("_pred"),
    )
    det = (F.col("_pred") != "und").cast("long")
    mism = ((F.col("_pred") != "und") & (F.col("_pred") != F.col("lang"))).cast(
        "long"
    )
    return (
        base.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(det).cast("long").alias("n_det"),
            F.sum(mism).cast("long").alias("n_mismatch"),
        )
        .withColumn(
            "mismatch_bp",
            F.when(
                F.col("n_det") > 0,
                F.expr("(10000 * n_mismatch) div n_det"),
            ).cast("long"),
        )
    )


def path_rollup(
    urls: DataFrame,
    max_depth: int = 2,
    host_col: str = "host",
    path_col: str = "path",
    weight_col: str | None = None,
) -> DataFrame:
    """Directory-prefix rollup of a URL table: one row per (host,
    prefix) for every prefix depth 0..max_depth, counting the URLs
    under that directory (and summing `weight_col` if given) — the
    per-directory view a crawl scheduler budgets on (a spammy or
    low-quality /calendar/ subtree is demoted wholesale, the way the
    reference's per-site rules act on whole URL subtrees via regex
    ignore; this is the aggregate that FINDS those subtrees).

    Depth 0 is the host root "/"; depth d is the first d path
    segments.  A URL only contributes to depths up to its own segment
    count, so every output row's n_urls is exactly the number of
    URLs at-or-below that directory.

    Scale shape: the explode is a map-side flat map bounded by
    max_depth+1 rows per URL (no shuffle); the single exchange is the
    (host, prefix) aggregation, map-side combinable.  Hot directories
    are hot KEYS, not hot partitions — the md5-spread of (host,
    prefix) hash partitioning.  Nothing collects."""
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    segs = F.filter(F.split(F.col(path_col), "/"), lambda s: s != F.lit(""))
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    base = urls.select(
        F.col(host_col).alias("host"),
        segs.alias("_segs"),
        w.alias("_w"),
    ).select(
        "host",
        "_w",
        F.explode(
            F.sequence(
                F.lit(0), F.least(F.lit(max_depth), F.size("_segs"))
            )
        ).alias("depth"),
        "_segs",
    )
    prefix = F.concat(
        F.lit("/"), F.array_join(F.slice("_segs", 1, F.col("depth")), "/")
    )
    return (
        base.select(
            "host",
            F.col("depth").cast("long").alias("depth"),
            prefix.alias("prefix"),
            "_w",
        )
        .groupBy("host", "depth", "prefix")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum("_w").cast("long").alias("total_w"),
        )
    )


def histogram_drift(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
    epoch_col: str,
) -> DataFrame:
    """Per-group distribution drift between two epochs as the total-
    variation distance of the bucket histograms, in floor basis points
    — the corpus-monitoring gate that catches a source whose length /
    quality / language mix shifted between snapshots BEFORE the shift
    poisons a mixture (vocab_drift's distributional twin: that one
    diffs token sets, this one diffs any bucketed distribution).

    `epoch_col` must be 0/1.  For group g with per-bucket counts
    a_i (epoch 0, total A) and b_i (epoch 1, total B)::

        drift_bp = floor(10000 * SUM_i |a_i*B - b_i*A| / (2*A*B))

    Pure BIGINT arithmetic (TV distance needs no logs, unlike KL/PSI)
    so the result is bit-identical across engines.  Overflow bound:
    |a_i*B| <= A*B, so the sum is <= 2*A*B and the 10000x numerator
    fits int64 while A*B < 4.6e14 (~2*10^7 rows per group per epoch);
    above that, cast the products to decimal(38,0) — the plan shape is
    unchanged.  Groups missing an epoch entirely report NULL (no
    distribution to compare).

    Scale shape: one map-side-combinable count aggregation on (group,
    bucket) — conditional sums, no pivot — then a second on (group):
    the histogram rows (bounded by distinct buckets), never the data,
    pass through the group-total join."""
    counts = (
        df.groupBy(
            F.col(group_col).alias("grp"), F.col(bucket_col).alias("bkt")
        )
        .agg(
            F.sum(
                F.when(F.col(epoch_col) == 0, 1).otherwise(0)
            ).cast("long").alias("_a"),
            F.sum(
                F.when(F.col(epoch_col) == 1, 1).otherwise(0)
            ).cast("long").alias("_b"),
        )
    )
    totals = counts.groupBy("grp").agg(
        F.sum("_a").cast("long").alias("_ta"),
        F.sum("_b").cast("long").alias("_tb"),
    )
    return (
        counts.join(totals, "grp")
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.max("_ta").alias("n_epoch0"),
            F.max("_tb").alias("n_epoch1"),
            F.sum(
                F.abs(F.col("_a") * F.col("_tb") - F.col("_b") * F.col("_ta"))
            ).cast("long").alias("_num"),
        )
        .select(
            group_col,
            "n_epoch0",
            "n_epoch1",
            F.when(
                (F.col("n_epoch0") > 0) & (F.col("n_epoch1") > 0),
                F.expr("(10000 * _num) div (2 * n_epoch0 * n_epoch1)"),
            ).cast("long").alias("drift_bp"),
        )
    )


def key_skew_audit(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """One-row skew report for a prospective shuffle key: how unequal
    the per-key row counts are BEFORE a groupBy/join commits to that
    key — the planning signal that decides salting / AQE skew-join /
    an IP-pool split (the north rule's explicit-skew-handling axis as
    a measurable, not a vibe).

        n_keys   — distinct keys
        n_rows   — total rows
        gini_bp  — exact Gini coefficient of per-key counts in floor
                   basis points: G = SUM_i (2i - n - 1)·x_i / (n·SUM x)
                   with x ascending, i the 1-based global rank —
                   0 = perfectly even, ->10^4 = one key holds all
        top1_bp / topN_bp — share of the heaviest 1 / top_n keys

    Integer-exact end to end (ranks via the two-phase global sequence
    — no single-task window over the key table), so any engine
    reproduces it bit-for-bit.  Ties order by (count, key) making the
    rank total; Gini is tie-order-invariant anyway (equal x_i swap
    ranks without changing the sum).

    Scale shape: ONE map-side-combinable count per key; everything
    after runs on the per-key table (1 row per key).  The rank pass
    is with_global_seq's range partition (driver holds one count per
    PARTITION, never per key); the head shares are a top_n sort-limit
    (tiny).  Overflow: SUM_i (2i-n-1)·x_i < 2n·SUM x, so int64 holds
    while n_keys·n_rows < 4.6e18 — at 10^8 hosts × 10^10 rows cast
    the product terms to decimal(38,0), same plan."""
    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    from news_please_spark.operators.ordering import with_global_seq

    caches: list[DataFrame] = []
    ranked, n_keys = with_global_seq(
        counts, ["_c", "_k"], out="_i", caches=caches
    )
    from news_please_spark.operators.cacheutil import release_df

    gini = ranked.groupBy().agg(
        F.sum("_c").alias("n_rows"),
        F.sum((2 * (F.col("_i") + 1) - F.lit(n_keys) - 1) * F.col("_c")).alias(
            "_num"
        ),
    )
    top = (
        counts.orderBy(F.desc("_c"), F.asc("_k"))
        .limit(top_n)
        .groupBy()
        .agg(
            F.max("_c").alias("_top1"),
            F.sum("_c").alias("_topn"),
        )
    )
    out = (
        gini.join(F.broadcast(top))
        .select(
            F.lit(n_keys).cast("long").alias("n_keys"),
            F.col("n_rows").cast("long"),
            F.when(
                (F.lit(n_keys) > 0) & (F.col("n_rows") > 0),
                F.expr(f"(10000 * _num) div ({n_keys} * n_rows)"),
            ).cast("long").alias("gini_bp"),
            F.expr("(10000 * _top1) div n_rows").cast("long").alias("top1_bp"),
            F.expr("(10000 * _topn) div n_rows").cast("long").alias(
                f"top{top_n}_bp"
            ),
        )
        .localCheckpoint()
    )
    for c in caches:
        release_df(c)
    return out
