"""Corpus term statistics: TF-IDF-style salient-term extraction.

The classic corpus-analytics query over a crawl's document table:
which terms characterize each document against the whole corpus?
Plan shape is the scalable one — explode to (doc, term) counts
(map-side combinable), one aggregate to the document-frequency table,
one equi-join on term (AQE-routed; the df table is |vocab| rows, far
smaller than the corpus), then a per-doc top-k window (bounded by the
doc's own vocabulary, never a skew bomb).

Scoring uses the RATIONAL idf surrogate ``tf * N / df`` quantized by
integer arithmetic (``(tf * N * 10000) DIV df``) rather than
``tf * ln(N/df)``: transcendental functions round differently across
engines (JVM Math.log vs libm), which would make a floor-quantized
score a knife-edge in the cross-engine oracle gate.  The ranking it
induces is the same family (monotone in tf and 1/df); swap in
``F.log`` for production scoring where bit-exactness across engines
is not a contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` salient terms per document by the rational TF-IDF
    score above; ties break toward the lexicographically smaller term.
    Tokenization is the corpus convention (trim + lower + split \\s+).
    Output: (id, term, score_q, rk)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs)).select(
        F.col(id_col),
        "term",
        F.expr("(tf * n * 10000) DIV df").alias("score_q"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score_q"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "score_q", F.col("rk").cast("long").alias("rk"))
    )


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, corpus
    tokenization (trim + lower + split \\s+).  Zero-shuffle scan
    stage; docs with < 2 tokens yield no rows.

    zip_with over two shifted slices, NOT transform over element_at:
    a HOF lambda body runs once per element in interpreted mode and
    re-evaluates every outer expression it references, so the old
    element_at(toks, i) form re-ran the \\s+ split per PAIR — O(L²)
    regex work per row (the repetition-module lesson, BENCH.md r4).
    Here the token array appears only as a HOF argument (evaluated
    once per row) and the lambda touches its element values alone."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.filter(F.trim(F.col(text_col)) != "")
        .filter(F.size(toks) >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("_p"))
        .select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


def lm_doc_scores(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020
    filter corpora by LM perplexity; reference has no analogue — this
    is the training-data tier): train a bigram model on `model_docs`
    (a trusted reference corpus — THE filtering configuration: junk
    bigrams are out-of-model and score 0) or, when omitted, on `docs`
    itself (corpus-self statistics; note a self-trained
    mean-probability REWARDS repetitive docs whose transitions are
    deterministic — pair it with the repetition signals, don't use it
    alone as a junk gate).

    Integer-exact scoring for the cross-engine oracle gate:
    p(w2|w1) is surrogate ``(c(w1,w2) * 10^6) DIV c1(w1)`` where c1
    counts w1 as a bigram PREFIX (so probabilities over successors of
    a fixed w1 sum to ~1), and the doc score is the integer mean of
    its per-occurrence surrogates.  Production would sum logs; the
    mean-probability form keeps every step BIGINT while inducing the
    same junk-vs-fluent separation.

    Plan: one explode to bigram occurrences, one map-side-combinable
    count per distinct bigram (the "training" pass), prefix counts by
    a second aggregation OF THE BIGRAM TABLE (|bigram vocab| rows, not
    the corpus), then one equi-join of doc occurrences against the
    |vocab|-sized model table and a per-doc mean.  Every join is an
    equi-join on the bigram key — hash-partitionable at any corpus
    size; no broadcast of anything corpus-proportional.

    Output: (id, n_bigrams, lm_q)."""
    bg = doc_bigrams(docs, id_col, text_col)
    mbg = (
        bg
        if model_docs is None
        else doc_bigrams(model_docs, id_col, text_col)
    )
    # model: bigram counts + prefix counts (derived from the bigram
    # table, so both "passes" share one shuffle of md5-sized keys)
    c2 = mbg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("_c2")
    )
    c1 = c2.groupBy("w1").agg(F.sum("_c2").cast("long").alias("_c1"))
    model = c2.join(c1, "w1").select(
        "w1", "w2",
        F.expr("_c2 * 1000000 div _c1").cast("long").alias("_pq"),
    )
    # LEFT join: an out-of-model bigram is evidence of junk and must
    # drag the mean down as p=0, not silently vanish from it
    return (
        bg.join(model, ["w1", "w2"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("sum(coalesce(_pq, 0)) div count(1)")
            .cast("long")
            .alias("lm_q"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 keyword search: inverted index + query-time top-k.


def inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The postings table (term, id, tf, dl) — the search index a
    crawl's article store feeds (reference stores articles for search
    downstream, e.g. its ElasticSearch sink, newsplease config
    elasticsearch section; the INDEX itself has no reference analogue
    — this is the engine-side equivalent of what that sink delegates).

    One explode + one map-side-combinable count per distinct
    (term, doc) — the only corpus shuffle, and it IS the index build
    (at scale, write this bucketed by term and query-time joins are
    shuffle-free).  ``dl`` (the doc's token count) rides each posting
    from the explode stage, the denormalization real impact-ordered
    indexes use, so scoring never joins back to a doc-length table."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.size(toks).cast("long").alias("dl"),
            F.explode(toks).alias("term"),
        )
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def bm25_topk(
    queries: DataFrame,
    docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k document retrieval (Robertson & Sparck Jones'
    probabilistic ranking; the Okapi BM25 form with k1=1.2, b=0.75)
    for a small query table (query_id, text) against the corpus.

    Integer-exact scoring for the cross-engine oracle gate (the same
    contract as tfidf_top_terms: transcendental log rounds differently
    across engines, so the idf uses the RATIONAL Robertson surrogate):

      idf_q    = ((2*(N - df) + 1) * 10^6) DIV (2*df + 1)
                 -- the (N-df+.5)/(df+.5) ratio, scale 10^6, no log
      norm_q   = 250 + (750 * dl) DIV avgdl        -- 10^3 * (1-b+b*dl/avgdl)
      tf_q     = (tf * 22 * 10^8) DIV (tf * 10^6 + 1200 * norm_q)
                 -- 10^3 * tf*(k1+1)/(tf + k1*norm), saturates at 2200
      score_q  = sum over distinct query terms of idf_q * tf_q

    avgdl is integer ``total_tokens DIV N``.  The induced ranking is
    monotone in the true BM25 per term (both factors are); swap log
    idf (doubles) in production where cross-engine bit-exactness is
    not a contract.  BIGINT headroom: idf_q <= 2e6*N/df and tf_q <=
    2200, so contributions stay under 2^63 through corpus sizes ~1e12
    unless a term's df is 1 at N~1e10 — at that point switch the idf
    scale from 1e6 to 1e3 (one constant), or DECIMAL.

    Plan: the corpus appears ONLY through the postings build (or a
    pre-built `postings` index table, the incremental/search-service
    shape); the query side is |Q| rows — query terms join the df table
    and then BROADCAST into the postings join, so query-time cost is
    one broadcast-hash scan of the matching postings plus one
    (query, doc) aggregation.  Nothing corpus-proportional ever
    broadcasts; ties rank toward the smaller doc id.

    Output: (query_id, doc_id, score_q, rk), rk <= k per query."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    post = inverted_index(docs, id_col, text_col) if postings is None else postings
    if postings is None:
        # df/avgdl stats, and the scoring join, each consume the
        # postings build — unpersisted, the tokenize+explode+groupBy
        # re-ran three times per query
        post = post.persist()
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("_df"))
    stats = post.select(id_col, "dl").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("dl").cast("long").alias("_tot"),
    )
    qterms = queries.select(
        F.col("query_id"),
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        ).alias("term"),
    ).filter(F.col("term") != "")
    qidf = (
        F.broadcast(qterms)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "term",
            F.expr("(2*(_n - _df) + 1) * 1000000 div (2*_df + 1)").alias("_idf"),
            F.expr("_tot div _n").alias("_avgdl"),
        )
    )
    # Co-partition the postings by DOC before the broadcast scoring
    # join: the join then stays hash(doc)-partitioned, and since
    # {doc} ⊆ {query, doc} the (query, doc) aggregate needs NO
    # exchange — with a Zipfian vocabulary the per-term join output is
    # ~|post|·|qterms|/|vocab| rows (10^8 at the 10× SF), and shuffling
    # that into the aggregate was the entry's whole cost. The shuffle
    # this ADDS is the narrow postings table once.
    post_doc = post.repartition(F.col(id_col))
    cand = post_doc.join(F.broadcast(qidf), "term").select(
        "query_id",
        F.col(id_col),
        (
            F.col("_idf")
            * F.expr(
                "(tf * 2200000000) div"
                " (tf * 1000000 + 1200 * (250 + (750 * dl) div _avgdl))"
            )
        ).alias("_c"),
    )
    scores = cand.groupBy("query_id", id_col).agg(
        F.sum("_c").cast("long").alias("score_q")
    )
    # (The ranking exchange is already bounded: Spark 3.5+ inserts a
    # partial WindowGroupLimit below it, keeping ≤ k rows per query
    # per partition — a hand-rolled local top-k prune was tried and
    # removed as redundant with it.)
    w = Window.partitionBy("query_id").orderBy(F.desc("score_q"), F.asc(id_col))
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "score_q", F.col("rk").cast("long").alias("rk"))
    )


def cooccurrence_counts(
    docs: DataFrame,
    window: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Directional token co-occurrence counts within a ±window token
    distance — the corpus statistic GloVe/word2vec-style embedding
    training consumes (Pennington et al. 2014 build exactly this
    matrix).  Returns (w1, w2, n_pair) where w1 precedes w2 by at most
    `window` positions.

    Pair extraction is `window` zip_with's over shifted slices (the
    interpreted-HOF-safe shape — no element_at re-evaluation), unioned
    INSIDE the array domain with concat before one explode, so the
    whole build rides the scan; the only shuffle is the final
    (w1, w2) count, map-side combinable with fixed-width-ish keys.
    Distance weighting (GloVe's 1/d) is deliberately left to the
    consumer: counts stay integers and oracle-exact."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    arrays = []
    for d in range(1, int(window) + 1):
        m = F.greatest(F.size(toks) - d, F.lit(0))
        arrays.append(
            F.zip_with(
                F.slice(toks, 1, m),
                F.slice(toks, 1 + d, m),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        )
    pairs = arrays[0] if len(arrays) == 1 else F.concat(*arrays)
    return (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(F.explode(pairs).alias("_p"))
        .groupBy(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
    )


def phrase_scores(
    docs: DataFrame,
    delta: int = 5,
    min_pair: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """word2phrase collocation mining (Mikolov et al. 2013 §4): score
    adjacent pairs by the discounted lift

        score_q = max(n_pair - delta, 0) * n_tokens * 10^4
                  div (n_w1 * n_w2)

    — the integer-quantized form of (c_ab - δ) / (c_a · c_b) · N.
    Ranking by lift is ranking by PMI (log is monotone); the log
    itself is deliberately avoided so the score is BIGINT-exact
    cross-engine (the tfidf_top_terms convention).  The max(…, 0)
    clamp both matches word2phrase (below-discount pairs never
    promote) and keeps the integer division floor/truncate-agnostic.
    Pairs seen < min_pair times are dropped before scoring.

    Scale shape: pair counts from `cooccurrence_counts(window=1)`;
    unigram counts via one combinable explode-count; the two unigram
    joins are equi-joins on the token key (vocab-sized side, spills
    fine); the corpus token total rides a 1-row broadcast crossJoin.
    At 10^12-token scale the quantized surrogate is the GATE — a
    production ranker would keep doubles after the same joins."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = docs.filter(F.trim(F.col(text_col)) != "")
    pairs = cooccurrence_counts(base, window=1, id_col=id_col, text_col=text_col)
    pairs = pairs.filter(F.col("n_pair") >= int(min_pair))
    uni = (
        base.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    total = uni.agg(F.sum("c").cast("long").alias("n_tok"))
    ca = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    cb = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    return (
        pairs.join(ca, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.expr(
                f"(greatest(n_pair - {int(delta)}, 0) * n_tok * 10000) "
                "div (c_a * c_b)"
            )
            .cast("long")
            .alias("score_q"),
        )
    )


def positional_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, id, pos) positional postings — one row per token
    occurrence, 0-based position. The phrase-query companion of
    inverted_index's impact postings (at scale, bucket by term like
    the tf index and phrase joins are shuffle-free)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col), F.posexplode(toks).alias("pos", "term")
        )
        .select("term", id_col, F.col("pos").cast("int").alias("pos"))
    )


def phrase_search(
    docs: DataFrame,
    phrases: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-token phrase search over positional postings with the
    ANCHOR-ALIGNMENT join: a phrase [t_0..t_{n-1}] matches doc d at
    anchor a iff the postings contain (t_i, d, a+i) for every slot i —
    so every posting hit projects anchor = pos − i and a match is a
    (query, doc, anchor) group covering all n DISTINCT slots. ONE
    postings join + ONE combinable aggregate for phrases of ANY
    length — no per-term join chain (the naive plan shuffles once per
    phrase word; this shape's cost is independent of n), no Window.
    Repeated words in a phrase are handled by the distinct-slot count
    (each slot must be witnessed at its own offset).

    `phrases`: (query_id, phrase) with exactly n whitespace tokens per
    phrase (validated). Returns (query_id, doc_id, n_hits, first_pos):
    distinct match anchors per doc and the earliest one.

    Join shape: a (query, doc, anchor) group covers all n slots iff the
    doc's n consecutive tokens at `anchor` equal the phrase's tokens —
    i.e. the doc's n-gram AT that anchor equals the (whitespace-
    normalized) phrase string. So instead of joining per-TERM (with a
    Zipfian vocabulary every common term matches almost every posting:
    |hits| ~ |post|·|query terms|/|vocab| rows into the slot-covering
    aggregate), join the doc's n-gram table against the phrase string
    directly — only TRUE matches survive the equi-join, and both
    aggregates collapse into one. Bit-identical output (tokens cannot
    contain whitespace, so the single-space join is injective)."""
    ptoks = F.split(F.trim(F.lower(F.col("phrase"))), r"\s+")
    terms = phrases.select(
        "query_id", F.posexplode(ptoks).alias("i", "term")
    )
    bad = terms.groupBy("query_id").agg(F.max("i").alias("_m")).filter(
        F.col("_m") != n - 1
    )
    if bad.limit(1).count() > 0:
        raise ValueError(f"every phrase must have exactly {n} tokens")
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") >= n)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_t") - n),
                    lambda a: F.concat_ws(
                        " ", F.slice(F.col("_t"), a + 1, n)
                    ),
                )
            ).alias("anchor", "_gram"),
        )
    )
    q = phrases.select(
        "query_id", F.concat_ws(" ", ptoks).alias("_gram")
    )
    return (
        grams.join(q, "_gram")
        .groupBy("query_id", id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.min("anchor").cast("int").alias("first_pos"),
        )
    )


def rrf_fuse(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 60,
    scale: int = 10_000_000,
    query_col: str = "query",
    item_col: str = "item",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher SIGIR 2009)
    — THE standard hybrid-retrieval combiner: fuse a lexical run
    (bm25_topk) with a dense run (brute_force/lsh/ivf topk) without
    score calibration, because RRF consumes only RANKS:
        rrf(d) = SUM over runs of 1 / (k + rank_run(d)).
    k=60 is the paper's (and every search engine's) default; items
    missing from a run contribute nothing for that run.

    Integer-exact: each term is floor(scale / (k + rank)) on BIGINTs,
    so fused scores and the final ordering hash-compare cross-engine.
    With scale 10^7 and k=60 consecutive ranks stay distinguishable
    through rank ~3000 — far past any top-k run depth.

    Distribution: one full-outer hash join on (query, item) + one
    query-keyed window for the fused rank — run tables are top-k-sized
    (queries x k rows), orders of magnitude below corpus scale.

    Output: (query, item, rrf_q, fused_rank 1-based)."""
    if k < 0 or scale <= 0:
        raise ValueError("k must be >= 0 and scale positive")

    def norm(df, tag):
        return df.select(
            F.col(query_col).alias("query"),
            F.col(item_col).alias("item"),
            F.floor(F.lit(int(scale)) / (F.lit(int(k)) + F.col(rank_col)))
            .cast("long")
            .alias(tag),
        )

    a = norm(run_a, "_ra")
    b = norm(run_b, "_rb")
    fused = a.join(b, ["query", "item"], "full_outer").select(
        "query",
        "item",
        (F.coalesce(F.col("_ra"), F.lit(0)) + F.coalesce(F.col("_rb"), F.lit(0)))
        .cast("long")
        .alias("rrf_q"),
    )
    w = Window.partitionBy("query").orderBy(
        F.col("rrf_q").desc(), F.col("item").asc()
    )
    return fused.withColumn("fused_rank", F.row_number().over(w))
