"""Training-data mixture sampling + per-group quality selection.

Two operators a large-scale training-data pipeline needs that the
reference (a crawler) stops short of, but that sit naturally on top of
its output tables:

* ``mixture_sample`` — deterministic per-source subsampling ("data
  mixture weights"): keep each row with probability rate[source],
  decided by a content hash of the row id, never by an RNG.  The same
  row is kept or dropped identically on every run, every engine, every
  partitioning — which is what makes training-data mixtures auditable.

* ``topfrac_per_group`` — exact top-⌈frac·n⌉ rows per group by a score
  (per-domain quality filtering).  The naive plan is a row_number()
  window partitioned by group, which funnels every row of a group
  through ONE task — a skew bomb when one domain holds 10^9 documents.
  This implementation aggregates to the (group, score) histogram first,
  computes the per-group admission threshold on the histogram, and
  ranks rows ONLY inside the one boundary (group, score) cell per
  group.  Result is bit-identical to the naive window (ties broken by
  id ascending) while every per-row stage stays bounded.

Both are pure Column/DataFrame compositions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# deterministic hash-fraction sampling


def rate_to_hex8(rate: float) -> str:
    """Map a keep-rate in [0, 1] to the threshold string such that
    `md5(id)[:8] < threshold` keeps ~rate of uniformly-hashed ids.
    Lowercase-hex string comparison is monotonic with the value, so the
    comparison itself needs no hex→int conversion — portable to any
    engine that has md5 and string `<`.

    rate >= 1.0 returns "g": lexicographically above every 8-hex-digit
    lowercase string, so `<` admits ALL rows — including the p=2^-32
    id whose md5 prefix is exactly "ffffffff", which a clamped
    "ffffffff" threshold with strict `<` would wrongly drop."""
    if rate >= 1.0:
        return "g"
    n = min(max(int(round(rate * (1 << 32))), 0), (1 << 32) - 1)
    return format(n, "08x")


def hash_frac_hex8(id_col) -> "F.Column":
    """First 8 hex chars of md5(id) — the uniform [0, 2^32) draw used by
    mixture_sample, as a comparable string."""
    return F.substring(F.md5(id_col.cast("string")), 1, 8)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff md5-hash-fraction(id) < rates[source].

    Sources absent from `rates` are dropped (rate 0); rate 1.0 keeps
    every row of its source (see rate_to_hex8).  Mixture weights are a
    config-sized dict, so the thresholds ride as a LITERAL map in the
    filter expression — no dim table, no join, no Python-RDD
    createDataFrame (whose cold worker launch costs seconds on a fresh
    session): the fact table never shuffles, the filter is map-side,
    and the decision depends only on (id, rate): deterministic across
    runs, partitionings, and engines."""
    thr_map = F.create_map(
        *[
            lit
            for s, r in sorted(rates.items())
            for lit in (F.lit(s), F.lit(rate_to_hex8(r)))
        ]
    )
    # absent source → null threshold → comparison null → row dropped
    return df.filter(
        hash_frac_hex8(F.col(id_col)) < thr_map[F.col(source_col)]
    )


# ---------------------------------------------------------------------------
# exact per-group top-fraction without a per-group global window


def topfrac_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    frac_pct: int,
    id_col: str,
) -> DataFrame:
    """Exactly ⌈frac_pct% · n_g⌉ best rows per group, ordered by
    (score DESC NULLS LAST, id ASC) — equal to
    `row_number() OVER (PARTITION BY g ORDER BY s DESC, id) <= k_g`
    (NULL scores and NULL groups included, matching the window's
    null-safe grouping) but computed skew-safely:

      1. histogram = groupBy(group, score).count()
      2. running count of strictly-better rows per group   (tiny window
         over the histogram COUNTS, not the data rows)
      3. every row whose score cell fits entirely under k_g passes with
         NO per-row ranking; rows of cells entirely at/over k_g are cut
         by the histogram join; only the ONE boundary cell per group
         (_above < k_g < _above + _cnt) ranks its rows by id.

    Skew contract: the per-ROW work is bounded by the largest single
    (group, score) cell that straddles a group's admission boundary —
    with quantized scores (recommended: quality scores at 10^3–10^4
    distinct values) that is ~n_g/cells; with continuous scores every
    cell has ~1 row and the ranking window is trivially bounded too.
    What continuous scores DO degrade is step 2: the histogram collapses
    toward one row per data row, so its per-group running sum approaches
    the naive window's shape (on 3 thin columns, not full rows).  Keep
    scores quantized when groups can be huge.

    frac_pct is an integer percentage so k_g = ⌈n_g·frac_pct/100⌉ is
    exact integer arithmetic — no float boundary flicker between
    engines."""
    hist = df.groupBy(group_col, score_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wk = Window.partitionBy(group_col)
    hist = hist.select(
        F.col(group_col).alias("_g"),
        F.col(score_col).alias("_s"),
        F.col("_cnt"),
        F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_above"),
        # k = ceil(n * frac_pct / 100), integer-exact
        ((F.sum("_cnt").over(wk) * frac_pct + 99) / 100)
        .cast("long")
        .alias("_k"),
    ).filter(F.col("_above") < F.col("_k"))
    # Null-safe equi-join (a plain equi-join would silently drop
    # NULL-score/NULL-group rows that the naive window ranks — e.g. a
    # ratio score over empty text is NULL in Spark). eqNullSafe keeps
    # the join a hash join: <=> is still an equality predicate.
    joined = df.join(
        hist,
        F.col(group_col).eqNullSafe(F.col("_g"))
        & F.col(score_col).eqNullSafe(F.col("_s")),
    )
    # Cells that fit entirely under k pass with no ranking at all — the
    # short-circuit that keeps a heavily-tied admitted cell (one domain,
    # one quantized score for millions of docs) out of any window task.
    full_cells = joined.filter(F.col("_above") + F.col("_cnt") <= F.col("_k"))
    boundary = joined.filter(F.col("_above") + F.col("_cnt") > F.col("_k"))
    rn = F.row_number().over(
        Window.partitionBy("_g", "_s").orderBy(F.col(id_col).asc())
    )
    boundary_adm = boundary.withColumn("_rn", rn).filter(
        F.col("_above") + F.col("_rn") <= F.col("_k")
    )
    return full_cells.select(*df.columns).unionByName(
        boundary_adm.select(*df.columns)
    )


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk)


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    packer_hex: int = 2,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end-to-end in a
    deterministic order and cut the token stream every ``seq_len``
    tokens — the standard pretraining packing step (Brown et al. 2020
    §2.1 pack documents into 2048-token contexts; T5's "pack" preprocessor).
    Beyond the reference crawler's scope; a training-data pipeline needs
    it between corpus hygiene and the trainer.

    Output: one row per (document × chunk it lands in) —
    ``(packer, chunk, id, n_tok, tok_start, tok_end, doc_off)`` where
    ``[tok_start, tok_end)`` is the span of the chunk the document
    fills and ``doc_off`` is the first packed token's offset inside the
    document.  A document longer than ``seq_len`` spans several chunks;
    chunk identity is the pair (packer, chunk).

    Determinism + scale:

    * Order is ``md5(id)`` ascending inside a *packer* — the first
      ``packer_hex`` hex chars of the same md5.  No RNG, no
      partitioning dependence: the same corpus packs identically on
      every run and engine (auditable mixtures, resumable jobs).
    * A single global cumulative sum would be one sort task.  Packers
      shard it: 16^packer_hex independent windows (256 at the default;
      use 4 → 65,536 at the 10^10-doc design point so one packer holds
      ~10^5 docs).  md5 uniformity bounds skew; packing quality is
      unchanged since chunk boundaries never cross packers.
    * Token count is the whitespace convention shared with
      ``token_totals`` (trim + split on ``\\s+``; empty text counts 1),
      so packed-token totals reconcile with corpus audits bit-exactly.
    * Pure Column algebra: window prefix-sum, integer DIV, one
      ``sequence``+``explode`` for the (rare) multi-chunk docs.  No
      Python, no shuffle beyond the packer hash partition + sort.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    # group_cols split the token stream BEFORE packing (e.g. pack the
    # train/val/test splits separately — chunks never cross a group)
    gcols = list(group_cols or [])
    key = F.md5(F.col(id_col).cast("string"))
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    base = df.select(
        *gcols,
        F.col(id_col),
        key.alias("_key"),
        F.substring(key, 1, packer_hex).alias("packer"),
        n_tok.alias("n_tok"),
    )
    w = (
        Window.partitionBy(*gcols, "packer")
        .orderBy("_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    started = base.select(
        *gcols,
        "packer",
        F.col(id_col),
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("_start"),
    )
    L = F.lit(int(seq_len)).cast("long")
    spans = started.select(
        *gcols,
        "packer",
        F.explode(
            F.sequence(
                F.expr(f"_start DIV {int(seq_len)}"),
                F.expr(f"(_start + n_tok - 1) DIV {int(seq_len)}"),
            )
        ).alias("chunk"),
        F.col(id_col),
        "n_tok",
        "_start",
    )
    lo = F.greatest(F.col("_start"), F.col("chunk") * L)
    hi = F.least(F.col("_start") + F.col("n_tok"), (F.col("chunk") + 1) * L)
    return spans.select(
        *gcols,
        "packer",
        F.col("chunk").cast("long").alias("chunk"),
        F.col(id_col),
        "n_tok",
        (lo - F.col("chunk") * L).alias("tok_start"),
        (hi - F.col("chunk") * L).alias("tok_end"),
        (lo - F.col("_start")).alias("doc_off"),
    )


# ---------------------------------------------------------------------------
# deterministic dataset split


def dataset_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in
    exactly one split decided by its id's md5 hash against cumulative
    hex thresholds — the split analogue of mixture_sample (auditable,
    partitioning-independent, reproducible in any engine with md5 and
    string compare).  ``fractions`` maps split name → fraction; they
    must sum to ~1 (the LAST split in insertion order absorbs rounding,
    i.e. acts as the else-branch).  Adds a ``split`` column."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    h = hash_frac_hex8(F.col(id_col))
    cum = 0.0
    bounds = []
    for name in names[:-1]:
        cum += fractions[name]
        bounds.append((name, rate_to_hex8(cum)))
    # nest the whens innermost-out so the SMALLEST matching threshold
    # wins: when(h < t1, s1).otherwise(when(h < t2, s2). ... .otherwise(last))
    expr = F.lit(names[-1])
    for name, thr in reversed(bounds):
        expr = F.when(h < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def leakage_safe_split(
    df: DataFrame,
    dup_pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """dataset_split that can never separate near-duplicates: every
    verified near-dup CLUSTER (connected components over `dup_pairs`,
    columns doc_a/doc_b) is assigned to one split as a unit, keyed by
    the md5 hash of the cluster's min-id root. A naive per-doc split
    leaks paraphrase-level duplicates across the train/eval boundary
    in proportion to the corpus near-dup rate — the classic silent
    eval-inflation bug in LLM data prep; splitting by cluster root
    makes it impossible by construction. Singletons are their own
    root, so non-duplicated docs split exactly as dataset_split would.

    Adds (root, split). Scale shape: the label propagation is the
    dup_clusters plan (per-round hash join + partial-agg min, bounded
    by cluster diameter); the final assignment is a map-side hash
    compare — no extra shuffle beyond the root join."""
    from news_please_spark.operators.graph import connected_components

    labels = connected_components(dup_pairs.select("doc_a", "doc_b"))
    with_root = (
        df.join(labels.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("root", F.coalesce(F.col("root"), F.col(id_col)))
    )
    return dataset_split(with_root, fractions, id_col="root")


def render_packed_chunks(
    packed: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Materialize pack_sequences' span rows into the actual training
    sequences: one row per chunk with its token text assembled from the
    member documents' slices, in stream order.  The round-trip proof
    that packing loses and reorders nothing — and the artifact a
    trainer actually consumes.

    Plan: join spans to their documents (equi-join on id), slice each
    document's token array to the packed span, then one aggregation per
    chunk that sorts the collected (tok_start, slice) structs and
    flattens — per-chunk work is bounded by seq_len tokens.  Output:
    (*group_cols, packer, chunk, n_docs, n_tok, chunk_text)."""
    gcols = list(group_cols or [])
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    pieces = packed.join(docs.select(F.col(id_col), toks.alias("_toks")), id_col).select(
        *gcols,
        "packer",
        "chunk",
        "tok_start",
        (F.col("tok_end") - F.col("tok_start")).alias("_len"),
        F.slice(
            F.col("_toks"),
            (F.col("doc_off") + 1).cast("int"),
            (F.col("tok_end") - F.col("tok_start")).cast("int"),
        ).alias("_piece"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("tok_start"), F.col("_piece")))
    )
    return pieces.groupBy(*gcols, "packer", "chunk").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_len").alias("n_tok"),
        F.array_join(
            F.flatten(F.transform(ordered, lambda s: s["_piece"])), " "
        ).alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# temperature-scaled mixture resampling (language/source balancing)


def temperature_thresholds(
    counts: dict[str, int], target: int, alpha: str = "sqrt"
) -> dict[str, str]:
    """Per-source md5-hex8 keep thresholds for a temperature-scaled
    mixture: source i gets weight w_i = n_i^alpha, a keep budget
    k_i = min(n_i, (target * w_i) DIV sum(w)), and the threshold
    admitting ~k_i of its n_i rows under the hash_frac_hex8 draw —
    the resampling step that balances a multilingual/multi-domain
    corpus (GPT-3 / mBERT style: upsample the tail by downsampling
    the head less than proportionally; Brown et al. 2020 §2.2,
    Conneau & Lample 2019 §3.1 use alpha in [0.3, 0.7]).

    alpha is one of "prop" (w=n: plain proportional), "sqrt"
    (w=isqrt(n), exact integer square root — the common 0.5 setting),
    "uniform" (w=1: equal share per source).  Restricting to these
    keeps every weight an EXACT integer — a float pow() would make the
    budgets engine-rounding-dependent.  All arithmetic is arbitrary-
    precision Python on a config-sized dict; the DuckDB oracle
    reproduces it with HUGEINT + corrected floor(sqrt()).

    A source whose budget covers it (k_i >= n_i) maps to "g" (keep
    all, the rate_to_hex8 convention); otherwise the threshold is
    (k_i * 2^32) DIV n_i as 8 lowercase hex digits."""
    from math import isqrt

    if target < 0:
        raise ValueError(f"target must be >= 0, got {target}")
    weigh = {
        "prop": lambda n: n,
        "sqrt": isqrt,
        "uniform": lambda n: 1,
    }.get(alpha)
    if weigh is None:
        raise ValueError(f"alpha must be prop|sqrt|uniform, got {alpha!r}")
    w = {s: weigh(n) for s, n in counts.items() if n > 0}
    sw = sum(w.values())
    out = {}
    for s, n in counts.items():
        if n <= 0:
            continue
        k = min(n, (target * w[s]) // sw)
        out[s] = "g" if k >= n else format((k << 32) // n, "08x")
    return out


def temperature_sample(
    df: DataFrame,
    target: int,
    alpha: str = "sqrt",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ~``target`` rows total, allocated across sources by
    n^alpha temperature weights (see temperature_thresholds), decided
    per row by the same deterministic md5 hash-fraction draw as
    mixture_sample — auditable, partitioning-independent, identical
    in any engine with md5.

    Plan: ONE map-side-combinable count to the |sources| histogram
    (config-sized — languages or domain buckets, 10^2..10^4 rows),
    collected to compute exact thresholds driver-side, then a map-side
    literal-map filter: the corpus itself never shuffles and is
    scanned once.  This is the same two-phase shape as the CMS/HLL
    sketches: tiny aggregate state, broadcast-free scan."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    thr = temperature_thresholds(counts, target, alpha)
    if not thr:
        return df.filter(F.lit(False))
    thr_map = F.create_map(
        *[lit for s, t in sorted(thr.items()) for lit in (F.lit(s), F.lit(t))]
    )
    return df.filter(
        hash_frac_hex8(F.col(id_col)) < thr_map[F.col(source_col)]
    )


# ---------------------------------------------------------------------------
# weighted sampling without replacement (priority sampling)


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weight-proportional sample of k rows WITHOUT replacement, with
    the Horvitz-Thompson weight estimates that make the sample usable
    for unbiased subset-sum estimation — priority sampling (Duffield,
    Lund & Thorup, JACM 54(6) 2007): draw u_i uniform, set priority
    q_i = w_i / u_i, keep the k highest priorities, and estimate every
    kept row's weight as max(w_i, tau) where tau is the (k+1)-th
    priority.  The data-curation use: pick k documents proportional to
    a quality/length weight, deterministically, with per-row inclusion
    probabilities you can audit.

    Integer-exact by construction (the house convention — float keys
    would make the sample engine-rounding-dependent):

      u_i   = first 8 md5 hex chars of the id, as int, +1  (in [1, 2^32])
      q_i   = (w_i << 32) DIV u_i          (exact long arithmetic;
                                            weights must be < 2^31)
      order = (q DESC, id ASC)             (total, tie-stable)

    Plan shape: the priority is a map-side Column; the k+1 selection is
    orderBy().limit(k+1) which Spark executes as TakeOrderedAndProject
    — per-partition heaps of size k+1, no global sort, no shuffle of
    the corpus.  Only the k+1 survivors reach the single-task ranking
    window and the 1-row threshold aggregate, so driver/exchange volume
    is O(k) at any corpus size.

    Returns (id, w, priority, rk, w_est); rows with NULL or
    non-positive weight are clamped to weight 1 (every row must have a
    nonzero chance or the estimator's support is wrong).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    )
    w = F.greatest(F.coalesce(F.col(weight_col).cast("long"), F.lit(1)), F.lit(1))
    base = (
        df.select(F.col(id_col), w.alias("w"), u.alias("_u"))
        .withColumn("priority", F.expr(f"w * {1 << 32}L DIV _u"))
    )
    top = base.orderBy(F.col("priority").desc(), F.col(id_col).asc()).limit(k + 1)
    # rank AND threshold from one pass over the k+1 survivors: tau is
    # the (k+1)-th priority when it exists, read via a whole-set window
    # (k+1 rows, single partition) — NOT a separate agg branch, which
    # would make the executed plan scan the corpus twice (`top` has no
    # exchange Spark could reuse between two consumers)
    rk = F.row_number().over(
        Window.orderBy(F.col("priority").desc(), F.col(id_col).asc())
    )
    whole = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tau = F.max(
        F.when(F.col("rk") == k + 1, F.col("priority")).otherwise(F.lit(0))
    ).over(whole)
    return (
        top.withColumn("rk", rk.cast("long"))
        .withColumn("w_est", F.greatest(F.col("w"), tau).cast("long"))
        .filter(F.col("rk") <= k)
        .select(F.col(id_col), "w", "priority", "rk", "w_est")
    )


# ---------------------------------------------------------------------------
# length-bucketed batch planning (padding-efficiency for training batches)


def length_bucket_plan(
    df: DataFrame,
    batch_size: int,
    boundaries: tuple[int, ...] = (32, 64, 128, 256, 512, 1024, 2048),
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_hex: int = 1,
) -> DataFrame:
    """Length-bucketed batch planning: group documents of similar token
    length into fixed-size batches so pad-to-longest waste stays small
    — the batching step every padded-attention trainer runs between
    the corpus and the GPU (bucketing by length is the standard
    counterpart to pack_sequences' concat-and-chunk for models that
    must keep document boundaries).

    Assignment is deterministic and engine-portable:

      bucket = #{b in boundaries : n_tok >= b}   (a sum of integer
               indicator comparisons — no CASE ladder drift)
      shard  = first ``shard_hex`` md5 hex chars of the id (the
               pack_sequences sharding convention: batches never cross
               a shard, so no bucket becomes one sort task; md5
               uniformity bounds skew; raise shard_hex at design scale)
      batch  = (row_number within (bucket, shard) by md5 key) - 1,
               integer-divided by ``batch_size``

    Output is the per-batch plan a trainer consumes:
    (bucket, shard, batch, n_docs, max_tok, sum_tok, pad_waste) with
    pad_waste = n_docs*max_tok - sum_tok (pad-to-longest-in-batch).

    Plan shape: ONE shuffle, on (bucket, shard); the follow-up groupBy
    (bucket, shard, batch) reuses that partitioning (hash partitioning
    on a subset of the grouping keys already clusters the groups), so
    Catalyst elides the second Exchange.  Token count is the
    whitespace convention shared with token_totals, so plan totals
    reconcile with corpus audits bit-exactly."""
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    key = F.md5(F.col(id_col).cast("string"))
    bucket = sum(
        (F.col("n_tok") >= int(b)).cast("long") for b in boundaries
    )
    base = df.select(
        F.col(id_col), key.alias("_key"), n_tok.alias("n_tok")
    ).select(
        F.col(id_col),
        "_key",
        "n_tok",
        bucket.alias("bucket"),
        F.substring(F.col("_key"), 1, shard_hex).alias("shard"),
    )
    rn = F.row_number().over(
        Window.partitionBy("bucket", "shard").orderBy("_key", id_col)
    )
    batched = base.withColumn("_rn", rn).withColumn(
        "batch", F.expr(f"CAST((_rn - 1) DIV {int(batch_size)} AS LONG)")
    )
    return batched.groupBy("bucket", "shard", "batch").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("n_tok").cast("long").alias("max_tok"),
        F.sum("n_tok").cast("long").alias("sum_tok"),
        (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok"))
        .cast("long")
        .alias("pad_waste"),
    )


# ---------------------------------------------------------------------------
# token-budget epoch planning (mixture construction under per-source caps)


def token_budget_plan(
    counts: dict[str, int],
    budget: int,
    epochs: int | dict[str, int],
    alpha: str = "sqrt",
) -> dict[str, tuple[int, bool]]:
    """Allocate a total training-token ``budget`` across sources
    proportional to n^alpha weights, capping every source at
    ``epochs[s] * n_s`` tokens (no source repeats more than its max
    epochs) and redistributing capped-off excess to the uncapped
    sources — exact integer water-filling, the budget arithmetic
    behind published mixture tables (e.g. Llama/GPT-3-style "epochs
    over the dataset" columns; Muennighoff et al. 2023 on repeating
    data up to ~4 epochs).

    Semantics (the unique fixpoint): capped set S* = {s : c_s ≤ λ·w_s}
    with λ = (budget − Σ_{S*} c) / Σ_{∉S*} w, c_s = epochs_s·n_s; the
    uncapped remainder R = budget − Σ_{S*} c is split proportional to w
    with largest-remainder rounding (remainder DESC, source ASC), so
    Σ alloc == min(budget, Σ c) EXACTLY. All arithmetic is
    arbitrary-precision Python over the config-sized source histogram
    (the temperature_thresholds pattern) — no float, no overflow at
    any corpus size; the DuckDB oracle reproduces the fixpoint with
    the sorted-ratio prefix closed form.

    ``alpha`` is prop|sqrt|uniform (the temperature_thresholds weight
    family, exact integers). Returns {source: (alloc_tokens, capped)};
    sources with n ≤ 0 get (0, False).
    """
    from math import isqrt

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    weigh = {"prop": lambda n: n, "sqrt": isqrt, "uniform": lambda n: 1}.get(alpha)
    if weigh is None:
        raise ValueError(f"alpha must be prop|sqrt|uniform, got {alpha!r}")
    eps = epochs if isinstance(epochs, dict) else {s: epochs for s in counts}
    live = {s: n for s, n in counts.items() if n > 0}
    w = {s: weigh(n) for s, n in live.items()}
    caps = {s: eps[s] * live[s] for s in live}
    capped: set[str] = set()
    while True:
        un = [s for s in live if s not in capped]
        if not un:
            break
        tot_w = sum(w[s] for s in un)
        rem_budget = budget - sum(caps[s] for s in capped)
        newly = [s for s in un if caps[s] * tot_w <= rem_budget * w[s]]
        if not newly:
            break
        capped.update(newly)
    un = sorted(s for s in live if s not in capped)
    tot_w = sum(w[s] for s in un)
    rem_budget = budget - sum(caps[s] for s in capped)
    alloc = {s: caps[s] for s in capped}
    if un:
        base = {s: (rem_budget * w[s]) // tot_w for s in un}
        left = rem_budget - sum(base.values())
        order = sorted(un, key=lambda s: (-((rem_budget * w[s]) % tot_w), s))
        for i, s in enumerate(order):
            alloc[s] = base[s] + (1 if i < left else 0)
    return {s: (alloc.get(s, 0), s in capped) for s in counts}


def plan_token_budget(
    df: DataFrame,
    budget: int,
    epochs,
    alpha: str = "sqrt",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """DataFrame wrapper: one map-side-combinable aggregation to the
    per-source token histogram (whitespace convention shared with
    token_totals), exact plan driver-side (config-sized, like
    temperature_sample), result as one row per source:
    (source, n_tokens, max_epochs, capped, alloc_tokens, epochs_q)
    with epochs_q = floor(1e4 · alloc / n)."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col)
        .agg(
            F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
            .cast("long")
            .alias("n")
        )
        .collect()
    }
    # epochs may be an int, a dict, or a callable(source) -> int — the
    # callable form avoids a second corpus pass just to list sources
    if callable(epochs):
        eps = {s: int(epochs(s)) for s in counts}
    elif isinstance(epochs, dict):
        eps = epochs
    else:
        eps = {s: int(epochs) for s in counts}
    plan = token_budget_plan(counts, budget, eps, alpha)
    # emit as JVM-side literals (explode of a literal struct array), NOT
    # createDataFrame(python_rows): a local-RDD result pays a cold
    # Python-worker launch on first action — the mixture_sample lesson
    rows = [
        F.struct(
            F.lit(s).alias("source"),
            F.lit(int(n)).cast("long").alias("n_tokens"),
            F.lit(int(eps[s])).cast("long").alias("max_epochs"),
            F.lit(int(plan[s][1])).cast("long").alias("capped"),
            F.lit(int(plan[s][0])).cast("long").alias("alloc_tokens"),
            F.lit((10_000 * plan[s][0]) // n if n > 0 else 0)
            .cast("long")
            .alias("epochs_q"),
        )
        for s, n in sorted(counts.items())
    ]
    spark = df.sparkSession
    if not rows:
        return spark.createDataFrame(
            [],
            "source string, n_tokens long, max_epochs long, capped long, "
            "alloc_tokens long, epochs_q long",
        )
    return spark.range(1).select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.*")


def priority_sample_per_group(
    df: DataFrame,
    weight_col: str,
    k: int,
    group_col: str,
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Stratified priority sampling: an independent weight-proportional
    k-sample WITHOUT replacement inside every group (source, language,
    domain) — the mixture-aware form of `priority_sample`, for building
    a training subset that keeps per-source representation while still
    favoring high-weight documents inside each source.

    Same integer-exact estimator (Duffield, Lund & Thorup 2007):
    q = (w << 32) DIV u with u the md5-derived uniform draw; per group
    keep the k highest priorities and estimate each kept row's weight
    as max(w, tau_g) where tau_g is that group's (k+1)-th priority
    (0 when the group has ≤ k rows — every row kept, weights exact).

    Plan shape: the priority is a map-side Column; per-group (k+1)
    selection goes through `ordering.mark_top_k_per_key` with salting,
    so no task ever sorts a whole skewed group — any single task is
    bounded at ~|group|/salt_buckets rows, and the final per-group rank
    window sees ≤ k+1 rows per group.  Corpus rows that lose inside a
    salt bucket never reach phase 2.

    Returns (group, id, w, priority, rk, w_est), rk 1-based within the
    group; NULL/non-positive weights clamp to 1 as in priority_sample.
    """
    from news_please_spark.operators.ordering import mark_top_k_per_key

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    )
    w = F.greatest(F.coalesce(F.col(weight_col).cast("long"), F.lit(1)), F.lit(1))
    base = (
        df.select(F.col(group_col), F.col(id_col), w.alias("w"), u.alias("_u"))
        .withColumn("priority", F.expr(f"w * {1 << 32}L DIV _u"))
        .withColumn("_negq", -F.col("priority"))
    )
    marked = mark_top_k_per_key(
        base, group_col, ["_negq", id_col], k + 1,
        salt_buckets=salt_buckets, salt_on=id_col,
    )
    survivors = marked.filter(F.col("_topk"))
    wg = Window.partitionBy(group_col).orderBy(
        F.col("priority").desc(), F.col(id_col).asc()
    )
    whole = Window.partitionBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = survivors.withColumn("rk", F.row_number().over(wg).cast("long"))
    ranked = ranked.withColumn(
        "_tau",
        F.max(
            F.when(F.col("rk") == k + 1, F.col("priority")).otherwise(F.lit(0))
        ).over(whole),
    )
    return ranked.filter(F.col("rk") <= k).select(
        F.col(group_col),
        F.col(id_col),
        F.col("w"),
        F.col("priority"),
        F.col("rk"),
        F.greatest(F.col("w"), F.col("_tau")).cast("long").alias("w_est"),
    )


# ---------------------------------------------------------------------------
# T5-style span corruption (deterministic masking plan + sentinel render)


def _pos_hash32(id_col, pos) -> "F.Column":
    """Engine-portable per-(doc, position) uint32: first 8 md5 hex chars
    of 'doc:pos' (DuckDB image: ('0x'||substr(md5(...),1,8))::BIGINT)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(id_col.cast("string"), F.lit(":"), pos.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stride: int = 4,
    keep_mod: int = 5,
    keep_lt: int = 2,
    max_span: int = 3,
) -> DataFrame:
    """T5-style span-corruption preprocessing (Raffel et al. 2020 §3.1.4
    "span corruption" objective) as a DETERMINISTIC masking plan: mask
    spans start only at stride-aligned positions (so spans of length
    <= max_span < stride can NEVER overlap — the property that makes
    every token's mask state a pure per-position function instead of a
    left-to-right sequential scan), a slot becomes a start when its
    (doc, pos) hash mod keep_mod < keep_lt, and the span length is
    1 + (hash >> 8) % max_span. Defaults mask ~20% of tokens in spans
    of mean length 2.

    Returns (id, n_spans, n_masked, inputs, targets): `inputs` is the
    text with each masked span replaced by its <extra_id_K> sentinel
    (K = span order), `targets` the T5 decoder string
    '<extra_id_0> masked toks <extra_id_1> ...'. Real T5 draws the plan
    from an RNG; pinning it to hash arithmetic makes the plan
    reproducible across engines and runs — the same determinism
    contract as mixture_sample/dataset_split.

    Zero shuffle: token array + HOF folds per row, rides the scan.
    Every lambda touches only element values over materialized columns
    (the repetition.py HOF discipline)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = df.select(F.col(id_col), F.col(text_col)).withColumn("_toks", toks)
    L = F.size("_toks")
    idc = F.col(id_col)
    # candidate span starts: stride-aligned slots whose hash elects them
    starts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest((L - 1) / stride, F.lit(0)).cast("int")),
            lambda i: F.struct(
                (i * stride).alias("s"),
                (1 + F.shiftright(_pos_hash32(idc, i * stride), 8) % max_span)
                .cast("int")
                .alias("len"),
                (_pos_hash32(idc, i * stride) % keep_mod < keep_lt).alias("on"),
            ),
        ),
        lambda st: st["on"] & (st["s"] < L),
    )
    d = d.withColumn("_starts", starts)
    sts = F.col("_starts")
    # per-token piece: sentinel at a span start, dropped inside a span,
    # the token itself otherwise (span index = starts strictly before p)
    def _covering(p):
        return F.filter(
            sts, lambda st: (st["s"] <= p) & (p < st["s"] + st["len"])
        )

    pieces = F.transform(
        F.sequence(F.lit(0), L - 1),
        lambda p: F.when(
            F.exists(sts, lambda st: st["s"] == p),
            F.concat(
                F.lit("<extra_id_"),
                F.size(F.filter(sts, lambda st: st["s"] < p)).cast("string"),
                F.lit(">"),
            ),
        )
        .when(F.size(_covering(p)) > 0, F.lit(None).cast("string"))
        .otherwise(F.element_at("_toks", p + 1)),
    )
    inputs = F.array_join(F.filter(pieces, lambda x: x.isNotNull()), " ")
    # targets: '<extra_id_K> tok tok <extra_id_K+1> ...' in span order
    tgt_parts = F.transform(
        sts,
        lambda st, k: F.concat(
            F.lit("<extra_id_"),
            k.cast("string"),
            F.lit("> "),
            F.array_join(
                F.slice(
                    F.col("_toks"),
                    st["s"] + 1,
                    F.least(st["len"], L - st["s"]).cast("int"),
                ),
                " ",
            ),
        ),
    )
    n_masked = F.aggregate(
        sts,
        F.lit(0),
        lambda acc, st: acc + F.least(st["len"], L - st["s"]).cast("int"),
    )
    return d.select(
        id_col,
        F.size(sts).cast("long").alias("n_spans"),
        n_masked.cast("long").alias("n_masked"),
        inputs.alias("inputs"),
        F.array_join(tgt_parts, " ").alias("targets"),
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rate_mod: int = 2,
    spm_mod: int = 3,
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022, "FIM"):
    elected documents are split at two hash-chosen token boundaries
    into (prefix, middle, suffix) and re-serialized for infilling
    training — PSM order '<PRE> p <SUF> s <MID> m' by default, SPM
    '<PRE> <SUF> s <MID> m p' for a hash-chosen subset (the paper
    trains on a PSM/SPM mixture). Non-elected docs pass through
    verbatim (fim = false). Docs under 3 tokens cannot split and pass
    through.

    Deterministic: election (doc hash % rate_mod == 0), SPM choice,
    and both split points derive from md5(doc_id) arithmetic — the
    same no-RNG contract as span_corruption/mixture_sample, so runs
    and engines agree exactly. 1 <= p1 < p2 <= L-1 guarantees all
    three parts are non-empty. Zero shuffle: per-row token slices."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = df.select(F.col(id_col), F.col(text_col)).withColumn("_toks", toks)
    L = F.size("_toks")
    idc = F.col(id_col)
    h1 = _pos_hash32(idc, F.lit(1))
    h2 = _pos_hash32(idc, F.lit(2))
    elected = (_pos_hash32(idc, F.lit(0)) % rate_mod == 0) & (L >= 3)
    spm = _pos_hash32(idc, F.lit(3)) % spm_mod == 0
    # two distinct interior boundaries in [1, L-1]
    p1 = (h1 % (L - 2)) + 1                     # 1 .. L-2
    p2 = p1 + 1 + (h2 % (L - 1 - p1))           # p1+1 .. L-1
    pre = F.array_join(F.slice("_toks", 1, p1), " ")
    mid = F.array_join(F.slice("_toks", p1 + 1, p2 - p1), " ")
    suf = F.array_join(F.slice("_toks", p2 + 1, L - p2), " ")
    psm = F.concat(
        F.lit("<PRE> "), pre, F.lit(" <SUF> "), suf, F.lit(" <MID> "), mid
    )
    spm_txt = F.concat(
        F.lit("<PRE> <SUF> "), suf, F.lit(" <MID> "), mid, F.lit(" "), pre
    )
    out_text = F.when(~elected, F.col(text_col)).otherwise(
        F.when(spm, spm_txt).otherwise(psm)
    )
    return d.select(
        id_col,
        elected.alias("fim"),
        F.when(elected & spm, F.lit("spm"))
        .when(elected, F.lit("psm"))
        .otherwise(F.lit("raw"))
        .alias("mode"),
        out_text.alias("text_out"),
    )


def ul2_plan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """UL2 mixture-of-denoisers plan (Tay et al. 2022): each doc is
    hash-assigned one denoiser —

      R (h%4 in {0,1}): regular span corruption (stride 4, mean span 2,
        ~20% masked), inputs prefixed '[NLU]'
      X (h%4 == 2): extreme corruption (stride 8, spans up to 7, ~30%
        masked), prefixed '[NLG]'
      S (h%4 == 3): sequential/prefix-LM split at a hash-chosen
        boundary (suffix becomes the single target span), prefixed
        '[S2S]'

    — the paper's paradigm-token + mixture recipe, under the same
    no-RNG determinism as span_corruption/fim_transform. Returns
    (id, denoiser, n_spans, n_masked, inputs, targets); R/X delegate
    to span_corruption, so the roundtrip invariant holds per branch.
    Zero shuffle (three filtered scans unioned; at scale this is one
    pass with a mode column — kept as a union here so each branch IS
    the already-tested operator)."""
    idc = F.col(id_col)
    dmode = _pos_hash32(idc, F.lit("ul2")) % 4

    def _tag(sdf, denoiser, prefix):
        return sdf.select(
            id_col,
            F.lit(denoiser).alias("denoiser"),
            "n_spans",
            "n_masked",
            F.concat(F.lit(prefix + " "), F.col("inputs")).alias("inputs"),
            "targets",
        )

    r = _tag(
        span_corruption(df.filter(dmode < 2), text_col, id_col), "R", "[NLU]"
    )
    x = _tag(
        span_corruption(
            df.filter(dmode == 2),
            text_col,
            id_col,
            stride=8,
            keep_mod=5,
            keep_lt=3,
            max_span=7,
        ),
        "X",
        "[NLG]",
    )
    sdocs = df.filter(dmode == 3).select(idc, F.col(text_col)).withColumn(
        "_toks", F.split(F.trim(F.col(text_col)), r"\s+")
    )
    L = F.size("_toks")
    p = 1 + _pos_hash32(idc, F.lit("ul2-s")) % F.greatest(L - 1, F.lit(1))
    s = sdocs.select(
        id_col,
        F.lit("S").alias("denoiser"),
        F.lit(1).cast("long").alias("n_spans"),
        (L - p).cast("long").alias("n_masked"),
        F.concat(
            F.lit("[S2S] "),
            F.array_join(F.slice("_toks", 1, p), " "),
            F.lit(" <extra_id_0>"),
        ).alias("inputs"),
        F.concat(
            F.lit("<extra_id_0> "), F.array_join(F.slice("_toks", p + 1, F.greatest(L - p, F.lit(0))), " ")
        ).alias("targets"),
    )
    return r.unionByName(x).unionByName(s)


def sentence_chunks(
    docs: DataFrame,
    max_chars: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-boundary-respecting greedy chunking — the
    context-window prep that pack_sequences deliberately skips:
    pack_sequences concatenates and cuts at EXACT token offsets
    (pretraining convention), while fine-tuning / RAG / embedding
    corpora want chunks that never split a sentence.  Greedy rule:
    sentences (runs ending in [.!?], regex split — no lookbehind, so
    the same pattern runs on RE2 engines) accumulate into the current
    chunk while  current_len + 1 + sentence_len <= max_chars  (the +1
    is the joining space); otherwise a new chunk opens.  A single
    sentence longer than max_chars becomes its own oversized chunk —
    never split mid-sentence (documented contract; cap upstream via
    pack_sequences if hard limits matter).

    The whole per-document fold runs inside ONE F.aggregate over the
    sentence array — a codegen'd sequential fold per row, zero
    shuffle, zero Python, no window.  This is the idiomatic Spark
    shape for per-document sequential logic: the order dependence
    lives INSIDE a row, not across rows.

    Output: (id, chunk_id 0-based, chunk_text, n_chars)."""
    raw = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[^.!?]+[.!?]*"), 0
    )
    sents = F.transform(
        F.filter(raw, lambda s: F.trim(s) != F.lit("")), lambda s: F.trim(s)
    )
    init = F.struct(
        F.array().cast("array<string>").alias("chunks"),
        F.lit(0).alias("cur"),
    )

    def merge(acc, s):
        fits = (F.size(acc["chunks"]) > 0) & (
            acc["cur"] + 1 + F.length(s) <= F.lit(int(max_chars))
        )
        appended = F.concat(
            F.slice(acc["chunks"], 1, F.size(acc["chunks"]) - 1),
            F.array(F.concat(F.element_at(acc["chunks"], -1), F.lit(" "), s)),
        )
        opened = F.concat(acc["chunks"], F.array(s))
        return F.struct(
            F.when(fits, appended).otherwise(opened).alias("chunks"),
            F.when(fits, acc["cur"] + 1 + F.length(s))
            .otherwise(F.length(s))
            .alias("cur"),
        )

    chunks = F.aggregate(sents, init, merge, lambda acc: acc["chunks"])
    return (
        docs.select(F.col(id_col).alias("doc_id"), chunks.alias("_chunks"))
        .select("doc_id", F.posexplode("_chunks").alias("chunk_id", "chunk_text"))
        .withColumn("n_chars", F.length("chunk_text").cast("long"))
    )


def passage_chunks(
    docs: DataFrame,
    window_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window passage chunking with overlap — the RAG/embedding
    corpus prep that complements sentence_chunks (greedy
    sentence-boundary packing) and pack_sequences (cross-doc exact-token
    packing): fixed window_tokens-token passages at a fixed stride, so
    consecutive passages overlap by window_tokens - stride tokens and
    no token run of length <= overlap is ever split across ALL the
    passages containing it (the retrieval-recall argument for overlap).
    Window count = ceil((n - W)/S) + 1 (one tail-covering window, min
    1), the same lattice as rolling_fingerprints — a passage index
    built here aligns 1:1 with the containment fingerprints.

    Plan shape: tokenize + window slices are per-row array transforms
    (zero shuffle, zero Python, no Window); at 100 TB the output is
    map-only against the scan. Docs that are empty after trim emit no
    passages.

    Output: (doc_id, chunk_id 0-based, start_tok, n_tok, chunk_text)."""
    from news_please_spark.functions.text import tokens

    if stride <= 0 or window_tokens <= 0:
        raise ValueError("window_tokens and stride must be positive")
    w, s = int(window_tokens), int(stride)
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - w) / F.lit(float(s))) + 1, F.lit(1)
    ).cast("int")
    passages = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * s).cast("int").alias("start_tok"),
            F.least(F.lit(w), n - i * s).cast("int").alias("n_tok"),
            F.array_join(F.slice(toks, i * s + 1, w), " ").alias("chunk_text"),
        ),
    )
    return (
        docs.where(F.trim(F.col(text_col)) != F.lit(""))
        .select(F.col(id_col).alias("doc_id"), passages.alias("_p"))
        .select("doc_id", F.posexplode("_p").alias("chunk_id", "_c"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("_c.start_tok").alias("start_tok"),
            F.col("_c.n_tok").alias("n_tok"),
            F.col("_c.chunk_text").alias("chunk_text"),
        )
    )


def mixture_interleave(
    docs: DataFrame,
    weights: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stride-scheduler interleave of a source mixture —
    the order in which a trainer should CONSUME a weighted multi-source
    corpus so that every prefix holds sources in weight proportion
    (classic stride scheduling: max per-source deviation from its
    entitlement is one item at any prefix).

    `weights`: (source, weight) with positive INTEGER weights — the
    mixture dimension table (O(10-10^3) rows by construction; it is
    collected once for the lcm and broadcast into the join). Source s
    with weight w emits its j-th item (j = per-source md5 rank, dense
    via the scale-safe with_group_seq) at virtual time

        vtime = (2j + 1) * (L / w),   L = lcm(all weights)

    — all BIGINT arithmetic, so the order replays bit-for-bit in any
    engine. Global positions attach with the two-phase with_global_seq
    (never a one-task window). Output: doc rows + j, vtime, mix_pos.
    """
    import math

    from news_please_spark.operators.ordering import (
        with_global_seq,
        with_group_seq,
    )

    wrows = weights.collect()
    if not wrows:
        raise ValueError("weights is empty")
    by_src = {}
    for r in wrows:
        w = int(r["weight"])
        if w < 1:
            raise ValueError(f"weight must be a positive integer: {r}")
        by_src[r[source_col]] = w
    lcm = 1
    for w in by_src.values():
        lcm = lcm * w // math.gcd(lcm, w)

    keyed = docs.withColumn(
        "_h", F.md5(F.col(id_col).cast("string"))
    )
    ranked = with_group_seq(keyed, source_col, ["_h", id_col], out="j")
    stride = F.broadcast(
        weights.select(
            F.col(source_col),
            (F.lit(lcm) / F.col("weight")).cast("long").alias("_stride"),
        )
    )
    v = ranked.join(stride, source_col).withColumn(
        "vtime", ((2 * F.col("j") + 1) * F.col("_stride")).cast("long")
    )
    out, _ = with_global_seq(
        v, ["vtime", source_col, "j"], out="mix_pos"
    )
    return out.drop("_h", "_stride")
