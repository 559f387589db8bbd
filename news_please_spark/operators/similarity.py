"""Similarity search over embedding columns (task brief: brute-force
cosine top-k baseline + an LSH-bucketed scale path).

All math is native higher-order functions (zip_with/aggregate) — the
dot products run inside whole-stage codegen, no Python. The brute-force
path broadcasts the (small) query side so the corpus never shuffles;
the LSH path buckets the corpus once and only compares within buckets.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def norm_of(vec: Column) -> Column:
    """sqrt(dot(v, v)) — precompute ONCE per row/centroid wherever many
    cosines share a vector: cosine(a, b) == dot(a, b) / (na * nb) with
    na/nb precomputed is the IDENTICAL arithmetic (same fold, same sqrt,
    same product) at a third of the interpreted-HOF work, since the
    naive form re-derives both self-dots inside every comparison."""
    return F.sqrt(dot(vec, vec))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, per-query window.
    Scale: O(|Q|·|C|) compute but zero corpus shuffle — right whenever
    |Q| is small (the usual 'find neighbors of these docs' shape)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_q")
    ).withColumn("_qn", norm_of(F.col("_q")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_vn", norm_of(F.col("_v")))
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("_q"), F.col("_v")) / (F.col("_qn") * F.col("_vn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


@lru_cache(maxsize=None)
def _plane_coefs(plane: int, dim: int) -> tuple[float, ...]:
    """Deterministic pseudo-random coefficients in [-1, 1] for plane
    `plane`, dimensions 1..dim — derived from md5 (first 8 hex chars as
    a uint32), so the SAME planes are reproducible in any engine with
    md5 (the DuckDB oracle re-derives them; xxhash64 is Spark-private).

    Driver-side image of _plane_coef_col — the
    IDENTICAL value sequence ((uint32 of md5 hex[:8]) % 2001 - 1000) /
    1000.0, computed once per (plane, dim) instead of once per ELEMENT
    per ROW inside an interpreted HOF lambda. Integer ops are exact and
    the final /1000.0 is one IEEE double division in both engines, so
    literalizing the coefficients cannot change a single bucket bit."""
    out = []
    for i in range(1, dim + 1):
        h = int(hashlib.md5(f"plane{plane}_{i}".encode()).hexdigest()[:8], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return tuple(out)


def _plane_coef_col(pid: Column, i: Column) -> Column:
    """_plane_coef with the plane id itself a Column — byte-identical
    concat layout ("plane{pid}_{i}"), used by the ragged-row fallback
    where the plane index is a lambda variable."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("plane"), pid.cast("string"), F.lit("_"), i.cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (F.pmod(h, F.lit(2001)) - 1000).cast("double") / 1000.0


def _projections(vec: Column, plane_ids: tuple[int, ...], dim: int | None) -> Column:
    """array<double> of <v, plane_pid> for every pid, in order.

    Fast path (dim known, row length matches): ONE nested literal
    coefficient matrix — built as a single F.expr (per-element F.lit
    costs one py4j round-trip each, ~1.3 s of driver time for 32×64
    coefficients, measured; the SQL string parses in ~1 ms; every value
    is n/1000 with |n| ≤ 1000, so repr() round-trips exactly through
    the SQL double parser) — and ONE transform whose lambda folds
    zip_with(vec, coefs). The md5/conv/pmod chain leaves the per-element
    hot path entirely (at dim 64 × 32 planes it ran 2048 times PER ROW
    in interpreted HOF mode).

    Fallback (dim unknown, or a ragged row whose length ≠ dim): derive
    each coefficient from md5 per element, exactly the original
    expression. when/otherwise evaluates lazily per row, so uniform-dim
    data never executes the fallback and ragged inputs keep
    bit-identical buckets."""
    idx = F.sequence(F.lit(1), F.size(vec))
    pid_arr = F.expr(
        "array(" + ",".join(str(p) for p in plane_ids) + ")"
    )
    slow = F.transform(
        pid_arr,
        lambda pid: F.aggregate(
            F.zip_with(vec, idx, lambda x, i: x * _plane_coef_col(pid, i)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    if dim is None:
        return slow
    mat = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{c!r}D" for c in _plane_coefs(pid, dim)) + ")"
            for pid in plane_ids
        )
        + ")"
    )
    fast = F.transform(
        mat,
        lambda coefs: F.aggregate(
            F.zip_with(vec, coefs, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return F.when(F.size(vec) == dim, fast).otherwise(slow)


def _bucket_of(projs: Column, planes: int, offset: int) -> Column:
    """Sign bits of projs[offset .. offset+planes) packed into a long.
    `projs` must be a lambda variable or materialized column — element_at
    on it is a lookup, not a re-evaluation."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        proj = F.element_at(projs, offset + p + 1)
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def _bind(value: Column, fn) -> Column:
    """Evaluate `value` ONCE per row and pass it to fn as a lambda
    variable: transform(array(value), v -> fn(v))[0]. Without this,
    every reference to `value` inside a built-up expression would embed
    (and, in interpreted HOF mode, re-evaluate) a full copy of its
    tree."""
    return F.transform(F.array(value), fn)[0]


def lsh_bucket(
    vec: Column, planes: int = 12, table: int = 0, dim: int | None = None
) -> Column:
    """Random-hyperplane signature: bit p = sign of <v, plane_p>.
    `table` offsets the plane family for multi-table LSH. Pass `dim`
    (peek_dim) to route coefficient derivation to the literal-matrix
    fast path — see _projections."""
    pids = tuple(table * 1000 + p for p in range(planes))
    return _bind(
        _projections(vec, pids, dim), lambda pr: _bucket_of(pr, planes, 0)
    )


def lsh_buckets(
    vec: Column, planes: int, tables: int, dim: int | None = None
) -> Column:
    """Array of (table, bucket) keys — classic OR-amplified LSH: a pair
    is a candidate if ANY table agrees. Recall → 1 as `tables` grows,
    cost grows linearly. All tables' projections come from one
    coefficient matrix in one pass (see _projections)."""
    pids = tuple(t * 1000 + p for t in range(tables) for p in range(planes))
    return _bind(
        _projections(vec, pids, dim),
        lambda pr: F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    _bucket_of(pr, planes, t * planes).alias("b"),
                )
                for t in range(tables)
            ]
        ),
    )


def peek_dim(df: DataFrame, vec_col: str) -> int | None:
    """Length of the first non-null vector — one 1-row job at plan
    construction. Used only to pick the fast literal-coefficient branch;
    a wrong peek (ragged data) costs the md5 fallback per odd row, never
    correctness."""
    row = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .first()
    )
    return int(row["d"]) if row is not None and row["d"] is not None else None


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    planes: int = 4,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = False,
) -> DataFrame:
    """Approximate top-k: compare only within matching LSH buckets of
    any of `tables` independent plane families (OR-amplification).
    Scale path: the corpus is bucketed once (a single projection),
    candidates come from hash-joins on (table, bucket) — the corpus is
    never crossed. Recall tunes with tables (up) and planes (down).

    quantize=True ranks and returns sim_q = floor(10^4·cos) as BIGINT
    (the cross-engine-exact form the oracle gate hashes) instead of the
    raw double cos."""
    dim = peek_dim(corpus, vec_col)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_q")
        )
        .withColumn("_qn", norm_of(F.col("_q")))
        .withColumn("_tb", F.explode(lsh_buckets(F.col("_q"), planes, tables, dim)))
    )
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("_v")
        )
        .withColumn("_vn", norm_of(F.col("_v")))
        .withColumn("_tb", F.explode(lsh_buckets(F.col("_v"), planes, tables, dim)))
    )
    cand = (
        q.join(c, "_tb")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "_q", "_qn", "neighbor_id", "_v", "_vn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # dot/(qn·vn) with precomputed norms is the identical arithmetic to
    # cosine() (same folds, same sqrt, same product) at a third of the
    # per-pair interpreted-HOF work — see norm_of.
    pair_cos = dot(F.col("_q"), F.col("_v")) / (F.col("_qn") * F.col("_vn"))
    if quantize:
        sims = cand.select(
            "query_id",
            "neighbor_id",
            F.floor(10000 * pair_cos).cast("long").alias("sim_q"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("sim_q"), F.col("neighbor_id"))
    else:
        sims = cand.select(
            "query_id", "neighbor_id", pair_cos.alias("cos")
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def ivf_centroid_rows(
    corpus: DataFrame,
    n_lists: int | None = None,
    centroid_stride: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF coarse-quantizer codebook as (cid, cv) rows.

    Default selection (`n_lists`): the `n_lists` corpus vectors with the
    smallest md5(id) — a deterministic pseudo-random sample whose SIZE
    IS FIXED regardless of corpus size, so at 10^10 docs the broadcast
    stays n_lists·dim doubles and per-row assignment work stays
    O(n_lists), not O(n). Spark computes it as a TakeOrdered (map-side
    partial top-n, no full sort); any engine with md5 re-derives the
    identical set (`ORDER BY md5(CAST(id AS VARCHAR)) LIMIT n_lists`).

    Legacy selection (`centroid_stride`): every stride-th id — kept for
    the exhaustive-equivalence unit tests, NOT a scale path (n_lists
    grows as n/stride, making total assignment work O(n²/stride))."""
    c = corpus.select(
        F.col(id_col).alias("cid"), as_double(F.col(vec_col)).alias("cv")
    )
    if centroid_stride is not None:
        return c.filter(F.col("cid") % centroid_stride == 0)
    if n_lists is None:
        n_lists = 256
    return (
        c.orderBy(F.md5(F.col("cid").cast("string"))).limit(n_lists)
    ).select("cid", "cv")


def _top2(vec: Column, vn: Column, cents: Column) -> Column:
    """Fold: (best cid/cos, second-best cid/cos) over the sorted
    centroid array; strict > keeps the smallest cid on ties. Each
    centroid is scored ONCE (transform), the fold then compares
    scalars — not re-deriving the 64-dim dot in every branch; the
    row's own norm `vn` is precomputed once outside (norm_of), the
    centroid's rides in the codebook struct — identical arithmetic
    to cosine() at a third of the folds. Shared by ivf_topk and
    ivfadc_topk."""
    scored = F.transform(
        cents,
        lambda cent: F.struct(
            cent["cid"].alias("cid"),
            (dot(vec, cent["cv"]) / (vn * cent["cn"])).alias("cos"),
        ),
    )
    init = F.struct(
        F.lit(-1).cast("long").alias("b1"),
        F.lit(-2.0).alias("c1"),
        F.lit(-1).cast("long").alias("b2"),
        F.lit(-2.0).alias("c2"),
    )

    def step(acc, s):
        return F.struct(
            F.when(s["cos"] > acc["c1"], s["cid"]).otherwise(acc["b1"]).alias("b1"),
            F.when(s["cos"] > acc["c1"], s["cos"]).otherwise(acc["c1"]).alias("c1"),
            F.when(s["cos"] > acc["c1"], acc["b1"])
            .when(s["cos"] > acc["c2"], s["cid"])
            .otherwise(acc["b2"])
            .alias("b2"),
            F.when(s["cos"] > acc["c1"], acc["c1"])
            .when(s["cos"] > acc["c2"], s["cos"])
            .otherwise(acc["c2"])
            .alias("c2"),
        )

    return F.aggregate(scored, init, step)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    n_lists: int | None = None,
    centroid_stride: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the classic coarse-
    quantizer ANN layout (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", IEEE TPAMI 2011, the IVF part without PQ
    refinement):

      1. a FIXED-SIZE deterministic centroid set (`n_lists` vectors by
         md5-rank — see ivf_centroid_rows; no RNG, reproducible in any
         engine, bounded broadcast no matter the corpus size);
      2. every corpus vector is assigned to its nearest centroid (its
         IVF "list") by a per-row fold over the broadcast centroid
         array — zero shuffle, whole-stage codegen, O(n_lists·dim) per
         row ⇒ O(n·n_lists·dim) total, linear in the corpus;
      3. query vectors are assigned to their `nprobe` nearest lists the
         same way FROM THE QUERIES TABLE ITSELF (external queries that
         don't appear in the corpus are first-class, not dropped);
         candidates come from an equi-join on the list id, so the
         corpus is never crossed — per-query work is
         |corpus|/n_lists · nprobe.

    Ties on equal cosine break toward the smaller centroid id (the
    centroid array is sorted, the fold keeps the first winner), which
    is exactly `ORDER BY cos DESC, cid` — engine-portable. Returns
    (query_id, neighbor_id, sim_q) with sim_q = floor(10^4·cos) as
    BIGINT, ranked per query, top k."""
    c = corpus.select(
        F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_vn", norm_of(F.col("_v")))
    cents = ivf_centroid_rows(
        corpus, n_lists=n_lists, centroid_stride=centroid_stride,
        id_col=id_col, vec_col=vec_col,
    ).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("cid"), F.col("cv"), norm_of(F.col("cv")).alias("cn"))
            )
        ).alias("cents")
    )

    corpus_cells = c.crossJoin(F.broadcast(cents)).select(
        F.col("_id").alias("neighbor_id"),
        F.col("_v").alias("_cv"),
        F.col("_vn").alias("_cvn"),
        _top2(F.col("_v"), F.col("_vn"), F.col("cents"))["b1"].alias("cell"),
    )
    # queries are assigned from THEIR OWN vectors (identical fold, same
    # broadcast codebook) — a query id absent from the corpus still
    # probes its nprobe nearest lists instead of being silently dropped
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", norm_of(F.col("_qv")))
    query_cells = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "_qv",
            "_qn",
            _top2(F.col("_qv"), F.col("_qn"), F.col("cents")).alias("_a"),
        )
        .select(
            "query_id",
            "_qv",
            "_qn",
            F.explode(
                F.slice(F.array(F.col("_a.b1"), F.col("_a.b2")), 1, nprobe)
            ).alias("cell"),
        )
        .filter(F.col("cell") >= 0)  # fewer centroids than nprobe
    )
    sims = (
        query_cells.join(corpus_cells, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(
                10000 * (dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cvn")))
            )
            .cast("long")
            .alias("sim_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_q"), F.col("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def ivf_assign_cells(
    corpus: DataFrame,
    n_lists: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid (IVF top-1) cell assignment over the same
    md5-rank codebook ivf_topk uses: (id, cell) rows.  Zero shuffle —
    the codebook is one broadcast array and each row folds over it in
    whole-stage codegen, O(n_lists·dim) per row at any corpus size.
    Ties on equal cosine keep the smallest cid (sorted array + strict
    >), i.e. ORDER BY cos DESC, cid — engine-portable."""
    cents = ivf_centroid_rows(
        corpus, n_lists=n_lists, id_col=id_col, vec_col=vec_col
    ).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("cid"), F.col("cv"), norm_of(F.col("cv")).alias("cn"))
            )
        ).alias("cents")
    )

    def _top1(vec: Column, vn: Column, cents_arr: Column) -> Column:
        scored = F.transform(
            cents_arr,
            lambda cent: F.struct(
                cent["cid"].alias("cid"),
                (dot(vec, cent["cv"]) / (vn * cent["cn"])).alias("cos"),
            ),
        )
        init = F.struct(
            F.lit(-1).cast("long").alias("cid"), F.lit(-2.0).alias("cos")
        )
        return F.aggregate(
            scored,
            init,
            lambda acc, s: F.when(s["cos"] > acc["cos"], s).otherwise(acc),
        )["cid"]

    v = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_av")
    ).withColumn("_an", norm_of(F.col("_av")))
    return v.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        _top1(F.col("_av"), F.col("_an"), F.col("cents")).alias("cell"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC)


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 as a left fold over squared differences — the same
    fold-order contract as dot(), so quantized distances hash-match the
    oracle's sequential list_sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook(
    corpus: DataFrame,
    n_cents: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The PQ codebook as ONE row holding the cid-sorted centroid
    vectors (Jégou et al. 2011 share one coarse codebook across
    subspaces in the IVFADC setup; here the m-th subspace's centroid j
    is the j-th selected vector's m-th slice). Selection is the
    engine's deterministic md5-rank sample (same contract as
    ivf_centroid_rows): FIXED size regardless of corpus scale — the
    broadcast is n_cents*dim doubles at 10^10 docs too."""
    sel = corpus.select(
        F.col(id_col).alias("cid"), as_double(F.col(vec_col)).alias("cv")
    ).orderBy(F.md5(F.col("cid").cast("string"))).limit(n_cents)
    return sel.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("_cb")
    ).select(F.transform(F.col("_cb"), lambda s: s["cv"]).alias("cents"))


def _subspace_dists(vec: Column, cents: Column, m: int, sub: int) -> Column:
    """Array (position-aligned with the codebook) of squared L2 between
    ``vec``'s m-th slice and each centroid's m-th slice."""
    lo = m * sub + 1
    return F.transform(
        cents,
        lambda c: _l2sq(F.slice(vec, lo, sub), F.slice(c, lo, sub)),
    )


def _sub_code(vec: Column, cents: Column, m: int, sub: int) -> Column:
    """1-based position of the nearest per-subspace centroid, computed
    in ONE interpreted-HOF pass: transform to (dist, pos) structs and
    take the struct min (orders by dist, then pos — i.e. ties go to
    the smaller position, exactly array_position-of-array_min
    semantics, at half the evaluation cost: HOFs are interpreted, not
    codegen'd, so writing the dists expression twice really does run
    every _l2sq fold twice per row)."""
    lo = m * sub + 1
    ds = F.transform(
        cents,
        lambda c, i: F.struct(
            _l2sq(F.slice(vec, lo, sub), F.slice(c, lo, sub)).alias("d"),
            (i + 1).cast("int").alias("p"),
        ),
    )
    return F.array_min(ds)["p"]


def pq_encode(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    n_cents: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """(id, codes) — each vector compressed to ``m`` small integers
    (1-based positions of the nearest per-subspace centroid, ties to
    the smaller position via array_position-of-min). THE memory story
    at design scale: a 64-dim float corpus (256 B/vector) becomes
    m=8 bytes/vector — 10^10 embeddings fit in 80 GB instead of
    2.5 TB, which is what makes an in-cluster ANN index resident.

    Zero shuffle: the codebook broadcasts (bounded — see pq_codebook)
    and every row folds over it in whole-stage codegen;
    O(n_cents * dim) per row, linear in the corpus."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    cb = pq_codebook(corpus, n_cents, id_col, vec_col) if codebook is None else codebook
    v = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_v")
    )
    codes = F.array(
        *[_sub_code(F.col("_v"), F.col("cents"), mm, sub) for mm in range(m)]
    )
    return v.crossJoin(F.broadcast(cb)).select(
        F.col(id_col), codes.alias("codes")
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 8,
    n_cents: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search" — the ADC
    estimator): the corpus is scanned as 8-byte codes, each query
    precomputes an (m × n_cents) lookup table of subspace distances,
    and a pair's distance estimate is m table lookups + (m-1) adds —
    no per-pair vector arithmetic at all.

    Plan: codes come from pq_encode (or a pre-encoded ``codes`` table —
    the stored-index shape); the query side (LUT rows, m*n_cents
    doubles per query) broadcasts into a crossJoin scan of the codes.
    The corpus never shuffles and is never touched as full vectors
    after encoding. Compose with ivf_assign_cells to probe cells
    instead of scanning (IVFADC proper) when queries are many.

    Output: (query_id, neighbor_id, dist_q, rk) with
    dist_q = floor(10^6 * estimated squared L2), ranked ascending,
    ties to the smaller neighbor id."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    sub = dim // m
    cb = pq_codebook(corpus, n_cents, id_col, vec_col)
    enc = (
        pq_encode(corpus, dim, m, n_cents, id_col, vec_col, codebook=cb)
        if codes is None
        else codes
    ).select(F.col(id_col).alias("neighbor_id"), "codes")
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_q")
    )
    lut = F.array(
        *[
            _subspace_dists(F.col("_q"), F.col("cents"), mm, sub)
            for mm in range(m)
        ]
    )
    qlut = q.crossJoin(F.broadcast(cb)).select("query_id", lut.alias("_lut"))
    dist = F.lit(0.0)
    for mm in range(m):
        dist = dist + F.element_at(
            F.element_at(F.col("_lut"), mm + 1),
            F.element_at(F.col("codes"), mm + 1),
        )
    sims = (
        F.broadcast(qlut)
        .crossJoin(enc)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(dist * 1000000).cast("long").alias("dist_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist_q"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "dist_q", F.col("rk").cast("long").alias("rk"))
    )


def ivfadc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 8,
    n_cents: int = 16,
    n_lists: int = 64,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC proper (Jégou et al. 2011 §IV): the coarse IVF quantizer
    routes each query to its ``nprobe`` nearest inverted lists and the
    PQ/ADC estimator scores ONLY the codes in those lists — the full
    design-scale ANN path where neither the corpus vectors nor the
    whole code table are touched per query.

    One map pass over the corpus produces (id, cell, codes) against
    the two bounded broadcast codebooks (IVF centroids + PQ codebook)
    — zero shuffle, no join between the assignment and the encoding.
    Queries build their (m × n_cents) ADC LUT and probe cells from
    their OWN vectors (external queries are first-class), explode to
    nprobe rows, and equi-join the coded corpus on the cell id: per-
    query work is |corpus|/n_lists · nprobe code lookups. At design
    scale the coded corpus is a stored table partitioned by cell; the
    LUT side is per-query-tiny and broadcasts.

    Output matches pq_adc_topk: (query_id, neighbor_id, dist_q, rk)
    with dist_q = floor(10^6 · estimated squared L2), ascending, ties
    to the smaller neighbor id. Exactness caveat vs pq_adc_topk: only
    probed cells are candidates (that is the point).
    """
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if k <= 0 or nprobe <= 0:
        raise ValueError(f"k and nprobe must be positive, got {k}, {nprobe}")
    sub = dim // m
    ivf_cents = ivf_centroid_rows(
        corpus, n_lists=n_lists, id_col=id_col, vec_col=vec_col
    ).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("cid"), F.col("cv"), norm_of(F.col("cv")).alias("cn"))
            )
        ).alias("cents")
    )
    cb = pq_codebook(corpus, n_cents, id_col, vec_col).select(
        F.col("cents").alias("pq_cents")
    )
    # ONE pass: cell assignment + PQ encoding against both broadcasts
    v = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_vn", norm_of(F.col("_v")))
    codes = F.array(
        *[_sub_code(F.col("_v"), F.col("pq_cents"), mm, sub) for mm in range(m)]
    )
    coded = (
        v.crossJoin(F.broadcast(ivf_cents))
        .crossJoin(F.broadcast(cb))
        .select(
            F.col(id_col).alias("neighbor_id"),
            _top2(F.col("_v"), F.col("_vn"), F.col("cents"))["b1"].alias("cell"),
            codes.alias("codes"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_q")
    ).withColumn("_qn", norm_of(F.col("_q")))
    lut = F.array(
        *[
            _subspace_dists(F.col("_q"), F.col("pq_cents"), mm, sub)
            for mm in range(m)
        ]
    )
    probes = (
        q.crossJoin(F.broadcast(ivf_cents))
        .crossJoin(F.broadcast(cb))
        .select(
            "query_id",
            lut.alias("_lut"),
            _top2(F.col("_q"), F.col("_qn"), F.col("cents")).alias("_a"),
        )
        .select(
            "query_id",
            "_lut",
            F.explode(
                F.slice(F.array(F.col("_a.b1"), F.col("_a.b2")), 1, nprobe)
            ).alias("cell"),
        )
        .filter(F.col("cell") >= 0)
    )
    dist = F.lit(0.0)
    for mm in range(m):
        dist = dist + F.element_at(
            F.element_at(F.col("_lut"), mm + 1),
            F.element_at(F.col("codes"), mm + 1),
        )
    sims = (
        probes.join(coded, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(dist * 1000000).cast("long").alias("dist_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist_q"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "neighbor_id", "dist_q", F.col("rk").cast("long").alias("rk")
        )
    )


def random_project(
    emb: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a Rademacher
    (±1) projection matrix (Achlioptas 2001, "Database-friendly random
    projections": r_ij = ±1 each w.p. 1/2 satisfies the JL lemma with
    the same guarantees as Gaussian entries) — the cheap 64→16 front
    end that makes downstream ANN distance work 4× smaller.

    Engine-portable determinism: sign(j, i) = +1 iff the first hex
    char of md5("j_i") is < '8' (exactly half the hex alphabet), and
    the input vector is integer-quantized (floor(x·scale)), so every
    projected coordinate y_j = Σ_i qv_i·sign(j, i) is an exact integer
    any engine reproduces. The unscaled sum is returned (the 1/√d'
    JL normalization is a constant factor that cancels in distance
    RANKINGS; apply it outside when absolute distances matter).

    Scale: the sign matrix is out_dim·in_dim literals compiled into
    the plan (bounded, independent of corpus size — the codebook
    rule); the projection is a zero-shuffle per-row fold riding the
    scan. Output exploded to (id, dim, y) rows."""
    import hashlib

    from news_please_spark.operators.clustering import quantize_vec

    def sign(j: int, i: int) -> int:
        return 1 if hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0] < "8" else -1

    rows = emb.select(
        F.col(id_col), quantize_vec(F.col(vec_col), scale).alias("qv")
    )
    projected = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("qv"),
                    F.array(*[F.lit(sign(j, i)) for i in range(1, in_dim + 1)]),
                    lambda a, s: a * s,
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            for j in range(out_dim)
        ]
    )
    return rows.select(
        id_col, F.posexplode(projected).alias("dim", "y")
    ).select(id_col, "dim", "y")


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    hi_q: int = 9500,
    lo_q: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for retrieval training (the DPR/ANCE
    recipe): for each query, the top-k most similar corpus vectors
    whose quantized cosine lies in [lo_q, hi_q) — similar enough to
    be confusable (hard), but below the near-duplicate band that
    would poison training with false negatives. The hi_q ceiling is
    the same floor(10⁴·cos) scale the dedup tier thresholds on, so
    "everything embedding_near_dups would pair" is exactly what this
    excludes.

    This is the exact/baseline path (broadcast queries × corpus scan,
    no corpus shuffle — the ann_cosine_topk plan with a band filter
    BELOW the ranking window, so only in-band rows reach it). At
    10^10 docs compose the approximate front end instead: ivf_topk /
    lsh_topk with an inflated k, then apply the same band filter and
    re-rank — the ceiling only ever REMOVES top rows, so retrieval
    with k' ≥ k + |near-dups| is exact w.r.t. the candidates."""
    e = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).withColumn("vn", norm_of(F.col("v")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm_of(F.col("qv")))
    pairs = F.broadcast(q).crossJoin(e).filter(F.col("query_id") != F.col(id_col))
    sims = pairs.select(
        "query_id",
        F.col(id_col).alias("neg_id"),
        F.floor(10000 * (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn"))))
        .cast("long")
        .alias("sim_q"),
    ).filter((F.col("sim_q") >= lo_q) & (F.col("sim_q") < hi_q))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim_q"), F.col("neg_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neg_id", "sim_q", "rk")
    )


def vec_quantize_int8(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the
    standard 4× storage/bandwidth cut before ANN at 10^10 vectors
    (codes live in the page cache; floats don't). Per-vector max-abs
    scaling, the scheme faiss/SQ8 and every int8 vector store uses:

      scale_q = floor(10⁶ · max_i |v_i|)   (0 for the all-zero vector)
      code_i  = clamp(round-half-up(v_i · 127·10⁶ / scale_q), ±127)
                 (the clamp covers the floor-lowered denominator edge)
      err_q   = floor(10⁶ · Σ_i |v_i − code_i·scale_q/(127·10⁶)|)
                 (L1 reconstruction error, the quality audit column)

    All decisions are made on DOUBLE images of the float input with a
    fixed operation order, then floored to integers — the same
    portability discipline as the cosine entries, so any engine
    re-derives identical codes. Zero shuffle: pure per-row HOFs riding
    the scan. Output: (id, scale_q, codes array<int>, err_q)."""
    # One mapInPandas kernel: per row, the max-abs/code/err arithmetic
    # runs vectorized in numpy float64 with the IDENTICAL operation
    # order as the Column form (elementwise ops are order-free; the L1
    # error sum uses cumsum, which is the exact left-associated
    # sequential sum the fold computed). The HOF form paid interpreted
    # per-element lambda eval for ~4 array passes per row; an unrolled
    # element_at chain was tried first and REJECTED — flat 64-term
    # chains evaluate ~8× slower than the fold (see OPTIMIZATION_r06.md
    # "negative results"). Zero shuffle either way.
    import numpy as np
    import pandas as pd

    id_type = emb.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            ids, scales, codes_out, errs = [], [], [], []
            for rid, vec in zip(pdf[id_col], pdf[vec_col]):
                if vec is None:
                    ids.append(rid)
                    scales.append(None)
                    codes_out.append(None)
                    errs.append(None)
                    continue
                v = np.asarray(vec, dtype=np.float64)
                m = float(np.max(np.abs(v))) if v.size else 0.0
                m = m if m > 0.0 else 0.0
                scale_q = int(np.floor(1000000 * m))
                if scale_q > 0:
                    t = ((v * 127.0) * 1000000.0) / np.float64(scale_q)
                    codes = np.maximum(
                        -127.0, np.minimum(127.0, np.floor(t + 0.5))
                    ).astype(np.int32)
                else:
                    codes = np.zeros(v.size, dtype=np.int32)
                recon = (codes.astype(np.float64) * np.float64(scale_q)) / 127000000.0
                terms = np.abs(v - recon)
                tot = float(np.cumsum(terms)[-1]) if terms.size else 0.0
                err_q = int(np.floor(1000000 * tot))
                ids.append(rid)
                scales.append(scale_q)
                codes_out.append(codes)
                errs.append(err_q)
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="object"),
                "scale_q": pd.Series(scales, dtype="object"),
                "codes": pd.Series(codes_out, dtype="object"),
                "err_q": pd.Series(errs, dtype="object"),
            })

    return emb.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} {id_type}, scale_q long, codes array<int>, err_q long"
    )


def margin_mine(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 4,
    threshold_q: int = 10500,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-based candidate mining (Artetxe & Schwenk, ACL 2019
    "Margin-based parallel corpus mining", ratio margin, forward
    variant): a query's best neighbor is accepted only when its
    similarity stands OUT of the query's neighborhood —
    margin = cos(x, y1) / mean(cos(x, NN_k(x))) — the criterion that
    suppresses hubness false positives absolute-threshold mining
    suffers (a hub vector is near everything, so its margin ~1).
    The bitext-mining / cross-corpus alignment primitive (CCMatrix).

    Integer-exact contract: per-pair cosines are quantized to basis
    points FIRST, so the k-neighborhood sum is an integer sum
    (order-independent — a raw double sum would be accumulation-order
    sensitive and engine-divergent at floor boundaries); then
    margin_q = 10000 * n * cos_q(top1) // sum(cos_q over n <= k NNs).
    Queries whose neighborhood sum is <= 0 are dropped (an
    anti-correlated neighborhood has no meaningful margin).

    Returns (query_id, neighbor_id, cos_q, margin_q, accepted).
    Scale shape: inherits brute_force_topk's broadcast-queries ×
    corpus scan (zero corpus shuffle); swap in lsh_topk/ivf_topk
    candidates for the 10^10 point — the margin math is agnostic to
    the top-k source."""
    topk = brute_force_topk(queries, corpus, k=k, id_col=id_col, vec_col=vec_col)
    scored = topk.select(
        "query_id",
        "neighbor_id",
        F.floor(F.lit(10000) * F.col("cos")).cast("long").alias("cos_q"),
    )
    agg = scored.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("cos_q").alias("_sum"),
        F.max(F.struct(F.col("cos_q"), (-F.col("neighbor_id")).alias("_nn"))).alias("_top"),
    )
    out = (
        agg.filter(F.col("_sum") > 0)
        .select(
            "query_id",
            (-F.col("_top._nn")).alias("neighbor_id"),
            F.col("_top.cos_q").alias("cos_q"),
            # floor (not cast-truncation) so negative top-1 cosines
            # round the same way as the oracle's floor()
            F.floor(
                (F.lit(10000) * F.col("_n") * F.col("_top.cos_q"))
                / F.col("_sum")
            ).cast("long").alias("_m"),
        )
        .select(
            "query_id",
            "neighbor_id",
            "cos_q",
            F.col("_m").alias("margin_q"),
            (F.col("_m") >= threshold_q).alias("accepted"),
        )
    )
    return out


def dim_truncation_audit(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    prefix_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka prefix-dimension audit (Kusupati et al., NeurIPS
    2022): how much of the FULL-dimension cosine top-k survives when
    similarity uses only the first `prefix_dims` components — the
    measurement that decides whether the cheap prefix index (IVF cells
    on 16 dims, full re-rank on survivors) is safe for this embedding
    column, BEFORE committing the 10^10-vector index build to it.

    Returns (query_id, n_hits, recall_bp): |top-k_full ∩ top-k_prefix|
    and its floor-bp share of k.  Similarities are quantized to
    floor(10^4·cos) with the operation order the ann entries
    established (10000·(dot/denom), left-fold dot) and ranked
    (sim DESC, neighbor ASC), so the two top-k SETS — and hence the
    audit — are bit-identical across engines.

    Scale shape: queries broadcast twice against the corpus (full and
    prefix pass — the prefix slice is a map-side Column, no second
    scan materializes); per-query windows see |C| rows only inside
    TakeOrdered-style partial ranking; the final join is on the two
    O(|Q|·k) survivor tables."""
    if k <= 0 or prefix_dims <= 0:
        raise ValueError("k and prefix_dims must be positive")
    # Precompute per SIDE what the per-pair expression used to re-fold:
    # the prefix slice and both norms ride the (tiny) query table and
    # the corpus rows ONCE; each pair then pays exactly one dot fold
    # per pass instead of three — identical arithmetic (dot/sqrt order
    # unchanged; the slices are the same values the in-pair slice
    # produced), one third of the interpreted-HOF work. (An unrolled
    # element_at chain was tried and REJECTED: 8× slower than the fold
    # — see OPTIMIZATION_r06.md "negative results".)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_q")
    ).withColumn("_qp", F.slice(F.col("_q"), 1, prefix_dims))
    q = q.withColumn("_qn", norm_of(F.col("_q"))).withColumn(
        "_qnp", norm_of(F.col("_qp"))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_vp", F.slice(F.col("_v"), 1, prefix_dims))
    c = c.withColumn("_vn", norm_of(F.col("_v"))).withColumn(
        "_vnp", norm_of(F.col("_vp"))
    )

    def topk(qv, cv, qn, vn, label):
        sims = (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.floor(10000 * (dot(qv, cv) / (qn * vn)))
                .cast("long")
                .alias("_s"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("_s"), F.asc("neighbor_id")
        )
        return (
            sims.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .select("query_id", F.col("neighbor_id").alias(label))
        )

    full = topk(
        F.col("_q"), F.col("_v"), F.col("_qn"), F.col("_vn"), "n_full"
    )
    pref = topk(
        F.col("_qp"), F.col("_vp"), F.col("_qnp"), F.col("_vnp"), "n_pref"
    )
    hits = full.join(
        pref,
        (full["query_id"] == pref["query_id"])
        & (full["n_full"] == pref["n_pref"]),
        "left",
    ).select(
        full["query_id"],
        F.when(pref["n_pref"].isNotNull(), 1).otherwise(0).alias("_hit"),
    )
    return hits.groupBy("query_id").agg(
        F.sum("_hit").cast("long").alias("n_hits"),
        F.expr(f"(10000 * sum(_hit)) div {k}").cast("long").alias("recall_bp"),
    )
