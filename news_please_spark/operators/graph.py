"""Connected components over an edge table — transitive closure for
dup clusters, the step that turns pairwise near-dup verdicts into
dedup GROUPS (a≈b and b≈c must put a, b, c in ONE cluster even when
a≉c pairwise; keeping min-id per cluster is then exemplar selection,
not a per-pair coin flip).

Algorithm: iterative min-label propagation (the "hash-to-min" family,
Kiveris et al. 2014, "Connected Components in MapReduce and Beyond")
PLUS per-round pointer doubling (Shiloach & Vishkin 1982): every node
starts labeled with itself; each round it (a) hooks — takes the min of
its own label and its neighbors' labels — then (b) compresses — takes
its label's label, halving pointer-chain depth.  Fixpoint = every node
holds its component's min id.  Hooking alone converges in O(diameter)
rounds; the doubling step makes it O(log diameter) — a 10^6-node chain
resolves in ~20 rounds instead of 10^6 (test: 200-chain in <= 12).
Near-dup clusters are dense stars/cliques that finish in 2-4 rounds
either way; the doubling is the insurance for adversarial chains.

Distribution: one hash-shuffle join per round on node id, labels
localCheckpoint'ed each round (plan stays flat, superseded checkpoints
released deterministically — the frontier's wave-loop discipline).
The per-round changed-row count rides the label checkpoint as an
Observation — the driver sees one scalar, no extra job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from news_please_spark.operators.cacheutil import release_df


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 50,
) -> DataFrame:
    """(id, root) for every node appearing in `edges`, root = the
    smallest node id in its connected component.  Deterministic;
    isolated nodes never appear (feed them separately if singletons
    should carry their own label).  Raises after `max_iters` rounds
    without convergence — diameter that large means the input is not a
    dup graph."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    und = und.localCheckpoint()
    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("root", F.col("id"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iters):
            neigh = (
                und.join(labels, und["b"] == labels["id"])
                .groupBy("a")
                .agg(F.min("root").alias("_nr"))
            )
            hooked = labels.join(
                neigh, labels["id"] == neigh["a"], "left"
            ).select(
                "id",
                "root",
                F.least(
                    F.col("root"), F.coalesce(F.col("_nr"), F.col("root"))
                ).alias("_h"),
            )
            # pointer doubling: follow the hooked label one more hop
            # (labels only ever decrease toward the component min, so
            # compressing through the PREVIOUS round's table is safe
            # and halves chain depth every round)
            lk = labels.select(
                F.col("id").alias("_lid"), F.col("root").alias("_lroot")
            )
            # the convergence check rides the checkpoint job as an
            # Observation (the frontier wave-loop's stats pattern) —
            # zero extra jobs per round, and the label projection is
            # folded into the same checkpoint instead of a second one
            _obs = Observation()
            prev = labels
            labels = (
                hooked.join(lk, hooked["_h"] == lk["_lid"], "left")
                .select(
                    "id",
                    "root",
                    F.least(
                        F.col("_h"), F.coalesce(F.col("_lroot"), F.col("_h"))
                    ).alias("_new"),
                )
                .observe(
                    _obs,
                    F.count_if(F.col("_new") != F.col("root")).alias("chg"),
                )
                .select("id", F.col("_new").alias("root"))
                .localCheckpoint(eager=True)
            )
            release_df(prev)
            if _obs.get["chg"] == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    finally:
        release_df(und)


def pagerank_scaled(
    edges: DataFrame,
    nodes: DataFrame,
    out_degree: int,
    iters: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    materialize: bool = True,
    teleport_nodes: DataFrame | None = None,
) -> DataFrame:
    """Integer-EXACT fixed-iteration PageRank for uniform-out-degree
    graphs — link-authority scores for crawl frontier prioritization
    (the role OPIC / PageRank play in production crawl schedulers;
    the reference's BFS order is authority-blind, this is the upgrade
    a 10^10-URL frontier wants).

    Exactness trick: with uniform out-degree D and integer damping
    d = damping_pct/100, rescale rank at step k by N*(100*D)**k.  The
    recurrence becomes pure BIGINT arithmetic::

        R_0[n]     = 1
        R_{k+1}[n] = (100-d%)*D*(100*D)**k  +  d% * SUM_{src->n} R_k[src]

    (divide R_iters by N*(100*D)**iters to recover the probability).
    No floating point anywhere, so the result is bit-identical across
    engines, partitionings, and summation orders — which is what lets
    the driver hash-compare it against a SQL oracle.  Overflow bound:
    total mass is conserved at N*(100*D)**k, so every entry fits a
    signed 64-bit long while N*(100*D)**iters < 2**63 (N ~ 3e11 at the
    default D=3, iters=3).

    Distribution: `edges` is hash-partitioned on `src` ONCE and
    localCheckpoint'ed; each iteration then shuffles only the rank
    table (one long per node) to meet it, and the per-dst SUM is
    map-side combinable.  Superseded rank checkpoints are released
    every round (the frontier wave-loop discipline).  In-degree skew
    (a hub page linked from everywhere) concentrates one groupBy key —
    AQE skew-join handles it at runtime; the salting upgrade is to
    split hot dst keys and re-sum, bit-identical because integer
    addition is associative.

    Multi-edges contribute once per edge (standard multigraph
    PageRank); callers wanting simple-graph semantics distinct() the
    edge table first.

    materialize=False skips the per-iteration localCheckpoints and
    returns one lazy linear plan — right for small iteration counts
    where the caller wants the whole computation to run inside ITS
    action (benchmark timing windows, composition into a larger plan);
    the edge table is then re-derived once per iteration.

    ``teleport_nodes`` restricts where teleport mass lands (TrustRank-
    style seeding, Gyöngyi et al. VLDB 2004): nodes outside the set get
    a zero teleport term and a zero initial rank, so their score is
    pure inherited link mass.  The teleport magnitude PER SEED is kept
    identical to the uniform case, which makes the seeded rank
    componentwise ≤ the uniform rank (every recurrence coefficient is
    nonnegative) — the monotonicity spam_mass depends on.  Default
    None = every node (classic PageRank, unchanged results).
    """
    if out_degree <= 0:
        raise ValueError("out_degree must be positive")
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    if materialize:
        e = e.repartition("_src").localCheckpoint()
    base = 100 * out_degree
    if teleport_nodes is None:
        marked = nodes.select(F.col(id_col).alias("id"), F.lit(True).alias("_tp"))
    else:
        tset = teleport_nodes.select(
            F.col(id_col).alias("id"), F.lit(True).alias("_mark")
        ).distinct()
        marked = (
            nodes.select(F.col(id_col).alias("id"))
            .join(tset, "id", "left")
            .select("id", F.coalesce(F.col("_mark"), F.lit(False)).alias("_tp"))
        )
        if materialize:
            marked = marked.localCheckpoint()
    ranks = marked.select(
        "id", F.when(F.col("_tp"), 1).otherwise(0).cast("long").alias("r")
    )
    try:
        for k in range(iters):
            teleport = (100 - damping_pct) * out_degree * base**k
            contrib = (
                e.join(ranks, e["_src"] == ranks["id"])
                .groupBy("_dst")
                .agg(F.sum("r").alias("_c"))
            )
            prev = ranks
            ranks = (
                marked
                .join(contrib, F.col("id") == F.col("_dst"), "left")
                .select(
                    "id",
                    (
                        F.when(F.col("_tp"), teleport).otherwise(0)
                        + F.lit(damping_pct) * F.coalesce(F.col("_c"), F.lit(0))
                    )
                    .cast("long")
                    .alias("r"),
                )
            )
            if materialize:
                ranks = ranks.localCheckpoint()
                release_df(prev)
        return ranks
    finally:
        if materialize:
            release_df(e)
            # safe only once the returned ranks are their own
            # checkpoint (iters >= 1); at iters == 0 the result still
            # reads through `marked` and must keep its blocks
            if teleport_nodes is not None and iters > 0:
                release_df(marked)


def spam_mass(
    edges: DataFrame,
    nodes: DataFrame,
    bad_nodes: DataFrame,
    out_degree: int,
    iters: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    materialize: bool = True,
) -> DataFrame:
    """Spam mass (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2006): how
    much of a page's PageRank is inherited through the flagged part of
    the web — the crawl-scheduler signal that demotes link farms the
    blocklist itself hasn't caught yet (rank laundered from bad
    neighborhoods shows up as high relative mass even when the page is
    not itself listed).

    Computed as two integer-exact fixed-iteration ranks in the SAME
    N·(100·D)^k scale: R (teleport to every node) and R_good (teleport
    restricted to nodes NOT in ``bad_nodes`` — the TrustRank-seeded
    variant).  Every recurrence coefficient is nonnegative and the
    good teleport vector is componentwise ≤ the uniform one, so
    R_good ≤ R exactly; absolute mass = R − R_good, relative mass
    spam_bp = (R − R_good)·10⁴ DIV R (R is always ≥ its own teleport
    term > 0 for teleport-eligible nodes; pure-inherited nodes with
    R = 0 report 0).

    Scale shape: exactly two pagerank_scaled runs; per iteration only
    the 1-long-per-node rank table shuffles. With materialize=True
    each run builds its own hash-partitioned edge checkpoint (2× a
    one-time cost, not per-iteration); the final merge is an id
    equi-join of two node-sized tables.  Overflow: the bp multiply
    tightens pagerank_scaled's bound by 10⁴ — at the default D=3,
    iters=3 that still covers N up to ~3·10⁷ per 64-bit lane; above
    that drop to iters=2 or consume spam_abs directly (the allocate_
    budget documentation-over-runtime-assert convention).

    Returns (id, rank_all, rank_good, spam_abs, spam_bp)."""
    good = nodes.select(F.col(id_col).alias(id_col)).join(
        bad_nodes.select(F.col(id_col).alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    r_all = pagerank_scaled(
        edges, nodes, out_degree, iters, damping_pct,
        src=src, dst=dst, id_col=id_col, materialize=materialize,
    ).select(F.col("id"), F.col("r").alias("rank_all"))
    r_good = pagerank_scaled(
        edges, nodes, out_degree, iters, damping_pct,
        src=src, dst=dst, id_col=id_col, materialize=materialize,
        teleport_nodes=good,
    ).select(F.col("id"), F.col("r").alias("rank_good"))
    return r_all.join(r_good, "id").select(
        "id",
        "rank_all",
        "rank_good",
        (F.col("rank_all") - F.col("rank_good")).alias("spam_abs"),
        F.when(
            F.col("rank_all") > 0,
            F.expr("(rank_all - rank_good) * 10000L DIV rank_all"),
        )
        .otherwise(0)
        .cast("long")
        .alias("spam_bp"),
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """General double-precision PageRank: arbitrary out-degrees,
    dangling nodes (out-degree 0) redistribute their mass uniformly.
    Same join/groupBy plan shape as `pagerank_scaled` (which is the
    hash-comparable specialization for uniform-degree graphs); this
    variant is checked against a numpy power-iteration oracle in
    pytest with float tolerance.

    The per-iteration dangling mass is a 1-row aggregate collected to
    the driver (O(1) rows — the same grain as the frontier's wave
    counts), never a data-sized collect."""
    n = nodes.count()
    if n == 0:
        return nodes.select(F.col(id_col).alias("id"), F.lit(0.0).alias("rank"))
    e = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .repartition("_src")
        .localCheckpoint()
    )
    outdeg = e.groupBy("_src").agg(F.count("*").alias("_deg")).localCheckpoint()
    ranks = nodes.select(F.col(id_col).alias("id")).withColumn(
        "rank", F.lit(1.0 / n)
    )
    try:
        for _ in range(iters):
            linked = ranks.join(outdeg, ranks["id"] == outdeg["_src"], "left")
            dangling = (
                linked.filter(F.col("_deg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
            contrib = (
                e.join(
                    linked.filter(F.col("_deg").isNotNull()).select(
                        F.col("id").alias("_rid"),
                        (F.col("rank") / F.col("_deg")).alias("_share"),
                    ),
                    e["_src"] == F.col("_rid"),
                )
                .groupBy("_dst")
                .agg(F.sum("_share").alias("_c"))
            )
            prev = ranks
            ranks = (
                nodes.select(F.col(id_col).alias("id"))
                .join(contrib, F.col("id") == F.col("_dst"), "left")
                .select(
                    "id",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.lit(dangling / n))
                    ).alias("rank"),
                )
                .localCheckpoint()
            )
            release_df(prev)
        return ranks
    finally:
        release_df(e)
        release_df(outdeg)


def hits_scaled(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Integer-EXACT fixed-iteration HITS (Kleinberg 1999, "Authoritative
    Sources in a Hyperlinked Environment") — the hub/authority
    decomposition that complements PageRank for crawl prioritization:
    news INDEX pages are hubs (they link to many good articles),
    articles are authorities; a frontier that knows both can schedule
    hub recrawls and authority fetches differently.

    UNNORMALIZED form: h_0 = 1; then per iteration
    a_{k+1}[n] = SUM_{s->n} h_k[s], h_{k+1}[n] = SUM_{n->d} a_{k+1}[d].
    Skipping the per-step L2 normalization (a float sqrt that rounds
    differently across engines) keeps every value a BIGINT sum — the
    RANKING is identical (normalization is a positive per-step scalar)
    and the result hash-compares against a SQL oracle.  Overflow bound:
    values grow like (d_in*d_out)^iters — at the default iters=2 safe
    through ~10^4-degree hubs on 10^9-edge graphs; production wanting
    deep iteration switches to the normalized double form the same way
    pagerank() pairs with pagerank_scaled().

    Distribution: two map-side-combinable SUM aggregations per
    iteration (one keyed by dst, one by src) + equi-joins on node id —
    the same shape and skew story as pagerank_scaled (AQE skew-join /
    salting both apply unchanged, bit-identical because integer
    addition is associative).  Score vectors stay SPARSE between
    iterations: a node absent from a/h has score 0, and zero rows
    contribute nothing to the next SUM, so the full node table is
    joined exactly once — in the final projection — instead of twice
    per iteration (at 10^10 nodes those interior left-joins against
    `ids` were the dominant cost, and they only manufactured zeros the
    very next join threw away).  h_0 ≡ 1 collapses the first authority
    pass to plain in-degree: one aggregation, no join.  Lazy linear
    plan: the whole computation runs inside the caller's action.

    Output: (id, authority, hub) for every node."""
    if iters <= 0:
        raise ValueError("iters must be positive")
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    ids = nodes.select(F.col(id_col).alias("id"))

    def _sum_over(scores: DataFrame, col: str, join_key: str, group_key: str) -> DataFrame:
        # sparse propagation: SUM scores[col] over edges whose join_key
        # endpoint has a score, keyed by the opposite endpoint
        return (
            e.join(scores, e[join_key] == scores["id"])
            .groupBy(F.col(group_key).alias("id"))
            .agg(F.sum(col).cast("long").alias(col))
        )

    # a_1 = in-degree (h_0 is uniformly 1)
    a = e.groupBy(F.col("_dst").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    h = _sum_over(a, "a", "_dst", "_src").withColumnRenamed("a", "h")
    for _ in range(iters - 1):
        a = _sum_over(h, "h", "_src", "_dst").withColumnRenamed("h", "a")
        h = _sum_over(a, "a", "_dst", "_src").withColumnRenamed("a", "h")
    return (
        ids.join(a, "id", "left")
        .join(h, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("authority"),
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hub"),
        )
    )


def anchor_terms(
    edges: DataFrame,
    docs: DataFrame,
    top_k: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "doc_id",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Anchor-text aggregation: (dst, term, cnt, rk) — the top-k terms
    other pages use when linking to each target, the classic
    link-context ranking/description signal (search engines index a
    page under its incoming anchor text; a crawler uses it to
    prioritize unfetched URLs it has only seen described).

    ``edges`` must carry an ``anchor`` array<string> column (the link's
    text, already tokenized — e.g. a slice of the source page near the
    link).  Scale shape: one explode to (dst, term) occurrences, a
    map-side-combinable count, and a per-target top-k window.  The
    window's partition is a single TARGET's distinct-term set — bounded
    by vocabulary, not by in-degree (a million links saying "home"
    collapse to one counted row before any ranking), which is what
    makes this safe for the usual anchor-text skew (everyone links to
    the front page with the same words).
    """
    occ = edges.select(
        F.col(dst_col).alias("dst"), F.explode(anchor_col).alias("term")
    )
    counts = occ.groupBy("dst", "term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("dst").orderBy(
        F.desc("cnt"), F.asc("term")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= top_k)
        .select(F.col("dst").alias("dst_id"), "term", "cnt", "rk")
    )


def reciprocal_links(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Mutual-link detection — the classic link-farm / link-exchange
    signal (TrustRank-era spam features count reciprocal edges
    explicitly; organic web linking is overwhelmingly one-way). One
    row (a, b) with a < b per mutual pair.

    Plan: NOT a self-join. Each directed edge maps to its canonical
    unordered key (least, greatest) plus a direction bit; one
    map-side-combinable aggregation per key then keeps keys where
    both bits appeared. The edge table shuffles ONCE by the canonical
    key (fixed-width, no skew pile-up beyond the true pair degree) —
    a self-join would shuffle it twice and build a join hash table.
    Self-loops are dropped (a loop is not a mutual pair)."""
    s, d = F.col(src_col), F.col(dst_col)
    keyed = (
        edges.filter(s != d)
        .select(
            F.least(s, d).alias("a"),
            F.greatest(s, d).alias("b"),
            F.when(s < d, 1).otherwise(2).alias("_dir"),
        )
        .groupBy("a", "b")
        .agg(F.count_distinct("_dir").alias("_dirs"))
    )
    return keyed.filter(F.col("_dirs") == 2).select("a", "b")


def kcore_peel(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core peeling with a FIXED round budget: repeatedly drop nodes
    with fewer than k distinct undirected neighbors, then the edges
    touching them. The k-core is the fixpoint; a fixed number of
    peels converges to it from above and is the scale-friendly form —
    every round is the same static plan (one degree aggregation + two
    semi-joins), no data-dependent convergence polling, and 2-3 peels
    remove the overwhelming mass of the shell in real web graphs
    (degree-1 tendrils die in round 1, their newly-exposed parents in
    round 2). The dense cores that survive are where link farms and
    genuine hub communities live — the structural complement to
    spam_mass's propagation signal.

    Returns (node, deg): survivors after `rounds` peels with their
    degree in the SURVIVING subgraph. A survivor's degree can dip
    back below k when the final round's removals exposed it — the
    size of that set is exactly the remaining fixpoint gap, the
    signal for choosing the round budget. Self-loops ignored; edge direction ignored;
    parallel edges collapse (degree = distinct neighbors)."""
    s, d = F.col(src_col), F.col(dst_col)
    und = (
        edges.filter(s != d)
        .select(s.alias("a"), d.alias("b"))
        .unionByName(
            edges.filter(s != d).select(d.alias("a"), s.alias("b"))
        )
        .distinct()
    )
    for _ in range(rounds):
        deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("a")
        und = (
            und.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
        )
    return (
        und.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("a").alias("node"), "deg")
    )


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 4,
    materialize: bool = False,
) -> DataFrame:
    """Multi-hop redirect resolution by pointer doubling: collapse every
    redirect chain src -> ... -> final to one (src, final_url, hops,
    resolved) row.

    The reference keys articles by their redirect-canonical URL one hop
    at a time as responses arrive (reference newsplease/crawler/
    spiders/*.py via scrapy's redirect middleware + D4 keying); over an
    archived edge TABLE the set-oriented form is this operator.  Each
    round joins the state table with itself (state.cur = state.u), so a
    chain of length L collapses in ceil(log2 L) rounds — `rounds`=4
    resolves chains up to 16 hops, far beyond scrapy's default
    REDIRECT_MAX_TIMES=20 with rounds=5.

    `edges` must be functional: at most one outgoing redirect per
    `src_col` (dedupe to the latest fetch first — the operator does not
    pick a winner).  Nodes whose chain ends in a URL with no outgoing
    redirect get resolved=true; members of redirect CYCLES (a -> b -> a)
    never terminate and report resolved=false with their partially
    doubled state — surface them to the fetch tier as traps, never
    refetch targets.

    Scale shape: the state table stays edges-sized (redirects are a few
    percent of a frontier, never the frontier itself); each round is
    ONE hash equi-join on the url key + the final round a left join
    against the distinct src set. hops is exact (path-length sums
    compose under doubling).  materialize=True localCheckpoints per
    round — use when rounds is large enough that a 2^rounds-deep lazy
    join tree would stress the optimizer."""
    state = edges.select(
        F.col(src_col).alias("u"),
        F.col(dst_col).alias("cur"),
        F.lit(1).cast("long").alias("hops"),
    )
    for _ in range(int(rounds)):
        nxt = state.select(
            F.col("u").alias("_v"),
            F.col("cur").alias("_vcur"),
            F.col("hops").alias("_vhops"),
        )
        state = state.join(nxt, state["cur"] == nxt["_v"], "left").select(
            "u",
            F.coalesce("_vcur", "cur").alias("cur"),
            (F.col("hops") + F.coalesce(F.col("_vhops"), F.lit(0)))
            .cast("long")
            .alias("hops"),
        )
        if materialize:
            prev = state
            state = state.localCheckpoint()
            release_df(prev)
    outs = edges.select(F.col(src_col).alias("_o")).distinct()
    return state.join(outs, state["cur"] == F.col("_o"), "left").select(
        F.col("u").alias(src_col),
        F.col("cur").alias("final_url"),
        "hops",
        F.col("_o").isNull().alias("resolved"),
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, "Near
    linear time algorithm to detect community structures in large-scale
    networks") with a FIXED round budget and deterministic
    tie-breaking: every node starts labeled with its own id; each round
    every node simultaneously adopts the label carried by the most of
    its undirected neighbors, ties broken toward the SMALLEST label.
    Communities = nodes sharing a label after `rounds` rounds.

    Crawl use: partition the HOST graph into link communities so a
    crawl shard keeps site clusters together (politeness state and
    frontier locality both improve when a community maps to one
    shard) — the companion to rendezvous_shards' stateless placement.

    Determinism is the design constraint: classic ASYNC LPA is
    run-order dependent (its result depends on node visit order), so
    this is the synchronous variant with total-order tie-breaks — the
    same fixed-round discipline as kcore_peel/pagerank here, making the
    result reproducible and oracle-derivable cross-engine. Synchronous
    LPA can oscillate on bipartite structures; a fixed round budget
    (not convergence polling) is therefore also the semantics, not just
    the scale concession.

    Scale shape per round: one hash join of the undirected edge table
    against the (node, label) table on the neighbor key, a map-side-
    combinable (node, label) vote count, and a per-node argmax as a
    max(struct(votes, -label)) semigroup aggregate — no Window, no
    driver-side state beyond the loop counter. Self-loops ignored,
    parallel edges collapse (one vote per distinct neighbor).
    Requires non-negative integer node ids (the -label tie-break)."""
    s, d = F.col(src_col), F.col(dst_col)
    half = edges.filter(s != d).select(s.alias("a"), d.alias("b"))
    und = half.unionByName(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    und = und.localCheckpoint()
    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    try:
        for _ in range(rounds):
            votes = (
                und.join(labels, und["b"] == labels["id"])
                .groupBy("a", "label")
                .agg(F.count(F.lit(1)).alias("votes"))
            )
            stepped = (
                votes.groupBy("a")
                .agg(F.max(F.struct(F.col("votes"), (-F.col("label")).alias("nl"))).alias("w"))
                .select(F.col("a").alias("id"), (-F.col("w.nl")).alias("label"))
                .localCheckpoint()
            )
            prev = labels
            labels = stepped
            release_df(prev)
        return labels
    finally:
        release_df(und)


def opic_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """OPIC — Adaptive On-line Page Importance Computation (Abiteboul,
    Preda & Cobena, WWW 2003): the page-importance estimator real
    crawlers use to PRIORITIZE THE FRONTIER, because unlike PageRank it
    needs no global iteration-to-convergence — importance accumulates
    as the crawl proceeds. Every page starts with equal cash; each
    round a page distributes its cash equally along its out-edges and
    records what it spent in its history; importance ~ history + cash.

    Integer-exact fixed-round form (the cross-engine contract): cash
    starts at `scale`; a node with out-degree d (edge multiplicity
    counts) sends floor(cash/d) per edge, spends d*floor(cash/d), and
    KEEPS the division remainder; a node with no out-edges keeps all
    its cash (the virtual-sink node of the paper is the caller's
    modeling choice — add explicit edges to a sink id if wanted).
    Total cash is conserved every round (tested), so the scores are
    directly comparable across rounds and engines.

    Scale shape per round: one src-keyed hash join of the static
    (edge, outdeg) table against the cash table + one dst-keyed
    map-side-combinable sum — two shuffles, no Window, driver state is
    the loop counter only. The static edge+degree table is checkpointed
    once and reused every round (an Iceberg-cached image at cluster
    scale)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    state = nodes.select(
        "id",
        F.lit(scale).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("history"),
    ).localCheckpoint()
    try:
        for _ in range(rounds):
            # one src-keyed join, consumed by BOTH aggregations below
            # (long/long "/" is double division in Spark — floor makes
            # the integer semantics explicit and engine-portable)
            flows = ed.join(state, ed["src"] == state["id"]).select(
                state["id"].alias("giver"),
                "dst",
                F.floor(F.col("cash") / F.col("outdeg")).cast("long").alias("amt"),
            )
            incoming = flows.groupBy("dst").agg(F.sum("amt").alias("inflow"))
            spent = flows.groupBy("giver").agg(F.sum("amt").alias("give"))
            stepped = (
                state.join(spent, state["id"] == spent["giver"], "left")
                .join(incoming, state["id"] == incoming["dst"], "left")
                .select(
                    "id",
                    (
                        F.col("cash")
                        - F.coalesce(F.col("give"), F.lit(0))
                        + F.coalesce(F.col("inflow"), F.lit(0))
                    ).alias("cash"),
                    (
                        F.col("history") + F.coalesce(F.col("give"), F.lit(0))
                    ).alias("history"),
                )
                .localCheckpoint()
            )
            prev = state
            state = stepped
            release_df(prev)
        return state.select(
            "id", "cash", "history", (F.col("cash") + F.col("history")).alias("importance")
        )
    finally:
        release_df(ed)


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation
    (the MapReduce triangle pattern of Cohen 2009 / Suri &
    Vassilvitskii WWW 2011): orient every undirected edge from the
    endpoint with the SMALLER (degree, id) key to the larger, generate
    wedges only from each node's oriented out-neighbors, and close a
    wedge (u; v, w) iff the oriented edge v->w exists. Orientation
    bounds oriented out-degree by O(sqrt(m)) on real graphs, so wedge
    generation — the quadratic step — is per-node-bounded: a
    10^7-degree hub generates NO wedges from its own adjacency (its
    edges all point INTO it), which is exactly why this survives
    power-law webgraphs where the naive neighbor-intersection join
    explodes. Triangle density is the link-farm/community signal next
    to kcore_peel.

    Self-loops ignored, edge direction ignored, parallel edges
    collapse. Returns (node, n_tri) for nodes in >= 1 triangle (join
    against your node table for zeros). Plan: degree agg + orientation
    join + ONE wedge self-join + ONE closing equi-join + explode/agg —
    no Window, every aggregate map-side combinable."""
    s, d = F.col(src_col), F.col(dst_col)
    half = edges.filter(s != d).select(
        F.least(s, d).alias("a"), F.greatest(s, d).alias("b")
    ).distinct()
    und = half.unionByName(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    keyed = (
        und.join(deg.withColumnsRenamed({"a": "_ka", "deg": "dega"}), F.col("a") == F.col("_ka"))
        .join(deg.withColumnsRenamed({"a": "_kb", "deg": "degb"}), F.col("b") == F.col("_kb"))
        .select("a", "b", "dega", "degb")
    )
    oriented = keyed.filter(
        F.struct(F.col("dega"), F.col("a")) < F.struct(F.col("degb"), F.col("b"))
    ).select(
        F.col("a").alias("u"),
        F.col("b").alias("v"),
        F.struct(F.col("degb"), F.col("b")).alias("vkey"),
    ).localCheckpoint()
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = x.join(
        y,
        (F.col("x.u") == F.col("y.u")) & (F.col("x.vkey") < F.col("y.vkey")),
    ).select(
        F.col("x.u").alias("u"), F.col("x.v").alias("p"), F.col("y.v").alias("q")
    )
    closing = oriented.select(F.col("u").alias("p"), F.col("v").alias("q"))
    tris = wedges.join(closing, ["p", "q"], "left_semi")
    out = (
        tris.select(F.explode(F.array("u", "p", "q")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return out


def salsa_scaled(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 2,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Integer-exact fixed-iteration SALSA (Lempel & Moran 2000, "The
    Stochastic Approach for Link-Structure Analysis") — the random-walk
    cousin of HITS: instead of summing raw neighbor scores (which lets
    one mega-hub dominate), each step DIVIDES a node's score equally
    among its links, so authority flows like PageRank mass over the
    co-citation graph.  The crawl-scheduling use is the same as
    hits_scaled (hub recrawls vs authority fetches) but with built-in
    resistance to the TKC effect — a tightly-knit link farm saturates
    HITS yet gains nothing under SALSA's degree normalization, which
    is why it sits next to spam_mass in the frontier's signal set.

    Integer-exact form: a_0 = `scale` for every node with indeg >= 1;
    per iteration
        h[u] = SUM over u->v of (a[v] DIV indeg(v)),
        a[w] = SUM over u->w of (h[u] DIV outdeg(u)).
    Every step is a BIGINT floor-division + sum, so the result
    hash-compares cross-engine (DuckDB `//`).  Floors only ever SHED
    mass, so values are bounded by n*scale — no overflow headroom
    needed beyond 2^52 (exactness bound for the DIV operands).  The
    true SALSA stationary solution is indeg/total (authority chain);
    the fixed-iteration form is what a frontier actually materializes
    per snapshot, and planted-structure ranking agrees (tests).

    Distribution: degree tables are one map-side-combinable aggregate
    each, reused across iterations via localCheckpoint-free lazy reuse
    (they ride the same scan); per iteration two equi-joins on node id
    + two map-side-combinable SUMs — pagerank_scaled's exact shuffle
    story, AQE skew-join/salting apply unchanged.  Score vectors stay
    sparse between iterations (zero rows are dropped, absent = 0).

    Output: (id, authority, hub) BIGINTs for every node in `nodes`."""
    if iters <= 0:
        raise ValueError("iters must be positive")
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    ids = nodes.select(F.col(id_col).alias("id"))
    indeg = e.groupBy(F.col("_dst").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("indeg")
    )
    outdeg = e.groupBy(F.col("_src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )

    # a_0 = scale on every authority-side node (indeg >= 1)
    a = indeg.select("id", F.lit(int(scale)).cast("long").alias("a"))
    h = None
    for _ in range(iters):
        # hub step: h[u] = sum over u->v of a[v] DIV indeg(v)
        h = (
            e.join(a.join(indeg, "id"), e["_dst"] == F.col("id"))
            .select("_src", F.expr("a DIV indeg").alias("share"))
            .groupBy(F.col("_src").alias("id"))
            .agg(F.sum("share").cast("long").alias("h"))
        )
        # authority step: a[w] = sum over u->w of h[u] DIV outdeg(u)
        a = (
            e.join(h.join(outdeg, "id"), e["_src"] == F.col("id"))
            .select("_dst", F.expr("h DIV outdeg").alias("share"))
            .groupBy(F.col("_dst").alias("id"))
            .agg(F.sum("share").cast("long").alias("a"))
        )
    return (
        ids.join(a, "id", "left")
        .join(h, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("authority"),
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hub"),
        )
    )


def ball_sizes(
    edges: DataFrame,
    nodes: DataFrame,
    radius: int = 2,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Exact per-node neighborhood function |B(v, r)| for r = 1..radius
    — the all-sources generalization of the frontier's single BFS, and
    the exact twin of HyperBall (Boldi & Vigna 2013, "In-Core
    Computation of Geometric Centralities with HyperBall").  Ball
    growth rates are the crawl-planning signal for seed selection
    (a seed whose 2-ball is tiny wastes a politeness slot) and the
    input to effective-diameter / harmonic-centrality estimates.

    Exact form: the reached set is a distinct (root, node) pair table,
    expanded radius times through the edge list with an anti-join
    against already-reached pairs (the frontier_bfs3 wave loop, keyed
    by composite (root, node)).  Cost is SUM over r of |B(r)| pairs —
    fine for bounded radius on sparse graphs and THE oracle-checkable
    reference.  At 10^10 nodes the pair table is the scale hazard; the
    production swap is HyperBall proper: one HLL register array per
    node (operators/sketch.py::hll_registers), unioned along in-edges
    per round — O(n * 2^p) state instead of O(sum of balls), same loop
    shape.  This function is the exact small/medium-scale path and the
    calibration oracle for that swap.

    Distribution: per round one equi-join on node id + one distinct +
    one anti-join, all hash-partitioned on the (root, node) composite;
    counts are map-side-combinable conditional sums at the end.

    Output: (id, ball_1 .. ball_radius) BIGINTs, root itself EXCLUDED
    from its own ball counts' complement — i.e. ball_r INCLUDES the
    root (|B(v,0)| = 1), matching the neighborhood-function
    convention N(v, r) = #{u : d(v,u) <= r}."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    ids = nodes.select(F.col(id_col).alias("id"))
    reached = ids.select(
        F.col("id").alias("root"), F.col("id").alias("node"), F.lit(0).alias("d")
    )
    frontier = reached.select("root", "node")
    for r in range(1, radius + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_src"])
            .select("root", F.col("_dst").alias("node"))
            .distinct()
            .join(reached.select("root", "node"), ["root", "node"], "left_anti")
            .withColumn("d", F.lit(r))
        )
        reached = reached.unionByName(nxt)
        frontier = nxt.select("root", "node")
    aggs = [
        F.sum(F.when(F.col("d") <= r, 1).otherwise(0))
        .cast("long")
        .alias(f"ball_{r}")
        for r in range(1, radius + 1)
    ]
    return (
        reached.groupBy(F.col("root").alias("id"))
        .agg(*aggs)
    )


def hyperball(
    edges: DataFrame,
    nodes: DataFrame,
    radius: int = 2,
    p: int = 8,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """HyperBall proper (Boldi & Vigna 2013): the approximate,
    design-scale path for ball_sizes.  Instead of the exact (root,
    node) pair table — whose size is the SUM of all balls and explodes
    with graph expansion — every node carries one HLL register table
    (operators/sketch.py, <= 2^p rows per node), and each round merges
    its out-neighbors' sketches into its own:
        B(u, r) = {u} UNION over u->v of B(v, r-1)
    becomes a register-MAX, which is exactly HLL's lossless union.
    State is O(n * 2^p) REGARDLESS of radius or ball sizes — the
    reason HyperBall computed neighborhood functions on billion-node
    webgraphs in core.  Estimates are the sketch module's
    integer-exact raw HLL (bit-identical cross-engine), so even the
    APPROXIMATE path is oracle-checkable; ball_sizes is its
    calibration twin.  Raw-HLL caveat (same as hll_estimate's): below
    ~2.5 * 2^p the raw estimator reads high (production adds the
    linear-counting small-range correction — float territory, outside
    the oracle gate), so pick p for the ball sizes you expect; the
    calibration test runs degree-20 balls against p=4.

    Distribution per round: one equi-join of the edge list against
    the register table (hash-partitioned on node id) + one map-side-
    combinable MAX groupBy on (root, bucket).  No distinct, no
    anti-join, no pair-table growth.

    Output: (id, ball_1_est .. ball_radius_est) BIGINTs."""
    from news_please_spark.operators.cacheutil import release_df
    from news_please_spark.operators.sketch import hll_estimate, hll_registers

    if radius <= 0:
        raise ValueError("radius must be positive")
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    ids = nodes.select(F.col(id_col).alias("id"))
    items = ids.select(
        F.col("id").alias("root"), F.col("id").cast("string").alias("token")
    )
    regs = hll_registers(items, "token", group_cols=("root",), p=p).persist()
    held = [regs]  # every round's registers stay cached until the
    ests = []      # single materializing action below, then all release
    try:
        for r in range(1, radius + 1):
            prop = e.join(regs, e["_dst"] == regs["root"]).select(
                F.col("_src").alias("root"), "bucket", "max_rho"
            )
            regs = (
                regs.unionByName(prop)
                .groupBy("root", "bucket")
                .agg(F.max("max_rho").alias("max_rho"))
                .persist()
            )
            held.append(regs)
            ests.append(
                hll_estimate(regs, ("root",), p=p, out=f"ball_{r}_est")
            )
        out = ids
        for est in ests:
            out = out.join(est, out["id"] == est["root"], "left").drop("root")
        # force before releasing the register caches the plan reads
        out = out.localCheckpoint()
    finally:
        for h in held:
            release_df(h)
    return out


def contract_to_hosts(
    edges: DataFrame,
    src_host: Column,
    dst_host: Column,
) -> DataFrame:
    """Contract a page-level link graph to the host graph: one
    (src_host, dst_host, weight) row per host pair, weight = link
    count.  The host graph is 3-6 orders smaller than the page graph —
    the object crawl-budget decisions are actually made on.  One
    map-side-combinable aggregate; host-pair keys are fixed-width."""
    return (
        edges.select(src_host.alias("src"), dst_host.alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def pagerank_weighted_scaled(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    id_col: str = "id",
) -> DataFrame:
    """Integer-exact weighted PageRank for graphs with edge
    multiplicities — the host-graph companion of pagerank_scaled
    (which assumes a uniform out-degree, the derived page world's
    shape).  A host that links another host 10,000 times should pass
    10,000/total of its rank there, not 1/fan-out: contracted graphs
    are weighted by construction.

    Recurrence (all BIGINT, engine-portable):
        distributed(u) = (damping_pct * r(u)) DIV 100
        share(u->v)    = (distributed(u) * w(u,v)) DIV out_w(u)
        r'(v)          = ((100 - damping_pct) * scale) DIV 100
                         + SUM shares into v
    Floor division sheds a few units of mass per edge per iteration
    (bounded by the edge count) — the RANKING is what the frontier
    consumes, and the floors are identical cross-engine, so the result
    hash-compares.  Dangling hosts (no out-links) simply don't
    distribute — the standard sink treatment when ranks are read as
    relative priorities.

    Distribution: one out-weight aggregate (reused each iteration),
    then per iteration one equi-join rank->edges on src + one
    map-side-combinable SUM keyed by dst — identical shuffle story to
    pagerank_scaled; only 1-long-per-node rank rows move."""
    if iters <= 0:
        raise ValueError("iters must be positive")
    e = edges.select(
        F.col(src).alias("_src"),
        F.col(dst).alias("_dst"),
        F.col(weight).cast("long").alias("_w"),
    )
    ids = nodes.select(F.col(id_col).alias("id"))
    out_w = e.groupBy(F.col("_src").alias("id")).agg(
        F.sum("_w").cast("long").alias("_ow")
    )
    teleport = ((100 - damping_pct) * int(scale)) // 100
    r = ids.withColumn("r", F.lit(int(scale)).cast("long"))
    for _ in range(iters):
        flows = (
            e.join(r.join(out_w, "id"), e["_src"] == F.col("id"))
            .select(
                "_dst",
                F.expr(f"(({damping_pct} * r) DIV 100) * _w DIV _ow").alias(
                    "_share"
                ),
            )
            .groupBy(F.col("_dst").alias("id"))
            .agg(F.sum("_share").cast("long").alias("_in"))
        )
        r = ids.join(flows, "id", "left").select(
            "id",
            (F.lit(teleport) + F.coalesce(F.col("_in"), F.lit(0)))
            .cast("long")
            .alias("r"),
        )
    return r


def mutual_reach_clusters(
    edges: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-SCC cycle clusters: nodes that can reach each other in
    BOTH directions within `max_hops` hops, grouped into clusters —
    the spider-trap/redirect-cycle detector for a crawl frontier
    (calendar loops, session-id ping-pongs, mirror rings all live on
    short directed cycles; a node on no short cycle never appears).

    Exact semantics: build the hop-bounded directed closure R = {(a,b):
    dist(a→b) <= max_hops}, intersect with its transpose to get the
    mutual-pair graph M, then run connected_components over M — so two
    cycles sharing a node merge into one cluster (the trap NEIGHBORHOOD,
    not just the cycle).  Every SCC with internal diameter <= max_hops
    is recovered exactly; larger SCCs are split/approximated — the
    bounded compromise that keeps the plan shuffle-finite at web scale
    (true SCC needs unbounded fixpoint rounds).

    Returns (id, root): every on-cycle node labeled with its cluster's
    min node id.

    Scale shape: the closure grows one wave per hop — frontier ⋈ edges
    with an anti-join against the accumulated reach set (the crawl
    loop's own URL-seen discipline), everything hash-partitioned on the
    source node; |R| <= n·(out_deg^max_hops), the same cost class as
    ball_sizes/distance_distribution at equal radius.  The transpose
    intersection is one self-equi-join on (a,b); the CC rounds are
    O(log diameter) with pointer doubling.  Nothing collects or
    broadcasts anything node-proportional."""
    closure = bounded_closure(edges, max_hops=max_hops, src=src, dst=dst)
    try:
        return _mutual_cc(closure)
    finally:
        release_df(closure)


def bounded_closure(
    edges: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Hop-bounded directed closure: (a, b) pairs with 1 <= dist(a→b)
    <= max_hops (no self pairs).  One anti-join BFS wave per hop — the
    crawl loop's URL-seen discipline — so |result| is bounded by
    n·out_deg^max_hops and every join is hash-partitioned on the node
    id.  Returns a localCheckpoint'ed frame the CALLER must release_df
    when done; every intermediate is released here."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    reach = e
    frontier = e
    for _ in range(max_hops - 1):
        step = frontier.join(
            e.select(F.col("a").alias("_s"), F.col("b").alias("_t")),
            F.col("b") == F.col("_s"),
        ).select("a", F.col("_t").alias("b")).filter(
            F.col("a") != F.col("b")
        ).distinct()
        prev_frontier = frontier
        frontier = step.join(reach, ["a", "b"], "left_anti").localCheckpoint()
        if prev_frontier is not e:
            release_df(prev_frontier)
        if frontier.isEmpty():
            # early exit (ADVICE r5): an empty frontier means every
            # remaining wave is a no-op; skipping them skips their
            # eager checkpoint jobs on sparse/acyclic graphs (the
            # max_hops=7 paths) without changing the closure.
            break
        prev = reach
        reach = reach.unionByName(frontier).localCheckpoint()
        if prev is not e:
            release_df(prev)
    if frontier is not e:
        release_df(frontier)
    if reach is not e:
        release_df(e)
    return reach


def _mutual_cc(closure: DataFrame) -> DataFrame:
    """Closure ∩ transpose → connected components over mutual pairs."""
    t = closure.select(F.col("b").alias("_ta"), F.col("a").alias("_tb"))
    mutual = closure.join(
        t, (F.col("a") == F.col("_ta")) & (F.col("b") == F.col("_tb"))
    ).select("a", "b")
    return connected_components(mutual, src="a", dst="b")


def bowtie_regions(
    edges: DataFrame,
    nodes: DataFrame,
    max_hops: int = 3,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Hop-bounded bow-tie decomposition of a directed graph (Broder
    et al., "Graph structure in the Web", WWW 2000): pick the LARGEST
    mutual-reach cluster as the core, then place every node by its
    bounded reachability to/from the core —

      core   — member of the largest cluster (ties → smaller root id);
      bridge — reaches the core AND is reached by it within max_hops,
               without being mutually reachable with it (the paper's
               tubes, collapsed to one bounded class);
      in     — reaches the core only;
      out    — reached from the core only;
      other  — neither (tendrils + disconnected components).

    A graph with no short cycle has no core: every node is 'other'.
    Returns (id_col, region) for EVERY node in `nodes`.

    Scale shape: one bounded closure (see bounded_closure), reused for
    the cluster step and both reach classifications; core membership
    tests are left_semi joins on the node id; the only driver-side
    value is the single (root, size) row that names the core. Nothing
    node-proportional collects or broadcasts unconditionally."""
    closure = bounded_closure(edges, max_hops=max_hops, src=src, dst=dst)
    try:
        clusters = _mutual_cc(closure)
        top = (
            clusters.groupBy("root")
            .agg(F.count(F.lit(1)).alias("_n"))
            .orderBy(F.desc("_n"), F.asc("root"))
            .first()
        )
        ids = nodes.select(F.col(id_col))
        if top is None:
            release_df(clusters)
            return ids.withColumn("region", F.lit("other"))
        core = (
            clusters.filter(F.col("root") == top["root"])
            .select(F.col("id").alias("_cid"))
            .localCheckpoint()
        )
        release_df(clusters)
        inr = (
            closure.join(core, closure["b"] == core["_cid"], "left_semi")
            .select(F.col("a").alias(id_col))
            .distinct()
            .withColumn("_in", F.lit(True))
        )
        outr = (
            closure.join(core, closure["a"] == core["_cid"], "left_semi")
            .select(F.col("b").alias(id_col))
            .distinct()
            .withColumn("_out", F.lit(True))
        )
        out = (
            ids.join(
                core.select(
                    F.col("_cid").alias(id_col),
                    F.lit(True).alias("_core"),
                ),
                id_col,
                "left",
            )
            .join(inr, id_col, "left")
            .join(outr, id_col, "left")
            .select(
                id_col,
                F.when(F.col("_core"), F.lit("core"))
                .when(F.col("_in") & F.col("_out"), F.lit("bridge"))
                .when(F.col("_in"), F.lit("in"))
                .when(F.col("_out"), F.lit("out"))
                .otherwise(F.lit("other"))
                .alias("region"),
            )
        )
        # the classification joins are the last consumers of closure /
        # core: cut the result eagerly so the finally-release is safe
        out = out.localCheckpoint()
        release_df(core)
        return out
    finally:
        release_df(closure)


def component_size_histogram(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """(size, n_components): how many weakly-connected components of
    each size the graph holds — the one-table summary of web
    fragmentation that pairs with bowtie_regions (a healthy crawl
    domain shows one giant component plus a long singleton/small
    tail; many mid-size components mean the seed list under-covers).
    Passing `nodes` includes isolated nodes as size-1 components
    (connected_components itself never sees them).

    Scale shape: the CC rounds are the O(log diameter) pointer-
    doubling joins; the rollup is two map-side-combinable counts
    (root -> size, size -> n).  The histogram is bounded by the number
    of DISTINCT sizes — driver never sees node-proportional data."""
    cc = connected_components(edges, src=src, dst=dst)
    try:
        labels = cc
        if nodes is not None:
            labels = (
                nodes.select(F.col(id_col).alias("id"))
                .join(cc, "id", "left")
                .select(
                    "id", F.coalesce(F.col("root"), F.col("id")).alias("root")
                )
            )
        out = (
            labels.groupBy("root")
            .agg(F.count(F.lit(1)).cast("long").alias("size"))
            .groupBy("size")
            .agg(F.count(F.lit(1)).cast("long").alias("n_components"))
        )
        # cut the (distinct-size-bounded) result eagerly so the CC
        # label checkpoint can be released before we return
        return out.localCheckpoint()
    finally:
        release_df(cc)


def badrank(
    edges: DataFrame,
    nodes: DataFrame,
    bad_nodes: DataFrame,
    out_degree: int,
    iters: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    materialize: bool = True,
) -> DataFrame:
    """BadRank — anti-trust propagated BACKWARDS along links (the
    inverse-PageRank demotion idea popularized as BadRank; same family
    as Anti-TrustRank, Krishnan & Raj, AIRWeb 2006): a page that LINKS
    INTO a flagged neighborhood inherits badness, because linking TO
    spam is under the page author's control while being linked FROM
    spam is not — the asymmetry spam_mass (forward trust) cannot see.
    The two sit on opposite sides of the same blocklist: spam_mass
    finds rank LAUNDERED OUT of bad regions, badrank finds the pages
    FEEDING them.

    Implementation: one integer-exact pagerank_scaled run on the
    TRANSPOSED edge set with teleport restricted to ``bad_nodes`` —
    (id, r) where r is the badness mass in the N·(100·D)^iters scale,
    0 for pages with no path into the flagged set.  Requires uniform
    IN-degree `out_degree` on the original graph (= out-degree of the
    transpose); the derived webgraph's per-(m,a) bijections satisfy
    this exactly.

    Scale shape: identical to pagerank_scaled — the transpose is a
    column swap (no shuffle by itself), then only the one-long-per-
    node rank table shuffles per iteration."""
    t = edges.select(F.col(dst).alias("_ts"), F.col(src).alias("_td"))
    return pagerank_scaled(
        t,
        nodes,
        out_degree=out_degree,
        iters=iters,
        damping_pct=damping_pct,
        src="_ts",
        dst="_td",
        id_col=id_col,
        materialize=materialize,
        teleport_nodes=bad_nodes,
    )


def clustering_coefficients(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient in floor basis points —
    how much of a page's neighborhood is itself interlinked:
    clust_bp = 10^4 · triangles / (deg·(deg−1)/2).  Link farms and
    nepotistic cliques sit near 10^4 while organic hub pages sit near
    0, which makes this the per-NODE refinement of the triangle/kcore
    density signals (Watts & Strogatz 1998 define the coefficient;
    its spam use follows Becchetti et al., KDD 2008 "Link analysis
    for Web spam detection").

    Returns (node, deg, n_tri, clust_bp) for every node with >= 1
    distinct undirected edge; deg-1 nodes report NULL (no possible
    wedge).  Pure-integer ratio, engine-exact.

    Scale shape: the triangle side is the degree-oriented
    triangle_counts plan (hub-safe, no quadratic wedge at hubs); the
    degree side is one map-side-combinable count on the deduped
    undirected edge list; the merge is an id equi-join of node-sized
    tables.  The deg agg runs once here and once inside
    triangle_counts — two scans of the (fixed-width) edge list, kept
    in exchange for leaving triangle_counts' interface untouched."""
    s, d = F.col(src_col), F.col(dst_col)
    half = (
        edges.filter(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )
    und = half.unionByName(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    tri = triangle_counts(edges, src_col=src_col, dst_col=dst_col)
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
        )
        .withColumn(
            "clust_bp",
            F.when(
                F.col("deg") >= 2,
                F.expr("(10000 * 2 * n_tri) div (deg * (deg - 1))"),
            ).cast("long"),
        )
    )


def degree_distribution(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(direction, degree, n_nodes): the in-/out-degree histogram of a
    directed graph — the first number anyone asks of a webgraph (the
    power-law exponent eyeballs straight off it) and the companion to
    key_skew_audit when the skewed key IS a graph endpoint.  Self
    loops ignored; nodes count under a direction only if they have at
    least one edge that way (join a node table for the zero class).

    Scale shape: two map-side-combinable counts (per src, per dst),
    then a count over the per-node table; output is bounded by the
    number of DISTINCT degrees.  A 10^7-in-degree hub is one row."""
    e = edges.filter(F.col(src) != F.col(dst))
    outd = e.groupBy(F.col(src).alias("_n")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    ).select(F.lit("out").alias("direction"), "degree")
    ind = e.groupBy(F.col(dst).alias("_n")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    ).select(F.lit("in").alias("direction"), "degree")
    return (
        outd.unionByName(ind)
        .groupBy("direction", "degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )


def host_cocitation(
    edges: DataFrame,
    src: str = "src",
    dst_host: str = "dst_host",
    min_pages: int = 2,
) -> DataFrame:
    """Host co-citation pairs: how many PAGES link to both host A and
    host B — the link-network view (co-cited hosts are topically or
    commercially coupled; a clique of mutually co-cited low-quality
    hosts is a link farm's fingerprint, the host-level companion to
    clustering_coefficients' per-page view).  Input is an edge table
    already carrying the TARGET host per link.

    Returns (host_a, host_b, n_pages), host_a < host_b, pairs
    co-cited by >= min_pages pages.

    Scale shape: the pair explosion is a self-equi-join on the source
    page, bounded by out_degree^2 per page (out-degree is politeness-
    capped in any real crawl, and the distinct-hosts-per-page list is
    shorter still); the only exchange after it is the map-side-
    combinable (host_a, host_b) count.  No node-proportional state."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst_host).alias("_h")).distinct()
    a = e.select("_s", F.col("_h").alias("host_a"))
    b = e.select(F.col("_s").alias("_s2"), F.col("_h").alias("host_b"))
    return (
        a.join(b, (F.col("_s") == F.col("_s2")) & (F.col("host_a") < F.col("host_b")))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
        .filter(F.col("n_pages") >= min_pages)
    )
