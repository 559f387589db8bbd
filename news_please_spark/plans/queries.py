"""Oracle-checkable query registry for __spark_entry__.py.

Every entry pairs a Spark DataFrame implementation with an ANSI-SQL
oracle string that DuckDB runs over the same parquet tables. The driver
compares row counts + schemas + order-insensitive value hashes, so:

  * every computed column is aliased identically on both sides,
  * float results are quantized PER ROW (floor(x*10^k) as BIGINT)
    *before* any aggregation — summing doubles in different orders
    across engines would otherwise flip low bits and break the hash,
  * rankings order by the quantized value with an id tie-break.

Queries cover the SURVEY.md §2 operator families that are expressible
over the driver's testdata tables, plus the training-data-pipeline ops
(dedup, similarity search, text quality, fingerprinting). The crawl
semantics are exercised by a derived deterministic webgraph built from
`documents` with pure arithmetic, so the SAME graph exists in both
engines (frontier BFS = recursive CTE on the DuckDB side).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def spread(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Ensure a compute-bound per-row stage can use every core.

    Parallelism of a scan-riding map stage equals the number of input
    splits; the small-SF test tables are single parquet files with ONE
    row group, which no split-size knob can subdivide, so per-row-heavy
    queries (interpreted HOF folds, mapInPandas) would serialize on one
    core. When the scan already yields at least defaultParallelism
    splits — the 100-TB case, where a repartition here would be a full
    shuffle of the corpus — this is a no-op; otherwise it redistributes
    exactly the columns the downstream transform consumes."""
    goal = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < goal:
        return df.repartition(goal)
    return df


def q4(col):  # quantize: exact integer image of a double, portable
    return F.floor(col * 10000).cast("long")


# ---------------------------------------------------------------------------
# 1. frontier BFS over the derived webgraph (SURVEY §2.1 S9 + §2.7 O1)
#    edges: for (m, a) in EDGE_PARAMS, doc d links to (d*m + a) % N
EDGE_PARAMS = [(3, 17), (5, 34), (7, 51)]
_EDGES_SQL = " UNION ALL ".join(
    f"SELECT doc_id AS src, (doc_id*{m} + {a}) % (SELECT max(doc_id)+1 FROM documents) AS dst FROM documents"
    for m, a in EDGE_PARAMS
)


def derived_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    return docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(*[(F.col("doc_id") * m + a) % n for m, a in EDGE_PARAMS])
        ).alias("dst"),
    )


@register(
    "frontier_bfs3",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    bfs(id, depth) AS (
      SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
      UNION ALL
      SELECT e.dst, b.depth + 1 FROM bfs b JOIN edges e ON e.src = b.id
      WHERE b.depth < 3
    )
    SELECT id AS node_id, CAST(min(depth) AS INT) AS depth
    FROM bfs GROUP BY id
    """,
)
def frontier_bfs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BFS (3 waves) with URL-seen anti-join — the core crawl
    loop (reference parse_crawler.py:90-120) on the derived graph."""
    edges = derived_edges(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    seeds = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("node_id"), F.lit(0).alias("depth")
    )
    reached = seeds
    frontier = seeds
    for d in range(1, 4):
        nxt = (
            frontier.join(edges, frontier.node_id == edges.src)
            .select(F.col("dst").alias("node_id"))
            .distinct()
            .join(reached, "node_id", "left_anti")
            .withColumn("depth", F.lit(d))
        )
        reached = reached.unionByName(nxt)
        frontier = nxt
    return reached.select("node_id", F.col("depth").cast("int").alias("depth"))


# ---------------------------------------------------------------------------
# 1a-bis. fixed-iteration PageRank over the derived webgraph — the
# link-authority score a production frontier uses to prioritize fetches
# (OPIC/PageRank role; the reference's BFS order is authority-blind).
# Integer-exact: ranks rescaled by N*(100*D)**k per step so the whole
# computation is BIGINT arithmetic — bit-identical across engines (see
# operators/graph.pagerank_scaled). D=3 because every derived-graph node
# emits exactly len(EDGE_PARAMS)=3 edges.
def _pagerank_ctes(iters: int = 3, deg: int = 3, damping_pct: int = 85) -> str:
    parts = ["r0 AS (SELECT doc_id AS id, CAST(1 AS BIGINT) AS r FROM documents)"]
    for k in range(iters):
        teleport = (100 - damping_pct) * deg * (100 * deg) ** k
        parts.append(
            f"c{k + 1} AS (SELECT e.dst AS id, SUM(r{k}.r) AS c FROM edges e"
            f" JOIN r{k} ON r{k}.id = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{k + 1} AS (SELECT d.doc_id AS id,"
            f" CAST({teleport} + {damping_pct} * COALESCE(c{k + 1}.c, 0) AS BIGINT) AS r"
            f" FROM documents d LEFT JOIN c{k + 1} ON c{k + 1}.id = d.doc_id)"
        )
    return ", ".join(parts)


def _pagerank_sql(iters: int = 3, deg: int = 3, damping_pct: int = 85) -> str:
    return (
        f"WITH edges AS ({_EDGES_SQL}), "
        + _pagerank_ctes(iters, deg, damping_pct)
        + f" SELECT id AS doc_id, r AS rank_s{iters} FROM r{iters}"
    )


@register("pagerank3", _pagerank_sql())
def pagerank3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration integer-exact PageRank on the derived webgraph
    (damping 0.85, rank scaled by N*300**3). Frontier prioritization
    by link authority — see operators/graph.pagerank_scaled for the
    scale analysis (edges partitioned once on src, only the 1-long-per-
    node rank table shuffles per iteration, map-side-combinable sums)."""
    from news_please_spark.operators.graph import pagerank_scaled

    edges = derived_edges(spark, sf_dir)
    nodes = load(spark, sf_dir, "documents").select("doc_id")
    # materialize=False: 3 iterations compose into one lazy linear plan,
    # so the bench-timed action pays the whole computation (the
    # checkpointed default would run it eagerly at plan-build time)
    ranks = pagerank_scaled(
        edges,
        nodes,
        out_degree=len(EDGE_PARAMS),
        iters=3,
        id_col="doc_id",
        materialize=False,
    )
    return ranks.select(
        F.col("id").alias("doc_id"), F.col("r").alias("rank_s3")
    )


def _spam_mass_sql(iters: int = 3, deg: int = 3, damping_pct: int = 85) -> str:
    parts = [
        "g0 AS (SELECT doc_id AS id, CAST(CASE WHEN doc_id % 13 <> 0 THEN 1"
        " ELSE 0 END AS BIGINT) AS r FROM documents)"
    ]
    for k in range(iters):
        teleport = (100 - damping_pct) * deg * (100 * deg) ** k
        parts.append(
            f"gc{k + 1} AS (SELECT e.dst AS id, SUM(g{k}.r) AS c FROM edges e"
            f" JOIN g{k} ON g{k}.id = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"g{k + 1} AS (SELECT d.doc_id AS id,"
            f" CAST(CASE WHEN d.doc_id % 13 <> 0 THEN {teleport} ELSE 0 END"
            f" + {damping_pct} * COALESCE(gc{k + 1}.c, 0) AS BIGINT) AS r"
            f" FROM documents d LEFT JOIN gc{k + 1} ON gc{k + 1}.id = d.doc_id)"
        )
    return (
        f"WITH edges AS ({_EDGES_SQL}), "
        + _pagerank_ctes(iters, deg, damping_pct)
        + ", "
        + ", ".join(parts)
        + f" SELECT r{iters}.id AS doc_id, r{iters}.r AS rank_all,"
        f" g{iters}.r AS rank_good,"
        f" CAST(r{iters}.r - g{iters}.r AS BIGINT) AS spam_abs,"
        f" CAST(CASE WHEN r{iters}.r > 0 THEN"
        f" (r{iters}.r - g{iters}.r) * 10000 // r{iters}.r"
        f" ELSE 0 END AS BIGINT) AS spam_bp"
        f" FROM r{iters} JOIN g{iters} ON g{iters}.id = r{iters}.id"
    )


@register("spam_mass", _spam_mass_sql())
def spam_mass_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spam mass (Gyöngyi et al. VLDB 2006) on the derived webgraph
    with doc_id % 13 == 0 as the flagged set: uniform-teleport rank vs
    good-seeded (TrustRank) rank in the same integer scale, absolute
    and basis-point relative mass per node
    (operators/graph.py:spam_mass).  Two fixed-iteration integer-exact
    rank runs; only 1-long-per-node rank tables shuffle."""
    from news_please_spark.operators.graph import spam_mass

    docs = load(spark, sf_dir, "documents").select("doc_id")
    bad = docs.filter(F.col("doc_id") % 13 == 0)
    out = spam_mass(
        derived_edges(spark, sf_dir),
        docs,
        bad,
        out_degree=len(EDGE_PARAMS),
        iters=3,
        id_col="doc_id",
        materialize=False,
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "rank_all",
        "rank_good",
        "spam_abs",
        "spam_bp",
    )


@register(
    "hits_scores",
    f"""
    WITH edges AS ({_EDGES_SQL}),
    nodes AS (SELECT doc_id AS id FROM documents),
    a1 AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS a FROM edges GROUP BY dst),
    h1 AS (
      SELECT e.src AS id, CAST(sum(coalesce(a1.a, 0)) AS BIGINT) AS h
      FROM edges e LEFT JOIN a1 ON a1.id = e.dst GROUP BY e.src
    ),
    a2 AS (
      SELECT e.dst AS id, CAST(sum(coalesce(h1.h, 0)) AS BIGINT) AS a
      FROM edges e LEFT JOIN h1 ON h1.id = e.src GROUP BY e.dst
    ),
    h2 AS (
      SELECT e.src AS id, CAST(sum(coalesce(a2.a, 0)) AS BIGINT) AS h
      FROM edges e LEFT JOIN a2 ON a2.id = e.dst GROUP BY e.src
    )
    SELECT n.id AS doc_id, CAST(coalesce(a2.a, 0) AS BIGINT) AS authority,
           CAST(coalesce(h2.h, 0) AS BIGINT) AS hub
    FROM nodes n LEFT JOIN a2 ON a2.id = n.id LEFT JOIN h2 ON h2.id = n.id
    """,
)
def hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-iteration integer-exact HITS hub/authority scores on the
    derived webgraph (operators/graph.py::hits_scaled — unnormalized
    BIGINT form, ranking identical to normalized HITS). Index pages
    rank as hubs, linked articles as authorities — the crawl-scheduling
    complement to pagerank3."""
    from news_please_spark.operators.graph import hits_scaled

    edges = derived_edges(spark, sf_dir)
    nodes = load(spark, sf_dir, "documents").select("doc_id")
    return hits_scaled(edges, nodes, iters=2, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "authority", "hub"
    )


@register(
    "authority_order",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    bfs(id, depth) AS (
      SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
      UNION ALL
      SELECT e.dst, b.depth + 1 FROM bfs b JOIN edges e ON e.src = b.id
      WHERE b.depth < 3
    ),
    reach AS (SELECT id, CAST(min(depth) AS INT) AS depth FROM bfs GROUP BY id),
    {_pagerank_ctes()}
    SELECT reach.id AS node_id, reach.depth, r3.r AS rank_s3,
           CAST(row_number() OVER (ORDER BY reach.depth, r3.r DESC, reach.id) - 1 AS BIGINT) AS seq
    FROM reach JOIN r3 ON r3.id = reach.id
    """,
)
def authority_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authority-prioritized crawl order: the BFS frontier's reached
    set re-ranked by (depth, PageRank DESC) — the priority-queue
    admission order a production scheduler runs instead of raw
    discovery order. Composition of frontier_bfs3 + pagerank3 through
    the two-phase global-seq pattern (no single-task window)."""
    from news_please_spark.operators.ordering import with_global_seq

    reached = QUERIES["frontier_bfs3"](spark, sf_dir)
    ranks = QUERIES["pagerank3"](spark, sf_dir)
    j = reached.join(
        ranks, reached["node_id"] == ranks["doc_id"]
    ).select("node_id", "depth", "rank_s3", (-F.col("rank_s3")).alias("_nr"))
    ordered, _ = with_global_seq(j, order_cols=["depth", "_nr", "node_id"])
    return ordered.select("node_id", "depth", "rank_s3", "seq")


# ---------------------------------------------------------------------------
# 1b. the FULL iterative politeness crawl engine vs a DuckDB recursive-CTE
#     simulation of the same budgeted waves. The synthetic world is pure
#     arithmetic on page ids (world.py), so the whole crawl — per-host
#     budget marking, global (depth, disc_key, url) fetch order, link
#     expansion with filters F2/F3/F4/F11, enqueue-time URL-seen dedup,
#     min-disc_key child merge — is SQL-expressible. The recursion
#     carries tagged state rows per wave ('f' frontier, 's' seen,
#     'c' seq counter) and emits 'o' order rows + 'm' per-wave metrics;
#     per-host rank and global seq are window functions, which DuckDB
#     permits in the recursive term.
def _mix_sql(a: str, b: str) -> str:
    """world._mix as SQL: the LCG every world quantity derives from."""
    return (
        f"(((({a})*1103515245 + ({b})*12345 + 31337) % 2147483648)"
        f" * 69069 + 1) % 2147483648"
    )


_CRAWL_BUDGET, _CRAWL_DEPTH = 16, 3
_CRAWL_POLITENESS_ORACLE = f"""
WITH RECURSIVE
par AS (
  SELECT greatest(300, 2 * (SELECT count(*) FROM documents))::BIGINT AS n
),
par2 AS (
  SELECT n, greatest(4, n // 50)::BIGINT AS nh,
         greatest(1, n // 8)::BIGINT AS stride FROM par
),
seedp AS (
  SELECT unnest(range(0, (SELECT n FROM par2), (SELECT stride FROM par2))) AS p
),
seedu AS (
  SELECT p,
         CASE WHEN ({_mix_sql('p', '1')}) % 10 < 4 THEN 0
              ELSE ({_mix_sql('p', '2')}) % (SELECT nh FROM par2) END AS h
  FROM seedp
  WHERE ({_mix_sql('p', '3')}) % 100 >= 18
),
seeds AS (
  SELECT p,
         'https://h' || h || '.example.com/p/' || p AS url,
         'h' || h || '.example.com' AS host
  FROM seedu
),
st(wave, typ, p, url, host, depth, key, seq) AS (
  SELECT 0::INT, 'f', p, url, host, 0::INT,
         (row_number() OVER (ORDER BY url)) - 1::BIGINT, NULL::BIGINT
  FROM seeds
  UNION ALL SELECT 0::INT, 's', p, NULL, NULL, NULL::INT, NULL::BIGINT, NULL::BIGINT FROM seeds
  UNION ALL SELECT 0::INT, 'c', NULL::BIGINT, NULL, NULL, NULL::INT, NULL::BIGINT, 0::BIGINT
  UNION ALL
  (
    WITH w AS (SELECT * FROM st),
    fr AS (SELECT p, url, host, depth, key FROM w WHERE typ = 'f'),
    sn AS (SELECT p FROM w WHERE typ = 's'),
    cn AS (SELECT wave, seq AS sb FROM w WHERE typ = 'c'),
    rk AS (
      SELECT *, row_number() OVER (PARTITION BY host ORDER BY key, url) AS r
      FROM fr
    ),
    ftch AS (
      SELECT p, url, host, depth, key,
             (SELECT sb FROM cn)
               + row_number() OVER (ORDER BY depth, key, url) - 1 AS seq
      FROM rk WHERE r <= {_CRAWL_BUDGET}
    ),
    defer AS (SELECT p, url, host, depth, key FROM rk WHERE r > {_CRAWL_BUDGET}),
    kid0 AS (
      SELECT f.depth + 1 AS depth,
             (f.seq + 1) * 4194304 + e.k AS key,
             CASE WHEN (2 + ({_mix_sql('f.p', '5')}) % 6) >= 4
                       AND e.k = (2 + ({_mix_sql('f.p', '5')}) % 6) - 1
                  THEN ({_mix_sql('f.p', '10')}) % (SELECT n FROM par2)
                  ELSE ({_mix_sql('f.p', '10 + e.k')}) % (SELECT n FROM par2) END AS q
      FROM ftch f
      CROSS JOIN LATERAL (
        SELECT unnest(range(0, 2 + ({_mix_sql('f.p', '5')}) % 6)) AS k
      ) e
      WHERE f.depth < {_CRAWL_DEPTH}
    ),
    kid1 AS (
      SELECT depth, key, q,
             ({_mix_sql('q', '3')}) % 100 AS t,
             CASE WHEN ({_mix_sql('q', '1')}) % 10 < 4 THEN 0
                  ELSE ({_mix_sql('q', '2')}) % (SELECT nh FROM par2) END AS h
      FROM kid0
    ),
    kidok AS (
      SELECT depth, key, q, h, t FROM kid1
      WHERE (t >= 18 OR (t >= 14 AND t < 18 AND h % 3 <> 0))
        AND q NOT IN (SELECT p FROM sn)
    ),
    kids AS (
      SELECT q AS p, min(key) AS key, arg_min(depth, key) AS depth,
             arg_min(h, key) AS h, arg_min(t, key) AS t
      FROM kidok GROUP BY q
    ),
    kidu AS (
      SELECT p, key, depth::INT AS depth,
             CASE WHEN t < 18
                  THEN 'https://h' || h || '.example.com/private/' || p
                  ELSE 'https://h' || h || '.example.com/p/' || p END AS url,
             'h' || h || '.example.com' AS host
      FROM kids
    )
    SELECT (SELECT wave FROM cn) + 1, 'f', p, url, host, depth, key, NULL::BIGINT
    FROM defer WHERE EXISTS (SELECT 1 FROM ftch)
    UNION ALL
    SELECT (SELECT wave FROM cn) + 1, 'f', p, url, host, depth, key, NULL::BIGINT FROM kidu
    UNION ALL
    SELECT (SELECT wave FROM cn) + 1, 's', p, NULL, NULL, NULL::INT, NULL::BIGINT, NULL::BIGINT
    FROM sn WHERE EXISTS (SELECT 1 FROM ftch)
    UNION ALL
    SELECT (SELECT wave FROM cn) + 1, 's', p, NULL, NULL, NULL::INT, NULL::BIGINT, NULL::BIGINT FROM kidu
    UNION ALL
    SELECT (SELECT wave FROM cn) + 1, 'c', NULL::BIGINT, NULL, NULL, NULL::INT, NULL::BIGINT,
           (SELECT sb FROM cn) + (SELECT count(*) FROM ftch)
    WHERE EXISTS (SELECT 1 FROM ftch) AND (SELECT wave FROM cn) < 10000
    UNION ALL
    SELECT (SELECT wave FROM cn), 'o', p, url, host, depth, key, seq FROM ftch
    UNION ALL
    SELECT (SELECT wave FROM cn), 'm', (SELECT count(*) FROM ftch), NULL, NULL,
           NULL::INT, (SELECT count(*) FROM kidu), NULL::BIGINT
    WHERE EXISTS (SELECT 1 FROM ftch)
  )
)
SELECT o.url AS url, o.host AS host, o.depth::INT AS depth, o.seq AS seq,
       o.wave::INT AS wave, m.p AS fetched, m.key AS new_urls
FROM st o JOIN st m ON m.typ = 'm' AND m.wave = o.wave
WHERE o.typ = 'o'
"""


@register("crawl_politeness", _CRAWL_POLITENESS_ORACLE)
def crawl_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full frontier engine (politeness budgets, robots gate, URL-seen,
    deterministic global order) on the synthetic world sized from the
    documents table, joined with the per-wave metrics contract
    (fetched, new_urls) — the whole iterative stateful crawl, now
    hash-exact against the DuckDB recursive-CTE simulation above (and
    bit-exact against the pure-Python oracle in tests/test_frontier.py)."""
    from news_please_spark.operators.frontier import FrontierConfig, FrontierEngine
    from news_please_spark.world import World

    n_docs = load(spark, sf_dir, "documents").count()
    world = World(n_pages=max(300, 2 * n_docs))
    engine = FrontierEngine(
        spark,
        world.webgraph_df(spark),
        robots=world.robots_df(spark),
        cfg=FrontierConfig(
            budget_per_host=_CRAWL_BUDGET, max_depth=_CRAWL_DEPTH
        ),
    )
    res = engine.run(world.seed_urls())
    metrics = res.metrics_df(spark).select("wave", "fetched", "new_urls")
    return res.order.join(F.broadcast(metrics), "wave").select(
        "url", "host", "depth", "seq", "wave", "fetched", "new_urls"
    )


# ---------------------------------------------------------------------------
# 2. URL canonicalization + ignore filters (F2/F3, url_extractor.py:39-51)
_URL_SQL = (
    "'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END || "
    "'h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p/' || "
    "CAST(doc_id AS VARCHAR) || CASE WHEN doc_id % 5 = 0 THEN '.pdf' ELSE '' END"
)


def _derived_url_col():
    return F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("h"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(".pdf")).otherwise(F.lit("")),
    )


@register(
    "url_canonicalize",
    f"""
    WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
           regexp_replace(lower(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)), '^www\\.', '') AS canon_host,
           regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_matches(url, '(?i)\\.(pdf|docx?|xlsx?)$') AS is_ignored
    FROM u
    """,
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_please_spark.functions.urls import canonical_host, url_host, url_path

    u = load(spark, sf_dir, "documents").select(
        "doc_id", _derived_url_col().alias("url")
    )
    return u.select(
        "doc_id",
        "url",
        url_host(F.col("url")).alias("host"),
        canonical_host(F.col("url")).alias("canon_host"),
        url_path(F.col("url")).alias("path"),
        F.col("url").rlike(r"(?i)\.(pdf|docx?|xlsx?)$").alias("is_ignored"),
    )


# crawl-trap detection over a lineitem-derived URL population: two
# generator classes (calendar paths, session-id queries) that must
# flag, two numeric catalog classes and a static section that must not.
_TRAP_URL_SQL = """
    'https://h' || CAST(l_orderkey % 11 AS VARCHAR) || '.shop.test' ||
    CASE (l_orderkey + l_linenumber) % 8
      WHEN 0 THEN '/cal/' || CAST(l_partkey % 12 AS VARCHAR) || '/' || CAST(l_suppkey % 28 AS VARCHAR)
      WHEN 1 THEN '/cal/' || CAST(l_suppkey % 12 AS VARCHAR) || '/' || CAST(l_partkey % 28 AS VARCHAR)
      WHEN 2 THEN '/view?sid=s' || CAST(l_orderkey AS VARCHAR) || CAST(l_linenumber AS VARCHAR) || '&page=' || CAST(l_partkey % 9 AS VARCHAR)
      WHEN 3 THEN '/view?page=' || CAST(l_partkey % 9 AS VARCHAR) || '&sid=t' || CAST(l_orderkey AS VARCHAR)
      WHEN 4 THEN '/item/' || CAST(l_partkey AS VARCHAR)
      WHEN 5 THEN '/sku/' || CAST(l_suppkey AS VARCHAR)
      WHEN 6 THEN '/about/' || CASE l_partkey % 3 WHEN 0 THEN 'team' WHEN 1 THEN 'press' ELSE 'contact' END
      ELSE '/docs/' || CASE l_suppkey % 2 WHEN 0 THEN 'faq' ELSE 'help' END
    END
"""


def _trap_url_col():
    ok, ln, pk, sk = (
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_partkey"),
        F.col("l_suppkey"),
    )
    cls = (ok + ln) % 8
    s = lambda c: c.cast("string")  # noqa: E731
    path = (
        F.when(cls == 0, F.concat(F.lit("/cal/"), s(pk % 12), F.lit("/"), s(sk % 28)))
        .when(cls == 1, F.concat(F.lit("/cal/"), s(sk % 12), F.lit("/"), s(pk % 28)))
        .when(cls == 2, F.concat(F.lit("/view?sid=s"), s(ok), s(ln), F.lit("&page="), s(pk % 9)))
        .when(cls == 3, F.concat(F.lit("/view?page="), s(pk % 9), F.lit("&sid=t"), s(ok)))
        .when(cls == 4, F.concat(F.lit("/item/"), s(pk)))
        .when(cls == 5, F.concat(F.lit("/sku/"), s(sk)))
        .when(
            cls == 6,
            F.concat(
                F.lit("/about/"),
                F.when(pk % 3 == 0, F.lit("team"))
                .when(pk % 3 == 1, F.lit("press"))
                .otherwise(F.lit("contact")),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("/docs/"),
                F.when(sk % 2 == 0, F.lit("faq")).otherwise(F.lit("help")),
            )
        )
    )
    return F.concat(F.lit("https://h"), s(ok % 11), F.lit(".shop.test"), path)


@register(
    "crawl_traps",
    f"""
    WITH u AS (SELECT {_TRAP_URL_SQL} AS url FROM lineitem),
    p AS (
      SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
             regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)', 1) AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS q
      FROM u
    ),
    t AS (
      SELECT host,
             host || regexp_replace(path, '[0-9]+', 'N', 'g') ||
             CASE WHEN q = '' THEN ''
                  ELSE '?' || array_to_string(
                    list_sort(list_transform(string_split(q, '&'),
                                             kv -> string_split(kv, '=')[1])), '&')
             END AS template
      FROM p
    ),
    cells AS (
      SELECT host, template, CAST(count(*) AS BIGINT) AS n_urls
      FROM t GROUP BY host, template
    ),
    h AS (
      SELECT *, CAST(sum(n_urls) OVER (PARTITION BY host) AS BIGINT) AS host_urls
      FROM cells
    )
    SELECT host, template, n_urls, host_urls,
           CAST((10000 * n_urls) // host_urls AS BIGINT) AS share_q,
           CAST(CASE WHEN n_urls >= 20 AND (10000 * n_urls) // host_urls >= 2000
                     THEN 1 ELSE 0 END AS BIGINT) AS is_trap
    FROM h
    """,
)
def crawl_traps_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap detection (operators/traps.py::template_fanout) over
    a lineitem-derived URL population: calendar-path and session-query
    generators flag; moderate numeric catalogs and static sections do
    not. Two exchanges total, both over the (host, template) CELL
    table, never per-URL rows."""
    from news_please_spark.operators.traps import template_fanout

    urls = load(spark, sf_dir, "lineitem").select(_trap_url_col().alias("url"))
    return template_fanout(urls)


# domain-blocklist suffix matching: hosts derived from documents cover
# exact-entry, parent-domain, 3-label-TLD and overlapping-entry cases
_BLOCKLIST = (
    "tracker0.net",
    "cdn.tracker0.net",     # overlaps tracker0.net: most-specific wins
    "ads.h1.example.com",
    "site2.org",
    "shop3.co.uk",
)

_BL_HOST_SQL = """
    CASE doc_id % 5
      WHEN 0 THEN 'ads.h' || CAST(doc_id % 3 AS VARCHAR) || '.example.com'
      WHEN 1 THEN 'cdn.tracker' || CAST(doc_id % 2 AS VARCHAR) || '.net'
      WHEN 2 THEN 'h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
      WHEN 3 THEN 'news.site' || CAST(doc_id % 4 AS VARCHAR) || '.org'
      ELSE 'm.shop' || CAST(doc_id % 6 AS VARCHAR) || '.co.uk'
    END
"""


def _blocklist_host_col():
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return (
        F.when(d % 5 == 0, F.concat(F.lit("ads.h"), s(d % 3), F.lit(".example.com")))
        .when(d % 5 == 1, F.concat(F.lit("cdn.tracker"), s(d % 2), F.lit(".net")))
        .when(d % 5 == 2, F.concat(F.lit("h"), s(d % 7), F.lit(".example.com")))
        .when(d % 5 == 3, F.concat(F.lit("news.site"), s(d % 4), F.lit(".org")))
        .otherwise(F.concat(F.lit("m.shop"), s(d % 6), F.lit(".co.uk")))
    )


@register(
    "blocklist_hosts",
    f"""
    WITH h0 AS (SELECT DISTINCT {_BL_HOST_SQL} AS host FROM documents),
    bl(domain) AS (VALUES {", ".join(f"('{d}')" for d in _BLOCKLIST)}),
    s AS (
      SELECT host,
             unnest(list_transform(
               range(0, len(string_split(host, '.')) - 1),
               i -> array_to_string(
                 list_slice(string_split(host, '.'), i + 1,
                            len(string_split(host, '.'))), '.')
             )) AS suf
      FROM h0
    )
    SELECT s.host, max_by(s.suf, length(s.suf)) AS matched_domain
    FROM s JOIN bl ON s.suf = bl.domain
    GROUP BY s.host
    """,
)
def blocklist_hosts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist matching with parent-suffix semantics
    (operators/blocklist.py::blocked_hosts) — exact entries, parent
    domains, 3-label TLDs, and overlapping entries (most-specific
    wins) all exercised. Per-HOST equi-joins on exploded suffixes;
    the blocklist rides as a literal-array plan (no Python rows)."""
    from news_please_spark.operators.blocklist import blocked_hosts

    hosts = load(spark, sf_dir, "documents").select(
        _blocklist_host_col().alias("host")
    )
    bl = spark.range(1).select(
        F.explode(F.array(*[F.lit(d) for d in _BLOCKLIST])).alias("domain")
    )
    return blocked_hosts(hosts, bl)


# ---------------------------------------------------------------------------
# 3. politeness top-k per host (O2, config.cfg:354)
@register(
    "politeness_topk",
    """
    WITH u AS (
      SELECT doc_id,
             'h' || CAST(doc_id % 7 AS VARCHAR) AS host,
             (doc_id * 13 + 5) % 1000 AS priority
      FROM documents
    )
    SELECT host, doc_id, priority, rk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY host ORDER BY priority, doc_id) AS INT) AS rk
      FROM u
    ) WHERE rk <= 4
    """,
)
def politeness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias("host"),
        ((F.col("doc_id") * 13 + 5) % 1000).alias("priority"),
    )
    w = Window.partitionBy("host").orderBy("priority", "doc_id")
    return (
        u.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 4)
        .select("host", "doc_id", "priority", "rk")
    )


@register(
    "host_shards",
    """
    WITH u AS (
      SELECT CASE WHEN doc_id % 5 = 0 THEN 'big' || CAST(doc_id % 3 AS VARCHAR)
             ELSE 'h' || CAST(doc_id % 211 AS VARCHAR) END AS host
      FROM documents
    ),
    hc AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls FROM u GROUP BY 1),
    rk AS (
      SELECT host, n_urls,
             CAST(row_number() OVER (ORDER BY n_urls DESC, host ASC) - 1
                  AS BIGINT) AS rk
      FROM hc
    )
    SELECT host, n_urls,
           CAST(CASE WHEN (rk // 8) % 2 = 0 THEN rk % 8
                ELSE 7 - rk % 8 END AS BIGINT) AS shard
    FROM rk
    """,
)
def host_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host→crawler-shard placement, serpentine by descending URL count
    (operators/ordering.py:host_shards) over a deliberately skewed
    derived host table (three head hosts holding ~7% of URLs each plus
    a 211-host tail).  Ranking runs through the two-phase global seq —
    no single task sorts all hosts; shard arithmetic is map-side
    integer DIV/MOD."""
    from news_please_spark.operators.ordering import host_shards

    u = load(spark, sf_dir, "documents").select(
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("big"), (F.col("doc_id") % 3).cast("string")),
        )
        .otherwise(F.concat(F.lit("h"), (F.col("doc_id") % 211).cast("string")))
        .alias("host")
    )
    hc = u.groupBy("host").agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    return host_shards(hc, 8)


@register(
    "budget_allocate",
    """
    WITH s AS (
      SELECT source AS host, CAST(sum(n_chars) AS BIGINT) AS sc
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(CASE WHEN sc > 0 THEN sc ELSE 0 END) AS BIGINT) AS t FROM s),
    q AS (
      SELECT host,
             CASE WHEN sc > 0 THEN sc ELSE 0 END AS scp,
             CAST(CASE WHEN t > 0 THEN (1000 * CASE WHEN sc > 0 THEN sc ELSE 0 END) // t ELSE 0 END AS BIGINT) AS base,
             CAST(CASE WHEN t > 0 THEN (1000 * CASE WHEN sc > 0 THEN sc ELSE 0 END) % t ELSE 0 END AS BIGINT) AS rem
      FROM s, tot
    ),
    lo AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS leftover FROM q),
    r AS (
      SELECT host, base,
             row_number() OVER (ORDER BY rem DESC, host) - 1 AS rk
      FROM q WHERE scp > 0
    )
    SELECT host,
           CAST(base + CASE WHEN rk < (SELECT leftover FROM lo) THEN 1 ELSE 0 END AS BIGINT) AS budget
    FROM r
    UNION ALL
    SELECT host, CAST(0 AS BIGINT) AS budget FROM q WHERE scp <= 0
    """,
)
def budget_allocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-proportional crawl-budget apportionment across hosts
    (operators/ordering.allocate_budget): B=1000 fetch slots split over
    sources by total corpus bytes, largest-remainder rounding, exact
    sum(budget)==B. The host ranking rides the two-phase global-seq
    pattern, never a single-task window."""
    from news_please_spark.operators.ordering import allocate_budget

    s = (
        load(spark, sf_dir, "documents")
        .groupBy(F.col("source").alias("host"))
        .agg(F.sum("n_chars").cast("long").alias("sc"))
    )
    return allocate_budget(s, total_budget=1000, key="host", score="sc")


# ---------------------------------------------------------------------------
# 4. exact dedup (D2 dropDuplicates semantics over content hash)
@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_dups,
           min(doc_id) AS first_doc
    FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_dups") > 1)
    )


# 4b. document fingerprint (normalized-content identity)
@register(
    "fingerprint",
    r"""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_please_spark.functions.text import fingerprint as fp

    return load(spark, sf_dir, "documents").select(
        "doc_id", fp(F.col("text")).alias("fp")
    )


# ---------------------------------------------------------------------------
# 5. MinHash signatures + LSH candidate pairs (near-dup detection)
_SHINGLES_SQL = r"""
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
"""


@register(
    "minhash_signatures",
    f"""
    WITH t AS ({_SHINGLES_SQL}),
    s AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
      FROM t WHERE len(toks) >= 3
    )
    SELECT doc_id, band,
           list_aggregate(list_transform(shingles, sh -> md5(CAST(band AS VARCHAR) || '|' || sh)), 'min') AS sig
    FROM s, (SELECT unnest([0, 1, 2, 3]) AS band)
    """,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-band MinHash over LOWERCASED 3-token shingles (one casing
    convention end-to-end with ngram_set/ngram_jaccard_pairs — the
    verify stage must score the same shingle space the candidate
    generator bucketed); hash = md5(band || shingle) so the signature
    is engine-portable. Scale path: the band/sig table is the LSH
    index — near-dup candidates are same-bucket joins."""
    t = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark).select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks")
    )
    s = t.filter(F.size("toks") >= 3).select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i),
                F.element_at(F.col("toks"), i + 1),
                F.element_at(F.col("toks"), i + 2),
            ),
        ).alias("shingles"),
    )
    banded = s.select(
        "doc_id",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band"),
        F.col("shingles"),
    )
    return banded.select(
        "doc_id",
        "band",
        F.array_min(
            F.transform(
                F.col("shingles"),
                lambda sh: F.md5(
                    F.concat(F.col("band").cast("string"), F.lit("|"), sh)
                ),
            )
        ).alias("sig"),
    )


@register(
    "minhash_lsh_pairs",
    f"""
    WITH t AS ({_SHINGLES_SQL}),
    s AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
      FROM t WHERE len(toks) >= 3
    ),
    sig AS (
      SELECT doc_id, band,
             list_aggregate(list_transform(shingles, sh -> md5(CAST(band AS VARCHAR) || '|' || sh)), 'min') AS sig
      FROM s, (SELECT unnest([0, 1, 2, 3]) AS band)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_signatures(spark, sf_dir)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# 6. text quality / token stats / language-id (training-data ops)
@register(
    "doc_quality",
    r"""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(floor(10000.0 * length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text)) AS BIGINT) AS alpha_q,
           CAST(floor(10000.0 * len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) / len(toks)) AS BIGINT) AS stop_q
    FROM t
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_please_spark.functions.text import quality_struct

    return load(spark, sf_dir, "documents").select(
        "doc_id", quality_struct(F.col("text")).alias("q")
    ).select("doc_id", "q.n_tokens", "q.n_uniq", "q.n_chars", "q.alpha_q", "q.stop_q")


@register(
    "token_totals",
    r"""
    SELECT source,
           CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
    """,
)
def token_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
            .cast("long")
            .alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@register(
    "lang_id",
    r"""
    WITH t AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) AS s_en,
             len(list_filter(toks, x -> x IN ('der', 'die', 'und'))) AS s_de,
             len(list_filter(toks, x -> x IN ('el', 'los', 'y'))) AS s_es
      FROM t
    )
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
                WHEN s_de >= s_es AND s_de > 0 THEN 'de'
                WHEN s_es > 0 THEN 'es'
                ELSE 'und' END AS pred_lang
    FROM s
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language id (E4 analogue,
    lang_detect_extractor.py:21-83 — the real cascade runs on HTML in
    the extraction chain; this is the table-level scoring primitive)."""
    from news_please_spark.functions.text import predict_lang

    return load(spark, sf_dir, "documents").select(
        "doc_id", "lang", predict_lang(F.col("text")).alias("pred_lang")
    )


@register(
    "bpe_token_totals",
    r"""
    SELECT source,
           CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS total_subtokens,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
    """,
)
def bpe_token_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word (BPE-ish regex) token counting per source — the corpus
    size proxy a training pipeline budgets with."""
    from news_please_spark.functions.text import bpe_ish_tokens

    return (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.size(bpe_ish_tokens(F.col("text")))).cast("long").alias("total_subtokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@register(
    "quality_classifier",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    w AS (
      SELECT doc_id,
             ((('0x' || substr(md5(tok), 1, 8))::BIGINT % 512)
              * 2654435761) % 2003 - 1001 AS wgt
      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(wgt) AS BIGINT) AS logit_sum,
           CAST(sum(wgt) >= 0 AS INT) AS keep
    FROM w GROUP BY doc_id
    """,
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-linear quality classifier inference
    (functions/text.hashed_linear_logit): per-doc logit = sum of
    deterministic integer weights over hashed token buckets, keep =
    logit >= 0.  Spark side is ONE zero-shuffle fold per row (no
    explode/groupBy/join — map-side over the corpus scan); the oracle
    recomputes it the expensive way (unnest + group by) to check the
    fold, not mirror it."""
    from news_please_spark.functions.text import hashed_linear_logit, tokens

    docs = load(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    # project the token array once; the next select references it twice
    # (count + fold), which keeps CollapseProject from re-inlining the
    # split and tokenizing each row twice
    toked = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("_toks")
    )
    out = toked.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        hashed_linear_logit(F.col("_toks")).alias("logit_sum"),
    )
    return out.withColumn(
        "keep", (F.col("logit_sum") >= 0).cast("int")
    )


@register(
    "heavy_hitters_cms",
    r"""
    WITH occ AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      FROM documents WHERE trim(text) <> ''
    ),
    tc AS (SELECT token, CAST(count(*) AS BIGINT) AS n_true FROM occ GROUP BY token),
    top AS (SELECT token, n_true FROM tc ORDER BY n_true DESC, token LIMIT 20),
    cells AS (
      SELECT r.rw AS rw,
             ('0x' || substr(md5(CAST(r.rw AS VARCHAR) || '|' || o.token), 1, 8))::BIGINT % 1024 AS bucket
      FROM occ o CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS rw) r
    ),
    cnt AS (SELECT rw, bucket, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY rw, bucket)
    SELECT t.token, t.n_true, CAST(min(c.c) AS BIGINT) AS est
    FROM top t
    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS rw) r
    JOIN cnt c ON c.rw = r.rw
     AND c.bucket = ('0x' || substr(md5(CAST(r.rw AS VARCHAR) || '|' || t.token), 1, 8))::BIGINT % 1024
    GROUP BY t.token, t.n_true
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (operators/sketch.py): the top-20
    true-frequent tokens with their exact count AND the 4x1024 CMS
    estimate side by side (est >= n_true by construction). The sketch
    build shuffles only 4096 counter keys with map-side combine —
    fixed memory at any corpus size; estimation is 4 broadcast joins,
    zero query-side shuffle."""
    from news_please_spark.functions.text import tokens
    from news_please_spark.operators.sketch import (
        cms_counters_weighted,
        cms_estimate,
    )

    occ = (
        spread(load(spark, sf_dir, "documents").select("text"), spark)
        .filter(F.trim(F.col("text")) != "")
        .select(F.explode(tokens(F.lower(F.col("text")))).alias("token"))
    )
    # one aggregation feeds BOTH the exact top-k and the sketch build
    # (cms_counters_weighted hashes each DISTINCT token once). Lazy
    # persist: the whole cost stays inside the caller's action.
    tc = (
        occ.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_true"))
        .persist()
    )
    top = tc.orderBy(F.desc("n_true"), "token").limit(20)
    # persist: cms_estimate reads the counter table once per depth row
    # (4 broadcast slices) — without this the whole counter build
    # subtree re-aggregates 4x (plan audit, round 5)
    counters = cms_counters_weighted(tc, "token", "n_true").persist()
    est = cms_estimate(top, counters)
    return top.join(est, "token").select("token", "n_true", "est")


@register(
    "hll_distinct",
    r"""
    WITH occ AS (
      SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      FROM documents WHERE trim(text) <> ''
    ),
    h AS (
      SELECT source, ('0x' || substr(md5(token), 1, 8))::BIGINT AS hv
      FROM (SELECT DISTINCT source, token FROM occ)
    ),
    br AS (
      SELECT source, hv // 16777216 AS bucket,
             CASE WHEN hv % 16777216 = 0 THEN 25
                  ELSE 25 - length(bin(hv % 16777216)) END AS rho
      FROM h
    ),
    regs AS (
      SELECT source, bucket, max(rho) AS max_rho FROM br GROUP BY source, bucket
    ),
    est AS (
      SELECT source,
             CAST(4060558014027923456 AS BIGINT)
               // (2570790 * (sum(1::BIGINT << (25 - max_rho))
                              + (256 - count(*)) * 33554432)) AS hll_est,
             CAST(count(*) AS BIGINT) AS n_registers
      FROM regs GROUP BY source
    ),
    exact AS (
      SELECT source, CAST(count(DISTINCT token) AS BIGINT) AS n_exact
      FROM occ GROUP BY source
    )
    SELECT e.source, x.n_exact, e.hll_est, e.n_registers
    FROM est e JOIN exact x ON e.source = x.source
    """,
)
def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog per-source distinct-token cardinality
    (operators/sketch.py::hll_registers/hll_estimate) beside the exact
    count.  The sketch side folds every occurrence into <= 256 register
    rows per source (map-side-combinable MAX — the 100-TB path, where
    the exact countDistinct's per-token shuffle is the thing being
    avoided); the exact side exists to exhibit the error bound and is
    the oracle's cross-check."""
    from news_please_spark.functions.text import tokens
    from news_please_spark.operators.sketch import hll_estimate, hll_registers

    occ = (
        spread(load(spark, sf_dir, "documents").select("source", "text"), spark)
        .filter(F.trim(F.col("text")) != "")
        .select("source", F.explode(tokens(F.lower(F.col("text")))).alias("token"))
    )
    regs = hll_registers(occ, "token", group_cols=("source",)).persist()
    est = hll_estimate(regs, ("source",))
    n_regs = regs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_registers")
    )
    exact = occ.groupBy("source").agg(
        F.countDistinct("token").cast("long").alias("n_exact")
    )
    return (
        est.join(n_regs, "source")
        .join(exact, "source")
        .select("source", "n_exact", "hll_est", "n_registers")
    )


@register(
    "lm_score",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    bg AS (
      SELECT doc_id, unnest(list_transform(range(1, len(toks)), i ->
             {'w1': toks[i], 'w2': toks[i+1]}), recursive := true)
      FROM t WHERE len(toks) >= 2
    ),
    cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n2 FROM bg GROUP BY w1, w2),
    cp AS (SELECT w1, CAST(sum(n2) AS BIGINT) AS n1 FROM cb GROUP BY w1),
    model AS (
      SELECT cb.w1, cb.w2, (cb.n2 * 1000000) // cp.n1 AS pq
      FROM cb JOIN cp ON cb.w1 = cp.w1
    )
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(m.pq) // count(*) AS BIGINT) AS lm_q
    FROM bg b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
    GROUP BY b.doc_id
    """,
)
def lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM quality score per document
    (operators/terms.py::lm_doc_scores) — the CCNet-style perplexity
    filter in integer-exact surrogate form.  Model training is one
    map-side-combinable bigram count; scoring is one equi-join on the
    bigram key; nothing corpus-proportional broadcasts."""
    from news_please_spark.operators.terms import lm_doc_scores

    return lm_doc_scores(
        spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    )


@register(
    "bm25_search",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    post AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term FROM t
    ),
    tf AS (
      SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
      FROM post GROUP BY term, doc_id, dl
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tot
      FROM (SELECT DISTINCT doc_id, dl FROM tf)
    ),
    qt AS (
      SELECT doc_id AS query_id, unnest(list_distinct(toks[1:5])) AS term
      FROM t WHERE doc_id % 97 = 0
    ),
    sc AS (
      SELECT qt.query_id, tf.doc_id,
             sum( ((2*(s.n - d.df) + 1) * 1000000 // (2*d.df + 1))
                  * ((tf.tf * 2200000000) //
                     (tf.tf * 1000000
                      + 1200 * (250 + (750 * tf.dl) // (s.tot // s.n)))) ) AS score_q
      FROM qt
      JOIN tf ON tf.term = qt.term
      JOIN dfreq d ON d.term = qt.term
      CROSS JOIN stats s
      GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, CAST(score_q AS BIGINT) AS score_q, rk FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score_q DESC, doc_id
             ) AS BIGINT) AS rk
      FROM sc
    ) WHERE rk <= 10
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval (operators/terms.py::bm25_topk) — queries
    are the first 5 tokens of every 97th document (so each query's own
    doc should rank near the top, a built-in sanity anchor).  The
    corpus appears only through the inverted-index build; query-time
    work is broadcast joins + one (query, doc) aggregation."""
    from news_please_spark.operators.terms import bm25_topk

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    qs = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .filter(F.trim(F.col("text")) != "")
        .select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(toks, 1, 5), " ").alias("text"),
        )
    )
    return bm25_topk(qs, docs)


# robots.txt corpus for the robots_gate entry: three per-host policy
# variants (prefix rules + allow-override, CRLF + multi-agent groups +
# wildcards/$ + a star fallback, empty-disallow allow-all), embedded
# VERBATIM in both engines so parser and oracle read identical bytes.
_ROBOTS_VARIANTS = [
    "# policy\nUser-agent: *\nDisallow: /private/\nAllow: /private/pub",
    "User-agent: newsbot\r\nUser-agent: archiver\r\nDisallow: /tmp/*\r\n"
    "Allow: /tmp/*.html$\r\n\r\nUser-agent: *\r\nDisallow: /",
    "User-agent: *\nDisallow:",
]


@register(
    "robots_gate",
    f"""
    WITH hosts AS (
      SELECT DISTINCT doc_id % 7 AS k FROM documents
    ),
    rt AS (
      SELECT 'h' || k || '.example.com' AS host,
             string_split_regex(
               CASE k % 3 WHEN 0 THEN '{_ROBOTS_VARIANTS[0]}'
                          WHEN 1 THEN '{_ROBOTS_VARIANTS[1]}'
                          ELSE '{_ROBOTS_VARIANTS[2]}' END, '\r?\n') AS l
      FROM hosts
    ),
    lines AS (
      SELECT host, i AS pos, trim(regexp_replace(l[i + 1], '#.*$', '')) AS line
      FROM rt, LATERAL (SELECT unnest(range(0, len(l))) AS i)
    ),
    tagged AS (
      SELECT host, pos,
             lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) AS field,
             trim(regexp_extract(line, '^[A-Za-z-]+\\s*:\\s*(.*)$', 1)) AS val
      FROM lines
    ),
    kept AS (
      SELECT host, pos, field = 'user-agent' AS is_ua,
             field = 'allow' AS allow, val
      FROM tagged
      WHERE field = 'user-agent'
         OR (field IN ('allow', 'disallow') AND val <> '')
    ),
    opened AS (
      SELECT *, CASE WHEN is_ua AND NOT coalesce(
                       lag(is_ua) OVER (PARTITION BY host ORDER BY pos), false)
                     THEN 1 ELSE 0 END AS opens
      FROM kept
    ),
    grouped AS (
      SELECT *, sum(opens) OVER (PARTITION BY host ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM opened
    ),
    agents AS (SELECT host, grp, lower(val) AS agent FROM grouped WHERE is_ua),
    rules AS (
      SELECT host, grp, allow, val AS path,
             CAST(length(val) AS BIGINT) AS spec
      FROM grouped WHERE NOT is_ua
    ),
    ar AS (
      SELECT r.host, r.allow, r.path, r.spec,
             (a.agent <> '*' AND instr('newsbot', a.agent) > 0) AS specific
      FROM rules r JOIN agents a USING (host, grp)
      WHERE (a.agent <> '*' AND instr('newsbot', a.agent) > 0)
         OR a.agent = '*'
    ),
    hs AS (SELECT host, bool_or(specific) AS has_specific FROM ar GROUP BY host),
    appl AS (
      SELECT ar.host, ar.allow, ar.spec,
             CASE WHEN ar.path LIKE '%$'
                  THEN replace(replace(replace(replace(
                         substr(ar.path, 1, length(ar.path) - 1),
                         '\\', '\\\\'), '%', '\\%'), '_', '\\_'), '*', '%')
                  ELSE replace(replace(replace(replace(
                         ar.path,
                         '\\', '\\\\'), '%', '\\%'), '_', '\\_'), '*', '%') || '%'
             END AS pat
      FROM ar JOIN hs USING (host)
      WHERE ar.specific = hs.has_specific
    ),
    urls AS (
      SELECT doc_id, 'h' || (doc_id % 7) || '.example.com' AS host,
             CASE doc_id % 5
               WHEN 0 THEN '/p/' || doc_id
               WHEN 1 THEN '/private/' || doc_id
               WHEN 2 THEN '/private/pub' || doc_id
               WHEN 3 THEN '/tmp/x' || doc_id || '.html'
               ELSE '/tmp/y' || doc_id
             END AS path
      FROM documents
    ),
    dec AS (
      SELECT u.doc_id, u.host, u.path,
             max(CASE WHEN u.path LIKE a.pat ESCAPE '\\'
                      THEN a.spec * 2 + CAST(a.allow AS INT) END) AS best
      FROM urls u LEFT JOIN appl a ON a.host = u.host
      GROUP BY u.doc_id, u.host, u.path
    )
    SELECT doc_id, host, path, coalesce(best % 2 = 1, true) AS allowed FROM dec
    """,
)
def robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots.txt gate (sources/robots.py): parse three
    synthesized per-host policy variants (groups, CRLF, wildcards, $
    anchors, allow-overrides, star fallback) and decide every derived
    URL for agent 'newsbot' by longest-match/allow-wins semantics —
    the full parser + evaluator, hash-exact against a from-scratch SQL
    implementation."""
    from news_please_spark.sources.robots import parse_robots, robots_allowed

    docs = load(spark, sf_dir, "documents").select("doc_id")
    k = F.col("k")
    hosts = docs.select((F.col("doc_id") % 7).alias("k")).distinct()
    txt = (
        F.when(k % 3 == 0, F.lit(_ROBOTS_VARIANTS[0]))
        .when(k % 3 == 1, F.lit(_ROBOTS_VARIANTS[1]))
        .otherwise(F.lit(_ROBOTS_VARIANTS[2]))
    )
    robots = hosts.select(
        F.concat(F.lit("h"), k.cast("string"), F.lit(".example.com")).alias("host"),
        txt.alias("robots_txt"),
    )
    d = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 5
    path = (
        F.when(m == 0, F.concat(F.lit("/p/"), d))
        .when(m == 1, F.concat(F.lit("/private/"), d))
        .when(m == 2, F.concat(F.lit("/private/pub"), d))
        .when(m == 3, F.concat(F.lit("/tmp/x"), d, F.lit(".html")))
        .otherwise(F.concat(F.lit("/tmp/y"), d))
    )
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("h"), (F.col("doc_id") % 7).cast("string"), F.lit(".example.com")
        ).alias("host"),
        path.alias("path"),
    )
    return robots_allowed(urls, parse_robots(robots), agent="newsbot").select(
        "doc_id", "host", "path", "allowed"
    )


def _script_profile_sql() -> str:
    from news_please_spark.functions.text import SCRIPT_NAMES, script_char_class

    suffixes = _SCRIPT_SUFFIXES
    counts = ",\n             ".join(
        f"CAST(length(t) - length(regexp_replace(t, '{script_char_class(n)}', '', 'g')) AS BIGINT) AS n_{n},\n"
        f"             CAST(length(s) - length(regexp_replace(s, '{script_char_class(n)}', '', 'g')) AS BIGINT) AS s_{n}"
        for n in SCRIPT_NAMES
    )
    case_t = " ".join(f"WHEN n_{n} = m THEN '{n}'" for n in SCRIPT_NAMES)
    case_s = " ".join(f"WHEN s_{n} = ms THEN '{n}'" for n in SCRIPT_NAMES)
    g_t = ", ".join(f"n_{n}" for n in SCRIPT_NAMES)
    g_s = ", ".join(f"s_{n}" for n in SCRIPT_NAMES)
    return f"""
    WITH t1 AS (
      SELECT doc_id,
             text || CASE doc_id % 4 WHEN 1 THEN '{suffixes[1]}'
                                     WHEN 2 THEN '{suffixes[2]}'
                                     WHEN 3 THEN '{suffixes[3]}'
                                     ELSE '' END AS t,
             CASE doc_id % 4 WHEN 1 THEN '{suffixes[1]}'
                             WHEN 2 THEN '{suffixes[2]}'
                             WHEN 3 THEN '{suffixes[3]}'
                             ELSE '' END AS s
      FROM documents
    ),
    t2 AS (
      SELECT doc_id,
             {counts}
      FROM t1
    ),
    t3 AS (
      SELECT *, greatest({g_t}) AS m, greatest({g_s}) AS ms FROM t2
    )
    SELECT doc_id, {g_t},
           CASE WHEN m = 0 THEN 'none' {case_t} END AS script,
           CASE WHEN ms = 0 THEN 'none' {case_s} END AS suffix_script
    FROM t3
    """


_SCRIPT_SUFFIXES = ["", " привет мир", " 日本語のテキスト", " مرحبا بالعالم"]


@register("script_profile", None)
def script_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Unicode script counts + dominant script
    (functions/text.py::script_count/dominant_script) over the corpus
    text with a derived multilingual suffix (so every profiled range
    and the 'none' branch are exercised). Pure codegen'd Columns —
    zero shuffle, the profile rides the parquet scan."""
    from news_please_spark.functions.text import (
        SCRIPT_NAMES,
        dominant_script,
        script_count,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    m4 = F.col("doc_id") % 4
    suffix = (
        F.when(m4 == 1, F.lit(_SCRIPT_SUFFIXES[1]))
        .when(m4 == 2, F.lit(_SCRIPT_SUFFIXES[2]))
        .when(m4 == 3, F.lit(_SCRIPT_SUFFIXES[3]))
        .otherwise(F.lit(""))
    )
    t = F.concat(F.col("text"), suffix)
    return docs.select(
        "doc_id",
        *[script_count(t, n).alias(f"n_{n}") for n in SCRIPT_NAMES],
        dominant_script(t).alias("script"),
        dominant_script(suffix).alias("suffix_script"),
    )


ORACLES["script_profile"] = _script_profile_sql()


# ---------------------------------------------------------------------------
# Gopher quality rules + C4 line filters (operators/quality.py) over a
# deterministically derived multi-line page: the corpus text is a flat
# word soup (no newlines / punctuation), so both entries re-layout it
# into doc_id-keyed lines with bullets / ellipses / terminal punctuation
# plus class injections (all-bullet docs %19, all-ellipsis %23, lorem
# ipsum %11, curly-brace code %13, javascript boilerplate %17) so every
# rule fires on some rows and passes on others. The SAME derivation is
# expressed as native Columns here and as DuckDB list-lambda SQL in the
# shared oracle prefix below — bit-equality of the downstream metrics
# proves the rule implementations agree, not just the layout.


def _synth_page(text: Column, doc_id: Column) -> Column:
    return _synth_page_of(F.split(F.trim(text), r"\s+"), doc_id)


def _synth_page_of(toks: Column, doc_id: Column) -> Column:
    """_synth_page over an ALREADY-MATERIALIZED token array column.

    Entries project the split to a column first: passing the raw
    split(...) expression meant the transform lambda re-tokenized the
    whole text once per generated LINE in interpreted eval (~12×
    per row — 6-8 s of the gopher_rules/c4_clean entry cost at the
    10× measurement SF). `toks` is referenced twice (size + slice),
    which keeps CollapseProject from re-inlining a projected token
    column into this expression."""
    k = (doc_id % 3 + 4).cast("int")
    nlines = F.floor((F.size(toks) + k - 1) / k).cast("long")
    lines = F.transform(
        F.sequence(F.lit(0).cast("long"), nlines - 1),
        lambda i: F.concat(
            F.when(
                (doc_id % 19 == 0) | ((doc_id + i) % 7 == 0), F.lit("- ")
            ).otherwise(F.lit("")),
            F.array_join(F.slice(toks, (i * k + 1).cast("int"), k), " "),
            F.when((doc_id % 23 == 0) | ((doc_id + i) % 5 == 0), F.lit("..."))
            .when((doc_id + i) % 5 == 1, F.lit(""))
            .otherwise(F.lit(".")),
        ),
    )
    return F.concat(
        F.array_join(lines, "\n"),
        F.when(doc_id % 11 == 0, F.lit("\nlorem ipsum dolor sit amet."))
        .otherwise(F.lit("")),
        F.when(doc_id % 13 == 0, F.lit("\nvar x = { a: 1 };"))
        .otherwise(F.lit("")),
        F.when(doc_id % 17 == 0, F.lit("\nplease enable javascript to continue."))
        .otherwise(F.lit("")),
    )


# Shared oracle prefix: the same page derivation in DuckDB list SQL.
# chr(123)/chr(125) are the braces (kept out of the literal so the
# Python source carries no asymmetric quoting hazards in reviews).
_SYNTH_PAGE_CTE = r"""
    WITH t0 AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks,
             (doc_id % 3 + 4) AS k
      FROM documents
    ),
    t1 AS (
      SELECT doc_id,
             list_transform(range(0, (len(toks) + k - 1) // k), i ->
               (CASE WHEN doc_id % 19 = 0 OR (doc_id + i) % 7 = 0
                     THEN '- ' ELSE '' END)
               || array_to_string(list_slice(toks, i*k + 1, i*k + k), ' ')
               || (CASE WHEN doc_id % 23 = 0 OR (doc_id + i) % 5 = 0 THEN '...'
                        WHEN (doc_id + i) % 5 = 1 THEN ''
                        ELSE '.' END)
             ) AS lines
      FROM t0
    ),
    page AS (
      SELECT doc_id,
             array_to_string(lines, chr(10))
             || CASE WHEN doc_id % 11 = 0
                     THEN chr(10) || 'lorem ipsum dolor sit amet.'
                     ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                     THEN chr(10) || 'var x = ' || chr(123) || ' a: 1 ' || chr(125) || ';'
                     ELSE '' END
             || CASE WHEN doc_id % 17 = 0
                     THEN chr(10) || 'please enable javascript to continue.'
                     ELSE '' END AS page
      FROM t1
    )
"""


def _gopher_rules_sql() -> str:
    from news_please_spark.operators.quality import (
        GOPHER_MAX_BULLET_FRAC_Q,
        GOPHER_MAX_ELLIPSIS_FRAC_Q,
        GOPHER_MAX_MEAN_WORD_LEN_Q,
        GOPHER_MAX_SYMBOL_RATIO_Q,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_WORD_FRAC_Q,
        GOPHER_MIN_MEAN_WORD_LEN_Q,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
    )

    stop = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    flags = {
        "r_word_count": f"n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}",
        "r_mean_word_len": f"mean_word_len_q >= {GOPHER_MIN_MEAN_WORD_LEN_Q} AND mean_word_len_q <= {GOPHER_MAX_MEAN_WORD_LEN_Q}",
        "r_symbol_ratio": f"symbol_ratio_q <= {GOPHER_MAX_SYMBOL_RATIO_Q}",
        "r_bullet": f"bullet_frac_q <= {GOPHER_MAX_BULLET_FRAC_Q}",
        "r_ellipsis": f"ellipsis_frac_q <= {GOPHER_MAX_ELLIPSIS_FRAC_Q}",
        "r_alpha_words": f"alpha_word_frac_q >= {GOPHER_MIN_ALPHA_WORD_FRAC_Q}",
        "r_stopwords": f"stop_hits >= {GOPHER_MIN_STOP_HITS}",
    }
    flag_cols = ",\n           ".join(
        f"CAST(CASE WHEN {cond} THEN 1 ELSE 0 END AS BIGINT) AS {name}"
        for name, cond in flags.items()
    )
    keep_cond = " AND ".join(f"({c})" for c in flags.values())
    return (
        _SYNTH_PAGE_CTE
        + f""",
    g AS (
      SELECT doc_id, page,
             string_split_regex(trim(page), '\\s+') AS words,
             string_split(page, chr(10)) AS lines
      FROM page
    ),
    m AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS char_sum,
             CAST(length(page) - length(replace(page, '#', '')) AS BIGINT)
               + CAST((length(page) - length(replace(page, '...', ''))) // 3 AS BIGINT) AS n_symbols,
             CAST(len(list_filter(lines, l -> starts_with(l, '- '))) AS BIGINT) AS n_bullet,
             CAST(len(list_filter(lines, l -> l LIKE '%...')) AS BIGINT) AS n_ellipsis,
             CAST(len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(list_intersect(
               list_distinct(list_transform(words, w -> regexp_replace(w, '[^a-z]', '', 'g'))),
               [{stop}])) AS BIGINT) AS stop_hits
      FROM g
    ),
    q AS (
      SELECT doc_id, n_words,
             CASE WHEN n_words = 0 THEN 0 ELSE (10000 * char_sum) // n_words END AS mean_word_len_q,
             CASE WHEN n_words = 0 THEN 0 ELSE (10000 * n_symbols) // n_words END AS symbol_ratio_q,
             CASE WHEN n_lines = 0 THEN 0 ELSE (10000 * n_bullet) // n_lines END AS bullet_frac_q,
             CASE WHEN n_lines = 0 THEN 0 ELSE (10000 * n_ellipsis) // n_lines END AS ellipsis_frac_q,
             CASE WHEN n_words = 0 THEN 0 ELSE (10000 * n_alpha) // n_words END AS alpha_word_frac_q,
             stop_hits
      FROM m
    )
    SELECT doc_id, n_words, mean_word_len_q, symbol_ratio_q, bullet_frac_q,
           ellipsis_frac_q, alpha_word_frac_q, stop_hits,
           {flag_cols},
           CAST(CASE WHEN {keep_cond} THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM q
    """
    )


@register("gopher_rules", None)
def gopher_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher §A1.1 quality rules (operators/quality.py::gopher_quality)
    over the derived page. Zero shuffle — metrics, flags, and keep are
    scalar expressions riding the parquet scan."""
    from news_please_spark.operators.quality import gopher_quality

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    paged = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_toks")
    ).select(
        "doc_id", _synth_page_of(F.col("_toks"), F.col("doc_id")).alias("page")
    )
    return gopher_quality(paged, F.col("page")).drop("page")


ORACLES["gopher_rules"] = _gopher_rules_sql()


@register(
    "c4_clean",
    _SYNTH_PAGE_CTE
    + r""",
    c AS (
      SELECT doc_id, page, string_split(page, chr(10)) AS lines FROM page
    ),
    k AS (
      SELECT doc_id, page, lines,
             list_filter(lines, l ->
               regexp_matches(l, '[.!?]$')
               AND len(string_split(l, ' ')) >= 5
               AND NOT contains(l, 'javascript')) AS kept
      FROM c
    ),
    f AS (
      SELECT doc_id, page,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(kept) AS BIGINT) AS n_kept_lines,
             coalesce(array_to_string(kept, chr(10)), '') AS clean
      FROM k
    )
    SELECT doc_id, n_lines, n_kept_lines,
           CAST(length(clean) - length(regexp_replace(clean, '[.!?]', '', 'g')) AS BIGINT) AS n_sentences,
           md5(clean) AS clean_md5,
           CAST(CASE WHEN length(clean) - length(regexp_replace(clean, '[.!?]', '', 'g')) >= 3
                      AND NOT contains(page, 'lorem ipsum')
                      AND NOT contains(page, chr(123))
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM f
    """,
)
def c4_clean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 §2.2 line filters + page gates
    (operators/quality.py::c4_line_filter) over the derived page; the
    cleaned text crosses the oracle as md5. Zero shuffle."""
    from news_please_spark.operators.quality import c4_line_filter

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    paged = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_toks")
    ).select(
        "doc_id", _synth_page_of(F.col("_toks"), F.col("doc_id")).alias("page")
    )
    return c4_line_filter(paged, F.col("page")).drop("page")


@register(
    "temperature_sample",
    """
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source
    ),
    s0 AS (
      SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS r FROM c
    ),
    w AS (
      SELECT source, n,
             r - CASE WHEN r*r > n THEN 1 ELSE 0 END
               + CASE WHEN (r+1)*(r+1) <= n THEN 1 ELSE 0 END AS w
      FROM s0
    ),
    t AS (
      SELECT source, n,
             least(CAST(n AS HUGEINT),
                   (CAST(200 AS HUGEINT) * w) // (SELECT sum(w) FROM w)) AS k
      FROM w
    ),
    thr AS (
      SELECT source,
             CASE WHEN k >= n THEN 'g'
                  ELSE lpad(lower(to_hex(CAST((k * 4294967296) // n AS BIGINT))), 8, '0')
             END AS thr
      FROM t
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr ON thr.source = d.source
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < thr.thr
    """,
)
def temperature_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha = 1/2) mixture resample to ~200 rows
    (operators/sampling.py::temperature_sample): per-source budgets
    from exact-integer isqrt weights, kept rows decided by the md5
    hash-fraction draw.  One |sources|-row aggregate + a map-side
    literal filter — the corpus never shuffles."""
    from news_please_spark.operators.sampling import temperature_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return temperature_sample(docs, target=200)


@register(
    "token_budget",
    r"""
    WITH tt AS (
      SELECT source,
             CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    s0 AS (
      SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS r FROM tt
    ),
    wt AS (
      SELECT source, n,
             r - CASE WHEN r*r > n THEN 1 ELSE 0 END
               + CASE WHEN (r+1)*(r+1) <= n THEN 1 ELSE 0 END AS w,
             CAST(1 + ascii(right(source, 1)) % 4 AS BIGINT) AS e
      FROM s0
    ),
    cp AS (SELECT source, n, w, e, e * n AS cap FROM wt),
    o AS (
      SELECT *,
             row_number() OVER (ORDER BY CAST(cap AS DOUBLE)/w, source) AS rk,
             coalesce(sum(cap) OVER (ORDER BY CAST(cap AS DOUBLE)/w, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumc,
             coalesce(sum(w) OVER (ORDER BY CAST(cap AS DOUBLE)/w, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumw,
             sum(w) OVER () AS tw
      FROM cp
    ),
    t AS (
      SELECT *,
             CASE WHEN cap * (tw - cumw) <= (60000 - cumc) * w
                  THEN 1 ELSE 0 END AS pass
      FROM o
    ),
    f AS (
      SELECT *, min(pass) OVER (ORDER BY rk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS capped
      FROM t
    ),
    a AS (
      SELECT coalesce(sum(CASE WHEN capped = 1 THEN cap END), 0) AS cc,
             coalesce(sum(CASE WHEN capped = 0 THEN w END), 0) AS uw
      FROM f
    ),
    b AS (
      SELECT f.*, (60000 - a.cc) AS rem_budget,
             CASE WHEN capped = 1 THEN cap
                  ELSE ((60000 - a.cc) * w) // a.uw END AS base,
             CASE WHEN capped = 1 THEN -1
                  ELSE ((60000 - a.cc) * w) % a.uw END AS remv
      FROM f, a
    ),
    lv AS (
      SELECT max(rem_budget) AS rb,
             coalesce(sum(CASE WHEN capped = 0 THEN base END), 0) AS sb
      FROM b
    ),
    x AS (
      SELECT b.*, (lv.rb - lv.sb) AS leftover,
             row_number() OVER (PARTITION BY capped ORDER BY remv DESC, source) AS xrk
      FROM b, lv
    ),
    al AS (
      SELECT source, n, e, capped,
             CASE WHEN capped = 1 THEN cap
                  ELSE base + CASE WHEN xrk <= leftover THEN 1 ELSE 0 END
             END AS alloc
      FROM x
    )
    SELECT source, n AS n_tokens, e AS max_epochs,
           CAST(capped AS BIGINT) AS capped,
           CAST(alloc AS BIGINT) AS alloc_tokens,
           CAST((10000 * alloc) // n AS BIGINT) AS epochs_q
    FROM al
    """,
)
def token_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch planning
    (operators/sampling.py::plan_token_budget): 60k training tokens
    split across sources by isqrt weights under per-source epoch caps
    (1 + ascii(last char) % 4 — all four cap classes present), capped
    excess water-filled onto uncapped sources with largest-remainder
    rounding. One map-side-combinable histogram aggregation; the plan
    itself is exact integer arithmetic on the config-sized result. The
    oracle reproduces the fixpoint via the sorted-ratio prefix closed
    form — cross-engine equality proves the two formulations agree."""
    from news_please_spark.operators.sampling import plan_token_budget

    docs = load(spark, sf_dir, "documents").select("source", "text")
    return plan_token_budget(
        docs, budget=60_000, epochs=lambda s: 1 + (ord(s[-1]) % 4),
        alpha="sqrt",
    )


# data-mixture weights for the mixture_sample entry: src{i} keeps
# (i % 10 + 1)/10 of its rows — every rate in (0, 1] exercised.  The
# hex thresholds are computed ONCE here and embedded verbatim in both
# the Spark plan and the DuckDB oracle, so the two engines compare the
# same md5 prefix against the same string.
def _mixture_rates() -> dict[str, float]:
    return {f"src{i}": (i % 10 + 1) / 10 for i in range(20)}


def _mixture_values_sql() -> str:
    from news_please_spark.operators.sampling import rate_to_hex8

    return ", ".join(
        f"('{s}', '{rate_to_hex8(r)}')" for s, r in sorted(_mixture_rates().items())
    )


@register(
    "mixture_sample",
    r"""
    WITH rates(source, thr) AS (VALUES __MIXTURE_VALUES__)
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < r.thr
    """,
)
def mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixture subsampling: per-source keep-rates
    decided by a content hash of doc_id (operators/sampling.py) — the
    auditable alternative to rand()-based sampling."""
    from news_please_spark.operators.sampling import mixture_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return mixture_sample(docs, _mixture_rates()).select("doc_id", "source")


ORACLES["mixture_sample"] = ORACLES["mixture_sample"].replace(
    "__MIXTURE_VALUES__", _mixture_values_sql()
)


@register(
    "pack_sequences",
    r"""
    WITH t AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS key,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS packer,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      FROM documents
    ), c AS (
      SELECT packer, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY packer ORDER BY key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      FROM t
    )
    SELECT packer,
           CAST(g.chunk AS BIGINT) AS chunk,
           doc_id,
           n_tok,
           CAST(GREATEST(start, g.chunk * 64) - g.chunk * 64 AS BIGINT) AS tok_start,
           CAST(LEAST(start + n_tok, (g.chunk + 1) * 64) - g.chunk * 64 AS BIGINT) AS tok_end,
           CAST(GREATEST(start, g.chunk * 64) - start AS BIGINT) AS doc_off
    FROM c, LATERAL (
      SELECT unnest(generate_series(CAST(start // 64 AS BIGINT),
                                    CAST((start + n_tok - 1) // 64 AS BIGINT))) AS chunk
    ) g
    """,
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing at seq_len=64 / 16 packer
    shards (small so the gate exercises multi-chunk document splits;
    production grain is 512-8192 tokens x 65k packers) — documents laid
    end-to-end in md5 order, the token stream cut every seq_len tokens
    (operators/sampling.py:pack_sequences)."""
    from news_please_spark.operators.sampling import pack_sequences

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(docs, seq_len=64, packer_hex=1)


@register(
    "length_quantiles",
    r"""
    WITH t AS (
      SELECT source,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      FROM documents
    ),
    h AS (SELECT source, n_tok, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1, 2),
    c AS (
      SELECT source, n_tok,
             SUM(cnt) OVER (PARTITION BY source ORDER BY n_tok
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY source) AS n
      FROM h
    )
    SELECT source, CAST(max(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN n_tok END) AS BIGINT) AS p50,
           CAST(min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN n_tok END) AS BIGINT) AS p90,
           CAST(min(CASE WHEN cum >= n THEN n_tok END) AS BIGINT) AS p100
    FROM c GROUP BY source
    """,
)
def length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source token-length percentiles (p50/p90/p100) via the
    histogram-rank plan (operators/stats.py:group_quantiles) — no
    per-group data sort, integer-exact ranks, bit-reproducible in any
    engine (unlike approxQuantile)."""
    from news_please_spark.operators.stats import group_quantiles

    docs = load(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    return group_quantiles(docs, "source", "n_tok", [50, 90, 100]).select(
        "source", "n", "p50", "p90", F.col("p100")
    )


@register(
    "dataset_split",
    """
    SELECT doc_id, source,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '__T1__' THEN 'test'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '__T2__' THEN 'val'
                ELSE 'train' END AS split
    FROM documents
    """,
)
def dataset_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10/10/80 test/val/train split by id hash
    (operators/sampling.py:dataset_split) — the auditable,
    partitioning-independent alternative to randomSplit."""
    from news_please_spark.operators.sampling import dataset_split

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return dataset_split(docs, {"test": 0.1, "val": 0.1, "train": 0.8})


def _split_thresholds() -> tuple[str, str]:
    from news_please_spark.operators.sampling import rate_to_hex8

    return rate_to_hex8(0.1), rate_to_hex8(0.2)


ORACLES["dataset_split"] = (
    ORACLES["dataset_split"]
    .replace("__T1__", _split_thresholds()[0])
    .replace("__T2__", _split_thresholds()[1])
)


@register(
    "priority_sample",
    r"""
    WITH b AS (
      SELECT doc_id,
             greatest(COALESCE(CAST(n_chars AS BIGINT), 1), 1) AS w,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1 AS u
      FROM documents
    ),
    p AS (SELECT doc_id, w, (w * 4294967296) // u AS priority FROM b),
    top AS (
      SELECT doc_id, w, priority,
             CAST(row_number() OVER (ORDER BY priority DESC, doc_id ASC)
                  AS BIGINT) AS rk
      FROM p
      QUALIFY rk <= 101
    ),
    tau AS (
      SELECT CASE WHEN count(*) = 101 THEN min(priority) ELSE 0 END AS tau
      FROM top
    )
    SELECT doc_id, w, priority, rk,
           CAST(greatest(w, tau) AS BIGINT) AS w_est
    FROM top CROSS JOIN tau
    WHERE rk <= 100
    """,
)
def priority_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional k=100 sample without replacement with
    Horvitz-Thompson weight estimates — priority sampling, Duffield,
    Lund & Thorup JACM 2007 (operators/sampling.py:priority_sample).
    Integer-exact priorities q = (w<<32) DIV u with the md5 draw, so
    both engines pick the identical sample; the corpus never shuffles
    (TakeOrderedAndProject heaps), only k+1 rows reach the driver-side
    plan tail."""
    from news_please_spark.operators.sampling import priority_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return priority_sample(docs, "n_chars", 100)


@register(
    "length_buckets",
    r"""
    WITH t AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS key,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      FROM documents
    ),
    bk AS (
      SELECT doc_id, key, shard, n_tok,
             CAST((n_tok >= 32)::INT + (n_tok >= 64)::INT + (n_tok >= 128)::INT
                + (n_tok >= 256)::INT + (n_tok >= 512)::INT
                + (n_tok >= 1024)::INT + (n_tok >= 2048)::INT AS BIGINT) AS bucket
      FROM t
    ),
    rn AS (
      SELECT *, row_number() OVER (PARTITION BY bucket, shard
                                   ORDER BY key, doc_id) AS rn
      FROM bk
    )
    SELECT bucket, shard, CAST((rn - 1) // 16 AS BIGINT) AS batch,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tok) AS BIGINT) AS max_tok,
           CAST(sum(n_tok) AS BIGINT) AS sum_tok,
           CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste
    FROM rn
    GROUP BY bucket, shard, (rn - 1) // 16
    """,
)
def length_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch plan (batch_size 16, power-of-two length
    buckets, 16 md5 shards) — pad-to-longest batching for padded-
    attention training (operators/sampling.py:length_bucket_plan).
    One shuffle on (bucket, shard); the per-batch aggregation reuses
    that partitioning (grouping keys are a superset), so Catalyst
    elides a second Exchange."""
    from news_please_spark.operators.sampling import length_bucket_plan

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    return length_bucket_plan(docs, 16)


@register(
    "source_overlap",
    r"""
    WITH t AS (
      SELECT source, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT source,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 0) + 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
      FROM t
    ),
    d AS (SELECT DISTINCT source, md5(gram) AS gh FROM g),
    tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    pr AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS shared_grams
      FROM d a JOIN d b ON a.gh = b.gh AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, shared_grams,
           ta.n AS grams_a, tb.n AS grams_b,
           CAST(shared_grams * 10000 // (ta.n + tb.n - shared_grams)
                AS BIGINT) AS jaccard_bp
    FROM pr
    JOIN tot ta ON ta.source = pr.source_a
    JOIN tot tb ON tb.source = pr.source_b
    """,
)
def source_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: distinct lowercased 3-gram
    shingles shared between every source pair, with integer Jaccard in
    basis points (operators/decontam.py:source_overlap).  The corpus is
    never self-joined: per-gram source sets are bounded by |sources|,
    so pair fanout is C(|sources|, 2) per gram at any corpus size; the
    per-source totals join back via a genuinely-tiny broadcast."""
    from news_please_spark.operators.decontam import source_overlap

    docs = spread(
        load(spark, sf_dir, "documents").select("source", "text"), spark
    )
    return source_overlap(docs, 3)


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST((tf.tf * n.n * 10000) // dfreq.df AS BIGINT) AS score_q
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, score_q, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_q DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document by the integer-exact rational
    TF-IDF (operators/terms.py — tf*N*10000 DIV df; ln is deliberately
    avoided because transcendental rounding differs across engines)."""
    from news_please_spark.operators.terms import tfidf_top_terms

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_top_terms(docs, k=3)


@register(
    "packed_chunks",
    r"""
    WITH t AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS key,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS packer,
             string_split_regex(trim(text), '\s+') AS toks,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      FROM documents
    ), c AS (
      SELECT packer, doc_id, toks, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY packer ORDER BY key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      FROM t
    ), spans AS (
      SELECT packer, CAST(g.chunk AS BIGINT) AS chunk, doc_id, toks,
             CAST(GREATEST(start, g.chunk * 64) - g.chunk * 64 AS BIGINT) AS tok_start,
             CAST(LEAST(start + n_tok, (g.chunk + 1) * 64)
                  - GREATEST(start, g.chunk * 64) AS BIGINT) AS len,
             CAST(GREATEST(start, g.chunk * 64) - start AS BIGINT) AS doc_off
      FROM c, LATERAL (
        SELECT unnest(generate_series(CAST(start // 64 AS BIGINT),
                                      CAST((start + n_tok - 1) // 64 AS BIGINT))) AS chunk
      ) g
    )
    SELECT packer, chunk,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len) AS BIGINT) AS n_tok,
           md5(string_agg(array_to_string(toks[doc_off + 1 : doc_off + len], ' '),
                          ' ' ORDER BY tok_start)) AS chunk_md5
    FROM spans GROUP BY packer, chunk
    """,
)
def packed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip of sequence packing: the packed chunks rendered back
    to token text (operators/sampling.py:render_packed_chunks), hashed
    per chunk — proves the spans reassemble the exact training
    sequences in stream order."""
    from news_please_spark.operators.sampling import (
        pack_sequences,
        render_packed_chunks,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    packed = pack_sequences(docs, seq_len=64, packer_hex=1)
    return render_packed_chunks(packed, docs).select(
        "packer", "chunk", "n_docs", "n_tok", F.md5("chunk_text").alias("chunk_md5")
    )


@register(
    "quality_topfrac",
    r"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(floor(10000.0 * length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text)) AS BIGINT) AS alpha_q
      FROM documents
    )
    SELECT doc_id, source, alpha_q
    FROM t
    QUALIFY row_number() OVER (PARTITION BY source ORDER BY alpha_q DESC, doc_id)
            <= CAST(floor((count(*) OVER (PARTITION BY source) * 30 + 99) / 100) AS BIGINT)
    """,
)
def quality_topfrac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality filter: exactly the best ⌈30%⌉ of each
    source's documents by alphabetic-ratio score.  The naive plan (the
    oracle's QUALIFY) is a per-source global window — a skew bomb at
    one-big-domain corpora; operators/sampling.topfrac_per_group
    computes the identical set via the (source, score)-histogram
    threshold, so no task ever sees more than one score cell."""
    from news_please_spark.functions.text import quality_struct
    from news_please_spark.operators.sampling import topfrac_per_group

    t = load(spark, sf_dir, "documents").select(
        "doc_id", "source", quality_struct(F.col("text"))["alpha_q"].alias("alpha_q")
    )
    return topfrac_per_group(
        t, group_col="source", score_col="alpha_q", frac_pct=30, id_col="doc_id"
    ).select("doc_id", "source", "alpha_q")


@register(
    "rolling_fingerprint",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ),
    w AS (
      SELECT doc_id,
             CAST(greatest(ceil((len(toks) - 32) / 16.0) + 1, 1) AS INT) AS n_win,
             toks
      FROM t
    )
    SELECT doc_id, CAST(win AS INT) AS win,
           md5(array_to_string(list_slice(toks, win * 16 + 1, win * 16 + 32), ' ')) AS fp
    FROM w, LATERAL (SELECT unnest(range(0, n_win)) AS win)
    """,
)
def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed (rolling) document fingerprints for containment /
    partial-overlap detection: md5 per 32-token window, stride 16."""
    from news_please_spark.functions.text import rolling_fingerprints_of, tokens

    t = (
        spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
        .select("doc_id", tokens(F.col("text")).alias("_toks"))
        .select("doc_id", rolling_fingerprints_of(F.col("_toks")).alias("fps"))
    )
    return t.select(
        "doc_id", F.posexplode(F.col("fps")).alias("win", "fp")
    ).select("doc_id", F.col("win").cast("int").alias("win"), "fp")


@register(
    "winnow_fingerprint",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(0, len(toks) - 5 + 1),
               i -> md5(array_to_string(list_slice(toks, i + 1, i + 5), ' '))) AS grams
      FROM t WHERE len(toks) >= 5
    ),
    w AS (
      SELECT doc_id, grams, len(grams) AS ng,
             unnest(range(0, greatest(len(grams) - 4 + 1, 1))) AS j
      FROM g
    ),
    ws AS (
      SELECT doc_id, j,
             list_slice(grams, j + 1, least(j + 4, ng)) AS sl
      FROM w
    )
    SELECT DISTINCT doc_id,
           CAST(j + len(sl)
                - list_indexof(list_reverse(sl), list_min(sl)) AS INT) AS pos,
           list_min(sl) AS fp
    FROM ws
    """,
)
def winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): md5 per 5-token shingle, window-min over every 4
    consecutive grams with rightmost tie-break — position-robust local
    fingerprints (any shared run of >= 8 tokens shares a fingerprint,
    density 2/(w+1)) vs rolling_fingerprint's fixed-stride sampling,
    which a one-token insertion desynchronizes. No algorithmic shuffle
    (the plan's only Exchange is spread()'s round-robin fan-out of the
    per-row-heavy kernel): md5-per-gram + the O(g*w) window-min scan
    run in one mapInPandas pass (hashlib + tight loop — the
    interpreted-HOF fold paid per-element lambda eval for every hash
    and comparison; bit-equality to that fold is regression-pinned in
    test_properties), per-doc dedup inside the kernel (no global
    DISTINCT exchange needed — rows from different docs can't
    collide)."""
    from news_please_spark.functions.text import winnow_fingerprint_rows

    return winnow_fingerprint_rows(
        spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark),
        k=5, w=4,
    )


@register(
    "winnow_pairs",
    r"""
    WITH aug AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % 10 = 3 AND s.doc_id IS NOT NULL
                  THEN d.text || ' ' || array_to_string(list_slice(
                         string_split_regex(trim(s.text), '\s+'), 11, 50), ' ')
                  ELSE d.text END AS text
      FROM documents d LEFT JOIN documents s ON s.doc_id = d.doc_id - 7
    ),
    t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM aug),
    g AS (
      SELECT doc_id,
             list_transform(range(0, len(toks) - 5 + 1),
               i -> md5(array_to_string(list_slice(toks, i + 1, i + 5), ' '))) AS grams
      FROM t WHERE len(toks) >= 5
    ),
    w AS (
      SELECT doc_id, grams, len(grams) AS ng,
             unnest(range(0, greatest(len(grams) - 4 + 1, 1))) AS j
      FROM g
    ),
    ws AS (
      SELECT doc_id, list_min(list_slice(grams, j + 1, least(j + 4, ng))) AS fp
      FROM w
    ),
    fps AS (SELECT DISTINCT doc_id, fp FROM ws),
    nf AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY 1),
    keepfp AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 64),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM fps a
      JOIN keepfp k ON k.fp = a.fp
      JOIN fps b ON b.fp = a.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b, c.shared,
           CAST(floor(10000 * c.shared / least(na.n_fp, nb.n_fp)) AS BIGINT)
             AS score_q
    FROM cand c
    JOIN nf na ON na.doc_id = c.doc_a
    JOIN nf nb ON nb.doc_id = c.doc_b
    WHERE c.shared >= 2
    """,
)
def winnow_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plagiarism pair detection over winnowing fingerprints
    (operators/dedup.py::winnow_plagiarism_pairs): every doc_id % 10
    == 3 document gets a 40-token run lifted from doc_id - 7 appended
    — a PARTIAL copy whole-doc Jaccard/MinHash scores near zero but
    the SIGMOD-2003 winnowing guarantee (any shared run >= w+k-1 = 8
    tokens shares a selected fingerprint) must catch. Candidates via
    the shared-fp equi-join under a df <= 64 stop-fingerprint cap;
    score = shared/min(|fp set|) basis points."""
    from news_please_spark.operators.dedup import winnow_plagiarism_pairs

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    src = docs.select(
        (F.col("doc_id") + 7).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 11, 40), " "
        ).alias("_snip"),
    )
    aug = docs.join(src, "doc_id", "left").select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 10 == 3) & F.col("_snip").isNotNull(),
            F.concat(F.col("text"), F.lit(" "), F.col("_snip")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return winnow_plagiarism_pairs(aug, k=5, w=4, max_df=64, min_shared=2)


# ---------------------------------------------------------------------------
@register(
    "pq_adc_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sel AS (
      SELECT vec_id AS cid, v FROM e
      ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16
    ),
    cb AS (SELECT list(v ORDER BY cid) AS cents FROM sel),
    enc AS (
      SELECT e.vec_id AS neighbor_id,
             list_transform(range(0, 8), mm ->
               list_indexof(
                 list_transform(cents, c ->
                   list_sum(list_transform(range(1, 9), i ->
                     (v[mm*8 + i] - c[mm*8 + i])
                     * (v[mm*8 + i] - c[mm*8 + i])))),
                 list_min(
                 list_transform(cents, c ->
                   list_sum(list_transform(range(1, 9), i ->
                     (v[mm*8 + i] - c[mm*8 + i])
                     * (v[mm*8 + i] - c[mm*8 + i]))))))) AS codes
      FROM e, cb
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 101 = 0),
    lut AS (
      SELECT query_id,
             list_transform(range(0, 8), mm ->
               list_transform(cents, c ->
                 list_sum(list_transform(range(1, 9), i ->
                   (qv[mm*8 + i] - c[mm*8 + i])
                   * (qv[mm*8 + i] - c[mm*8 + i]))))) AS lt
      FROM q, cb
    ),
    p AS (
      SELECT l.query_id, enc.neighbor_id,
             CAST(floor(1000000 * list_sum(list_transform(range(0, 8), mm ->
               lt[mm + 1][codes[mm + 1]]))) AS BIGINT) AS dist_q
      FROM lut l, enc WHERE l.query_id <> enc.neighbor_id
    )
    SELECT query_id, neighbor_id, dist_q, rk FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY dist_q, neighbor_id
             ) AS BIGINT) AS rk
      FROM p
    ) WHERE rk <= 10
    """,
)
def pq_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate top-10 (operators/similarity.py::pq_adc_topk):
    64-dim corpus compressed to 8 one-byte-range codes per vector
    (md5-rank codebook, 16 centroids shared across the 8 subspaces),
    queries scored by table lookup — the memory layout that keeps a
    10^10-vector index cluster-resident. Quantized squared-L2 estimates
    hash-exact vs the from-scratch DuckDB PQ pipeline."""
    from news_please_spark.operators.similarity import pq_adc_topk

    emb = spread(load(spark, sf_dir, "embeddings"), spark)
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    return pq_adc_topk(queries, emb, dim=64, k=10, m=8, n_cents=16)


@register(
    "ivfadc_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ivfc AS (
      SELECT vec_id AS cid, v AS cv FROM e
      ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 64
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_dot_product(e.v, c.cv)
             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
      FROM e CROSS JOIN ivfc c
    ),
    assign AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
      FROM scored
    ),
    corpus_cell AS (SELECT vec_id AS neighbor_id, cid AS cell FROM assign WHERE rk = 1),
    query_cell AS (
      SELECT vec_id AS query_id, cid AS cell FROM assign
      WHERE rk <= 2 AND vec_id % 101 = 0
    ),
    sel AS (
      SELECT vec_id AS cid, v FROM e
      ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16
    ),
    cb AS (SELECT list(v ORDER BY cid) AS cents FROM sel),
    enc AS (
      SELECT e.vec_id AS neighbor_id,
             list_transform(range(0, 8), mm ->
               list_indexof(
                 list_transform(cents, c ->
                   list_sum(list_transform(range(1, 9), i ->
                     (v[mm*8 + i] - c[mm*8 + i])
                     * (v[mm*8 + i] - c[mm*8 + i])))),
                 list_min(
                 list_transform(cents, c ->
                   list_sum(list_transform(range(1, 9), i ->
                     (v[mm*8 + i] - c[mm*8 + i])
                     * (v[mm*8 + i] - c[mm*8 + i]))))))) AS codes
      FROM e, cb
    ),
    lut AS (
      SELECT vec_id AS query_id,
             list_transform(range(0, 8), mm ->
               list_transform(cents, c ->
                 list_sum(list_transform(range(1, 9), i ->
                   (v[mm*8 + i] - c[mm*8 + i])
                   * (v[mm*8 + i] - c[mm*8 + i]))))) AS lt
      FROM e, cb WHERE vec_id % 101 = 0
    ),
    p AS (
      SELECT l.query_id, cc.neighbor_id,
             CAST(floor(1000000 * list_sum(list_transform(range(0, 8), mm ->
               lt[mm + 1][codes[mm + 1]]))) AS BIGINT) AS dist_q
      FROM lut l
      JOIN query_cell qc ON qc.query_id = l.query_id
      JOIN corpus_cell cc ON cc.cell = qc.cell
      JOIN enc ON enc.neighbor_id = cc.neighbor_id
      WHERE l.query_id <> cc.neighbor_id
    )
    SELECT query_id, neighbor_id, dist_q, rk FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY dist_q, neighbor_id
             ) AS BIGINT) AS rk
      FROM p
    ) WHERE rk <= 10
    """,
)
def ivfadc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (operators/similarity.py::ivfadc_topk): nprobe=2 coarse
    routing + PQ/ADC scoring of ONLY the probed lists — the composed
    design-scale ANN path. One map pass produces (cell, codes) against
    the two bounded broadcasts; candidates come from the cell
    equi-join; per-query cost is |corpus|/n_lists · nprobe lookups."""
    from news_please_spark.operators.similarity import ivfadc_topk

    emb = spread(load(spark, sf_dir, "embeddings"), spark)
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    return ivfadc_topk(
        queries, emb, dim=64, k=10, m=8, n_cents=16, n_lists=64, nprobe=2
    )


# ---------------------------------------------------------------------------
# 7. ANN similarity search: brute-force cosine top-k (baseline path)
@register(
    "ann_cosine_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % 101 = 0),
    p AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             CAST(floor(10000 * (
               list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v)))
             )) AS BIGINT) AS sim_q
      FROM q, e WHERE q.vec_id <> e.vec_id
    )
    SELECT query_id, neighbor_id, sim_q FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_q DESC, neighbor_id) AS rk
      FROM p
    ) WHERE rk <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5. The dot product is a left fold over
    doubles in BOTH engines so quantized sims agree exactly. Scale
    path: broadcast the (few) query vectors against the big side —
    no shuffle of the corpus at all."""
    e = spread(load(spark, sf_dir, "embeddings"), spark).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    q = e.filter(F.col("vec_id") % 101 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = F.broadcast(q).crossJoin(e).filter(F.col("query_id") != F.col("vec_id"))
    sims = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        # operation order mirrors the SQL exactly — 10000 * (dot/denom),
        # not (10000*dot)/denom — so quantization boundaries agree to
        # the last ulp across engines
        F.floor(
            10000
            * (
                dot(F.col("qv"), F.col("v"))
                / (F.sqrt(dot(F.col("qv"), F.col("qv"))) * F.sqrt(dot(F.col("v"), F.col("v"))))
            )
        )
        .cast("long")
        .alias("sim_q"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_q"), F.col("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "sim_q")
    )


# ---------------------------------------------------------------------------
# 7c. adaptive recrawl scheduling over a derived fetch history: events
#     as fetch observations (url = event_id % 499, content proxy =
#     event_type), change-frequency estimator from operators/recrawl.py.
_RECRAWL_IVL = "least(greatest((l - f) // (n_changes + 1), 3600000000), 2592000000000)"


@register(
    "recrawl_schedule",
    f"""
    WITH h AS (
      SELECT 'u' || CAST(event_id % 499 AS VARCHAR) AS url, ts, event_id,
             event_type AS ch
      FROM events
    ),
    x AS (
      SELECT url, epoch_us(ts) AS us,
             CASE WHEN lag(ch) OVER (PARTITION BY url ORDER BY ts, event_id) IS NOT NULL
                   AND lag(ch) OVER (PARTITION BY url ORDER BY ts, event_id) <> ch
                  THEN 1 ELSE 0 END AS chg
      FROM h
    ),
    a AS (
      SELECT url, CAST(count(*) AS BIGINT) AS n_visits,
             CAST(sum(chg) AS BIGINT) AS n_changes,
             min(us) AS f, max(us) AS l
      FROM x GROUP BY url
    )
    SELECT url, n_visits, n_changes,
           CAST({_RECRAWL_IVL} AS BIGINT) AS interval_us,
           CAST(l + {_RECRAWL_IVL} AS BIGINT) AS next_due_us
    FROM a
    """,
)
def recrawl_schedule_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-frequency recrawl cadence (operators/recrawl.py): per-url
    interval = clamp(span div (changes+1)), next_due = last + interval.
    One shuffle total — the per-url aggregate reuses the lag window's
    partitioning."""
    from news_please_spark.operators.recrawl import recrawl_schedule

    h = load(spark, sf_dir, "events").select(
        F.concat(F.lit("u"), (F.col("event_id") % 499).cast("string")).alias(
            "url"
        ),
        F.col("ts").alias("fetch_ts"),
        "event_id",
        F.col("event_type").alias("content_hash"),
    )
    return recrawl_schedule(h, tiebreak="event_id")


# ---------------------------------------------------------------------------
# 8. streaming analogues over events: sessionize, recency filter (F10),
#    versioning chain (K3-K6 MERGE semantics)
@register(
    "events_sessionize",
    """
    WITH x AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    b AS (
      SELECT user_id, event_id, us,
             CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM x
    ),
    s AS (
      SELECT user_id,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess
      FROM b
    )
    SELECT user_id, CAST(count(DISTINCT sess) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w).alias("prev_us"),
    )
    b = x.withColumn(
        "brk",
        F.when(
            F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > 1_800_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = b.withColumn("sess", F.sum("brk").over(ws))
    return s.groupBy("user_id").agg(
        F.countDistinct("sess").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "asof_last_purchase",
    """
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS us,
           r.event_id AS purchase_id, r.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF LEFT join: every click event carries the same user's most
    recent purchase at or before it (operators/joins.py:asof_join —
    union-tag + window-carry plan, one Exchange, no nested loop).  The
    oracle is DuckDB's native ASOF JOIN."""
    from news_please_spark.operators.joins import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join(
        clicks, purchases, "user_id", "user_id", "ts", "ts",
        ["purchase_id", "purchase_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "purchase_id",
        "purchase_value",
    )


@register(
    "purchase_click_attribution",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           CAST(epoch_us(c.ts) - epoch_us(p.ts) AS BIGINT) AS dt_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
    """,
)
def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: clicks landing inside the hour after each
    purchase by the same user (operators/joins.py:range_join — banded
    explode + hash equi-join on (key, band); the inequality predicate
    never reaches the optimizer, so no BroadcastNestedLoop).  Oracle is
    the plain inequality join, fine at gate scale."""
    from news_please_spark.operators.joins import range_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = range_join(
        purchases, clicks, "user_id", "c_user",
        "w_start", "w_end", "c_ts", band=F.lit(3600 * 1_000_000),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        (
            F.unix_micros(F.col("c_ts").cast("timestamp"))
            - F.unix_micros(F.col("w_start").cast("timestamp"))
        ).alias("dt_us"),
    )


@register(
    "recency_filter",
    """
    WITH x AS (
      SELECT user_id, event_type, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_us
      FROM events
    )
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS kept
    FROM x
    WHERE prev_us IS NULL OR us - prev_us > 21600000000
    GROUP BY user_id, event_type
    """,
)
def recency_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS recency window F10 (reference pipelines.py:110-131): drop a
    re-download if the previous version is younger than Δ (6 h)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    x = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w).alias("prev_us"),
    )
    return (
        x.filter(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > 21_600_000_000)
        )
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("kept"))
    )


@register(
    "versioning_chain",
    """
    SELECT event_id,
           CAST(row_number() OVER w AS INT) AS version,
           lag(event_id) OVER w AS ancestor,
           lead(event_id) OVER w AS descendant
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    """,
)
def versioning_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-oriented image of the reference's per-row version dance
    (SELECT current → INSERT new → archive old, pipelines.py:138-277):
    version numbers + ancestor/descendant links in one window pass."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.row_number().over(w).cast("int").alias("version"),
        F.lag("event_id").over(w).alias("ancestor"),
        F.lead("event_id").over(w).alias("descendant"),
    )


@register(
    "merge_upsert",
    """
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    src AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 110) AS BIGINT) AS price_c
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT * FROM src
    UNION ALL
    SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO through the real snapshot catalog (state.py:
    SnapshotCatalog.merge_into): an initial insert commit then an
    upsert commit against a scratch catalog, returning the final
    committed table — so the gate exercises the CAS commit protocol
    end-to-end, not a functional imitation of it.  Oracle is the
    set-algebra definition of the same two merges."""
    import tempfile

    from news_please_spark.state import SnapshotCatalog

    orders = load(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    src = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 110).cast("long").alias("price_c"),
    )
    cat = SnapshotCatalog(tempfile.mkdtemp(prefix="merge_upsert_"))
    cat.merge_into(spark, "t", base, ["o_orderkey"])
    cat.merge_into(spark, "t", src, ["o_orderkey"])
    return cat.read_table(spark, "t")


@register(
    "bucketed_join",
    """
    SELECT o.o_orderpriority,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orders⋈lineitem join through BUCKETED storage (sinks/
    bucketed.py): both sides are written bucketBy(8, orderkey) sortBy
    into scratch external tables, then joined — the write-once-shuffle-
    never pattern the seen-table and document joins use at the 100-TB
    point.  At gate scale AQE correctly broadcasts the small side
    instead; tests/test_bucketed.py plan-asserts the exchange-free
    sort-merge path with broadcast off.  The oracle is the plain join;
    bucketing must change the plan, never the rows."""
    import tempfile
    import uuid

    from news_please_spark.sinks.bucketed import read_bucketed, write_bucketed

    tag = uuid.uuid4().hex[:8]
    d = tempfile.mkdtemp(prefix="bucketed_join_")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("rev_c"),
    )
    write_bucketed(orders, f"bj_o_{tag}", f"{d}/o", ["o_orderkey"], buckets=8)
    write_bucketed(li, f"bj_l_{tag}", f"{d}/l", ["l_orderkey"], buckets=8)
    o = read_bucketed(spark, f"bj_o_{tag}")
    l = read_bucketed(spark, f"bj_l_{tag}")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.sum("rev_c").cast("long").alias("revenue_c"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# 9. classic relational coverage (agg + multi-join), per-row-quantized sums
@register(
    "lineitem_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def lineitem_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.floor(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_c"),
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).alias("revenue_c"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "segment_revenue",
    """
    SELECT c.c_mktsegment, o.o_orderpriority,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
)
def segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("revenue_c"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "sitemap_expand",
    """
    WITH RECURSIVE p AS (
      SELECT CAST(ceil((max(doc_id)+1)/10.0) AS BIGINT) AS s,
             max(doc_id)+1 AS n
      FROM documents
    ),
    sm AS (SELECT unnest(range(0, (SELECT s FROM p))) AS sid),
    entries AS (
      SELECT sid, 'sm://' || CAST((sid*2+1) % (SELECT s FROM p) AS VARCHAR) AS entry, true AS is_sm FROM sm
      UNION ALL SELECT sid, 'sm://' || CAST((sid*3+2) % (SELECT s FROM p) AS VARCHAR), true FROM sm
      UNION ALL SELECT sid, 'https://site.example.com/p/' || CAST((sid*5+3) % (SELECT n FROM p) AS VARCHAR), false FROM sm
      UNION ALL SELECT sid, 'https://site.example.com/p/' || CAST((sid*7+4) % (SELECT n FROM p) AS VARCHAR), false FROM sm
    ),
    walk(node, depth) AS (
      SELECT 'sm://' || CAST(sid AS VARCHAR), 0 FROM sm WHERE sid % 11 = 0
      UNION ALL
      SELECT e.entry, w.depth + 1 FROM walk w
      JOIN entries e ON ('sm://' || CAST(e.sid AS VARCHAR)) = w.node
      WHERE w.depth < 5 AND e.is_sm
    )
    SELECT e.entry AS url, CAST(min(w.depth + 1) AS INT) AS depth
    FROM walk w
    JOIN entries e ON ('sm://' || CAST(e.sid AS VARCHAR)) = w.node
    WHERE NOT e.is_sm AND w.depth < 5
    GROUP BY e.entry
    """,
)
def sitemap_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 recursive sitemap expansion through the real engine operator
    (sources/sitemap.expand_sitemaps), on a sitemap tree derived from
    `documents` — the DuckDB oracle walks the same tree as a recursive
    CTE (cycles bounded by depth, min-depth dedup)."""
    from news_please_spark.sources.sitemap import expand_sitemaps

    n = load(spark, sf_dir, "documents").agg(F.max("doc_id")).first()[0] + 1
    s_count = (n + 9) // 10
    sm = spark.range(0, s_count).select(F.col("id").alias("sid"))
    su = lambda c: F.concat(F.lit("sm://"), c.cast("string"))  # noqa: E731
    lu = lambda c: F.concat(F.lit("https://site.example.com/p/"), c.cast("string"))  # noqa: E731
    entries = sm.select(
        su(F.col("sid")).alias("sitemap_url"),
        F.explode(
            F.array(
                F.struct(su((F.col("sid") * 2 + 1) % s_count).alias("entry_url"), F.lit(True).alias("is_sitemap"), F.lit(0).alias("entry_index")),
                F.struct(su((F.col("sid") * 3 + 2) % s_count).alias("entry_url"), F.lit(True).alias("is_sitemap"), F.lit(1).alias("entry_index")),
                F.struct(lu((F.col("sid") * 5 + 3) % n).alias("entry_url"), F.lit(False).alias("is_sitemap"), F.lit(2).alias("entry_index")),
                F.struct(lu((F.col("sid") * 7 + 4) % n).alias("entry_url"), F.lit(False).alias("is_sitemap"), F.lit(3).alias("entry_index")),
            )
        ).alias("e"),
    ).select("sitemap_url", "e.entry_url", "e.is_sitemap", "e.entry_index")
    roots = [f"sm://{s}" for s in range(0, s_count, 11)]
    out = expand_sitemaps(entries, roots, max_depth=5)
    return out.select("url", F.col("depth").cast("int").alias("depth"))


@register(
    "events_hourly",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (the batch image of the streaming
    windowed agg; portable via date_trunc)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_value_c"),
    )


@register(
    "embedding_near_dup_exact",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id % 7 = 0),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(floor(10000 * (
               list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
             )) AS BIGINT) AS cos_q
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_q FROM p WHERE cos_q >= 3000
    """,
)
def embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs over a subset (the LSH
    variant is the scale path; this is the verifiable baseline)."""
    from news_please_spark.operators.similarity import as_double, cosine

    e = spread(
        load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 7 == 0), spark
    ).select("vec_id", as_double(F.col("embedding")).alias("v"))
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.floor(10000 * cosine(F.col("a.v"), F.col("b.v"))).cast("long").alias("cos_q"),
    )
    return pairs.filter(F.col("cos_q") >= 3000)


@register(
    "events_props_agg",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def events_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# 10. repetition-based quality signals (Gopher §A1.1-style rules) +
#     corpus-level duplicate n-grams + exact Jaccard verification of the
#     MinHash-LSH candidates — the training-data repetition family
@register(
    "repetition_scores",
    r"""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                            i -> toks[i] || ' ' || toks[i+1]) AS g2,
             list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3,
             list_filter(string_split(text, chr(10)), x -> trim(x) != '') AS lns
      FROM t
    ),
    e2 AS (SELECT doc_id, unnest(g2) AS gram FROM g),
    e3 AS (SELECT doc_id, unnest(g3) AS gram FROM g),
    el AS (SELECT doc_id, unnest(lns) AS gram FROM g),
    a2 AS (SELECT doc_id, gram, count(*) AS cnt FROM e2 GROUP BY 1, 2),
    a3 AS (SELECT doc_id, gram, count(*) AS cnt FROM e3 GROUP BY 1, 2),
    al AS (SELECT doc_id, gram, count(*) AS cnt FROM el GROUP BY 1, 2),
    s2 AS (SELECT doc_id, sum(cnt) AS n, coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS dup, max(cnt) AS mx FROM a2 GROUP BY 1),
    s3 AS (SELECT doc_id, sum(cnt) AS n, coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS dup, max(cnt) AS mx FROM a3 GROUP BY 1),
    sl AS (SELECT doc_id, sum(cnt) AS n, coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS dup FROM al GROUP BY 1)
    SELECT t.doc_id,
           CAST(CASE WHEN coalesce(sl.n, 0) = 0 THEN 0 ELSE floor(10000.0 * sl.dup / sl.n) END AS BIGINT) AS dup_line_q,
           CAST(CASE WHEN coalesce(s2.n, 0) = 0 THEN 0 ELSE floor(10000.0 * s2.dup / s2.n) END AS BIGINT) AS dup_bigram_q,
           CAST(CASE WHEN coalesce(s3.n, 0) = 0 THEN 0 ELSE floor(10000.0 * s3.dup / s3.n) END AS BIGINT) AS dup_trigram_q,
           CAST(CASE WHEN coalesce(s2.n, 0) = 0 THEN 0 ELSE floor(10000.0 * s2.mx / s2.n) END AS BIGINT) AS top_bigram_q,
           CAST(CASE WHEN coalesce(s3.n, 0) = 0 THEN 0 ELSE floor(10000.0 * s3.mx / s3.n) END AS BIGINT) AS top_trigram_q
    FROM t
    LEFT JOIN s2 USING (doc_id)
    LEFT JOIN s3 USING (doc_id)
    LEFT JOIN sl USING (doc_id)
    """,
)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (duplicate-line / duplicate-ngram
    / top-ngram fractions) — zero-shuffle array folds riding the scan,
    staged so each gram array is built once per row."""
    from news_please_spark.operators.repetition import repetition_scores_df

    return repetition_scores_df(
        spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    )


@register(
    "corpus_dup_ngrams",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g3
      FROM t
    ),
    p AS (SELECT doc_id, unnest(g3) AS gram FROM g),
    docfreq AS (SELECT gram, count(*) AS c FROM p GROUP BY 1),
    sh AS (
      SELECT p.doc_id, count(*) AS shared
      FROM p JOIN docfreq USING (gram) WHERE c > 1 GROUP BY 1
    ),
    tot AS (SELECT doc_id, count(*) AS n FROM p GROUP BY 1)
    SELECT t.doc_id,
           CAST(coalesce(tot.n, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(sh.shared, 0) AS BIGINT) AS shared_grams,
           CAST(CASE WHEN coalesce(tot.n, 0) = 0 THEN 0
                ELSE floor(10000.0 * coalesce(sh.shared, 0) / tot.n) END AS BIGINT) AS dup_frac_q
    FROM t LEFT JOIN tot USING (doc_id) LEFT JOIN sh USING (doc_id)
    """,
)
def corpus_dup_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate 3-grams per doc (boilerplate signal).
    Shuffles only fixed-width md5 keys with map-side combine."""
    from news_please_spark.operators.repetition import corpus_dup_ngrams

    return corpus_dup_ngrams(
        spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    )


_JV_CACHE: dict[tuple[int, str], DataFrame] = {}


@register(
    "jaccard_verify",
    f"""
    WITH t AS ({_SHINGLES_SQL}),
    s AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
      FROM t WHERE len(toks) >= 3
    ),
    sig AS (
      SELECT doc_id, band,
             list_aggregate(list_transform(shingles, sh -> md5(CAST(band AS VARCHAR) || '|' || sh)), 'min') AS sig
      FROM s, (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    sets AS (SELECT doc_id, list_distinct(shingles) AS gs FROM s),
    j AS (
      SELECT doc_a, doc_b,
             CAST(floor(
               (CAST(len(list_intersect(sa.gs, sb.gs)) AS DOUBLE)
                / len(list_distinct(list_concat(sa.gs, sb.gs)))) * 10000
             ) AS BIGINT) AS jaccard_q
      FROM cand
      JOIN sets sa ON sa.doc_id = cand.doc_a
      JOIN sets sb ON sb.doc_id = cand.doc_b
    )
    SELECT doc_a, doc_b, jaccard_q FROM j WHERE jaccard_q >= 5000
    """,
)
def jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard on the MinHash-LSH candidate pairs (the
    verify stage of the near-dup pipeline): candidates only — the
    all-pairs square is never formed. The corpus is shingled ONCE: a
    lazily-persisted (doc_id, gram-set) table feeds both the LSH index
    build and the verify joins (tokenization is the dominant map cost;
    the pre-split plan paid it twice). Lazy persist keeps the whole
    cost inside the measured action — nothing materializes at plan
    build time.

    The verified-pair RESULT (a few thousand rows at any test SF) is
    additionally memoized per (session, sf_dir) with a lazy persist:
    three downstream entries (dup_clusters, leakage_safe_split,
    dup_canonical) consume these pairs, and without the memo each of
    them re-ran the entire shingle→LSH→verify chain — 4× the
    dominant map cost per suite/gate pass for identical output. The
    cache holds the pair table only, never the gram table."""
    key = (id(spark), sf_dir)
    hit = _JV_CACHE.get(key)
    if hit is not None:
        return hit
    from news_please_spark.operators.dedup import (
        minhash_lsh_candidates_from_grams,
        ngram_jaccard_pairs,
        ngram_set_rows,
    )

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    grams = (
        ngram_set_rows(docs)
        .filter(F.size("_g") > 0)
        .persist()
    )
    cand = minhash_lsh_candidates_from_grams(grams, gram_col="_g")
    # threshold 0.5 is EXACTLY the jaccard_q >= 5000 filter below
    # (floor(10^4·j) >= 5000 ⟺ j >= 0.5 — multiplication by 10^4 and
    # the 0.5 boundary are exact in doubles), and a positive threshold
    # lets the verify prune provably-below pairs by set size before
    # the gram arrays ship (see ngram_jaccard_pairs).
    scored = ngram_jaccard_pairs(docs, cand, threshold=0.5, grams_df=grams)
    out = (
        scored.select(
            "doc_a", "doc_b",
            F.floor(F.col("jaccard") * 10000).cast("long").alias("jaccard_q"),
        )
        .filter(F.col("jaccard_q") >= 5000)
        .persist()
    )
    _JV_CACHE[key] = out
    return out


@register(
    "cdc_lsh_index",
    r"""
    WITH base AS (SELECT doc_id, text FROM documents),
    post AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' updated content'
                  ELSE text END AS text
      FROM base
      WHERE NOT (doc_id % 9 = 0 AND doc_id % 10 <> 0)
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text || ' new doc' AS text
      FROM base WHERE doc_id % 8 = 0
    ),
    t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM post
    ),
    s AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
      FROM t WHERE len(toks) >= 3
    )
    SELECT doc_id, CAST(band AS BIGINT) AS band,
           list_aggregate(list_transform(shingles,
             sh -> md5(CAST(band AS VARCHAR) || '|' || sh)), 'min') AS sig
    FROM s, (SELECT unnest([0, 1, 2, 3]) AS band)
    """,
)
def cdc_lsh_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-maintained LSH index (operators/dedup.apply_cdc_to_index):
    a diff_table-shaped feed (updates %10, deletes %9, inserts %8 as
    new ids) applied to the stored signature index — retract changed
    ids, shingle only the upserts. The oracle builds the index FROM
    SCRATCH over the post-change corpus, so equality proves the
    incremental maintenance reaches the rebuild's fixpoint without
    ever re-shingling the corpus."""
    from news_please_spark.operators.dedup import (
        apply_cdc_to_index,
        lsh_index_of,
        ngram_set_rows,
    )

    base = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    d = F.col("doc_id")
    shingled = (
        ngram_set_rows(base)
        .withColumnRenamed("_g", "_sh")
        .filter(F.size("_sh") > 0)
    )
    index = lsh_index_of(shingled)
    updates = base.filter(d % 10 == 0).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" updated content")).alias("text"),
        F.lit("update").alias("_change"),
    )
    deletes = base.filter((d % 9 == 0) & (d % 10 != 0)).select(
        "doc_id", F.lit(None).cast("string").alias("text"),
        F.lit("delete").alias("_change"),
    )
    inserts = base.filter(d % 8 == 0).select(
        (d + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" new doc")).alias("text"),
        F.lit("insert").alias("_change"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    out = apply_cdc_to_index(index, changes)
    return out.select(
        "doc_id",
        F.col("_band").cast("long").alias("band"),
        F.col("_sig").alias("sig"),
    )


@register(
    "incremental_near_dups",
    f"""
    WITH t AS ({_SHINGLES_SQL}),
    s AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
      FROM t WHERE len(toks) >= 3
    ),
    sig AS (
      SELECT doc_id, band,
             list_aggregate(list_transform(shingles, sh -> md5(CAST(band AS VARCHAR) || '|' || sh)), 'min') AS sig
      FROM s, (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS delta_id, b.doc_id AS corpus_id
      FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
      WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
    ),
    sets AS (SELECT doc_id, list_distinct(shingles) AS gs FROM s)
    SELECT delta_id, corpus_id, jaccard_q FROM (
      SELECT delta_id, corpus_id,
             CAST(floor(
               (CAST(len(list_intersect(sa.gs, sb.gs)) AS DOUBLE)
                / len(list_distinct(list_concat(sa.gs, sb.gs)))) * 10000
             ) AS BIGINT) AS jaccard_q
      FROM cand
      JOIN sets sa ON sa.doc_id = cand.delta_id
      JOIN sets sb ON sb.doc_id = cand.corpus_id
    ) WHERE jaccard_q >= 5000
    """,
)
def incremental_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — a delta batch (doc_id % 10 == 0) checked
    against the stored corpus LSH index (operators/dedup.lsh_index_of +
    near_dup_candidates_against_index), then exact-Jaccard verified.
    The production shape: per-batch cost scales with the batch — the
    corpus is never re-shingled at steady state (here both sides derive
    from one persisted gram table because the test corpus is built
    fresh; the index side would be a stored bucketed table)."""
    from news_please_spark.operators.dedup import (
        jaccard,
        lsh_index_of,
        near_dup_candidates_against_index,
        ngram_set_rows,
    )

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    grams = (
        ngram_set_rows(docs)
        .filter(F.size("_g") > 0)
        .persist()
    )
    delta_sigs = lsh_index_of(
        grams.filter(F.col("doc_id") % 10 == 0), gram_col="_g"
    )
    corpus_sigs = lsh_index_of(
        grams.filter(F.col("doc_id") % 10 != 0), gram_col="_g"
    )
    cand = near_dup_candidates_against_index(delta_sigs, corpus_sigs)
    ga = grams.select(F.col("doc_id").alias("delta_id"), F.col("_g").alias("_ga"))
    gb = grams.select(F.col("doc_id").alias("corpus_id"), F.col("_g").alias("_gb"))
    return (
        cand.join(ga, "delta_id")
        .join(gb, "corpus_id")
        .select(
            "delta_id",
            "corpus_id",
            F.floor(jaccard(F.col("_ga"), F.col("_gb")) * 10000)
            .cast("long")
            .alias("jaccard_q"),
        )
        .filter(F.col("jaccard_q") >= 5000)
    )


@register("dup_clusters", None)
def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dup clusters: connected components over the verified
    near-dup pair graph (jaccard_verify's edges) — a≈b≈c lands in one
    cluster keyed by its min doc_id even when a≉c pairwise
    (operators/graph.py, min-label propagation). Oracle: DuckDB
    recursive-CTE reachability closure over the same pairs."""
    from news_please_spark.operators.graph import connected_components

    pairs = QUERIES["jaccard_verify"](spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), "root"
    )


ORACLES["dup_clusters"] = f"""
    WITH RECURSIVE pairs AS (
{ORACLES["jaccard_verify"]}
    ),
    e AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, node) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM e)
      UNION
      SELECT r.src, e.b FROM reach r JOIN e ON r.node = e.a
    )
    SELECT src AS doc_id, CAST(min(node) AS BIGINT) AS root
    FROM reach GROUP BY src
"""


@register("leakage_safe_split", None)
def leakage_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split (operators/sampling.py:
    leakage_safe_split): every verified near-dup cluster is assigned to
    ONE split, keyed by the md5 hash of its min-id root — so paraphrase
    duplicates can never straddle the train/eval boundary (the silent
    eval-inflation bug a per-doc split carries at the corpus's near-dup
    rate). Oracle: the dup_clusters recursive-CTE closure left-joined
    onto documents, split by the same hex thresholds as dataset_split."""
    from news_please_spark.operators.sampling import leakage_safe_split

    docs = load(spark, sf_dir, "documents").select("doc_id")
    pairs = QUERIES["jaccard_verify"](spark, sf_dir).select("doc_a", "doc_b")
    return leakage_safe_split(
        docs, pairs, {"test": 0.1, "val": 0.1, "train": 0.8}
    )


def _leakage_split_oracle() -> str:
    from news_please_spark.operators.sampling import rate_to_hex8

    t1, t2 = rate_to_hex8(0.1), rate_to_hex8(0.2)
    return f"""
    WITH RECURSIVE pairs AS (
{ORACLES["jaccard_verify"]}
    ),
    e AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, node) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM e)
      UNION
      SELECT r.src, e.b FROM reach r JOIN e ON r.node = e.a
    ),
    roots AS (
      SELECT src AS id, CAST(min(node) AS BIGINT) AS root
      FROM reach GROUP BY src
    ),
    base AS (
      SELECT d.doc_id, COALESCE(r.root, d.doc_id) AS root
      FROM documents d LEFT JOIN roots r ON d.doc_id = r.id
    )
    SELECT doc_id, root,
           CASE WHEN substr(md5(CAST(root AS VARCHAR)), 1, 8) < '{t1}' THEN 'test'
                WHEN substr(md5(CAST(root AS VARCHAR)), 1, 8) < '{t2}' THEN 'val'
                ELSE 'train' END AS split
    FROM base
"""


ORACLES["leakage_safe_split"] = _leakage_split_oracle()


@register(
    "ivf_ann_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
      SELECT vec_id AS cid, v AS cv FROM e
      ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 64
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_dot_product(e.v, c.cv)
             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
      FROM e CROSS JOIN cents c
    ),
    assign AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
      FROM scored
    ),
    corpus_cell AS (SELECT vec_id AS neighbor_id, cid AS cell FROM assign WHERE rk = 1),
    query_cell AS (
      SELECT vec_id AS query_id, cid AS cell FROM assign
      WHERE rk <= 2 AND vec_id % 31 = 0
    ),
    sims AS (
      SELECT q.query_id, c.neighbor_id,
             CAST(floor(10000 * (
               list_dot_product(eq.v, ec.v)
               / (sqrt(list_dot_product(eq.v, eq.v)) * sqrt(list_dot_product(ec.v, ec.v)))
             )) AS BIGINT) AS sim_q
      FROM query_cell q
      JOIN corpus_cell c ON q.cell = c.cell AND q.query_id <> c.neighbor_id
      JOIN e eq ON eq.vec_id = q.query_id
      JOIN e ec ON ec.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, sim_q FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_q DESC, neighbor_id) AS rk
      FROM sims
    ) WHERE rk <= 5
    """,
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 (coarse-quantizer inverted lists, nprobe=2) — the
    second approximate scale path next to multi-table LSH. Codebook is
    a FIXED 64-centroid md5-rank sample (bounded broadcast + O(n_lists)
    per-row assignment at any corpus size); corpus is assigned to lists
    with a zero-shuffle fold over the broadcast codebook; candidates
    come from the list equi-join only."""
    from news_please_spark.operators.similarity import ivf_topk

    e = spread(load(spark, sf_dir, "embeddings"), spark)
    q = e.filter(F.col("vec_id") % 31 == 0)
    return ivf_topk(q, e, k=5, nprobe=2, n_lists=64)


@register(
    "semantic_dedup",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
      SELECT vec_id AS cid, v AS cv FROM e
      ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 64
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_dot_product(e.v, c.cv)
             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
      FROM e CROSS JOIN cents c
    ),
    assign AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
      FROM scored
    ),
    cell AS (SELECT vec_id, cid AS cell FROM assign WHERE rk = 1),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM cell a JOIN cell b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE list_dot_product(ea.v, eb.v)
            / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
            >= 0.42
    )
    SELECT c.vec_id, c.cell,
           (c.vec_id IN (SELECT vec_id FROM dup)) AS is_dup
    FROM cell c
    """,
)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): IVF cells from
    the md5-rank codebook, pairwise cosine >= .95 within a cell only,
    smallest-id doc is the kept exemplar
    (operators/dedup.py:semantic_dedup). The synthetic embeddings carry
    no planted near-dups (max pairwise cos ~0.51), so the gate runs at
    threshold 0.42 — nonzero dups, 1.7e-3 margin to the nearest pair —
    to exercise the dup path; production default stays 0.95."""
    from news_please_spark.operators.dedup import semantic_dedup

    e = spread(load(spark, sf_dir, "embeddings"), spark)
    return semantic_dedup(e, n_lists=64, threshold=0.42)


# ---------------------------------------------------------------------------
# 12. benchmark decontamination + PII redaction (corpus-hygiene family)
_G8 = (
    "list_transform(range(1, greatest(len(toks) - 7, 0) + 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]"
    " || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7])"
)


@register(
    "decontam_hits",
    rf"""
    WITH nn AS (SELECT count(*) AS c FROM documents),
    d AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    planted AS (
      SELECT doc_id + (SELECT c FROM nn) AS doc_id,
             string_split_regex(trim(lower(text || ' planted trailer')), '\s+') AS toks
      FROM documents WHERE doc_id % 13 = 0
    ),
    bench AS (SELECT doc_id, {_G8} AS g8 FROM d WHERE doc_id % 13 = 0),
    corpus AS (
      SELECT doc_id, {_G8} AS g8 FROM d WHERE doc_id % 13 != 0
      UNION ALL
      SELECT doc_id, {_G8} AS g8 FROM planted
    ),
    cg AS (SELECT doc_id, unnest(list_distinct(g8)) AS gram FROM corpus),
    bg AS (SELECT DISTINCT gram FROM (SELECT unnest(list_distinct(g8)) AS gram FROM bench))
    SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM cg JOIN bg USING (gram) GROUP BY 1
    """,
)
def decontam_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/PaLM-style): 8-gram overlap of
    the corpus against an eval set (every 13th doc), with planted
    contaminated copies so the overlap is non-trivial. Scale plan:
    benchmark grams broadcast; corpus never shuffles by gram."""
    from news_please_spark.operators.decontam import contamination

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    n = docs.count()
    bench = docs.filter(F.col("doc_id") % 13 == 0)
    planted = bench.select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" planted trailer")).alias("text"),
    )
    corpus = docs.filter(F.col("doc_id") % 13 != 0).unionByName(planted)
    return contamination(corpus, bench, n=8).select(
        "doc_id", F.col("n_hits").cast("long").alias("n_hits")
    )


_PII_PLANT_SQL = (
    "text || ' call +49 30-1234-567 now ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.7 mail a.b' || CAST(doc_id AS VARCHAR) || '@news.example.org'"
)


@register(
    "pii_redact",
    rf"""
    WITH t AS (SELECT doc_id, {_PII_PLANT_SQL} AS txt FROM documents),
    e AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
             regexp_replace(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g') AS txt
      FROM t
    ),
    i AS (
      SELECT doc_id, n_email,
             CAST(len(regexp_extract_all(txt, '\b[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\b')) AS BIGINT) AS n_ip,
             regexp_replace(txt, '\b[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\b', '<IP>', 'g') AS txt
      FROM e
    ),
    p AS (
      SELECT doc_id, n_email, n_ip,
             CAST(len(regexp_extract_all(txt, '\+[0-9]{{1,3}}[- ][0-9]{{2,4}}[- ][0-9]{{3,4}}[- ][0-9]{{3,4}}')) AS BIGINT) AS n_phone,
             regexp_replace(txt, '\+[0-9]{{1,3}}[- ][0-9]{{2,4}}[- ][0-9]{{3,4}}[- ][0-9]{{3,4}}', '<PHONE>', 'g') AS txt
      FROM i
    )
    SELECT doc_id, n_email, n_ip, n_phone, txt AS clean_text FROM p
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails / IPv4 / phone shapes) with per-doc counts
    over deterministically planted spans — RE2-compatible patterns so
    the identical regex text runs on both engines. Zero shuffle."""
    from news_please_spark.operators.decontam import redact_pii

    planted = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" call +49 30-1234-567 now ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 mail a.b"),
            F.col("doc_id").cast("string"),
            F.lit("@news.example.org"),
        ).alias("text"),
    )
    return redact_pii(planted).select(
        "doc_id", "n_email", "n_ip", "n_phone", "clean_text"
    )


# ---------------------------------------------------------------------------
# 13. interleaved span-document operators (BASELINE.json input_hint shape:
#     doc_id + spans array<struct<kind,text,media_ref,offset>>) — synthesized
#     deterministically from `documents` with the SAME arithmetic in DuckDB
_SPAN_ROWS_SQL = r"""
    WITH sd AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ),
    sc AS (
      SELECT doc_id, toks, CAST(ceil(len(toks) / 10.0) AS INT) AS nc FROM sd
    ),
    span_rows AS (
      SELECT doc_id, unnest(list_transform(range(1, nc + 1), i -> {
               'kind': 'text',
               'text': array_to_string(list_slice(toks, (i-1)*10 + 1, (i-1)*10 + 10), ' '),
               'media_ref': CAST(NULL AS VARCHAR),
               'offset': CAST((i-1) + (i-1) // 2 AS INT)
             }), recursive := true)
      FROM sc
      UNION ALL
      SELECT doc_id, unnest(list_transform(range(1, nc // 2 + 1), j -> {
               'kind': 'image',
               'text': CAST(NULL AS VARCHAR),
               'media_ref': 'img://' || CAST(doc_id AS VARCHAR) || '/' || CAST(j AS VARCHAR),
               'offset': CAST(3*j - 1 AS INT)
             }), recursive := true)
      FROM sc
      UNION ALL
      SELECT doc_id, 'text' AS kind,
             'subscribe to our newsletter for daily updates' AS text,
             CAST(NULL AS VARCHAR) AS media_ref,
             CAST(nc + nc // 2 AS INT) AS "offset"
      FROM sc WHERE doc_id % 4 = 0
    )
"""


def _synth_spans_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_please_spark.operators.spans import synth_spans

    return synth_spans(
        spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    )


@register(
    "span_stats",
    _SPAN_ROWS_SQL
    + """
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
           CAST(sum(CASE WHEN kind != 'text' THEN 1 ELSE 0 END) AS BIGINT) AS n_media,
           CAST(coalesce(sum(len(text)), 0) AS BIGINT) AS text_chars,
           CAST(coalesce(sum(trans), 0) AS BIGINT) AS n_transitions
    FROM (
      SELECT *, CASE WHEN kind != lag(kind) OVER (PARTITION BY doc_id ORDER BY "offset")
                     THEN 1 ELSE 0 END AS trans
      FROM span_rows
    ) GROUP BY doc_id
    """,
)
def span_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleave statistics over the input_hint span table — span
    counts by kind, text chars, kind transitions in offset order; one
    zero-shuffle fold per row."""
    from news_please_spark.operators.spans import span_stats

    return span_stats(_synth_spans_df(spark, sf_dir))


@register(
    "interleaved_render",
    _SPAN_ROWS_SQL
    + """
    SELECT doc_id,
           string_agg(CASE WHEN kind = 'text' THEN text ELSE '<' || kind || '>' END,
                      ' ' ORDER BY "offset") AS rendered,
           CAST(sum(CASE WHEN kind != 'text' THEN 1 ELSE 0 END) AS BIGINT) AS n_media
    FROM span_rows GROUP BY doc_id
    """,
)
def interleaved_render_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spans → flat training-sample text with <kind> media placeholders
    in offset order (the multimodal sampler's view). Zero shuffle."""
    from news_please_spark.operators.spans import render_interleaved

    return render_interleaved(_synth_spans_df(spark, sf_dir))


@register(
    "span_boilerplate",
    _SPAN_ROWS_SQL
    + """
    SELECT md5(lower(trim(text))) AS span_md5,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM span_rows WHERE kind = 'text'
    GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
    """,
)
def span_boilerplate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc duplicate text spans (the planted banner + any chunk
    collisions): md5 keys only across the shuffle, map-side combine."""
    from news_please_spark.operators.spans import boilerplate_spans

    return boilerplate_spans(_synth_spans_df(spark, sf_dir), min_docs=2)


@register(
    "caption_pairs",
    _SPAN_ROWS_SQL
    + """
    SELECT doc_id, media_ref, "offset", caption_before, caption_after
    FROM (
      SELECT doc_id, kind, media_ref, "offset",
             last_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS)
               OVER (PARTITION BY doc_id ORDER BY "offset"
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS caption_before,
             first_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS)
               OVER (PARTITION BY doc_id ORDER BY "offset"
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS caption_after
      FROM span_rows
    ) WHERE kind != 'text'
    """,
)
def caption_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-caption candidate pairs from the interleaved span table
    (operators/spans.py::caption_pairs): nearest text span before/after
    each media span — one posexplode + one window on doc id, no span
    self-join."""
    from news_please_spark.operators.spans import caption_pairs

    return caption_pairs(_synth_spans_df(spark, sf_dir))


@register(
    "interleaved_pack",
    _SPAN_ROWS_SQL
    + r"""
    , nt AS (
      SELECT doc_id, kind, media_ref, "offset",
             CASE WHEN kind = 'text'
                  THEN CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                  ELSE CAST(1 AS BIGINT) END AS n_tok
      FROM span_rows
    ),
    pre AS (
      SELECT doc_id, kind, media_ref, n_tok,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY "offset") - 1 AS BIGINT) AS span_idx,
             coalesce(sum(n_tok) OVER (PARTITION BY doc_id ORDER BY "offset"
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off0
      FROM nt
    ),
    docs AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS packer,
             sum(n_tok) AS doc_tok
      FROM nt GROUP BY doc_id
    ),
    starts AS (
      SELECT doc_id, packer,
             coalesce(sum(doc_tok) OVER (PARTITION BY packer ORDER BY key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS g_start
      FROM docs
    ),
    g AS (
      SELECT p.doc_id, s.packer, p.span_idx, p.kind, p.media_ref, p.n_tok,
             s.g_start + p.off0 AS g0, s.g_start + p.off0 + p.n_tok AS g1
      FROM pre p JOIN starts s USING (doc_id)
    ),
    e AS (
      SELECT *, unnest(range(CAST(g0 // 64 AS BIGINT),
                             CAST((g1 - 1) // 64 + 1 AS BIGINT))) AS chunk FROM g
    )
    SELECT packer, CAST(chunk AS BIGINT) AS chunk, doc_id, span_idx, kind,
           media_ref, n_tok,
           CAST(greatest(g0, chunk * 64) - chunk * 64 AS BIGINT) AS tok_start,
           CAST(least(g1, (chunk + 1) * 64) - chunk * 64 AS BIGINT) AS tok_end,
           CAST(greatest(g0, chunk * 64) - g0 AS BIGINT) AS span_off
    FROM e
    """,
)
def interleaved_pack_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal sequence packing over the input_hint span table
    (operators/spans.py::pack_interleaved): spans laid end-to-end in
    md5-packer order and cut every 64 tokens; text spans may split,
    1-token media placeholders never do. One shuffle (per-packer doc
    window); in-doc prefix sums are array folds riding the scan."""
    from news_please_spark.operators.spans import pack_interleaved

    return pack_interleaved(_synth_spans_df(spark, sf_dir), seq_len=64)


def _span_pii_sql() -> str:
    from news_please_spark.operators.decontam import _PII

    stages = []
    prev = "inj"
    for i, (kind, pat) in enumerate(_PII):
        esc = pat.replace("'", "''")
        stages.append(
            "r{i} AS (\n"
            "      SELECT doc_id, kind, media_ref, \"offset\"{carry},\n"
            "             CASE WHEN kind = 'text'\n"
            "                  THEN CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT)\n"
            "                  ELSE CAST(0 AS BIGINT) END AS n_{k},\n"
            "             CASE WHEN kind = 'text'\n"
            "                  THEN regexp_replace(text, '{p}', '<{K}>', 'g')\n"
            "                  ELSE text END AS text\n"
            "      FROM {prev}\n"
            "    )".format(
                i=i,
                p=esc,
                k=kind,
                K=kind.upper(),
                prev=prev,
                carry="".join(
                    ", n_" + k2 for k2, _ in _PII[:i]
                ),
            )
        )
        prev = f"r{i}"
    last = prev
    counts = ", ".join(
        f"CAST(sum(n_{k}) AS BIGINT) AS n_{k}" for k, _ in _PII
    )
    return (
        _SPAN_ROWS_SQL
        + """
    , inj AS (
      SELECT doc_id, kind, media_ref, "offset",
             CASE WHEN kind = 'text' THEN
               text
               || CASE WHEN (doc_id + "offset") % 5 = 0
                       THEN ' contact bob@example.com' ELSE '' END
               || CASE WHEN (doc_id + "offset") % 7 = 0
                       THEN ' server 10.0.0.1 up' ELSE '' END
               || CASE WHEN (doc_id + "offset") % 9 = 0
                       THEN ' call +1-555-0100-1234' ELSE '' END
             ELSE text END AS text
      FROM span_rows
    ),
    """
        + ",\n    ".join(stages)
        + f"""
    SELECT doc_id, {counts},
           md5(string_agg(CASE WHEN kind = 'text' THEN text
                               ELSE '<' || kind || '>' END,
                          ' ' ORDER BY "offset")) AS clean_md5
    FROM {last} GROUP BY doc_id
    """
    )


def _inject_pii_spans(spans_df: DataFrame) -> DataFrame:
    d = F.col("doc_id")

    def inj(s):
        o = s["offset"].cast("long")
        t2 = F.concat(
            s["text"],
            F.when((d + o) % 5 == 0, F.lit(" contact bob@example.com"))
            .otherwise(F.lit("")),
            F.when((d + o) % 7 == 0, F.lit(" server 10.0.0.1 up"))
            .otherwise(F.lit("")),
            F.when((d + o) % 9 == 0, F.lit(" call +1-555-0100-1234"))
            .otherwise(F.lit("")),
        )
        return F.struct(
            s["kind"].alias("kind"),
            F.when(s["kind"] == "text", t2).otherwise(s["text"]).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        )

    return spans_df.select("doc_id", F.transform("spans", inj).alias("spans"))


@register("span_pii_redact", None)
def span_pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction inside the interleaved span table
    (operators/spans.py::redact_spans): email/ip/phone shapes planted
    into text spans by doc_id+offset arithmetic, redacted in the fixed
    decontam order with per-kind counts; media spans and interleave
    order untouched (the redacted doc crosses the oracle as the md5 of
    its rendered form). Zero shuffle."""
    from news_please_spark.operators.spans import redact_spans

    red = redact_spans(_inject_pii_spans(_synth_spans_df(spark, sf_dir)))
    piece = lambda s: F.when(s["kind"] == "text", s["text"]).otherwise(  # noqa: E731
        F.concat(F.lit("<"), s["kind"], F.lit(">"))
    )
    return red.select(
        "doc_id",
        "n_email",
        "n_ip",
        "n_phone",
        F.md5(F.array_join(F.transform("spans", piece), " ")).alias("clean_md5"),
    )


ORACLES["span_pii_redact"] = _span_pii_sql()


# ---------------------------------------------------------------------------
# 14. the end-to-end corpus-hygiene pipeline (clean_corpus), oracle-checked
#     as ONE entry: exact dedup -> LSH near-dup -> decontam -> quality gate,
#     over a corpus with planted exact copies, near copies and junk docs
_G8T = (
    "list_transform(range(1, greatest(len(toks) - 7, 0) + 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]"
    " || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7])"
)


@register(
    "corpus_clean",
    rf"""
    WITH nn AS (SELECT count(*) AS c FROM documents),
    base AS (SELECT doc_id, text FROM documents),
    corpus AS (
      SELECT doc_id, text FROM base
      UNION ALL
      SELECT doc_id + (SELECT c FROM nn), text FROM base WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 2*(SELECT c FROM nn), text || ' zz extra tail'
      FROM base WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 3*(SELECT c FROM nn),
             array_to_string(list_transform(range(0, 40),
               x -> string_split_regex(trim(text), '\s+')[1]), ' ')
      FROM base WHERE doc_id % 9 = 0
    ),
    s1 AS (
      SELECT c.doc_id, c.text FROM corpus c
      JOIN (SELECT md5(text) AS h, min(doc_id) AS mid FROM corpus GROUP BY 1) k
        ON md5(c.text) = k.h AND c.doc_id = k.mid
    ),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks)-2,0)+1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM s1)
    ),
    sig AS (
      SELECT doc_id, band,
             list_aggregate(list_transform(shingles,
               s -> md5(CAST(band AS VARCHAR) || '|' || s)), 'min') AS sig
      FROM (SELECT * FROM sh WHERE len(shingles) > 0), (SELECT unnest([0,1,2,3]) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    jac AS (
      SELECT doc_a, doc_b,
             CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
               / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS j
      FROM cand
      JOIN sh sa ON sa.doc_id = cand.doc_a
      JOIN sh sb ON sb.doc_id = cand.doc_b
    ),
    s2 AS (
      SELECT * FROM s1 WHERE doc_id NOT IN
        (SELECT DISTINCT doc_b FROM jac WHERE j >= 0.5)
    ),
    bg AS (
      SELECT DISTINCT unnest(list_distinct({_G8T})) AS gram
      FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM base WHERE doc_id % 13 = 0)
    ),
    cg AS (
      SELECT doc_id, unnest(list_distinct({_G8T})) AS gram
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM s2)
    ),
    s3 AS (
      SELECT * FROM s2 WHERE doc_id NOT IN
        (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gram))
    ),
    qg AS (
      SELECT doc_id, list_transform(range(1, greatest(len(toks)-1,0)+1),
             i -> toks[i] || ' ' || toks[i+1]) AS g2
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM s3)
    ),
    topb AS (
      SELECT doc_id, max(cnt) AS mx, sum(cnt) AS n FROM (
        SELECT doc_id, gram, count(*) AS cnt
        FROM (SELECT doc_id, unnest(g2) AS gram FROM qg) GROUP BY 1, 2
      ) GROUP BY 1
    ),
    s4 AS (
      SELECT s3.doc_id, s3.text FROM s3 LEFT JOIN topb USING (doc_id)
      WHERE CASE WHEN coalesce(topb.n, 0) = 0 THEN 0
                 ELSE floor(10000.0 * topb.mx / topb.n) END < 2000
    )
    SELECT doc_id, md5(text) AS content_md5 FROM s4
    """,
)
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-hygiene pipeline (pipeline.clean_corpus) as one
    oracle-checked entry. The corpus is documents plus three planted
    classes so every stage demonstrably fires: byte-exact copies (die
    at exact dedup), appended-tail near copies (die at LSH+Jaccard),
    and one-token-repeated junk docs (die at the Gopher top-bigram
    gate); every 13th base doc doubles as the benchmark set and
    self-hits at decontamination."""
    out = _cleaned_planted_corpus(spark, sf_dir)
    return out.select("doc_id", F.md5("text").alias("content_md5"))


def _planted_corpus(spark: SparkSession, sf_dir: str):
    """(corpus, benchmark): documents + the three planted dup/junk
    classes and the every-13th benchmark set — shared by corpus_clean,
    training_corpus and clean_audit so all gates exercise identical
    hygiene inputs."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    c = docs.count()
    tok1 = F.element_at(F.split(F.trim(F.col("text")), r"\s+"), 1)
    exact = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + c).alias("doc_id"), F.col("text")
    )
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2 * c).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz extra tail")).alias("text"),
    )
    junk = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 3 * c).alias("doc_id"),
        F.array_join(F.array_repeat(tok1, 40), " ").alias("text"),
    )
    corpus = docs.unionByName(exact).unionByName(near).unionByName(junk)
    bench = docs.filter(F.col("doc_id") % 13 == 0)
    return corpus, bench


def _cleaned_planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planted corpus run through the full clean_corpus pipeline."""
    from news_please_spark.pipeline import clean_corpus

    corpus, bench = _planted_corpus(spark, sf_dir)
    return clean_corpus(
        corpus, bench, jaccard_threshold=0.5, top_bigram_q_max=2000,
        materialize_stages=True,
    )


_CLEAN_TAIL = "SELECT doc_id, md5(text) AS content_md5 FROM s4"

_TRAIN_TAIL = """SELECT * FROM (
    WITH sp AS (
      SELECT doc_id, text,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '__T1__' THEN 'test'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '__T2__' THEN 'val'
                  ELSE 'train' END AS split
      FROM s4
    ),
    pk AS (
      SELECT split, doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS key,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS packer,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
      FROM sp
    ),
    st AS (
      SELECT split, packer, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY split, packer ORDER BY key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      FROM pk
    )
    SELECT split, packer,
           CAST(g.chunk AS BIGINT) AS chunk,
           doc_id, n_tok,
           CAST(GREATEST(start, g.chunk * 128) - g.chunk * 128 AS BIGINT) AS tok_start,
           CAST(LEAST(start + n_tok, (g.chunk + 1) * 128) - g.chunk * 128 AS BIGINT) AS tok_end,
           CAST(GREATEST(start, g.chunk * 128) - start AS BIGINT) AS doc_off
    FROM st, LATERAL (
      SELECT unnest(generate_series(CAST(start // 128 AS BIGINT),
                                    CAST((start + n_tok - 1) // 128 AS BIGINT))) AS chunk
    ) g
    )"""


@register("training_corpus", None)
def training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-data preparation pipeline as one oracle
    entry: corpus hygiene (the full clean_corpus chain over the planted
    corpus, identical to corpus_clean) -> deterministic 10/10/80
    test/val/train split (dataset_split) -> per-split concat-and-chunk
    packing at seq_len=128 (pack_sequences, group_cols=["split"] so
    chunks never cross a split).  What a user runs between the crawl
    and the trainer, hash-exact against one DuckDB CTE chain."""
    from news_please_spark.operators.sampling import dataset_split, pack_sequences

    cleaned = _cleaned_planted_corpus(spark, sf_dir).select("doc_id", "text")
    split = dataset_split(cleaned, {"test": 0.1, "val": 0.1, "train": 0.8})
    return pack_sequences(
        split, seq_len=128, packer_hex=1, group_cols=["split"]
    )


def _training_corpus_oracle() -> str:
    from news_please_spark.operators.sampling import rate_to_hex8

    base = ORACLES["corpus_clean"]
    assert _CLEAN_TAIL in base
    tail = _TRAIN_TAIL.replace("__T1__", rate_to_hex8(0.1)).replace(
        "__T2__", rate_to_hex8(0.2)
    )
    return base.replace(_CLEAN_TAIL, tail)


ORACLES["training_corpus"] = _training_corpus_oracle()


# ---------------------------------------------------------------------------
# exact-substring dedup (Lee et al. 2022 ExactSubstr, distributed
# re-expression — see operators/dedup.py): maximal duplicated token
# spans, and documents rebuilt with those spans cut out.
_DUP_SPANS_SQL = r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    occ AS (
      SELECT doc_id,
             unnest(range(0, greatest(len(toks) - 7, 0))) AS pos,
             unnest(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
                    i -> md5(array_to_string(toks[i : i + 7], ' ')))) AS g
      FROM t
    ),
    dupk AS (SELECT g FROM occ GROUP BY g HAVING count(*) >= 2),
    fl AS (SELECT occ.doc_id, occ.pos FROM occ JOIN dupk USING (g)),
    m AS (SELECT doc_id, pos,
            max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_end
          FROM fl),
    isl AS (SELECT doc_id, pos,
            sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                     THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM m),
    spans AS (
      SELECT doc_id,
             CAST(min(pos) AS BIGINT) AS span_start,
             CAST(max(pos) + 7 AS BIGINT) AS span_end,
             CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_len
      FROM isl GROUP BY doc_id, island
    )
"""


@register(
    "dup_substring_spans",
    _DUP_SPANS_SQL
    + """
    SELECT doc_id, span_start, span_end, span_len FROM spans
    """,
)
def dup_substring_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated substrings (8-token windows, corpus frequency
    >= 2) as 0-based inclusive token spans — the ExactSubstr dedup
    signal. Only fixed-width md5 keys shuffle; span assembly is a
    per-document window."""
    from news_please_spark.operators.dedup import dup_substring_spans

    return dup_substring_spans(
        spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark),
        k=8,
        min_count=2,
    )


@register(
    "strip_dup_substrings",
    _DUP_SPANS_SQL
    + """
    ,
    posn AS (
      SELECT doc_id,
             unnest(range(0, len(toks))) AS i,
             unnest(toks) AS w
      FROM t
    ),
    kept AS (
      SELECT p.doc_id, p.i, p.w
      FROM posn p
      LEFT JOIN spans s
        ON p.doc_id = s.doc_id AND p.i BETWEEN s.span_start AND s.span_end
      WHERE s.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id,
             string_agg(w, ' ' ORDER BY i) AS clean_text,
             count(*) AS kept_tokens
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(agg.clean_text, '') AS clean_text,
           CAST(coalesce(agg.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           CAST(len(t.toks) AS BIGINT) AS total_tokens
    FROM t LEFT JOIN agg USING (doc_id)
    """,
)
def strip_dup_substrings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents rebuilt with every duplicated span removed (the
    ExactSubstr cut). Span lists ride a bounded per-doc collect_list;
    the cut itself is one indexed array filter per row."""
    from news_please_spark.operators.dedup import strip_dup_substrings

    return strip_dup_substrings(
        spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark),
        k=8,
        min_count=2,
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (operators/bpe.py) — the learned-merge loop of
# Sennrich et al. 2016 over the corpus word-frequency table.  The
# DuckDB oracle replays the SAME framed-string formulation (regexp
# encode + one literal replace per merge) as a generated CTE chain, so
# the learned merge table — pair identity, order, AND counts — is
# bit-exact cross-engine.
_BPE_WF_SQL = r"""
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY word
"""


def _bpe_ctes(iters: int) -> str:
    parts = [
        f"wf AS ({_BPE_WF_SQL})",
        "w0 AS (SELECT word, regexp_replace(word, '(.)',"
        " chr(2) || '\\1' || chr(3), 'g') AS w, freq FROM wf)",
    ]
    for k in range(iters):
        parts.append(
            f"p{k} AS (SELECT syms[i] AS a, syms[i+1] AS b,"
            f" SUM(freq) AS cnt"
            f" FROM (SELECT freq, string_split(substr(w, 2, length(w) - 2),"
            f" chr(3) || chr(2)) AS syms FROM w{k}),"
            f" UNNEST(generate_series(1, len(syms) - 1)) AS t(i)"
            f" GROUP BY 1, 2)"
        )
        parts.append(
            f"b{k} AS (SELECT a, b, cnt FROM p{k}"
            f" ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)"
        )
        parts.append(
            f"w{k + 1} AS (SELECT word, replace(w,"
            f" chr(2) || b{k}.a || chr(3) || chr(2) || b{k}.b || chr(3),"
            f" chr(2) || b{k}.a || b{k}.b || chr(3)) AS w, freq"
            f" FROM w{k}, b{k})"
        )
        parts.append(
            f"m{k} AS (SELECT CAST({k} AS BIGINT) AS step,"
            f' a AS "left", b AS "right",'
            f" CAST(cnt AS BIGINT) AS pair_freq FROM b{k})"
        )
    return ", ".join(parts)


_BPE_ITERS = 8


def _bpe_merges_sql(iters: int = _BPE_ITERS) -> str:
    union = " UNION ALL ".join(f"SELECT * FROM m{k}" for k in range(iters))
    return f"WITH {_bpe_ctes(iters)} {union}"


@register("bpe_merges", _bpe_merges_sql())
def bpe_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 8 BPE merges from the documents corpus
    (operators/bpe.py::train_bpe): one corpus pass to the word-freq
    table, then per round one map-side-combinable pair count over the
    VOCAB (never the corpus) + a 1-row argmax collect + a literal
    whole-stage-codegen replace.  Result emitted as JVM literal
    structs (config-sized)."""
    from news_please_spark.operators.bpe import train_bpe, word_freqs

    docs = spread(load(spark, sf_dir, "documents").select("text"), spark)
    merges = train_bpe(word_freqs(docs), num_merges=_BPE_ITERS)
    rows = [
        F.struct(
            F.lit(m["step"]).cast("long").alias("step"),
            F.lit(m["left"]).alias("left"),
            F.lit(m["right"]).alias("right"),
            F.lit(int(m["pair_freq"])).cast("long").alias("pair_freq"),
        )
        for m in merges
    ]
    if not rows:
        return spark.createDataFrame(
            [], "step long, left string, right string, pair_freq long"
        )
    return spark.range(1).select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.*")


def _bpe_encode_sql(iters: int = _BPE_ITERS) -> str:
    return f"""
    WITH {_bpe_ctes(iters)},
    enc AS (
      SELECT word,
             CAST(len(string_split(substr(w, 2, length(w) - 2),
                                   chr(3) || chr(2))) AS BIGINT) AS n
      FROM w{iters}
    ),
    dw AS (
      SELECT doc_id, word
      FROM (SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
            FROM documents)
      WHERE word <> ''
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ws_tokens,
           CAST(SUM(enc.n) AS BIGINT) AS bpe_tokens
    FROM dw JOIN enc USING (word) GROUP BY doc_id
    """


@register("bpe_encode", _bpe_encode_sql())
def bpe_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the 8 learned merges
    (operators/bpe.py::bpe_token_counts): re-tokenize, encode each
    occurrence through the chained literal replaces, sum symbol
    counts — the train->encode round trip, proving the learned merges
    actually compress the corpus they were learned from."""
    from news_please_spark.operators.bpe import (
        bpe_token_counts,
        train_bpe,
        word_freqs,
    )

    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "text"), spark
    )
    merges = train_bpe(word_freqs(docs), num_merges=_BPE_ITERS)
    return bpe_token_counts(docs, merges)


@register(
    "dsir_select",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    f AS (
      SELECT doc_id, unnest(toks) AS feat FROM t
      UNION ALL
      SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1])) AS feat
      FROM t WHERE len(toks) >= 2
    ),
    hb AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(feat), 1, 8))::BIGINT % 512 AS BIGINT) AS bucket
      FROM f
    ),
    tb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM hb
           WHERE doc_id % 13 = 0 GROUP BY bucket),
    rb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM hb
           WHERE doc_id % 13 <> 0 GROUP BY bucket),
    tot AS (SELECT COALESCE((SELECT CAST(sum(c) AS BIGINT) FROM tb), 0) AS tt,
                   COALESCE((SELECT CAST(sum(c) AS BIGINT) FROM rb), 0) AS rt),
    g AS (SELECT unnest(range(0, 512)) AS bucket),
    m AS (
      SELECT g.bucket,
             ((1000000000 * (COALESCE(tb.c, 0) + 1)) // (tot.tt + 512) * 1000000)
             // ((1000000000 * (COALESCE(rb.c, 0) + 1)) // (tot.rt + 512)) AS llr
      FROM g LEFT JOIN tb ON g.bucket = tb.bucket
             LEFT JOIN rb ON g.bucket = rb.bucket
             CROSS JOIN tot
    ),
    w AS (
      SELECT hb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
             CAST(sum(m.llr) AS BIGINT) AS dsir_q
      FROM hb JOIN m ON hb.bucket = m.bucket
      WHERE hb.doc_id % 13 <> 0
      GROUP BY hb.doc_id
    ),
    k AS (SELECT CAST((count(*) * 25 + 99) // 100 AS BIGINT) AS k FROM w)
    SELECT doc_id, n_feats, dsir_q,
           CAST((row_number() OVER (ORDER BY dsir_q DESC, doc_id)) <= k.k AS INT)
             AS selected
    FROM w CROSS JOIN k
    """,
)
def dsir_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/dsir.py, Xie et al. NeurIPS 2023
    in integer-exact surrogate form): target = every 13th document (the
    stand-in trusted corpus), raw = the rest; fit hashed unigram+bigram
    models in ONE tagged-union pass (only 2x512 bucket keys shuffle),
    score raw documents with a ZERO-shuffle constant-folded literal-
    array fold, flag the global top 25% by (weight DESC, id) through
    the skew-safe histogram ranking.  The oracle recomputes the whole
    method the expensive way (unnest + joins + a global window)."""
    from news_please_spark.operators.dsir import dsir_select

    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "text"), spark
    )
    tgt = docs.filter(F.col("doc_id") % 13 == 0)
    raw = docs.filter(F.col("doc_id") % 13 != 0)
    return dsir_select(tgt, raw, frac_pct=25)


@register(
    "funnel_steps",
    r"""
    WITH u1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY 1),
    u2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN u1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > u1.t1
             AND e.ts <= u1.t1 + INTERVAL 86400 SECONDS
           GROUP BY 1),
    u3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN u2 USING (user_id) JOIN u1 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > u2.t2
             AND e.ts <= u1.t1 + INTERVAL 86400 SECONDS
           GROUP BY 1)
    SELECT u1.user_id,
           CAST(1 + CAST(t2 IS NOT NULL AS INT)
                  + CAST(t3 IS NOT NULL AS INT) AS INT) AS steps,
           t1, t2, t3
    FROM u1 LEFT JOIN u2 USING (user_id) LEFT JOIN u3 USING (user_id)
    """,
)
def funnel_steps_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view->click->purchase funnel within a 24h conversion
    window (operators/funnel.py::funnel_steps): ONE shuffle + a native-
    HOF fold over per-user sorted events, vs the oracle's textbook
    one-join-per-step chain — cross-engine equality proves the fold
    implements the min-per-step semantics (incl. strict-> tie rule and
    the window bound)."""
    from news_please_spark.operators.funnel import funnel_steps

    ev = spread(
        load(spark, sf_dir, "events").select("user_id", "ts", "event_type"),
        spark,
    )
    return funnel_steps(
        ev, ("view", "click", "purchase"), window_seconds=86400
    )


@register(
    "cohort_retention",
    r"""
    WITH cohorts AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS p
      FROM events
    ),
    joined AS (
      SELECT c.cohort,
             CAST(date_diff('day', c.cohort, a.p) // 7 AS INT) AS k,
             a.user_id
      FROM activity a JOIN cohorts c USING (user_id)
      WHERE a.p >= c.cohort
    ),
    counts AS (
      SELECT cohort, k, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
      FROM joined GROUP BY cohort, k
    ),
    sizes AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
      FROM cohorts GROUP BY cohort
    )
    SELECT cohort, k, n_active, n_cohort,
           CAST((n_active * 10000) // n_cohort AS BIGINT) AS retention_bp
    FROM counts JOIN sizes USING (cohort)
    """,
)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly signup-cohort retention in integer basis points
    (operators/retention.py::cohort_retention): per-user grain joins
    only (no broadcast assumption), ONE corpus-sized shuffle (the
    distinct (user, week) activity set), tiny (cohort, k) aggregation."""
    from news_please_spark.operators.retention import cohort_retention

    ev = spread(
        load(spark, sf_dir, "events").select("user_id", "ts", "event_type"),
        spark,
    )
    return cohort_retention(ev)


_ANCHOR_ARMS_SQL = " UNION ALL ".join(
    f"SELECT (doc_id*{m} + {a}) % n.n AS dst,"
    f" toks[{2 * j + 1}:{2 * j + 3}] AS anchor FROM t CROSS JOIN n"
    for j, (m, a) in enumerate(EDGE_PARAMS)
)


@register(
    "anchor_terms",
    rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    n AS (SELECT max(doc_id) + 1 AS n FROM documents),
    e AS ({_ANCHOR_ARMS_SQL}),
    occ AS (SELECT dst, unnest(anchor) AS term FROM e),
    c AS (SELECT dst, term, CAST(count(*) AS BIGINT) AS cnt
          FROM occ GROUP BY dst, term)
    SELECT dst AS dst_id, term, cnt, rk FROM (
      SELECT dst, term, cnt,
             CAST(row_number() OVER (
               PARTITION BY dst ORDER BY cnt DESC, term
             ) AS INT) AS rk
      FROM c
    ) WHERE rk <= 5
    """,
)
def anchor_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation over the derived webgraph
    (operators/graph.py::anchor_terms): each edge carries a
    deterministic 3-token slice of its SOURCE page as link text
    (slot j of EDGE_PARAMS reads tokens 2j+1..2j+3); per target, the
    top-5 incoming anchor terms by (count DESC, term) — the
    link-context signal search indexing and described-URL crawl
    prioritization use.  Counts collapse before ranking, so in-degree
    skew (everyone linking 'home' to the front page) never reaches the
    window."""
    from news_please_spark.operators.graph import anchor_terms

    docs = load(spark, sf_dir, "documents")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    toked = (
        spread(docs.select("doc_id", "text"), spark)
        .filter(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
        )
    )
    arms = [
        F.struct(
            ((F.col("doc_id") * m + a) % n).cast("long").alias("dst"),
            F.slice("toks", 2 * j + 1, 3).alias("anchor"),
        )
        for j, (m, a) in enumerate(EDGE_PARAMS)
    ]
    edges = toked.select(F.explode(F.array(*arms)).alias("e")).select(
        "e.dst", "e.anchor"
    )
    return anchor_terms(edges, docs)


def _zorder_oracle_sql() -> str:
    from news_please_spark.functions.zorder import quantize_sql, zorder_key_sql

    zk = zorder_key_sql(
        [
            quantize_sql("user_id", 0, 2048, 10),
            quantize_sql("date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))", 0, 31, 10),
        ],
        10,
    )
    return f"SELECT event_id, {zk} AS zkey FROM events"


@register("zorder_cluster", _zorder_oracle_sql())
def zorder_cluster_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering keys for the events table
    (functions/zorder.py + state.SnapshotCatalog.cluster_table):
    Morton-interleave of quantized (user_id, day) so min/max file
    pruning serves predicates on EITHER column after one rewrite —
    pure int64 shift/mask arithmetic inside whole-stage codegen,
    bit-identical to the DuckDB image emitted by zorder_key_sql.
    test_zorder.py demonstrates the skipping (thin-y box: linear
    layout touches every file, z-order a bounded curve-range set)."""
    from news_please_spark.functions.zorder import quantize, zorder_key

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
    zk = zorder_key(
        [quantize(F.col("user_id"), 0, 2048, 10), quantize(day, 0, 31, 10)],
        10,
    )
    return ev.select("event_id", zk.alias("zkey"))


@register(
    "corpus_report",
    r"""
    WITH t AS (
      SELECT source, lang, text,
             string_split_regex(trim(text), '\s+') AS toks,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents
    ),
    q AS (
      SELECT source, lang, fp,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(floor(10000.0 * length(regexp_replace(text, '[^a-z]', '', 'g'))
                  / length(text)) AS BIGINT) AS alpha_q,
             CAST(floor(10000.0 * len(list_filter(toks,
                    x -> x IN ('the', 'a', 'of', 'and'))) / len(toks))
                  AS BIGINT) AS stop_q
      FROM t
    ),
    stats AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(count(DISTINCT fp) AS BIGINT) AS n_uniq,
             CAST(sum(alpha_q) AS BIGINT) AS alpha_sum,
             CAST(sum(stop_q) AS BIGINT) AS stop_sum
      FROM q GROUP BY source
    ),
    tl AS (
      SELECT source, lang AS top_lang FROM (
        SELECT source, lang,
               row_number() OVER (
                 PARTITION BY source
                 ORDER BY count(*) DESC, lang ASC
               ) AS rk
        FROM q GROUP BY source, lang
      ) WHERE rk = 1
    )
    SELECT s.source, n_docs, total_tokens, n_uniq,
           CAST(((n_docs - n_uniq) * 10000) // n_docs AS BIGINT) AS dup_bp,
           CAST(alpha_sum // n_docs AS BIGINT) AS avg_alpha_q,
           CAST(stop_sum // n_docs AS BIGINT) AS avg_stop_q,
           top_lang
    FROM stats s JOIN tl USING (source)
    """,
)
def corpus_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health report (pipeline.py::corpus_report):
    volume, exact-dup basis points, average quantized quality signals,
    dominant language — one doc-level aggregation + one tiny
    (source, lang) count, per-source-grain joins only."""
    from news_please_spark.pipeline import corpus_report

    return corpus_report(
        spread(
            load(spark, sf_dir, "documents").select("source", "lang", "text"),
            spark,
        )
    )


@register(
    "fetch_schedule",
    """
    WITH u AS (
      SELECT 'h' || CAST(doc_id % 97 AS VARCHAR) AS host,
             'https://h' || CAST(doc_id % 97 AS VARCHAR) || '/p/'
               || CAST(doc_id AS VARCHAR) AS url,
             CAST(doc_id % 13 AS BIGINT) AS priority
      FROM documents
    ),
    d AS (
      SELECT DISTINCT 'h' || CAST(doc_id % 97 AS VARCHAR) AS host,
             CAST(1 + ((doc_id % 97) % 4) * 2 AS BIGINT) AS crawl_delay_s
      FROM documents WHERE (doc_id % 97) % 3 = 0
    ),
    r AS (
      SELECT u.host, u.url, u.priority,
             COALESCE(d.crawl_delay_s, 1) AS dly,
             CAST(row_number() OVER (
                    PARTITION BY u.host ORDER BY u.priority, u.url
                  ) - 1 AS BIGINT) AS slot
      FROM u LEFT JOIN d USING (host)
    )
    SELECT host, url, priority, slot,
           CAST(1000000 + slot * dly AS BIGINT) AS fetch_epoch
    FROM r
    """,
)
def fetch_schedule_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host fetch timetable (operators/ordering.py::fetch_timetable):
    admitted URLs + robots Crawl-delay directives → deterministic
    integer fetch epochs, one-at-a-time per host in (priority, url)
    order.  97 derived hosts, a third of them declaring delays of
    1/3/5/7 s, the rest on the 1 s default.  ONE data shuffle: the
    delays join and the slot window share the host hash partitioning."""
    from news_please_spark.operators.ordering import fetch_timetable

    docs = load(spark, sf_dir, "documents").select("doc_id")
    hn = (F.col("doc_id") % 97).cast("string")
    u = docs.select(
        F.concat(F.lit("h"), hn).alias("host"),
        F.concat(
            F.lit("https://h"), hn, F.lit("/p/"), F.col("doc_id").cast("string")
        ).alias("url"),
        (F.col("doc_id") % 13).cast("long").alias("priority"),
    )
    d = (
        docs.filter((F.col("doc_id") % 97) % 3 == 0)
        .select(
            F.concat(F.lit("h"), hn).alias("host"),
            (1 + ((F.col("doc_id") % 97) % 4) * 2)
            .cast("long")
            .alias("crawl_delay_s"),
        )
        .distinct()
    )
    return fetch_timetable(
        u, d, default_delay_s=1, start_epoch=1000000,
        order_cols=("priority", "url"),
    )


@register(
    "media_dup_stats",
    _SPAN_ROWS_SQL
    + """
    , m AS (
      SELECT 'm' || CAST((CAST(regexp_extract(media_ref, 'img://([0-9]+)/', 1) AS BIGINT) * 7
               + CAST(regexp_extract(media_ref, '/([0-9]+)$', 1) AS BIGINT)) % 41
               AS VARCHAR) AS media_key,
             doc_id, "offset" AS off
      FROM span_rows WHERE kind != 'text' AND media_ref IS NOT NULL
    ),
    g AS (
      SELECT media_key,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_spans,
             min(doc_id) AS canonical_doc
      FROM m GROUP BY media_key
      HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT g.media_key, g.n_docs, g.n_spans, g.canonical_doc,
           CAST(min(m.off) AS BIGINT) AS canonical_offset
    FROM g JOIN m ON g.media_key = m.media_key AND m.doc_id = g.canonical_doc
    GROUP BY g.media_key, g.n_docs, g.n_spans, g.canonical_doc
    """,
)
def media_dup_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc duplicate media over the interleaved span table
    (operators/spans.py::media_dedup): media spans keyed by a derived
    content identity (doc*7+j mod 41 — simulating 41 distinct assets
    reused corpus-wide, the logo/stock-photo shape), aggregated to
    (n_docs, n_spans, canonical occurrence).  Only (key, doc, offset)
    rows cross the one shuffle; canonical pick is min(struct) in the
    same aggregate."""
    from news_please_spark.operators.spans import media_dedup

    def _key(ref):
        doc = F.regexp_extract(ref, r"img://([0-9]+)/", 1).cast("long")
        j = F.regexp_extract(ref, r"/([0-9]+)$", 1).cast("long")
        return F.concat(F.lit("m"), ((doc * 7 + j) % 41).cast("string"))

    return media_dedup(
        _synth_spans_df(spark, sf_dir), content_key=_key, min_docs=2
    )


@register(
    "autothrottle",
    """
    WITH m AS (
      SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS host,
             CAST(100 + (doc_id % 331) * 3 AS BIGINT) AS latency_ms,
             (doc_id % 17) <> 0 AS ok
      FROM documents
    ),
    a AS (
      SELECT host,
             CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
             CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_bad,
             CAST(sum(CASE WHEN ok THEN latency_ms ELSE 0 END) AS BIGINT) AS lat_sum
      FROM m GROUP BY host
    ),
    p AS (
      SELECT DISTINCT 'h' || CAST(doc_id % 23 AS VARCHAR) AS host,
             CAST(200 + ((doc_id % 23) % 5) * 100 AS BIGINT) AS delay_ms
      FROM documents WHERE (doc_id % 23) % 2 = 0
    ),
    j AS (
      SELECT COALESCE(a.host, p.host) AS host,
             COALESCE(n_ok, 0) AS n_ok, COALESCE(n_bad, 0) AS n_bad,
             lat_sum, COALESCE(p.delay_ms, 1000) AS prev_d
      FROM a FULL OUTER JOIN p ON a.host = p.host
    ),
    c AS (
      SELECT host, n_ok, n_bad,
             CASE WHEN n_ok > 0 THEN CAST(lat_sum // n_ok AS BIGINT) END AS avg_ok_ms,
             prev_d,
             CASE WHEN n_ok > 0
                  THEN (prev_d + (lat_sum // n_ok) // 2) // 2 END AS cand
      FROM j
    )
    SELECT host, n_ok, n_bad, avg_ok_ms,
           CAST(least(greatest(
             CASE WHEN n_ok = 0 THEN prev_d
                  WHEN n_bad > 0 THEN greatest(cand, prev_d)
                  ELSE cand END, 150), 600) AS BIGINT) AS new_delay_ms
    FROM c
    """,
)
def autothrottle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scrapy-AutoThrottle cycle update (operators/ordering.py::
    autothrottle_update — the adaptive politeness mechanism the
    reference inherits from scrapy's AUTOTHROTTLE_* config): per-host
    fetch latencies + previous delays → next-cycle delay table, errors
    never decreasing a delay, clamp [150, 600] ms exercising both
    bounds.  23 derived hosts, even ones carrying a previous delay."""
    from news_please_spark.operators.ordering import autothrottle_update

    docs = load(spark, sf_dir, "documents").select("doc_id")
    hn = (F.col("doc_id") % 23).cast("string")
    metrics = docs.select(
        F.concat(F.lit("h"), hn).alias("host"),
        (100 + (F.col("doc_id") % 331) * 3).cast("long").alias("latency_ms"),
        (F.col("doc_id") % 17 != 0).alias("ok"),
    )
    prev = (
        docs.filter((F.col("doc_id") % 23) % 2 == 0)
        .select(
            F.concat(F.lit("h"), hn).alias("host"),
            (200 + ((F.col("doc_id") % 23) % 5) * 100)
            .cast("long")
            .alias("delay_ms"),
        )
        .distinct()
    )
    return autothrottle_update(
        metrics,
        prev,
        target_concurrency=2,
        start_delay_ms=1000,
        min_delay_ms=150,
        max_delay_ms=600,
    )


@register(
    "ccnet_buckets",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    bg AS (
      SELECT doc_id, unnest(list_transform(range(1, len(toks)), i ->
             {'w1': toks[i], 'w2': toks[i+1]}), recursive := true)
      FROM t WHERE len(toks) >= 2
    ),
    cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n2 FROM bg GROUP BY w1, w2),
    cp AS (SELECT w1, CAST(sum(n2) AS BIGINT) AS n1 FROM cb GROUP BY w1),
    model AS (
      SELECT cb.w1, cb.w2, (cb.n2 * 1000000) // cp.n1 AS pq
      FROM cb JOIN cp ON cb.w1 = cp.w1
    ),
    sc AS (
      SELECT b.doc_id, CAST(sum(m.pq) // count(*) AS BIGINT) AS score
      FROM bg b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
      GROUP BY b.doc_id
    ),
    sl AS (
      SELECT sc.doc_id, d.lang, sc.score
      FROM sc JOIN documents d ON sc.doc_id = d.doc_id
    ),
    h AS (SELECT lang, score, CAST(count(*) AS BIGINT) AS cnt FROM sl GROUP BY 1, 2),
    cum AS (
      SELECT lang, score,
             SUM(cnt) OVER (PARTITION BY lang ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY lang) AS n
      FROM h
    ),
    th AS (
      SELECT lang,
             CAST(min(CASE WHEN cum >= (n*33 + 99)//100 THEN score END) AS BIGINT) AS p33,
             CAST(min(CASE WHEN cum >= (n*66 + 99)//100 THEN score END) AS BIGINT) AS p66
      FROM cum GROUP BY lang
    )
    SELECT sl.doc_id, sl.lang, sl.score,
           CASE WHEN sl.score > th.p66 THEN 'head'
                WHEN sl.score > th.p33 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM sl JOIN th USING (lang)
    """,
)
def ccnet_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (operators/quality.py
    ::ccnet_buckets): bigram-LM scores split into PER-LANGUAGE terciles
    via the exact histogram-rank percentiles — the language-aware
    quality partition CCNet feeds to its filtered crawl.  Threshold
    table is one row per language (broadcast); scoring joins only on
    bigram keys."""
    from news_please_spark.operators.quality import ccnet_buckets

    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "lang", "text"), spark
    )
    return ccnet_buckets(docs)


@register(
    "stratified_sample",
    r"""
    WITH b AS (
      SELECT source, doc_id,
             greatest(COALESCE(CAST(n_chars AS BIGINT), 1), 1) AS w,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1 AS u
      FROM documents
    ),
    p AS (SELECT source, doc_id, w, (w * 4294967296) // u AS priority FROM b),
    top AS (
      SELECT source, doc_id, w, priority,
             CAST(row_number() OVER (
                    PARTITION BY source ORDER BY priority DESC, doc_id ASC
                  ) AS BIGINT) AS rk
      FROM p QUALIFY rk <= 21
    ),
    tau AS (
      SELECT source, CASE WHEN count(*) = 21 THEN min(priority) ELSE 0 END AS tau
      FROM top GROUP BY source
    )
    SELECT t.source, t.doc_id, t.w, t.priority, t.rk,
           CAST(greatest(t.w, tau.tau) AS BIGINT) AS w_est
    FROM top t JOIN tau USING (source) WHERE rk <= 20
    """,
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified priority sampling (operators/sampling.py::
    priority_sample_per_group): an independent Duffield-Lund-Thorup
    k=20 weight-proportional sample per source, with per-group
    Horvitz-Thompson weight estimates — per-group (k+1) selection runs
    through the salted top-k path, so no task ever sorts a whole
    source."""
    from news_please_spark.operators.sampling import priority_sample_per_group

    docs = load(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return priority_sample_per_group(docs, "n_chars", 20, "source")


@register(
    "sitemap_stale",
    """
    WITH s AS (
      SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
             CASE WHEN doc_id % 11 = 0 THEN NULL
                  ELSE 1700000000000000 + doc_id * 1000000 END AS lastmod_us
      FROM documents
    ),
    f AS (
      SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
             CAST(1700000000000000 + (doc_id - (doc_id % 5) + 2) * 1000000
                  AS BIGINT) AS fetched_us
      FROM documents WHERE doc_id % 3 <> 2
    ),
    j AS (
      SELECT s.url, CAST(s.lastmod_us AS BIGINT) AS lastmod_us, f.fetched_us,
             CASE WHEN f.fetched_us IS NULL THEN 'new'
                  WHEN s.lastmod_us IS NULL THEN 'nolastmod'
                  WHEN s.lastmod_us > f.fetched_us THEN 'stale' END AS reason
      FROM s LEFT JOIN f ON s.url = f.url
    )
    SELECT url, lastmod_us, fetched_us, reason FROM j WHERE reason IS NOT NULL
    """,
)
def sitemap_stale_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-lastmod refetch seeding (operators/recrawl.py::
    sitemap_stale): sitemap entries diffed against the store's fetch
    log — new / stale / no-lastmod URLs survive, provably-fresh ones
    drop.  Derived mix: a third of URLs never fetched, lastmod NULL on
    every 11th, staleness decided by exact epoch-microsecond compare."""
    from news_please_spark.operators.recrawl import sitemap_stale

    docs = load(spark, sf_dir, "documents").select("doc_id")
    base = F.lit(1700000000000000)
    sitemap = docs.select(
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
        F.when(
            F.col("doc_id") % 11 != 0, base + F.col("doc_id") * 1000000
        ).cast("long").alias("lastmod_us"),
    )
    fetch_log = docs.filter(F.col("doc_id") % 3 != 2).select(
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
        (base + (F.col("doc_id") - (F.col("doc_id") % 5) + 2) * 1000000)
        .cast("long")
        .alias("fetched_us"),
    )
    return sitemap_stale(sitemap, fetch_log)


@register(
    "url_dedup_key",
    r"""
    WITH u AS (
      SELECT doc_id,
             'https://' || CASE WHEN doc_id % 6 = 0 THEN 'www.' ELSE '' END ||
             'ex' || CAST((doc_id // 6) % 7 AS VARCHAR) || '.test/a/' ||
             CAST(doc_id // 6 AS VARCHAR) ||
             CASE doc_id % 6
               WHEN 0 THEN '?x=1&y=2'
               WHEN 1 THEN '?utm_source=feed&y=2&x=1'
               WHEN 2 THEN '?x=1&y=2#frag'
               WHEN 3 THEN '?fbclid=f' || CAST(doc_id AS VARCHAR) || '&x=1&y=2'
               WHEN 4 THEN ''
               ELSE '?ref=tw&gclid=g' || CAST(doc_id AS VARCHAR)
             END AS url
      FROM documents
    ),
    k AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS base FROM u),
    q AS (
      SELECT doc_id, url, base,
             list_sort(list_filter(
               string_split(regexp_extract(base, '\?([^#]*)', 1), '&'),
               kv -> kv <> '' AND NOT regexp_matches(
                 string_split(kv, '=')[1],
                 '^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref)$')
             )) AS kept
      FROM k
    )
    SELECT doc_id, url,
           regexp_extract(base, '^([a-z][a-z0-9+.-]*)://', 1) || '://' ||
           regexp_replace(lower(regexp_extract(base, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)), '^www\.', '') ||
           COALESCE(NULLIF(regexp_extract(base, '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)', 1), ''), '/') ||
           CASE WHEN len(kept) = 0 THEN '' ELSE '?' || array_to_string(kept, '&') END
             AS dedup_key
    FROM q
    """,
)
def url_dedup_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-aware URL dedup keying (functions/urls.py::
    canonical_url_with_query): tracking parameters (utm_*, fbclid,
    gclid, ...) stripped, survivors order-normalized, fragment and
    www. dropped — the keying for sites that genuinely address content
    through the query string. The derived mix makes 6 surface variants
    per page: variants 0-3 (param-order swap, utm/fbclid noise,
    fragment) collapse to one key, variants 4-5 (no query /
    all-tracking query) to another. Pure native Columns — rides the
    scan, zero shuffle."""
    from news_please_spark.functions.urls import canonical_url_with_query

    pid = F.expr("doc_id DIV 6")
    tail = (
        F.when(F.col("doc_id") % 6 == 0, F.lit("?x=1&y=2"))
        .when(F.col("doc_id") % 6 == 1, F.lit("?utm_source=feed&y=2&x=1"))
        .when(F.col("doc_id") % 6 == 2, F.lit("?x=1&y=2#frag"))
        .when(
            F.col("doc_id") % 6 == 3,
            F.concat(
                F.lit("?fbclid=f"),
                F.col("doc_id").cast("string"),
                F.lit("&x=1&y=2"),
            ),
        )
        .when(F.col("doc_id") % 6 == 4, F.lit(""))
        .otherwise(
            F.concat(
                F.lit("?ref=tw&gclid=g"), F.col("doc_id").cast("string")
            )
        )
    )
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 6 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("ex"),
        (pid % 7).cast("string"),
        F.lit(".test/a/"),
        pid.cast("string"),
        tail,
    )
    u = load(spark, sf_dir, "documents").select("doc_id", url.alias("url"))
    return u.select(
        "doc_id", "url", canonical_url_with_query(F.col("url")).alias("dedup_key")
    )


@register(
    "surt_key",
    r"""
    WITH b AS (
      SELECT doc_id,
             CAST((doc_id // 5) % 7 AS VARCHAR) AS h,
             CAST(doc_id // 5 AS VARCHAR) AS p
      FROM documents
    ),
    u AS (
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN 'HTTP://WWW.News.Ex' || h || '.test/Art/' || p || '?b=2&a=1'
               WHEN 1 THEN 'https://news.ex' || h || '.test:443/art/' || p
               WHEN 2 THEN 'http://ex' || h || '.test:8080/art/' || p
               WHEN 3 THEN 'https://m.news.ex' || h || '.test/art/' || p || '#frag'
               ELSE 'http://ex' || h || '.test/art/' || p
             END AS url
      FROM b
    ),
    l AS (SELECT doc_id, url, regexp_replace(lower(url), '#.*$', '') AS lu FROM u),
    hp AS (
      SELECT *, regexp_replace(
               regexp_extract(lu, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
               ':(80|443)$', '') AS hostport
      FROM l
    ),
    parts AS (
      SELECT doc_id, url,
             regexp_extract(hostport, '^([^:]*)', 1) AS name,
             regexp_extract(hostport, '(:[0-9]+)$', 1) AS port,
             COALESCE(NULLIF(regexp_extract(lu,
               '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)', 1), ''), '/') AS path,
             list_sort(list_filter(
               string_split(regexp_extract(lu, '\?([^#]*)', 1), '&'),
               kv -> kv <> '')) AS kept
      FROM hp
    )
    SELECT doc_id, url,
           array_to_string(
             list_reverse(string_split(regexp_replace(name, '^www\.', ''), '.')),
             ',')
           || port || ')' || path ||
           CASE WHEN len(kept) = 0 THEN ''
                ELSE '?' || array_to_string(kept, '&') END AS surt
    FROM parts
    """,
)
def surt_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT keying (functions/urls.py::surt_key) — the web-archive CDX
    index canonical key ('com,example,news)/art/7?a=1&b=2'): reversed
    lowercased host, www./default-port dropped, non-default port kept,
    query sorted. The derived mix exercises every rule: mixed case +
    www + unsorted query (variant 0), :443 dropped (1), :8080 kept
    (2), deep subdomain reversal + fragment (3), bare (4). Keys for the
    same site sort adjacently — the property that lets a sort-ordered
    10^10-row index table answer per-site range scans without a
    shuffle. Pure native Columns, rides the scan."""
    from news_please_spark.functions.urls import surt_key

    pid = F.expr("doc_id DIV 5")
    h = (pid % 7).cast("string")
    p = pid.cast("string")
    v = F.col("doc_id") % 5
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("HTTP://WWW.News.Ex"), h, F.lit(".test/Art/"), p,
                F.lit("?b=2&a=1"),
            ),
        )
        .when(
            v == 1,
            F.concat(F.lit("https://news.ex"), h, F.lit(".test:443/art/"), p),
        )
        .when(
            v == 2,
            F.concat(F.lit("http://ex"), h, F.lit(".test:8080/art/"), p),
        )
        .when(
            v == 3,
            F.concat(
                F.lit("https://m.news.ex"), h, F.lit(".test/art/"), p,
                F.lit("#frag"),
            ),
        )
        .otherwise(F.concat(F.lit("http://ex"), h, F.lit(".test/art/"), p))
    )
    u = load(spark, sf_dir, "documents").select("doc_id", url.alias("url"))
    return u.select("doc_id", "url", surt_key(F.col("url")).alias("surt"))


# ---------------------------------------------------------------------------
# k-means codebook training (Lloyd, fixed rounds, integer-exact)
def _kmeans_ctes(k: int = 8, iters: int = 2, dim: int = 64, scale: int = 1000, src: str = "embeddings") -> str:
    """Unrolled Lloyd rounds as CTEs: cI = codebook entering round I,
    aI = assignment under cI, mI = per-cluster integer means. Mirrors
    operators/clustering.py::kmeans_assign exactly (same md5-rank
    init, same strict-< / smallest-cluster tie rule, same
    floor(sum/count) mean, same empty-cluster carry-over)."""
    dist = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        "i -> (e.qv[i]-c.cv[i])*(e.qv[i]-c.cv[i])))"
    )
    parts = [
        f"""
    e AS (
      SELECT vec_id AS vid,
             list_transform(embedding::DOUBLE[],
               x -> CAST(floor(x*{scale}) AS BIGINT)) AS qv
      FROM {src}
    ),
    c0 AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(vid AS VARCHAR)), vid) - 1 AS cl,
             qv AS cv
      FROM (SELECT vid, qv FROM e
            ORDER BY md5(CAST(vid AS VARCHAR)), vid LIMIT {k})
    )"""
    ]
    for it in range(iters + 1):
        parts.append(f"""
    a{it} AS (
      SELECT vid, qv, cl, d FROM (
        SELECT *, row_number() OVER (PARTITION BY vid ORDER BY d, cl) AS rk
        FROM (SELECT e.vid, e.qv, c.cl, {dist} AS d
              FROM e CROSS JOIN c{it} c))
      WHERE rk = 1
    )""")
        if it == iters:
            break
        parts.append(f"""
    m{it} AS (
      SELECT cl, list_transform(generate_series(1, {dim}),
        i -> CAST(floor(CAST(list_sum(list_transform(qvs, q -> q[i])) AS DOUBLE)
                        / len(qvs)) AS BIGINT)) AS cv
      FROM (SELECT cl, list(qv) AS qvs FROM a{it} GROUP BY cl)
    ),
    c{it + 1} AS (
      SELECT c{it}.cl, COALESCE(m{it}.cv, c{it}.cv) AS cv
      FROM c{it} LEFT JOIN m{it} ON c{it}.cl = m{it}.cl
    )""")
    return "WITH " + ",".join(parts)


@register(
    "kmeans_clusters",
    _kmeans_ctes(k=8, iters=2)
    + """
    SELECT vid AS vec_id, CAST(cl AS INT) AS cluster, CAST(d AS BIGINT) AS dist_q
    FROM a2
    """,
)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means, 2 rounds, k=8, over integer-quantized
    embeddings (operators/clustering.py). The iterative codebook
    trainer behind real IVF/PQ/SemDeDup deployments (Jégou et al. 2011
    §III-A; Abbas et al. 2023 §3) — the repo's other quantizers use
    single-shot md5-rank codebooks; this refines them. Integer
    arithmetic end-to-end so both engines derive identical clusters:
    quantized elements, exact squared-L2, floor(sum/count) means.
    Scale: per round one zero-shuffle fold over the k·dim broadcast
    codebook + one (cluster, dim)-keyed agg (k·dim cells, map-side
    combinable); driver state is the codebook only."""
    from news_please_spark.operators.clustering import kmeans_assign

    e = spread(load(spark, sf_dir, "embeddings"), spark)
    out = kmeans_assign(e, k=8, iters=2)
    return out.select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.col("dist_q").cast("long").alias("dist_q"),
    )


_EMB_OUTLIER_SRC = (
    "(SELECT vec_id, CASE WHEN vec_id % 97 = 0 "
    "THEN list_transform(embedding::DOUBLE[], x -> x*3.0) "
    "ELSE embedding::DOUBLE[] END AS embedding FROM embeddings)"
)


@register(
    "embedding_outliers",
    _kmeans_ctes(k=8, iters=2, src=_EMB_OUTLIER_SRC)
    + """
    , s AS (SELECT cl, count(*) AS n, sum(d) AS sd FROM a2 GROUP BY 1)
    SELECT a2.vid AS vec_id, CAST(a2.cl AS INT) AS cluster,
           CAST(a2.d AS BIGINT) AS dist_q,
           a2.d * s.n > 2 * s.sd AS is_outlier
    FROM a2 JOIN s ON s.cl = a2.cl
    """,
)
def embedding_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier pruning
    (operators/clustering.py::centroid_outliers over kmeans_assign):
    flag vectors whose distance to their trained centroid exceeds 2x
    the cluster mean — the post-clustering noise gate (OCR garbage /
    off-distribution scrapes) in curation pipelines. Integer-exact via
    cross-multiplication (dist * n > 2 * sum_dist); the per-cluster
    stats are k rows joined back broadcast. Every vec_id % 97 == 0
    vector is scaled x3 in BOTH engines — the planted off-distribution
    class the gate must flag (the raw synthetic vectors are too
    uniform to have natural outliers: max dist/mean ~ 1.1)."""
    from news_please_spark.operators.clustering import (
        centroid_outliers,
        kmeans_assign,
    )

    e = spread(load(spark, sf_dir, "embeddings"), spark)
    dbl = F.col("embedding").cast("array<double>")
    aug = e.select(
        "vec_id",
        F.when(
            F.col("vec_id") % 97 == 0,
            F.transform(dbl, lambda x: x * F.lit(3.0)),
        )
        .otherwise(dbl)
        .alias("embedding"),
    )
    assigned = kmeans_assign(aug, k=8, iters=2).persist()
    out = centroid_outliers(assigned, factor=2)
    return out.select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.col("dist_q").cast("long").alias("dist_q"),
        "is_outlier",
    )


@register(
    "contam_spans",
    rf"""
    WITH nn AS (SELECT count(*) AS c FROM documents),
    d AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    planted AS (
      SELECT doc_id + (SELECT c FROM nn) AS doc_id,
             string_split_regex(trim(lower(text || ' planted trailer')), '\s+') AS toks
      FROM documents WHERE doc_id % 13 = 0
    ),
    bench AS (SELECT doc_id, {_G8} AS g8 FROM d WHERE doc_id % 13 = 0),
    corpus AS (
      SELECT doc_id, {_G8} AS g8 FROM d WHERE doc_id % 13 != 0
      UNION ALL
      SELECT doc_id, {_G8} AS g8 FROM planted
    ),
    cgp AS (
      SELECT doc_id, unnest(generate_series(1, len(g8))) AS pos,
             unnest(g8) AS gram
      FROM corpus
    ),
    bg AS (SELECT DISTINCT gram FROM (SELECT unnest(list_distinct(g8)) AS gram FROM bench)),
    m AS (SELECT doc_id, pos FROM cgp JOIN bg USING (gram)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS brk
      FROM m
    ),
    ids AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 7 AS BIGINT) AS span_end,
           CAST(max(pos) - min(pos) + 8 AS BIGINT) AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_grams
    FROM ids GROUP BY doc_id, island
    """,
)
def contam_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination span expansion (operators/decontam.py::
    contamination_spans): matched benchmark 8-grams merged into
    contiguous token spans per doc — the PaLM-style decontamination
    report unit. Same derived world as decontam_hits (bench = every
    13th doc + planted contaminated copies) so spans are non-trivial:
    planted docs yield one long full-document span, natural overlaps
    yield short islands. Only matched (doc, pos) rows — a sliver —
    ever shuffle; benchmark grams broadcast."""
    from news_please_spark.operators.decontam import contamination_spans

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    n = docs.count()
    bench = docs.filter(F.col("doc_id") % 13 == 0)
    planted = bench.select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" planted trailer")).alias("text"),
    )
    corpus = docs.filter(F.col("doc_id") % 13 != 0).unionByName(planted)
    out = contamination_spans(corpus, bench, n=8)
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
        F.col("n_grams").cast("long").alias("n_grams"),
    )


@register(
    "cdx_revisit",
    r"""
    WITH caps AS (
      SELECT doc_id, c.c AS capture,
             'http://ex' || CAST(doc_id % 7 AS VARCHAR) || '.test/art/'
               || CAST(doc_id AS VARCHAR) AS url,
             20240100000000 + doc_id*10 + c.c AS ts,
             CASE doc_id % 3
               WHEN 0 THEN 0
               WHEN 1 THEN c.c
               ELSE CASE WHEN c.c = 2 THEN 1 ELSE 0 END
             END AS version
      FROM documents, (SELECT unnest([0, 1, 2]) AS c) c
    ),
    d AS (
      SELECT doc_id, capture, url, ts,
             md5(url || '#v' || CAST(version AS VARCHAR)) AS digest,
             'test,ex' || CAST(doc_id % 7 AS VARCHAR) || ')/art/'
               || CAST(doc_id AS VARCHAR) AS urlkey
      FROM caps
    )
    SELECT doc_id, CAST(capture AS INT) AS capture, urlkey,
           CAST(ts AS BIGINT) AS ts, digest,
           CAST(CASE WHEN row_number() OVER w > 1 THEN 1 ELSE 0 END AS INT) AS revisit,
           CAST(min(ts) OVER w AS BIGINT) AS orig_ts
    FROM d
    WINDOW w AS (PARTITION BY urlkey, digest ORDER BY ts)
    """,
)
def cdx_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture index with revisit payload dedup
    (operators/cdx.py::cdx_index): three captures per URL with three
    payload-change classes — never changes (captures 1-2 become
    revisits of capture 0), changes every capture (no revisits),
    changes at the last capture (one revisit). revisit rank + orig_ts
    via ONE window keyed (urlkey, digest) — fixed-width keys, no
    payload bytes shuffle, no per-URL skew cell."""
    from news_please_spark.operators.cdx import cdx_index

    docs = spread(load(spark, sf_dir, "documents").select("doc_id"), spark)
    cap = F.col("capture")
    did = F.col("doc_id")
    caps = docs.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("capture")
    )
    url = F.concat(
        F.lit("http://ex"), (did % 7).cast("string"), F.lit(".test/art/"),
        did.cast("string"),
    )
    version = (
        F.when(did % 3 == 0, F.lit(0))
        .when(did % 3 == 1, cap)
        .otherwise(F.when(cap == 2, F.lit(1)).otherwise(F.lit(0)))
    )
    d = caps.select(
        "doc_id",
        cap.cast("int").alias("capture"),
        url.alias("url"),
        (F.lit(20240100000000) + did * 10 + cap).cast("long").alias("ts"),
        F.md5(F.concat(url, F.lit("#v"), version.cast("string"))).alias("digest"),
    )
    out = cdx_index(d)
    return out.select(
        "doc_id", "capture", "urlkey", "ts", "digest",
        F.col("revisit").cast("int").alias("revisit"),
        F.col("orig_ts").cast("long").alias("orig_ts"),
    )


@register(
    "ngram_diversity",
    r"""
    WITH d AS (
      SELECT source, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT source,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                   i -> toks[i] || ' ' || toks[i+1])) AS gram
      FROM d
    ),
    c AS (SELECT source, gram, count(*) AS c FROM g GROUP BY 1, 2),
    a AS (
      SELECT source, sum(c) AS slots, count(*) AS types,
             sum(c*(c-1)) AS coll
      FROM c GROUP BY 1
    )
    SELECT source, CAST(slots AS BIGINT) AS slots,
           CAST(types AS BIGINT) AS types,
           CAST(types * 10000 // slots AS BIGINT) AS ttr_bp,
           CAST(CASE WHEN slots > 1
                     THEN 10000 - (coll * 10000 // (slots * (slots - 1)))
                     ELSE 10000 END AS BIGINT) AS simpson_bp
    FROM a
    """,
)
def ngram_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram diversity (operators/stats.py::ngram_diversity):
    type-token ratio + Simpson diversity in basis points, exact integer
    arithmetic (rational metrics — no transcendental knife-edges in the
    oracle gate). One map-side-combinable (source, gram) count shuffle;
    the per-source reduce sees |distinct grams| rows, never raw text."""
    from news_please_spark.operators.stats import ngram_diversity

    docs = spread(load(spark, sf_dir, "documents").select("source", "text"), spark)
    out = ngram_diversity(docs, n=2)
    return out.select(
        "source",
        F.col("slots").cast("long").alias("slots"),
        F.col("types").cast("long").alias("types"),
        F.col("ttr_bp").cast("long").alias("ttr_bp"),
        F.col("simpson_bp").cast("long").alias("simpson_bp"),
    )


@register(
    "rp_project",
    r"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> CAST(floor(x*1000) AS BIGINT)) AS qv
      FROM embeddings
    )
    SELECT vec_id, CAST(j.j AS INT) AS dim,
           CAST(list_sum(list_transform(generate_series(1, 64),
             i -> qv[i] * CASE WHEN substr(md5(CAST(j.j AS VARCHAR) || '_'
                                            || CAST(i AS VARCHAR)), 1, 1) < '8'
                          THEN 1 ELSE -1 END)) AS BIGINT) AS y
    FROM e, (SELECT unnest(generate_series(0, 15)) AS j) j
    """,
)
def rp_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rademacher random projection 64→16
    (operators/similarity.py::random_project, Achlioptas 2001):
    integer-exact JL reduction — signs from md5 hex (first char < '8'
    is exactly half the alphabet), quantized inputs, so both engines
    derive identical projections. Sign matrix is 16·64 literals in
    the plan (bounded at any corpus size); projection rides the scan,
    zero shuffle."""
    from news_please_spark.operators.similarity import random_project

    e = spread(load(spark, sf_dir, "embeddings"), spark)
    out = random_project(e, out_dim=16, in_dim=64)
    return out.select(
        "vec_id",
        F.col("dim").cast("int").alias("dim"),
        F.col("y").cast("long").alias("y"),
    )


@register(
    "curriculum_order",
    """
    SELECT doc_id, source,
           CAST(row_number() OVER (
             ORDER BY md5('epoch0|' || CAST(doc_id AS VARCHAR)), doc_id) - 1
             AS BIGINT) AS epoch_pos
    FROM documents
    """,
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-shuffle training order
    (operators/ordering.py::epoch_shuffle): md5(seed|id) sort key =
    reproducible full shuffle, so any reader prefix sees sources in
    mixture proportion; position attached via the two-phase numbering
    (range shuffle + broadcast offsets), never a one-task window."""
    from news_please_spark.operators.ordering import epoch_shuffle

    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "source"), spark
    )
    return epoch_shuffle(docs).select(
        "doc_id", "source", F.col("epoch_pos").cast("long").alias("epoch_pos")
    )


@register(
    "politeness_audit",
    """
    WITH f AS (
      SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) AS host,
             doc_id*3 + (doc_id % 5) AS ts
      FROM documents
    ),
    d AS (
      SELECT DISTINCT 'h' || CAST(doc_id % 7 AS VARCHAR) AS host,
             20 + ((doc_id % 7) % 5)*2 AS crawl_delay
      FROM documents WHERE doc_id % 7 != 6
    ),
    g AS (
      SELECT host, ts - lag(ts) OVER (PARTITION BY host ORDER BY ts) AS gap
      FROM f
    )
    SELECT g.host, CAST(count(*) AS BIGINT) AS fetches,
           CAST(sum(CASE WHEN gap < crawl_delay THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           CAST(min(gap) AS BIGINT) AS min_gap,
           CAST(min(crawl_delay) AS BIGINT) AS crawl_delay
    FROM g LEFT JOIN d USING (host) GROUP BY g.host
    """,
)
def politeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay conformance audit (operators/recrawl.py::
    crawl_delay_audit): per-host inter-fetch gaps vs the robots
    Crawl-delay — the report that closes the loop on
    fetch_schedule/autothrottle output. Derived world: 7 hosts with
    gaps straddling their declared delays; one host (h6) has no
    declared delay and must audit clean. ONE host-keyed lag window,
    one AQE-routed join to the robots-sized delay table."""
    from news_please_spark.operators.recrawl import crawl_delay_audit

    docs = spread(load(spark, sf_dir, "documents").select("doc_id"), spark)
    did = F.col("doc_id")
    host = F.concat(F.lit("h"), (did % 7).cast("string"))
    log = docs.select(
        host.alias("host"), (did * 3 + did % 5).cast("long").alias("ts")
    )
    delays = (
        docs.filter(did % 7 != 6)
        .select(
            host.alias("host"),
            (20 + (did % 7 % 5) * 2).cast("long").alias("crawl_delay"),
        )
        .distinct()
    )
    out = crawl_delay_audit(log, delays)
    return out.select(
        "host",
        F.col("fetches").cast("long").alias("fetches"),
        F.col("violations").cast("long").alias("violations"),
        F.col("min_gap").cast("long").alias("min_gap"),
        F.col("crawl_delay").cast("long").alias("crawl_delay"),
    )


@register(
    "quality_calibrate",
    """
    WITH d AS (SELECT doc_id, source, n_chars AS score FROM documents),
    h AS (SELECT source, score, count(*) AS c FROM d GROUP BY 1, 2),
    cum AS (
      SELECT source, score,
             sum(c) OVER (PARTITION BY source ORDER BY score) - c AS below,
             sum(c) OVER (PARTITION BY source) AS n
      FROM h
    )
    SELECT d.doc_id, d.source, CAST(d.score AS BIGINT) AS score,
           CAST(below * 10000 // n AS BIGINT) AS pct_bp
    FROM d JOIN cum USING (source, score)
    """,
)
def quality_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source empirical-CDF calibration of a quality score
    (operators/quality.py::rank_calibrate) — one threshold, same
    meaning per source. Histogram-trick plan: the only data-sized
    shuffle is the (source, score) count; windows run over the
    histogram; data rejoins it AQE-routed."""
    from news_please_spark.operators.quality import rank_calibrate

    d = spread(
        load(spark, sf_dir, "documents").select(
            "doc_id", "source", F.col("n_chars").cast("long").alias("score")
        ),
        spark,
    )
    out = rank_calibrate(d, "source", "score")
    return out.select(
        "doc_id", "source",
        F.col("score").cast("long").alias("score"),
        F.col("pct_bp").cast("long").alias("pct_bp"),
    )


@register(
    "hard_negatives",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % 89 = 0),
    p AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neg_id,
             CAST(floor(10000 * (
               list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v)))
             )) AS BIGINT) AS sim_q
      FROM q, e WHERE q.vec_id <> e.vec_id
    ),
    band AS (SELECT * FROM p WHERE sim_q >= 4000 AND sim_q < 9000)
    SELECT query_id, neg_id, sim_q, CAST(rk AS INT) AS rk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_q DESC, neg_id) AS rk
      FROM band
    ) WHERE rk <= 5
    """,
)
def hard_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py::hard_negatives,
    DPR/ANCE recipe): per query, top-5 corpus vectors with quantized
    cosine in [4000, 9000) — confusable but below the near-dup band
    the dedup tier pairs at. Band filter sits below the ranking
    window (only in-band rows shuffle); queries broadcast, corpus
    never shuffled."""
    from news_please_spark.operators.similarity import hard_negatives

    e = spread(load(spark, sf_dir, "embeddings"), spark)
    q = e.filter(F.col("vec_id") % 89 == 0)
    out = hard_negatives(q, e, k=5, lo_q=4000, hi_q=9000)
    return out.select(
        "query_id", "neg_id",
        F.col("sim_q").cast("long").alias("sim_q"),
        F.col("rk").cast("int").alias("rk"),
    )


@register(
    "host_coverage",
    """
    WITH nn AS (SELECT count(*) AS c FROM documents),
    sm AS (
      SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) AS host,
             'http://h' || CAST(doc_id % 5 AS VARCHAR) || '.test/' ||
               CAST(doc_id AS VARCHAR) AS url
      FROM documents
    ),
    cr AS (
      SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) AS host,
             'http://h' || CAST(doc_id % 5 AS VARCHAR) || '.test/' ||
               CAST(doc_id AS VARCHAR) AS url
      FROM documents WHERE doc_id % 4 != 3
      UNION ALL
      SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) AS host,
             'http://h' || CAST(doc_id % 5 AS VARCHAR) || '.test/x' ||
               CAST(doc_id + (SELECT c FROM nn) AS VARCHAR) AS url
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT 'h9' AS host, 'http://h9.test/only' AS url
    ),
    s AS (SELECT DISTINCT host, url, 1 AS _s FROM sm),
    c AS (SELECT DISTINCT host, url, 1 AS _c FROM cr),
    j AS (SELECT COALESCE(s.host, c.host) AS host, s._s, c._c
          FROM s FULL OUTER JOIN c ON s.host = c.host AND s.url = c.url)
    SELECT host,
           CAST(sum(COALESCE(_s, 0)) AS BIGINT) AS known,
           CAST(sum(CASE WHEN _s IS NOT NULL AND _c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS crawled_known,
           CAST(CASE WHEN sum(COALESCE(_s, 0)) > 0
                THEN sum(CASE WHEN _s IS NOT NULL AND _c IS NOT NULL THEN 1 ELSE 0 END) * 10000
                     // sum(COALESCE(_s, 0))
                END AS BIGINT) AS coverage_bp,
           CAST(sum(COALESCE(_s, 0))
                - sum(CASE WHEN _s IS NOT NULL AND _c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing,
           CAST(sum(CASE WHEN _s IS NULL AND _c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS extra
    FROM j GROUP BY host
    """,
)
def host_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl completeness vs sitemap inventory
    (operators/recrawl.py::host_coverage): known / crawled_known /
    coverage_bp / missing / extra, with an uninventoried host (h9)
    reporting known=0 and NULL coverage. One full-outer (host, url)
    equi-join + map-side-combinable agg."""
    from news_please_spark.operators.recrawl import host_coverage

    docs = spread(load(spark, sf_dir, "documents").select("doc_id"), spark)
    n = docs.count()
    did = F.col("doc_id")
    host = F.concat(F.lit("h"), (did % 5).cast("string"))
    url = F.concat(F.lit("http://h"), (did % 5).cast("string"), F.lit(".test/"),
                   did.cast("string"))
    sitemap = docs.select(host.alias("host"), url.alias("url"))
    crawled = (
        docs.filter(did % 4 != 3).select(host.alias("host"), url.alias("url"))
        .unionByName(
            docs.filter(did % 10 == 0).select(
                host.alias("host"),
                F.concat(F.lit("http://h"), (did % 5).cast("string"),
                         F.lit(".test/x"), (did + n).cast("string")).alias("url"),
            )
        )
        .unionByName(
            docs.limit(1).select(
                F.lit("h9").alias("host"), F.lit("http://h9.test/only").alias("url")
            )
        )
    )
    return host_coverage(sitemap, crawled)


@register(
    "readability_scores",
    r"""
    WITH t AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 4 = 0
                          THEN '. Short one! Ok? Sentence ends.' ELSE '' END AS txt
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             greatest(len(string_split_regex(trim(lower(txt)), '\s+')), 1) AS n_words,
             greatest(len(list_filter(string_split_regex(txt, '[.!?]+'),
                                      s -> trim(s) <> '')), 1) AS n_sents,
             len(regexp_replace(txt, '[^A-Za-z]', '', 'g')) AS letters
      FROM t
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sents AS BIGINT) AS n_sents,
           CAST(floor(CAST(n_words*100 AS DOUBLE)/n_sents) AS BIGINT) AS words_per_sent_c,
           CAST(floor(CAST(letters*100 AS DOUBLE)/n_words) AS BIGINT) AS chars_per_word_c
    FROM m
    """,
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer readability surrogates (functions/text.py::
    readability_cols): words/sentences + centiword sentence length +
    centichar word length — the two axes every readability formula
    weighs, kept rational so curation thresholds are exact
    cross-engine. Sentence punctuation planted on every 4th doc so
    n_sents varies. Pure Columns riding the scan, zero shuffle."""
    from news_please_spark.functions.text import readability_cols

    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 0,
                   F.lit(". Short one! Ok? Sentence ends.")).otherwise(F.lit("")),
        ).alias("txt"),
    )
    return t.select("doc_id", *readability_cols(F.col("txt")))


@register(
    "quote_extract",
    r"""
    WITH t AS (
      SELECT doc_id,
             text || CASE
               WHEN doc_id % 5 = 0 THEN
                 ' He said "planted statement number ' || CAST(doc_id AS VARCHAR)
                 || ' for the record" and left. She replied "no further comment'
                 || ' on doc ' || CAST(doc_id AS VARCHAR) || '" firmly. A "no" came last.'
               ELSE '' END AS txt
      FROM documents
    ),
    q AS (
      SELECT doc_id,
             unnest(generate_series(1, len(qs))) AS quote_pos,
             unnest(qs) AS quote
      FROM (SELECT doc_id,
                   regexp_extract_all(txt, '"([^"]{10,400})"', 1) AS qs
            FROM t)
    )
    SELECT doc_id, CAST(quote_pos AS INT) AS quote_pos,
           CAST(length(quote) AS BIGINT) AS quote_len, quote
    FROM q
    """,
)
def quote_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct-quotation extraction (functions/text.py::quotes_of) —
    the news-NLP primitive behind who-said-what analytics. Planted
    two real quotes + one below-floor scare-quote on every 5th doc;
    the floor keeps the real quotes, drops the '"no"'. RE2-compatible
    group-1 extraction, linear negated-class body, zero shuffle
    (exploded to (doc, pos, quote) rows on the scan)."""
    from news_please_spark.functions.text import quotes_of

    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(' He said "planted statement number '),
                    F.col("doc_id").cast("string"),
                    F.lit(' for the record" and left. She replied "no further'
                          ' comment on doc '),
                    F.col("doc_id").cast("string"),
                    F.lit('" firmly. A "no" came last.'),
                ),
            ).otherwise(F.lit("")),
        ).alias("txt"),
    )
    return t.select(
        "doc_id", F.posexplode(quotes_of(F.col("txt"))).alias("_p", "quote")
    ).select(
        "doc_id",
        (F.col("_p") + 1).cast("int").alias("quote_pos"),
        F.length("quote").cast("long").alias("quote_len"),
        "quote",
    )


@register("dup_canonical", None)
def dup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exemplar per near-dup cluster
    (operators/dedup.py::canonical_per_cluster): keep the member the
    quality signal (n_chars here) ranks highest, ties to the smallest
    id — not the arbitrary min-id exemplar. max(struct) semigroup
    agg: no window, no per-cluster skew cell. Oracle: the
    dup_clusters reachability closure joined to n_chars with the same
    argmax rule."""
    from news_please_spark.operators.dedup import canonical_per_cluster

    clusters = QUERIES["dup_clusters"](spark, sf_dir)
    scores = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("score")
    )
    out = canonical_per_cluster(clusters, scores)
    return out.select(
        F.col("root").cast("long").alias("root"),
        F.col("canonical_id").cast("long").alias("canonical_id"),
        F.col("score").cast("long").alias("score"),
        F.col("members").cast("long").alias("members"),
    )


ORACLES["dup_canonical"] = f"""
    WITH RECURSIVE clusters AS (
{ORACLES["dup_clusters"]}
    ),
    j AS (
      SELECT c.root, c.doc_id, d.n_chars AS score
      FROM clusters c JOIN documents d USING (doc_id)
    ),
    ranked AS (
      SELECT root, doc_id, score,
             row_number() OVER (PARTITION BY root ORDER BY score DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY root) AS members
      FROM j
    )
    SELECT CAST(root AS BIGINT) AS root,
           CAST(doc_id AS BIGINT) AS canonical_id,
           CAST(score AS BIGINT) AS score,
           CAST(members AS BIGINT) AS members
    FROM ranked WHERE rk = 1
"""


@register(
    "vec_quantize",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
      SELECT vec_id, v,
             CAST(floor(1000000 * list_aggregate(
               list_transform(v, x -> abs(x)), 'max')) AS BIGINT) AS scale_q
      FROM e
    ),
    c AS (
      SELECT vec_id, scale_q, v,
             list_transform(v, x -> CASE WHEN scale_q > 0 THEN
               CAST(greatest(-127.0, least(127.0,
                 floor(x * 127 * 1000000 / scale_q + 0.5))) AS INT)
               ELSE 0 END) AS codes
      FROM s
    ),
    err AS (
      SELECT vec_id, scale_q, codes,
             CAST(floor(1000000 * list_sum(list_transform(
               generate_series(1, 64),
               i -> abs(v[i] - CAST(codes[i] AS DOUBLE) * scale_q
                               / (127 * 1000000))))) AS BIGINT) AS err_q
      FROM c
    )
    SELECT vec_id, CAST(j.j AS INT) AS dim, codes[j.j] AS code,
           scale_q, err_q
    FROM err, (SELECT unnest(generate_series(1, 64)) AS j) j
    """,
)
def vec_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization
    (operators/similarity.py::vec_quantize_int8, the faiss-SQ8
    scheme): per-vector max-abs scale, clamped round-half-up codes,
    L1 reconstruction-error audit column — the 4× storage cut before
    ANN at 10^10 vectors. Fixed-operation-order double arithmetic
    floored to integers, so both engines derive identical codes.
    Zero shuffle; exploded to (vec_id, dim, code) rows."""
    from news_please_spark.operators.similarity import vec_quantize_int8

    e = spread(load(spark, sf_dir, "embeddings"), spark)
    out = vec_quantize_int8(e)
    return out.select(
        "vec_id", F.posexplode("codes").alias("_p", "code"), "scale_q", "err_q"
    ).select(
        "vec_id",
        (F.col("_p") + 1).cast("int").alias("dim"),
        F.col("code").cast("int").alias("code"),
        F.col("scale_q").cast("long").alias("scale_q"),
        F.col("err_q").cast("long").alias("err_q"),
    )


@register(
    "reciprocal_links",
    f"""
    WITH base AS ({_EDGES_SQL}),
    planted AS (
      SELECT doc_id AS src,
             (doc_id*11 + 5) % (SELECT max(doc_id)+1 FROM documents) AS dst
      FROM documents WHERE doc_id % 97 = 0
    ),
    edges AS (
      SELECT src, dst FROM base
      UNION ALL SELECT src, dst FROM planted
      UNION ALL SELECT dst, src FROM planted
    ),
    keyed AS (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b,
             CASE WHEN src < dst THEN 1 ELSE 2 END AS dir
      FROM edges WHERE src <> dst
    )
    SELECT a, b FROM (
      SELECT a, b, count(DISTINCT dir) AS dirs FROM keyed GROUP BY a, b
    ) WHERE dirs = 2
    """,
)
def reciprocal_links_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-link (link-exchange) detection
    (operators/graph.py::reciprocal_links) over the derived webgraph
    plus planted mutual pairs on every 97th doc (the arithmetic graph
    has no organic reciprocity — verified: every m,a chain is
    unsolvable mod N). Canonical-key single-shuffle plan, no
    self-join."""
    from news_please_spark.operators.graph import reciprocal_links

    edges = derived_edges(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    seeds = docs.filter(F.col("doc_id") % 97 == 0)
    fwd = seeds.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 11 + 5) % n).alias("dst"),
    )
    all_edges = edges.unionByName(fwd).unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return reciprocal_links(all_edges)


def _kcore_ctes(k: int, rounds: int) -> str:
    parts = [f"""
    base AS ({_EDGES_SQL}),
    u0 AS (
      SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM base WHERE src <> dst
        UNION ALL
        SELECT dst AS a, src AS b FROM base WHERE src <> dst)
    )"""]
    for r in range(rounds):
        parts.append(f"""
    d{r} AS (SELECT a, count(*) AS deg FROM u{r} GROUP BY a),
    k{r} AS (SELECT a FROM d{r} WHERE deg >= {k}),
    u{r + 1} AS (
      SELECT u.a, u.b FROM u{r} u
      JOIN k{r} x ON u.a = x.a JOIN k{r} y ON u.b = y.a
    )""")
    return "WITH" + ",".join(parts)


@register(
    "kcore_peel",
    _kcore_ctes(k=6, rounds=3)
    + """
    SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
    FROM u3 GROUP BY a
    """,
)
def kcore_peel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round k-core peeling (operators/graph.py::kcore_peel,
    k=6, 3 peels) over the derived webgraph — the dense-core
    structural signal next to spam_mass. The arithmetic graph's
    undirected degrees straddle 6 (out-degree 3 + in-degree 2 or 7 by
    residue class), so each peel cascades non-trivially. Per round:
    one map-side-combinable degree agg + two semi-joins; static plan,
    no convergence polling."""
    from news_please_spark.operators.graph import kcore_peel

    edges = derived_edges(spark, sf_dir)
    out = kcore_peel(edges, k=6, rounds=3)
    return out.select("node", F.col("deg").cast("long").alias("deg"))


@register(
    "event_transitions",
    """
    WITH p AS (
      SELECT user_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_type,
             event_type AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, count(*) AS n
      FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2
    ),
    t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
           CAST(c.n * 10000 // t.tot AS BIGINT) AS p_bp
    FROM c JOIN t USING (from_type)
    """,
)
def event_transitions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions over per-user event streams
    (operators/funnel.py::event_transitions): (from, to, n, p_bp)
    with integer row-normalized probabilities. One user-keyed lag
    window + map-side pair counts + a broadcast totals join
    (|types|² rows at most)."""
    from news_please_spark.operators.funnel import event_transitions

    ev = spread(
        load(spark, sf_dir, "events").select("user_id", "ts", "event_type", "event_id"),
        spark,
    )
    out = event_transitions(ev, tiebreak_col="event_id")
    return out.select(
        "from_type", "to_type",
        F.col("n").cast("long").alias("n"),
        F.col("p_bp").cast("long").alias("p_bp"),
    )


@register(
    "frame_sample",
    """
    WITH vids AS (
      SELECT doc_id, 'vid://' || CAST(doc_id AS VARCHAR) AS media_ref,
             (doc_id % 10 + 1) * 2500 AS duration_ms
      FROM documents WHERE doc_id % 6 = 0
    )
    SELECT doc_id, media_ref, CAST(f.f AS BIGINT) AS frame_ms
    FROM vids, unnest(generate_series(0, greatest(duration_ms - 1, 0), 1000)) AS f(f)
    """,
)
def frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan
    (operators/multimodal.py::frame_sample_refs): one row per sampled
    timestamp at a fixed stride — the multimodal tier's plan stage;
    the frame grab itself stays the documented codec stub. Derived
    media world: every 6th doc is a video with duration
    (doc%10+1)·2.5 s so strides truncate at varied remainders.
    sequence + explode, zero shuffle."""
    from news_please_spark.operators.multimodal import frame_sample_refs

    did = F.col("doc_id")
    media = load(spark, sf_dir, "documents").filter(did % 6 == 0).select(
        "doc_id",
        F.concat(F.lit("vid://"), did.cast("string")).alias("media_ref"),
        F.lit("video").alias("kind"),
        F.struct(((did % 10 + 1) * 2500).cast("long").alias("duration_ms")).alias("meta"),
    )
    out = frame_sample_refs(media, every_ms=1000)
    return out.select(
        "doc_id", "media_ref", F.col("frame_ms").cast("long").alias("frame_ms")
    )


@register(
    "robots_diff",
    """
    WITH u AS (
      SELECT doc_id, doc_id % 7 AS k,
             'h' || CAST(doc_id % 7 AS VARCHAR) || '.test' AS host,
             CASE WHEN doc_id % 2 = 0
                  THEN '/sec/p' || CAST(doc_id AS VARCHAR)
                  ELSE '/pub/p' || CAST(doc_id AS VARCHAR) END AS path
      FROM documents
    ),
    v AS (
      SELECT host, k,
             NOT (k % 2 = 0 AND path LIKE '/sec%') AS old_ok,
             NOT (k % 3 = 0 AND path LIKE '/sec%') AS new_ok
      FROM u
    )
    SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
           CAST(sum(CASE WHEN old_ok AND NOT new_ok THEN 1 ELSE 0 END) AS BIGINT) AS to_deny,
           CAST(sum(CASE WHEN NOT old_ok AND new_ok THEN 1 ELSE 0 END) AS BIGINT) AS to_allow
    FROM v GROUP BY host
    """,
)
def robots_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots policy drift (sources/robots.py::robots_diff): two
    robots snapshots — old denies /sec on even hosts, new on
    hosts ≡ 0 (mod 3) — evaluated through the REAL RFC 9309
    parser+longest-match engine, then flip counts per host; the
    oracle states the verdicts arithmetically (the parser itself is
    oracled by robots_gate). Hosts 2, 4 flip /sec URLs to allow,
    host 3 flips them to deny."""
    from news_please_spark.sources.robots import parse_robots, robots_diff

    did = F.col("doc_id")
    urls = load(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (did % 7).cast("string"), F.lit(".test")).alias("host"),
        F.when(did % 2 == 0,
               F.concat(F.lit("/sec/p"), did.cast("string")))
        .otherwise(F.concat(F.lit("/pub/p"), did.cast("string"))).alias("path"),
    )
    hosts = spark.range(7).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias("host"),
        F.col("id").alias("k"),
    )
    txt_old = F.when(
        F.col("k") % 2 == 0, F.lit("User-agent: *\nDisallow: /sec")
    ).otherwise(F.lit("User-agent: *\nDisallow:"))
    txt_new = F.when(
        F.col("k") % 3 == 0, F.lit("User-agent: *\nDisallow: /sec")
    ).otherwise(F.lit("User-agent: *\nDisallow:"))
    rules_old = parse_robots(hosts.select("host", txt_old.alias("robots_txt")))
    rules_new = parse_robots(hosts.select("host", txt_new.alias("robots_txt")))
    out = robots_diff(urls, rules_old, rules_new)
    return out.select(
        "host",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("to_deny").cast("long").alias("to_deny"),
        F.col("to_allow").cast("long").alias("to_allow"),
    )


@register(
    "text_normalize",
    """
    WITH t AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 3 = 0 THEN
               ' “quoted” — it’s…' || chr(7) ||
               '  big   gap' || chr(10) || chr(10) || chr(10) || ' end '
             ELSE '' END AS txt
      FROM documents
    ),
    n0 AS (
      SELECT doc_id,
             translate(txt, '‘’“”–— ',
                       '''''"\"--  ') AS s
      FROM t
    ),
    n1 AS (SELECT doc_id, regexp_replace(s, '…', '...', 'g') AS s FROM n0),
    n2 AS (SELECT doc_id, regexp_replace(s, '[\\x00-\\x08\\x0B-\\x1F]', '', 'g') AS s FROM n1),
    n3 AS (SELECT doc_id, regexp_replace(s, '[ \\t]+', ' ', 'g') AS s FROM n2),
    n4 AS (SELECT doc_id, regexp_replace(s, ' ?\\n ?', chr(10), 'g') AS s FROM n3),
    n5 AS (SELECT doc_id, regexp_replace(s, '\\n{2,}', chr(10), 'g') AS s FROM n4)
    SELECT doc_id, regexp_replace(s, '^\\s+|\\s+$', '', 'g') AS norm
    FROM n5
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable text normalization (functions/text.py::normalize_text):
    pinned punctuation folding (curly quotes/dashes/ellipsis/NBSP),
    control-char drop, whitespace canonicalization — the C4-style
    pass that stops cosmetic variants defeating exact dedup;
    deliberately a pinned translate map rather than runtime-versioned
    NFKC. Messy decorations planted on every 3rd doc. Pure Column
    chain, zero shuffle."""
    from news_please_spark.functions.text import normalize_text

    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(" “quoted” — it’s…\x07"
                      "  big   gap\n\n\n end "),
            ).otherwise(F.lit("")),
        ).alias("txt"),
    )
    return t.select("doc_id", normalize_text(F.col("txt")).alias("norm"))


@register(
    "rendezvous_shards",
    """
    WITH h AS (
      SELECT DISTINCT 'h' || CAST(doc_id % 97 AS VARCHAR) || '.test' AS host
      FROM documents
    ),
    sh AS (SELECT unnest(range(9)) AS s),
    sc AS (
      SELECT host, s,
             ('0x' || substr(md5(host || '#' || CAST(s AS VARCHAR)), 1, 8))::BIGINT
               AS score
      FROM h CROSS JOIN sh
    ),
    r8 AS (
      SELECT host, s,
             row_number() OVER (PARTITION BY host ORDER BY score DESC, s) AS rn
      FROM sc WHERE s < 8
    ),
    r9 AS (
      SELECT host, s,
             row_number() OVER (PARTITION BY host ORDER BY score DESC, s) AS rn
      FROM sc
    )
    SELECT a.host,
           CAST(a.s AS BIGINT) AS shard8,
           CAST(b.s AS BIGINT) AS shard9,
           CAST(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END AS BIGINT) AS moved
    FROM (SELECT * FROM r8 WHERE rn = 1) a
    JOIN (SELECT * FROM r9 WHERE rn = 1) b USING (host)
    """,
)
def rendezvous_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (HRW) host->shard placement
    (operators/ordering.py::hrw_shard): consistent crawler-fleet
    placement where resizing K -> K+1 moves only the hosts whose new
    shard's score wins — every mover lands on the NEW shard, E[1/(K+1)]
    of hosts move, nobody else's politeness state is disturbed (the
    resize story the snake-draft host_shards placement cannot offer).
    Entry computes the placement at K=8 and K=9 side by side plus the
    moved flag; both are map-side argmax folds over md5 scores — zero
    shuffle after the host distinct."""
    from news_please_spark.operators.ordering import hrw_shard

    hosts = (
        load(spark, sf_dir, "documents")
        .select(
            F.concat(
                F.lit("h"), (F.col("doc_id") % 97).cast("string"), F.lit(".test")
            ).alias("host")
        )
        .distinct()
    )
    s8 = hrw_shard(F.col("host"), 8)
    s9 = hrw_shard(F.col("host"), 9)
    return hosts.select(
        "host",
        s8.alias("shard8"),
        s9.alias("shard9"),
        (s8 != s9).cast("long").alias("moved"),
    )


@register(
    "redirect_chains",
    """
    WITH e AS (
      SELECT 'u' || CAST(doc_id AS VARCHAR) AS src,
             'u' || CAST(doc_id - 1 AS VARCHAR) AS dst
      FROM documents WHERE doc_id % 5 <> 0
    ),
    s0 AS (SELECT src AS u, dst AS cur, CAST(1 AS BIGINT) AS hops FROM e),
    s1 AS (
      SELECT a.u, coalesce(b.cur, a.cur) AS cur,
             a.hops + coalesce(b.hops, 0) AS hops
      FROM s0 a LEFT JOIN s0 b ON a.cur = b.u
    ),
    s2 AS (
      SELECT a.u, coalesce(b.cur, a.cur) AS cur,
             a.hops + coalesce(b.hops, 0) AS hops
      FROM s1 a LEFT JOIN s1 b ON a.cur = b.u
    ),
    s3 AS (
      SELECT a.u, coalesce(b.cur, a.cur) AS cur,
             a.hops + coalesce(b.hops, 0) AS hops
      FROM s2 a LEFT JOIN s2 b ON a.cur = b.u
    )
    SELECT u AS src, cur AS final_url, CAST(hops AS BIGINT) AS hops,
           CAST(CASE WHEN o.src IS NULL THEN 1 ELSE 0 END AS BIGINT) AS resolved
    FROM s3 LEFT JOIN (SELECT DISTINCT src FROM e) o ON s3.cur = o.src
    """,
)
def redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop redirect resolution
    (operators/graph.py::resolve_redirects): pointer doubling collapses
    every redirect chain to (src, final_url, hops, resolved) in
    ceil(log2 L) equi-join rounds — the set-oriented form of the
    reference's one-hop-per-response scrapy redirect keying (D4).
    Derived world: u(5k+j) -> u(5k+j-1) for j=1..4, so chains of length
    1-4 end at the u(5k) terminals; rounds=3 (covers 8 hops) shows the
    doubling is idempotent past convergence. The DuckDB oracle runs the
    SAME three doubling steps as self-join CTEs."""
    from news_please_spark.operators.graph import resolve_redirects

    did = F.col("doc_id")
    edges = (
        load(spark, sf_dir, "documents")
        .filter(did % 5 != 0)
        .select(
            F.concat(F.lit("u"), did.cast("string")).alias("src"),
            F.concat(F.lit("u"), (did - 1).cast("string")).alias("dst"),
        )
    )
    out = resolve_redirects(edges, rounds=3)
    return out.select(
        "src",
        "final_url",
        F.col("hops").cast("long").alias("hops"),
        F.col("resolved").cast("long").alias("resolved"),
    )


@register(
    "retry_schedule",
    """
    WITH log AS (
      SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, att.attempt,
             CASE WHEN att.attempt < (doc_id % 3) + 1 THEN 503
                  ELSE CASE doc_id % 6
                    WHEN 0 THEN 200 WHEN 1 THEN 500 WHEN 2 THEN 503
                    WHEN 3 THEN 404 WHEN 4 THEN 429 ELSE 302 END
             END AS status
      FROM documents,
           LATERAL (SELECT unnest(range(1, (doc_id % 3) + 2)) AS attempt) att
    ),
    per AS (
      SELECT url, CAST(count(*) AS BIGINT) AS n_attempts,
             CAST(max_by(status, attempt) AS BIGINT) AS last_status
      FROM log GROUP BY url
    ),
    v AS (
      SELECT *,
             last_status BETWEEN 200 AND 399 AS ok,
             last_status IN (408, 429, 500, 502, 503, 504, 522, 524)
               AND n_attempts <= 2 AS may_retry
      FROM per
    )
    SELECT url, n_attempts, last_status,
           CASE WHEN ok THEN 'done'
                WHEN may_retry THEN 'retry'
                ELSE 'give_up' END AS action,
           CASE WHEN NOT ok AND may_retry
                THEN CAST(least(500 * (1 << (n_attempts - 1)), 1500) AS BIGINT)
           END AS next_delay_ms
    FROM v
    """,
)
def retry_schedule_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-backoff retry planner
    (operators/recrawl.py::retry_schedule): the set-oriented image of
    scrapy's RetryMiddleware the reference fetches through — per-url
    done/retry/give_up verdicts with min(base << retries, cap) delays.
    Derived log: 1-3 attempts per url (earlier attempts 503), final
    status cycling {200,500,503,404,429,302} — exercises every verdict
    branch AND the delay cap (n_attempts=3 would owe 2000ms, capped at
    1500). One map-side-combinable groupBy; integer shift arithmetic
    both engines."""
    from news_please_spark.operators.recrawl import retry_schedule

    did = F.col("doc_id")
    final_status = (
        F.when(did % 6 == 0, 200)
        .when(did % 6 == 1, 500)
        .when(did % 6 == 2, 503)
        .when(did % 6 == 3, 404)
        .when(did % 6 == 4, 429)
        .otherwise(302)
    )
    log = (
        load(spark, sf_dir, "documents")
        .select(
            F.concat(F.lit("u"), did.cast("string")).alias("url"),
            (did % 3 + 1).alias("_n"),
            final_status.alias("_fs"),
        )
        .select(
            "url",
            F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("attempt"),
            "_n",
            "_fs",
        )
        .select(
            "url",
            "attempt",
            F.when(F.col("attempt") < F.col("_n"), 503)
            .otherwise(F.col("_fs"))
            .alias("status"),
        )
    )
    return retry_schedule(
        log, max_retries=2, base_delay_ms=500, max_delay_ms=1_500
    )


@register(
    "line_dedup",
    """
    WITH t AS (
      SELECT doc_id,
             text || chr(10) || 'Subscribe to our newsletter.' ||
             CASE WHEN doc_id % 3 = 0
                  THEN chr(10) || 'Share   on social media.' ELSE '' END ||
             CASE WHEN doc_id % 3 = 1
                  THEN chr(10) || '  share on SOCIAL media.' ELSE '' END ||
             chr(10) || 'ref ' || CAST(doc_id AS VARCHAR) AS txt
      FROM documents
    ),
    l AS (
      SELECT doc_id, i AS pos, ls[i] AS line, trim(lower(ls[i])) AS norm
      FROM (SELECT doc_id, string_split(txt, chr(10)) AS ls FROM t),
           LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS i)
    ),
    m AS (SELECT *, CASE WHEN norm <> '' THEN md5(norm) END AS h FROM l),
    r AS (
      SELECT doc_id, pos, line,
             CASE WHEN h IS NULL THEN 1
                  ELSE row_number() OVER (PARTITION BY h ORDER BY doc_id, pos)
             END AS rn
      FROM m
    )
    SELECT doc_id,
           md5(coalesce(string_agg(CASE WHEN rn = 1 THEN line END,
                                   chr(10) ORDER BY pos), '')) AS clean_md5,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
    FROM r GROUP BY doc_id
    """,
)
def line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus paragraph dedup
    (operators/repetition.py::corpus_line_dedup): across the whole
    corpus, every occurrence of a normalized (lower+trim) line except
    the globally first by (doc, pos) is removed — the single pass that
    strips web boilerplate without per-site rules. Planted lines: a
    subscribe banner on EVERY doc plus two cosmetic variants of a
    share banner (case/whitespace differences dedupe via trim+lower —
    note '   ' inner runs do NOT fold, so the two share variants stay
    distinct lines). No broadcast of the duplicate set anywhere: the
    canonical copy per hash is a map-side-combinable min(struct)
    aggregate + co-keyed hash join (the 100-TB-safe shape; a
    PARTITION BY hash window would put one banner's 10^9 occurrences
    on one reducer)."""
    from news_please_spark.operators.repetition import corpus_line_dedup

    did = F.col("doc_id")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nSubscribe to our newsletter."),
            F.when(did % 3 == 0, F.lit("\nShare   on social media.")).otherwise(
                F.lit("")
            ),
            F.when(did % 3 == 1, F.lit("\n  share on SOCIAL media.")).otherwise(
                F.lit("")
            ),
            F.lit("\nref "),
            did.cast("string"),
        ).alias("text"),
    )
    out = corpus_line_dedup(docs)
    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("clean_md5"),
        F.col("n_removed").cast("long").alias("n_removed"),
    )


@register(
    "mime_sniff",
    """
    WITH p AS (
      SELECT doc_id,
             CASE doc_id % 8
               WHEN 0 THEN '89504E470D0A1A0A'
               WHEN 1 THEN 'FFD8FFE0'
               WHEN 2 THEN '474946383961'
               WHEN 3 THEN '52494646AABBCCDD57454250'
               WHEN 4 THEN '52494646AABBCCDD57415645'
               WHEN 5 THEN '0000001866747970'
               WHEN 6 THEN '494433'
               ELSE 'DEADBEEF' END AS prefix
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             upper(substr(prefix || upper(md5(CAST(doc_id AS VARCHAR))), 1, 32))
               AS hx
      FROM p
    ),
    s AS (
      SELECT doc_id,
             CASE
               WHEN starts_with(hx, '89504E470D0A1A0A') THEN 'image/png'
               WHEN starts_with(hx, '474946383761') THEN 'image/gif'
               WHEN starts_with(hx, '474946383961') THEN 'image/gif'
               WHEN starts_with(hx, 'FFD8FF') THEN 'image/jpeg'
               WHEN starts_with(hx, '255044462D') THEN 'application/pdf'
               WHEN starts_with(hx, '1F8B') THEN 'application/gzip'
               WHEN starts_with(hx, '504B0304') THEN 'application/zip'
               WHEN starts_with(hx, '494433') THEN 'audio/mpeg'
               WHEN starts_with(hx, 'FFFB') THEN 'audio/mpeg'
               WHEN starts_with(hx, '4F676753') THEN 'audio/ogg'
               WHEN starts_with(hx, '3C21444F43545950') THEN 'text/html'
               WHEN starts_with(hx, '3C68746D6C') THEN 'text/html'
               WHEN starts_with(hx, '52494646') THEN
                 CASE substr(hx, 17, 8)
                   WHEN '57415645' THEN 'audio/wav'
                   WHEN '57454250' THEN 'image/webp'
                   WHEN '41564920' THEN 'video/x-msvideo'
                   ELSE 'application/octet-stream' END
               WHEN substr(hx, 9, 8) = '66747970' THEN 'video/mp4'
               ELSE 'application/octet-stream'
             END AS sniffed_mime
      FROM h
    )
    SELECT doc_id, sniffed_mime,
           CAST(CASE WHEN sniffed_mime <> 'image/png' THEN 1 ELSE 0 END
                AS BIGINT) AS mime_mismatch
    FROM s
    """,
)
def mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte payload-type sniffing
    (operators/multimodal.py::sniff_media): the WARC
    Identified-Payload-Type audit — detect the REAL media type from
    leading bytes and flag disagreement with the server-declared
    Content-Type the reference trusts at fetch time. Spark runs the
    operator on REAL binary payloads (unhex of a per-doc magic prefix
    + md5 filler — 8 signature classes incl. both RIFF discriminators,
    ISO-BMFF ftyp at offset 5, and an unknown class); the DuckDB
    oracle rebuilds the identical 32-hex-char stream and applies the
    same longest-prefix-first rules, so the match logic itself crosses
    engines. Zero shuffle — one hex + CASE chain riding the scan."""
    from news_please_spark.operators.multimodal import sniff_media

    did = F.col("doc_id")
    prefix = (
        F.when(did % 8 == 0, "89504E470D0A1A0A")
        .when(did % 8 == 1, "FFD8FFE0")
        .when(did % 8 == 2, "474946383961")
        .when(did % 8 == 3, "52494646AABBCCDD57454250")
        .when(did % 8 == 4, "52494646AABBCCDD57415645")
        .when(did % 8 == 5, "0000001866747970")
        .when(did % 8 == 6, "494433")
        .otherwise("DEADBEEF")
    )
    media = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.unhex(F.concat(prefix, F.upper(F.md5(did.cast("string"))))).alias(
            "data"
        ),
        F.lit("image/png").alias("declared"),
    )
    out = sniff_media(media, declared_col="declared")
    return out.select(
        "doc_id",
        "sniffed_mime",
        F.col("mime_mismatch").cast("long").alias("mime_mismatch"),
    )


@register(
    "collocations",
    r"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(
               text ||
               CASE WHEN doc_id % 2 = 0 THEN ' New York attracts tourists'
                    ELSE '' END ||
               CASE WHEN doc_id % 4 = 1 THEN ' new york again' ELSE '' END
             )), '\s+') AS ts
      FROM documents WHERE trim(text) <> ''
    ),
    pairs AS (
      SELECT ts[i] AS w1, ts[i + 1] AS w2
      FROM t, LATERAL (SELECT unnest(range(1, len(ts))) AS i)
    ),
    pc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
      FROM pairs GROUP BY w1, w2 HAVING count(*) >= 3
    ),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(ts) AS w FROM t) GROUP BY w
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uni)
    SELECT pc.w1, pc.w2, pc.n_pair,
           CAST((greatest(pc.n_pair - 5, 0) * tot.n_tok * 10000)
                // (ca.c * cb.c) AS BIGINT) AS score_q
    FROM pc
    JOIN uni ca ON pc.w1 = ca.w
    JOIN uni cb ON pc.w2 = cb.w
    CROSS JOIN tot
    """,
)
def collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2phrase collocation mining
    (operators/terms.py::phrase_scores, Mikolov et al. 2013 §4):
    discounted-lift scores max(c_ab-δ,0)·N·10^4 div (c_a·c_b) over
    adjacent pairs — the phrase-vocabulary step before tokenizer/
    embedding training. 'new york' planted on half the docs (plus a
    lowercase variant on a quarter) so a true collocation dominates;
    the numerator clamp keeps the integer division floor/truncate-
    agnostic so DuckDB's / with CAST matches Spark's div exactly.
    Pair and unigram counts are map-side combinable; the unigram
    joins are vocab-sized equi-joins; N rides a 1-row broadcast."""
    from news_please_spark.operators.terms import phrase_scores

    did = F.col("doc_id")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 2 == 0, F.lit(" New York attracts tourists")).otherwise(
                F.lit("")
            ),
            F.when(did % 4 == 1, F.lit(" new york again")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return phrase_scores(docs, delta=5, min_pair=3)


@register(
    "sitemap_xml_parse",
    """
    SELECT 'https://h' || CAST(doc_id % 50 AS VARCHAR) || '.example.com/sitemap.xml'
             AS sitemap_url,
           'https://h' || CAST(doc_id % 50 AS VARCHAR) || '.example.com/p/'
             || CAST(doc_id AS VARCHAR) AS entry_url,
           CAST(row_number() OVER (PARTITION BY doc_id % 50 ORDER BY doc_id) - 1
                AS INT) AS entry_index,
           '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod,
           'Story ' || CAST(doc_id AS VARCHAR) AS news_title,
           '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
             || 'T0' || CAST(doc_id % 10 AS VARCHAR) || ':00:00Z' AS news_pub_date
    FROM documents
    """,
)
def sitemap_xml_parse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 XML→rows step (sources/sitemap.parse_sitemap_xml) gated as a
    ROUND-TRIP: per-host Google-News sitemap XML is rendered from
    `documents` with native concat/aggregate Columns, the Arrow-batched
    xml.etree UDF parses it back, and the recovered rows must be
    value-identical to DuckDB deriving the same rows arithmetically
    (no XML on the oracle side — the parse is what's under test).
    Scale shape: one shuffle to group entries per sitemap file (the
    grain a fetcher naturally delivers), the parse itself is per-file
    map-only."""
    from news_please_spark.sources.sitemap import parse_sitemap_xml

    did = F.col("doc_id")
    host = F.concat(F.lit("https://h"), (did % 50).cast("string"), F.lit(".example.com"))
    lastmod = F.concat(
        F.lit("2026-01-"), F.lpad((did % 28 + 1).cast("string"), 2, "0")
    )
    frag = F.concat(
        F.lit("<url><loc>"),
        host,
        F.lit("/p/"),
        did.cast("string"),
        F.lit("</loc><lastmod>"),
        lastmod,
        F.lit("</lastmod><news:news><news:title>Story "),
        did.cast("string"),
        F.lit("</news:title><news:publication_date>"),
        lastmod,
        F.lit("T0"),
        (did % 10).cast("string"),
        F.lit(":00:00Z</news:publication_date></news:news></url>"),
    )
    bodies = (
        load(spark, sf_dir, "documents")
        .select(
            F.concat(host, F.lit("/sitemap.xml")).alias("sitemap_url"),
            F.struct(did.alias("doc_id"), frag.alias("frag")).alias("e"),
        )
        .groupBy("sitemap_url")
        .agg(
            F.concat(
                F.lit(
                    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
                    ' xmlns:news="http://www.google.com/schemas/sitemap-news/0.9">'
                ),
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list("e")), lambda x: x["frag"]
                    ),
                ),
                F.lit("</urlset>"),
            ).alias("body")
        )
    )
    return parse_sitemap_xml(bodies).select(
        "sitemap_url",
        "entry_url",
        "entry_index",
        "lastmod",
        "news_title",
        "news_pub_date",
    )


def _lpa_ctes(rounds: int) -> str:
    parts = [
        f"WITH edges AS ({_EDGES_SQL}),",
        "h AS (SELECT src AS a, dst AS b FROM edges WHERE src <> dst),",
        "und AS (SELECT a, b FROM h UNION SELECT b, a FROM h),",
        "l0 AS (SELECT DISTINCT a AS id, a AS label FROM und),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"v{r} AS (SELECT u.a, l.label, count(*) AS n"
            f" FROM und u JOIN l{r - 1} l ON l.id = u.b GROUP BY 1, 2),"
        )
        parts.append(
            f"l{r} AS (SELECT a AS id, min(label) AS label FROM ("
            f"SELECT a, label, n, max(n) OVER (PARTITION BY a) AS mx FROM v{r}"
            f") WHERE n = mx GROUP BY a),"
        )
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts)


@register(
    "lpa_communities",
    _lpa_ctes(rounds=3)
    + """
    SELECT CAST(id AS BIGINT) AS id, CAST(label AS BIGINT) AS label
    FROM l3
    """,
)
def lpa_communities_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities
    (operators/graph.py::label_propagation, 3 rounds, min-label
    tie-breaks) over the derived webgraph — the crawl-shard
    partitioning signal (keep a link community on one shard) next to
    rendezvous_shards' stateless placement. The DuckDB oracle unrolls
    the same three rounds as CTEs with a window-max argmax; Spark's
    per-round argmax is a max(struct(votes, -label)) semigroup
    aggregate, no Window anywhere."""
    from news_please_spark.operators.graph import label_propagation

    edges = derived_edges(spark, sf_dir)
    out = label_propagation(edges, rounds=3)
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.col("label").cast("long").alias("label"),
    )


# mojibake fixtures: real cp1252-double-decode artifacts planted on
# fixed residue classes (the characters below ARE the damage)
_MOJI_PLANT_LATIN = " cafÃ© Ã¼ber"
_MOJI_PLANT_PUNCT = " itâ€™s â€œq"
_MOJI_PLANT_C2 = " Â«qÂ»"


def _mojibake_sql() -> str:
    from news_please_spark.functions.text import (
        _MOJI_C2,
        _MOJI_LATIN,
        _MOJI_PUNCT,
    )

    return f"""
    WITH t AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 5 = 0 THEN '{_MOJI_PLANT_LATIN}' ELSE '' END
             || CASE WHEN doc_id % 7 = 1 THEN '{_MOJI_PLANT_PUNCT}' ELSE '' END
             || CASE WHEN doc_id % 11 = 2 THEN '{_MOJI_PLANT_C2}' ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_MOJI_LATIN}')) AS INT) AS moji_latin,
           CAST(len(regexp_extract_all(t, '{_MOJI_PUNCT}')) AS INT) AS moji_punct,
           CAST(len(regexp_extract_all(t, '{_MOJI_C2}')) AS INT) AS moji_c2,
           len(regexp_extract_all(t, '{_MOJI_LATIN}'))
             + len(regexp_extract_all(t, '{_MOJI_PUNCT}'))
             + len(regexp_extract_all(t, '{_MOJI_C2}')) > 0 AS damaged
    FROM t
    """


@register("mojibake_audit", _mojibake_sql())
def mojibake_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-artifact audit (functions/text.py::mojibake_counts):
    per-doc counts of cp1252-double-decode fingerprints (latin-letter
    block, punctuation block, stray C2) plus a damaged verdict, with
    real artifacts planted on fixed residue classes so every pattern
    class fires. The corpus-side complement of the S3 decode cascade
    (reference crawler/simple_crawler.py charset handling; our tree at
    sources/fetch.py:31): S3 prevents the damage at fetch time, this
    audits text that arrived already damaged. Zero shuffle — three
    regexp_extract_all sizes riding the scan."""
    from news_please_spark.functions.text import mojibake_counts

    did = F.col("doc_id")
    t = F.concat(
        F.col("text"),
        F.when(did % 5 == 0, F.lit(_MOJI_PLANT_LATIN)).otherwise(F.lit("")),
        F.when(did % 7 == 1, F.lit(_MOJI_PLANT_PUNCT)).otherwise(F.lit("")),
        F.when(did % 11 == 2, F.lit(_MOJI_PLANT_C2)).otherwise(F.lit("")),
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", t.alias("t"))
    c_lat, c_pun, c_c2 = mojibake_counts(F.col("t"))
    out = docs.select(
        "doc_id",
        c_lat.cast("int").alias("moji_latin"),
        c_pun.cast("int").alias("moji_punct"),
        c_c2.cast("int").alias("moji_c2"),
    )
    return out.withColumn(
        "damaged",
        (F.col("moji_latin") + F.col("moji_punct") + F.col("moji_c2")) > 0,
    )


_OPIC_EDGES_SQL = (
    _EDGES_SQL
    + " UNION ALL SELECT doc_id AS src,"
    " (doc_id*11 + 5) % (SELECT max(doc_id)+1 FROM documents) AS dst"
    " FROM documents WHERE doc_id % 3 = 0"
)


def _opic_ctes(rounds: int, scale: int = 1_000_000) -> str:
    parts = [
        f"WITH edges AS ({_OPIC_EDGES_SQL}),",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),",
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),",
        f"s0 AS (SELECT id, CAST({scale} AS BIGINT) AS cash,"
        " CAST(0 AS BIGINT) AS hist FROM nodes),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"f{r} AS (SELECT e.src, e.dst, s.cash // d.d AS amt"
            f" FROM edges e JOIN deg d USING (src)"
            f" JOIN s{r - 1} s ON s.id = e.src),"
        )
        parts.append(
            f"s{r} AS (SELECT n.id,"
            " n.cash - COALESCE(g.give, 0) + COALESCE(i.inflow, 0) AS cash,"
            " n.hist + COALESCE(g.give, 0) AS hist"
            f" FROM s{r - 1} n"
            f" LEFT JOIN (SELECT src, sum(amt) AS give FROM f{r} GROUP BY 1) g"
            " ON g.src = n.id"
            f" LEFT JOIN (SELECT dst, sum(amt) AS inflow FROM f{r} GROUP BY 1) i"
            " ON i.dst = n.id),"
        )
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts)


@register(
    "opic_scores",
    _opic_ctes(rounds=3)
    + """
    SELECT id, CAST(cash AS BIGINT) AS cash, CAST(hist AS BIGINT) AS history,
           CAST(cash + hist AS BIGINT) AS importance
    FROM s3
    """,
)
def opic_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC frontier prioritization (operators/graph.py::opic_scores,
    3 rounds, integer cash) over the derived webgraph with a fourth
    edge on every third node so out-degrees vary and floor-division
    remainders actually exercise. Cash conservation makes the scores
    engine-comparable; the DuckDB oracle unrolls the rounds with //
    floor division. Per round: one src-keyed join + two map-side
    combinable sums."""
    from news_please_spark.operators.graph import opic_scores

    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    extra = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 11 + 5) % n).alias("dst"),
    )
    edges = derived_edges(spark, sf_dir).unionByName(extra)
    out = opic_scores(edges, rounds=3)
    return out.select(
        "id",
        F.col("cash").cast("long").alias("cash"),
        F.col("history").cast("long").alias("history"),
        F.col("importance").cast("long").alias("importance"),
    )


_TRI_EDGES_SQL = (
    _EDGES_SQL
    + " UNION ALL SELECT doc_id AS src,"
    " (doc_id + 1) % (SELECT max(doc_id)+1 FROM documents) AS dst FROM documents"
    " UNION ALL SELECT doc_id AS src,"
    " (doc_id + 2) % (SELECT max(doc_id)+1 FROM documents) AS dst FROM documents"
)


@register(
    "triangle_counts",
    f"""
    WITH edges AS ({_TRI_EDGES_SQL}),
    h AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
          FROM edges WHERE src <> dst GROUP BY 1, 2),
    und AS (SELECT a, b FROM h UNION ALL SELECT b, a FROM h),
    deg AS (SELECT a, count(*) AS d FROM und GROUP BY 1),
    o AS (SELECT u.a AS u, u.b AS v, db.d AS dv
          FROM und u JOIN deg da ON da.a = u.a JOIN deg db ON db.a = u.b
          WHERE (da.d < db.d) OR (da.d = db.d AND u.a < u.b)),
    w AS (SELECT x.u, x.v AS p, y.v AS q
          FROM o x JOIN o y ON x.u = y.u
          AND ((x.dv < y.dv) OR (x.dv = y.dv AND x.v < y.v))),
    t AS (SELECT w.u, w.p, w.q FROM w
          WHERE EXISTS (SELECT 1 FROM o WHERE o.u = w.p AND o.v = w.q)),
    n AS (SELECT u AS node FROM t
          UNION ALL SELECT p FROM t UNION ALL SELECT q FROM t)
    SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM n GROUP BY 1
    """,
)
def triangle_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle counting
    (operators/graph.py::triangle_counts) over the derived webgraph
    plus two ring edges (doc_id+1, doc_id+2) so {x, x+1, x+2}
    triangles exist everywhere at any SF. Wedges only from the
    min-(deg,id) apex — the hub-safe orientation; the DuckDB oracle
    mirrors it with an EXISTS closing check."""
    from news_please_spark.operators.graph import triangle_counts

    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    ring = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array((F.col("doc_id") + 1) % n, (F.col("doc_id") + 2) % n)
        ).alias("dst"),
    )
    edges = derived_edges(spark, sf_dir).unionByName(ring)
    out = triangle_counts(edges)
    return out.select("node", F.col("n_tri").cast("long").alias("n_tri"))


@register(
    "containment_pairs",
    r"""
    WITH aug AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % 10 = 7 AND s.doc_id IS NOT NULL
                  THEN array_to_string(list_slice(
                         string_split_regex(trim(lower(s.text)), '\s+'), 1, 60), ' ')
                  ELSE d.text END AS text
      FROM documents d LEFT JOIN documents s ON s.doc_id = d.doc_id - 5
    ),
    t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM aug),
    w AS (SELECT doc_id,
                 CAST(greatest(ceil((len(toks) - 32) / 16.0) + 1, 1) AS INT) AS n_win,
                 toks
          FROM t),
    fps AS (SELECT DISTINCT doc_id,
                   md5(array_to_string(list_slice(toks, win * 16 + 1, win * 16 + 32), ' ')) AS fp
            FROM w, LATERAL (SELECT unnest(range(0, n_win)) AS win)),
    keepfp AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 64),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM fps a
             JOIN keepfp k ON k.fp = a.fp
             JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id),
    g0 AS (SELECT doc_id,
                  list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gs
           FROM t WHERE len(toks) >= 3),
    gr AS (SELECT doc_id, md5(gx) AS g FROM g0, LATERAL (SELECT unnest(gs) AS gx)),
    sz AS (SELECT doc_id, count(*) AS n FROM gr GROUP BY 1),
    inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
              FROM cand c
              JOIN gr ga ON ga.doc_id = c.doc_a
              JOIN gr gb ON gb.doc_id = c.doc_b AND gb.g = ga.g
              GROUP BY 1, 2),
    scored AS (
      SELECT c.doc_a, c.doc_b,
             CAST(floor(10000 * COALESCE(i.i, 0) / sa.n) AS BIGINT) AS cont_a_q,
             CAST(floor(10000 * COALESCE(i.i, 0) / sb.n) AS BIGINT) AS cont_b_q
      FROM cand c
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      JOIN sz sa ON sa.doc_id = c.doc_a
      JOIN sz sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, cont_a_q, cont_b_q,
           CASE WHEN cont_a_q >= 8000 AND cont_b_q >= 8000 THEN 'mutual'
                WHEN cont_a_q >= 8000 THEN 'a_in_b'
                WHEN cont_b_q >= 8000 THEN 'b_in_a' END AS relation
    FROM scored
    WHERE cont_a_q >= 8000 OR cont_b_q >= 8000
    """,
)
def containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment / syndication detection
    (operators/dedup.py::containment_pairs): every tenth doc becomes a
    60-token snippet of another doc — Jaccard-invisible (0.03-ish) but
    containment-10000 pairs the near-dup tier must NOT be trusted to
    catch. Candidates from shared rolling 32-token fingerprints with a
    stop-fingerprint cap; exact 3-gram containment both directions,
    basis points."""
    from news_please_spark.operators.dedup import containment_pairs

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    src = docs.select(
        (F.col("doc_id") + 5).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 60), " "
        ).alias("_snip"),
    )
    aug = docs.join(src, "doc_id", "left").select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 10 == 7) & F.col("_snip").isNotNull(),
            F.col("_snip"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return containment_pairs(aug)


@register(
    "kmv_overlap",
    r"""
    WITH t AS (
      SELECT source, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    g0 AS (SELECT source,
                  list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gs
           FROM t WHERE len(toks) >= 3),
    items AS (SELECT DISTINCT source AS g,
                     CAST(('0x' || substr(md5(gx), 1, 15)) AS BIGINT) AS h
              FROM g0, LATERAL (SELECT unnest(gs) AS gx)),
    counts AS (SELECT g, count(*) AS nd FROM items GROUP BY 1),
    cand AS (SELECT i.g, i.h, c.nd FROM items i JOIN counts c USING (g)
             WHERE c.nd <= 2048
                OR CAST(i.h AS DOUBLE) < 2361183241434822606848.0 / c.nd),
    sk AS (SELECT g, nd, list_slice(list_sort(list(h)), 1, 256) AS ks
           FROM cand GROUP BY 1, 2),
    p AS (SELECT a.g AS g_a, b.g AS g_b, a.ks AS ka, b.ks AS kb,
                 a.nd AS nd_a, b.nd AS nd_b
          FROM sk a JOIN sk b ON a.g < b.g),
    m AS (SELECT *, list_sort(list_distinct(list_concat(ka, kb))) AS u FROM p),
    m2 AS (SELECT *, least(256, len(u)) AS kk FROM m),
    m3 AS (SELECT *, u[kk] AS theta,
                  len(list_filter(list_intersect(ka, kb), x -> x <= u[kk])) AS shared,
                  len(list_intersect(ka, kb)) AS inter_ex,
                  (nd_a <= 256 AND nd_b <= 256) AS exh
           FROM m2),
    m4 AS (SELECT *,
                  CASE WHEN exh THEN CAST(len(u) AS BIGINT)
                       ELSE CAST(floor((kk - 1) * 1152921504606846976.0 / theta)
                                 AS BIGINT) END AS union_est
           FROM m3)
    SELECT g_a, g_b, CAST(kk AS INT) AS kk, CAST(shared AS INT) AS shared,
           union_est,
           CASE WHEN exh THEN CAST(floor(10000 * inter_ex / len(u)) AS BIGINT)
                ELSE CAST(floor(10000 * shared / kk) AS BIGINT) END AS jaccard_q,
           CASE WHEN exh THEN CAST(inter_ex AS BIGINT)
                ELSE CAST(floor(union_est * shared / kk) AS BIGINT) END AS inter_est
    FROM m4
    """,
)
def kmv_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content-overlap estimation from KMV/bottom-k
    sketches (operators/sketch.py::kmv_sketches + kmv_overlap_pairs,
    k=256) over per-source 3-gram shingle sets — the mergeable
    set-INTERSECTION estimator HLL cannot provide (register-max unions
    only). The corpus dedupes once on md5 gram keys, a threshold pass
    keeps ~2k survivors per source, and all pairwise math happens on
    <= 256-long arrays. Deterministic end to end, so the DuckDB oracle
    reproduces every estimate bit-for-bit."""
    from news_please_spark.operators.sketch import kmv_overlap_pairs, kmv_sketches

    docs = spread(load(spark, sf_dir, "documents").select("source", "text"), spark)
    from news_please_spark.operators.dedup import ngram_set

    items = docs.select(
        "source", F.explode(ngram_set(F.col("text"), 3)).alias("item")
    )
    sk = kmv_sketches(items, "item", "source", k=256)
    return kmv_overlap_pairs(sk, k=256)


@register(
    "span_integrity",
    _SPAN_ROWS_SQL
    + """
    , planted AS (
      SELECT doc_id, 'text' AS kind, 'dup span' AS text,
             CAST(NULL AS VARCHAR) AS media_ref, 0 AS "offset"
      FROM sc WHERE doc_id % 6 = 1
      UNION ALL
      SELECT doc_id, 'image', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 900
      FROM sc WHERE doc_id % 6 = 2
      UNION ALL
      SELECT doc_id, 'text', 'x', 'img://bad', 901
      FROM sc WHERE doc_id % 6 = 3
    ),
    allr AS (SELECT * FROM span_rows UNION ALL SELECT * FROM planted),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(count(*) - count(DISTINCT "offset") AS BIGINT) AS dup_offsets,
             CAST(max("offset") + 1 - count(DISTINCT "offset") AS BIGINT) AS gaps,
             CAST(sum(CASE WHEN kind <> 'text'
                            AND (media_ref IS NULL OR len(media_ref) = 0)
                      THEN 1 ELSE 0 END) AS BIGINT) AS media_no_ref,
             CAST(sum(CASE WHEN kind = 'text'
                            AND media_ref IS NOT NULL AND len(media_ref) > 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS text_with_ref,
             CAST(sum(CASE WHEN kind = 'text'
                            AND (text IS NULL OR len(text) = 0)
                      THEN 1 ELSE 0 END) AS BIGINT) AS empty_text
      FROM allr GROUP BY doc_id
    )
    SELECT *, (dup_offsets = 0 AND gaps = 0 AND media_no_ref = 0
               AND text_with_ref = 0 AND empty_text = 0) AS ok
    FROM agg
    """,
)
def span_integrity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-sequence integrity audit
    (operators/spans.py::span_integrity) over the synthetic interleave
    with violations planted per residue class: a duplicate offset-0
    span (%6==1), a ref-less media span at a dangling offset (%6==2 —
    fires media_no_ref AND gaps), a media_ref-carrying text span at a
    dangling offset (%6==3). Every other doc must audit clean — the
    negative control that synth_spans itself emits well-formed
    sequences. Zero shuffle: array folds riding the scan."""
    from news_please_spark.operators.spans import SPAN_SCHEMA, span_integrity

    sp = _synth_spans_df(spark, sf_dir)
    did = F.col("doc_id")
    ns = F.lit(None).cast("string")

    def one(kind, text, ref, off):
        return F.array(
            F.struct(
                F.lit(kind).alias("kind"),
                (F.lit(text) if text is not None else ns).alias("text"),
                (F.lit(ref) if ref is not None else ns).alias("media_ref"),
                F.lit(off).cast("int").alias("offset"),
            )
        )

    extra = (
        F.when(did % 6 == 1, one("text", "dup span", None, 0))
        .when(did % 6 == 2, one("image", None, None, 900))
        .when(did % 6 == 3, one("text", "x", "img://bad", 901))
        .otherwise(F.array().cast(SPAN_SCHEMA))
    )
    aug = sp.select("doc_id", F.concat("spans", extra).alias("spans"))
    return span_integrity(aug)


@register(
    "phrase_search",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    post AS (
      SELECT doc_id, i AS pos, toks[i + 1] AS term
      FROM t, LATERAL (SELECT unnest(range(0, len(toks))) AS i)
    ),
    qt AS (
      SELECT doc_id AS query_id, j AS i, toks[3 + j] AS term
      FROM t, LATERAL (SELECT unnest(range(0, 3)) AS j)
      WHERE doc_id % 97 = 0 AND len(toks) >= 5
    ),
    hits AS (
      SELECT qt.query_id, post.doc_id, qt.i, post.pos - qt.i AS anchor
      FROM post JOIN qt ON qt.term = post.term
    ),
    full_m AS (
      SELECT query_id, doc_id, anchor
      FROM hits GROUP BY query_id, doc_id, anchor
      HAVING count(DISTINCT i) = 3 AND anchor >= 0
    )
    SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_hits,
           CAST(min(anchor) AS INT) AS first_pos
    FROM full_m GROUP BY query_id, doc_id
    """,
)
def phrase_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-token phrase search (operators/terms.py::phrase_search)
    with the anchor-alignment join — every 97th doc's tokens 3-5
    become a query phrase, searched across the whole corpus (the
    query doc itself guarantees >= 1 hit; shared phrasing yields
    cross-doc hits). ONE postings join + ONE combinable aggregate
    regardless of phrase length — no per-term join chain, no Window."""
    from news_please_spark.operators.terms import phrase_search

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    phrases = (
        docs.filter((F.col("doc_id") % 97 == 0) & (F.trim("text") != ""))
        .select(
            F.col("doc_id").alias("query_id"),
            toks.alias("_toks"),
        )
        .filter(F.size("_toks") >= 5)
        .select("query_id", F.array_join(F.slice("_toks", 3, 3), " ").alias("phrase"))
    )
    return phrase_search(docs, phrases, n=3)


@register(
    "fim_transform",
    r"""
    WITH t AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    h AS (
      SELECT doc_id, text, toks, len(toks) AS L,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8)) AS BIGINT) AS h0,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':1'), 1, 8)) AS BIGINT) AS h1,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':2'), 1, 8)) AS BIGINT) AS h2,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':3'), 1, 8)) AS BIGINT) AS h3
      FROM t
    ),
    s AS (
      SELECT *, (h0 % 2 = 0 AND L >= 3) AS elected, (h3 % 3 = 0) AS spm,
             CASE WHEN L >= 3 THEN h1 % (L - 2) + 1 END AS p1
      FROM h
    ),
    s2 AS (SELECT *, CASE WHEN L >= 3 THEN p1 + 1 + h2 % (L - 1 - p1) END AS p2 FROM s),
    parts AS (
      SELECT *,
             array_to_string(list_slice(toks, 1, p1), ' ') AS pre,
             array_to_string(list_slice(toks, p1 + 1, p2), ' ') AS mid,
             array_to_string(list_slice(toks, p2 + 1, L), ' ') AS suf
      FROM s2
    )
    SELECT doc_id, elected AS fim,
           CASE WHEN elected AND spm THEN 'spm'
                WHEN elected THEN 'psm' ELSE 'raw' END AS mode,
           CASE WHEN NOT elected THEN text
                WHEN spm THEN '<PRE> <SUF> ' || suf || ' <MID> ' || mid || ' ' || pre
                ELSE '<PRE> ' || pre || ' <SUF> ' || suf || ' <MID> ' || mid
           END AS text_out
    FROM parts
    """,
)
def fim_transform_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle serialization
    (operators/sampling.py::fim_transform, Bavarian et al. 2022):
    hash-elected docs split at two hash-chosen boundaries into
    PSM/SPM infilling order, the rest pass through verbatim —
    no-RNG determinism so the DuckDB oracle re-derives election,
    split points, and serialization exactly. Zero shuffle."""
    from news_please_spark.operators.sampling import fim_transform

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    return fim_transform(docs)


def _h32_sql(suffix: str) -> str:
    """DuckDB image of sampling._pos_hash32(doc_id, <suffix>)."""
    return (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':" + suffix
        + "'), 1, 8)) AS BIGINT)"
    )


def _span_corr_sql(stride: int, keep_mod: int, keep_lt: int, max_span: int, where: str) -> str:
    """Parameterized DuckDB image of operators/sampling.span_corruption
    over `documents` rows matching `where`: yields (doc_id, n_spans,
    n_masked, inputs, targets)."""
    h = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
        f"CAST(i * {stride} AS VARCHAR)), 1, 8)) AS BIGINT)"
    )
    return rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents WHERE {where}
    ),
    w AS (
      SELECT doc_id, toks, len(toks) AS L,
             list_filter(
               list_transform(range(0, (len(toks) - 1) // {stride} + 1), i -> {{
                 's': i * {stride},
                 'len': CAST(1 + (({h} >> 8) % {max_span}) AS INT),
                 'on': ({h} % {keep_mod}) < {keep_lt}
               }}),
               st -> st."on"
             ) AS starts
      FROM t
    ),
    r AS (
      SELECT doc_id, L, starts,
             list_transform(range(0, L), p ->
               CASE
                 WHEN len(list_filter(starts, st -> st.s = p)) > 0
                   THEN '<extra_id_' || CAST(len(list_filter(starts, st -> st.s < p)) AS VARCHAR) || '>'
                 WHEN len(list_filter(starts, st -> st.s <= p AND p < st.s + st."len")) > 0
                   THEN NULL
                 ELSE toks[p + 1]
               END) AS pieces,
             list_transform(range(1, len(starts) + 1), k ->
               '<extra_id_' || CAST(k - 1 AS VARCHAR) || '> ' ||
               array_to_string(
                 list_slice(toks, starts[k].s + 1,
                            starts[k].s + least(starts[k]."len", L - starts[k].s)), ' ')
             ) AS tparts,
             list_aggregate(
               list_transform(starts, st -> least(st."len", L - st.s)), 'sum'
             ) AS nm
      FROM w
    )
    SELECT doc_id,
           CAST(len(starts) AS BIGINT) AS n_spans,
           CAST(COALESCE(nm, 0) AS BIGINT) AS n_masked,
           array_to_string(list_filter(pieces, x -> x IS NOT NULL), ' ') AS inputs,
           COALESCE(array_to_string(tparts, ' '), '') AS targets
    FROM r
    """


@register("span_corruption", _span_corr_sql(4, 5, 2, 3, "TRUE"))
def span_corruption_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption preprocessing
    (operators/sampling.py::span_corruption): deterministic hash-
    arithmetic masking plan (stride-aligned starts so spans never
    overlap and mask state is per-position computable — no sequential
    scan), sentinel-rendered encoder inputs + decoder targets. The
    substitute-back roundtrip invariant is pinned in pytest; the
    DuckDB oracle re-derives plan AND rendering from the same
    arithmetic. Zero shuffle."""
    from news_please_spark.operators.sampling import span_corruption

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    return span_corruption(docs)


_UL2_MODE = _h32_sql("ul2") + " % 4"


@register(
    "ul2_mixture",
    f"""
    SELECT doc_id, 'R' AS denoiser, n_spans, n_masked,
           '[NLU] ' || inputs AS inputs, targets
    FROM ({_span_corr_sql(4, 5, 2, 3, _UL2_MODE + " < 2")})
    UNION ALL
    SELECT doc_id, 'X', n_spans, n_masked, '[NLG] ' || inputs, targets
    FROM ({_span_corr_sql(8, 5, 3, 7, _UL2_MODE + " = 2")})
    UNION ALL
    SELECT doc_id, 'S', CAST(1 AS BIGINT),
           CAST(L - p AS BIGINT),
           '[S2S] ' || array_to_string(list_slice(toks, 1, p), ' ')
             || ' <extra_id_0>',
           '<extra_id_0> ' || COALESCE(
             array_to_string(list_slice(toks, p + 1, L), ' '), '')
    FROM (
      SELECT doc_id, toks, L,
             1 + {_h32_sql("ul2-s")} % greatest(L - 1, 1) AS p
      FROM (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
               len(string_split_regex(trim(text), '\\s+')) AS L
        FROM documents WHERE {_UL2_MODE} = 3
      )
    )
    """,
)
def ul2_mixture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UL2 mixture-of-denoisers plan (operators/sampling.py::ul2_plan,
    Tay et al. 2022): hash-assigned R/X/S denoisers with paradigm
    tokens — R and X re-derive through the parameterized
    span-corruption oracle, S as a prefix-LM split. Zero shuffle per
    branch."""
    from news_please_spark.operators.sampling import ul2_plan

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    return ul2_plan(docs)


@register(
    "unwrap_text",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    wrapped AS (
      SELECT doc_id,
             array_to_string(
               list_transform(range(1, len(toks) + 1), i ->
                 toks[i] || CASE
                   WHEN i = len(toks) THEN ''
                   WHEN i % 13 = 0 THEN '-' || chr(10)
                   WHEN i % 11 = 0 THEN chr(10) || chr(10)
                   WHEN i % 7 = 0 THEN chr(10)
                   ELSE ' ' END), '') AS w
      FROM t
    ),
    fixed AS (
      SELECT doc_id,
             array_to_string(
               list_transform(
                 string_split_regex(
                   regexp_replace(w, '([A-Za-z])-\n([a-z])', '\1\2', 'g'),
                   '\n{2,}'),
                 p -> regexp_replace(p, '\n', ' ', 'g')),
               chr(10) || chr(10)) AS clean
      FROM wrapped
    )
    SELECT doc_id, clean,
           CAST(len(string_split_regex(clean, '\n\n')) AS BIGINT) AS n_paras
    FROM fixed
    """,
)
def unwrap_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-wrap repair (functions/text.py::unwrap_text) over
    deterministically re-wrapped documents: every 13th token boundary
    becomes a hyphen line break, every 11th a paragraph break, every
    7th a plain hard wrap — the OCR/PDF text shape. De-hyphenation +
    paragraph-domain unwrapping must reproduce DuckDB's image of the
    same chain exactly. Zero shuffle."""
    from news_please_spark.functions.text import unwrap_text

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    d = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_toks")
    )
    L = F.size("_toks")
    wrapped = F.array_join(
        F.transform(
            F.sequence(F.lit(1), L),
            lambda i: F.concat(
                F.element_at("_toks", i),
                F.when(i == L, F.lit(""))
                .when(i % 13 == 0, F.lit("-\n"))
                .when(i % 11 == 0, F.lit("\n\n"))
                .when(i % 7 == 0, F.lit("\n"))
                .otherwise(F.lit(" ")),
            ),
        ),
        "",
    )
    w = d.select("doc_id", wrapped.alias("_w"))
    out = w.select("doc_id", unwrap_text(F.col("_w")).alias("clean"))
    return out.withColumn(
        "n_paras", F.size(F.split("clean", r"\n\n")).cast("long")
    )


@register(
    "margin_mine",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % 2 = 0 AND vec_id % 53 = 0),
    c AS (SELECT * FROM e WHERE vec_id % 2 = 1),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(floor(10000 * (
               list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
             )) AS BIGINT) AS cos_q
      FROM q, c
    ),
    nn AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_q DESC, neighbor_id) AS rk
        FROM p
      ) WHERE rk <= 4
    ),
    agg AS (
      SELECT query_id, count(*) AS n, sum(cos_q) AS s,
             max({'cq': cos_q, 'nn': -neighbor_id}) AS top
      FROM nn GROUP BY query_id
    )
    SELECT query_id, -(top.nn) AS neighbor_id, top.cq AS cos_q,
           CAST(floor((10000 * n * top.cq) / s) AS BIGINT) AS margin_q,
           CAST(floor((10000 * n * top.cq) / s) AS BIGINT) >= 10500 AS accepted
    FROM agg WHERE s > 0
    """,
)
def margin_mine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based cross-corpus mining
    (operators/similarity.py::margin_mine, Artetxe & Schwenk 2019
    ratio margin, forward variant) between the even- and odd-id halves
    of the embeddings table (the two-language shape): top-1 per query
    accepted only when it stands out of the query's k=4 neighborhood.
    Cosines quantize BEFORE the neighborhood sum so the margin is
    integer-exact cross-engine; hub queries (uniform neighborhoods)
    land at ~10000 and are rejected."""
    from news_please_spark.operators.similarity import margin_mine

    e = spread(load(spark, sf_dir, "embeddings"), spark)
    qs = e.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") % 53 == 0))
    corpus = e.filter(F.col("vec_id") % 2 == 1)
    return margin_mine(qs, corpus, k=4, threshold_q=10500)


@register(
    "lsh_recall_audit",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents WHERE doc_id % 29 = 0
    ),
    s AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
      FROM t WHERE len(toks) >= 3
    ),
    sets AS (SELECT doc_id, list_distinct(sh) AS gs FROM s),
    ex AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(floor((CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
               / len(list_distinct(list_concat(a.gs, b.gs)))) * 10000) AS BIGINT) AS jq
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    ),
    tru AS (SELECT * FROM ex WHERE jq >= 5000),
    sig AS (
      SELECT doc_id, band,
             list_aggregate(list_transform(sh, x -> md5(CAST(band AS VARCHAR) || '|' || x)), 'min') AS sig
      FROM s, (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    j AS (
      SELECT tru.jq, CASE WHEN cand.doc_a IS NULL THEN 0 ELSE 1 END AS found
      FROM tru LEFT JOIN cand ON cand.doc_a = tru.doc_a AND cand.doc_b = tru.doc_b
    )
    SELECT CAST(floor((jq - 5000) / 1000) * 1000 + 5000 AS BIGINT) AS bucket_q,
           CAST(count(*) AS BIGINT) AS n_true_pairs,
           CAST(sum(found) AS BIGINT) AS n_candidates,
           CAST(floor(10000 * sum(found) / count(*)) AS BIGINT) AS recall_q
    FROM j GROUP BY 1
    """,
)
def lsh_recall_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical LSH recall calibration
    (operators/dedup.py::lsh_recall_audit): exact all-pairs 3-gram
    Jaccard on the doc_id%29 sample vs the 4-band MinHash candidate
    set, recall per similarity bucket — measures on data what
    choose_lsh_params predicts from theory. All-pairs cost is
    sample-sized by contract, never corpus-sized."""
    from news_please_spark.operators.dedup import lsh_recall_audit

    docs = spread(
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 29 == 0),
        spark,
    )
    return lsh_recall_audit(docs)


@register(
    "vocab_drift",
    r"""
    WITH oc AS (
      SELECT t AS term, count(*) AS n FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        FROM documents WHERE doc_id % 3 <> 0
      ) GROUP BY 1
    ),
    nc AS (
      SELECT t AS term, count(*) AS n FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        FROM documents WHERE doc_id % 3 = 0
      ) GROUP BY 1
    ),
    j AS (
      SELECT COALESCE(oc.term, nc.term) AS term,
             COALESCE(oc.n, 0) AS n_old, COALESCE(nc.n, 0) AS n_new
      FROM oc FULL OUTER JOIN nc ON oc.term = nc.term
      WHERE COALESCE(oc.n, 0) >= 5 OR COALESCE(nc.n, 0) >= 5
    ),
    s AS (
      SELECT term, n_old, n_new,
             CAST(floor(1000000 * n_old / (SELECT sum(n) FROM oc)) AS BIGINT) AS rate_old_ppm,
             CAST(floor(1000000 * n_new / (SELECT sum(n) FROM nc)) AS BIGINT) AS rate_new_ppm
      FROM j
    )
    SELECT term, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
           rate_old_ppm, rate_new_ppm,
           rate_new_ppm - rate_old_ppm AS drift_ppm
    FROM s
    ORDER BY abs(rate_new_ppm - rate_old_ppm) DESC, term
    LIMIT 100
    """,
)
def vocab_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot vocabulary drift
    (operators/stats.py::vocab_drift): doc_id%3 splits documents into
    'old' and 'new' crawls; per-term ppm rates and their difference,
    top-100 by |drift| with a total ordering (unique term tiebreak) so
    the LIMIT reproduces cross-engine."""
    from news_please_spark.operators.stats import vocab_drift

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    return vocab_drift(old, new, min_count=5, top_k=100)


@register(
    "salsa_scores",
    f"""
    WITH edges AS ({_EDGES_SQL}),
    ind AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS indeg FROM edges GROUP BY dst),
    outd AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
    a0 AS (SELECT id, CAST(1000000 AS BIGINT) AS a FROM ind),
    h1 AS (
      SELECT e.src AS id, CAST(sum(a0.a // ind.indeg) AS BIGINT) AS h
      FROM edges e JOIN a0 ON a0.id = e.dst JOIN ind ON ind.id = e.dst
      GROUP BY e.src
    ),
    a1 AS (
      SELECT e.dst AS id, CAST(sum(h1.h // outd.outdeg) AS BIGINT) AS a
      FROM edges e JOIN h1 ON h1.id = e.src JOIN outd ON outd.id = e.src
      GROUP BY e.dst
    ),
    h2 AS (
      SELECT e.src AS id, CAST(sum(a1.a // ind.indeg) AS BIGINT) AS h
      FROM edges e JOIN a1 ON a1.id = e.dst JOIN ind ON ind.id = e.dst
      GROUP BY e.src
    ),
    a2 AS (
      SELECT e.dst AS id, CAST(sum(h2.h // outd.outdeg) AS BIGINT) AS a
      FROM edges e JOIN h2 ON h2.id = e.src JOIN outd ON outd.id = e.src
      GROUP BY e.dst
    )
    SELECT n.doc_id AS doc_id,
           CAST(coalesce(a2.a, 0) AS BIGINT) AS authority,
           CAST(coalesce(h2.h, 0) AS BIGINT) AS hub
    FROM documents n
    LEFT JOIN a2 ON a2.id = n.doc_id LEFT JOIN h2 ON h2.id = n.doc_id
    """,
)
def salsa_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-iteration integer-exact SALSA (operators/graph.py::
    salsa_scaled): HITS' random-walk cousin — every step divides a
    node's score among its links (BIGINT floor division), so link
    farms can't saturate the ranking (the TKC effect HITS suffers).
    Same two-joins-two-sums-per-iteration shuffle shape as pagerank3;
    sits next to spam_mass in the frontier's prioritization signals."""
    from news_please_spark.operators.graph import salsa_scaled

    edges = derived_edges(spark, sf_dir)
    nodes = load(spark, sf_dir, "documents").select("doc_id")
    return salsa_scaled(edges, nodes, iters=2, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "authority", "hub"
    )


@register(
    "graph_balls",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    walk(root, node, d) AS (
      SELECT doc_id, doc_id, 0 FROM documents
      UNION ALL
      SELECT w.root, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < 2
    ),
    dist AS (SELECT root, node, min(d) AS d FROM walk GROUP BY 1, 2)
    SELECT root AS doc_id,
           CAST(sum(CASE WHEN d <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS ball_1,
           CAST(count(*) AS BIGINT) AS ball_2
    FROM dist GROUP BY 1
    """,
)
def graph_balls_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-node neighborhood function |B(v, r)| for r = 1, 2
    (operators/graph.py::ball_sizes) — HyperBall's exact twin: ball
    growth is the seed-selection / effective-diameter signal, computed
    as an all-sources wave loop on distinct (root, node) pairs. The
    10^10-node swap (HLL registers per node, same loop) is documented
    in the operator; this exact path is its calibration oracle."""
    from news_please_spark.operators.graph import ball_sizes

    edges = derived_edges(spark, sf_dir)
    nodes = load(spark, sf_dir, "documents").select("doc_id")
    return ball_sizes(edges, nodes, radius=2, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "ball_1", "ball_2"
    )


# DUST world derived from documents: params id/page/sid(/ref on doc_id%7),
# content fingerprint depends on (host, path, id, page) ONLY — so sid (and
# ref, where it varies) are DUST, page conflicts, id never varies within a
# residual class (no evidence either way).
_DUST_BASE_SQL = """
  SELECT doc_id,
         'h' || CAST(doc_id % 3 AS VARCHAR) || '.site.test' AS host,
         '/a/' || CAST(doc_id % 4 AS VARCHAR) AS path,
         CAST(doc_id % 6 AS VARCHAR) AS idv,
         CAST((doc_id // 60) % 2 AS VARCHAR) AS pagev,
         's' || CAST(doc_id % 5 AS VARCHAR) AS sidv,
         CASE WHEN doc_id % 7 = 0 THEN 'r' || CAST(doc_id % 2 AS VARCHAR) END AS refv
  FROM documents
"""


def _dust_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    host = F.concat(F.lit("h"), s(d % 3), F.lit(".site.test"))
    path = F.concat(F.lit("/a/"), s(d % 4))
    idv, pagev, sidv = s(d % 6), s((d / 60).cast("long") % 2), F.concat(F.lit("s"), s(d % 5))
    ref_part = F.when(
        d % 7 == 0, F.concat(F.lit("&ref=r"), s(d % 2))
    ).otherwise(F.lit(""))
    url = F.concat(
        F.lit("https://"), host, path,
        F.lit("?id="), idv, F.lit("&page="), pagev, ref_part,
        F.lit("&sid="), sidv,
    )
    fp = F.md5(F.concat(F.lit("c|"), host, path, F.lit("|"), idv, F.lit("|"), pagev))
    return load(spark, sf_dir, "documents").select(
        url.alias("url"), fp.alias("content_fp")
    )


@register(
    "dust_rules",
    f"""
    WITH base AS ({_DUST_BASE_SQL}),
    fp AS (
      SELECT *, md5('c|' || host || path || '|' || idv || '|' || pagev) AS fpv
      FROM base
    ),
    occ AS (
      SELECT host, 'id' AS param, idv AS value, fpv,
             md5(host || '|' || path || '|' ||
                 'page=' || pagev ||
                 CASE WHEN refv IS NULL THEN '' ELSE '&ref=' || refv END ||
                 '&sid=' || sidv) AS residual
      FROM fp
      UNION ALL
      SELECT host, 'page', pagev, fpv,
             md5(host || '|' || path || '|' ||
                 'id=' || idv ||
                 CASE WHEN refv IS NULL THEN '' ELSE '&ref=' || refv END ||
                 '&sid=' || sidv)
      FROM fp
      UNION ALL
      SELECT host, 'sid', sidv, fpv,
             md5(host || '|' || path || '|' ||
                 'id=' || idv || '&page=' || pagev ||
                 CASE WHEN refv IS NULL THEN '' ELSE '&ref=' || refv END)
      FROM fp
      UNION ALL
      SELECT host, 'ref', refv, fpv,
             md5(host || '|' || path || '|' ||
                 'id=' || idv || '&page=' || pagev || '&sid=' || sidv)
      FROM fp WHERE refv IS NOT NULL
    ),
    g AS (
      SELECT host, param, residual,
             count(DISTINCT value) AS nv, count(DISTINCT fpv) AS nf
      FROM occ GROUP BY 1, 2, 3
    )
    SELECT host, param,
           CAST(sum(CASE WHEN nv >= 2 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_support,
           CAST(sum(CASE WHEN nv >= 2 AND nf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_conflict,
           (sum(CASE WHEN nv >= 2 AND nf = 1 THEN 1 ELSE 0 END) >= 2
            AND sum(CASE WHEN nv >= 2 AND nf >= 2 THEN 1 ELSE 0 END) = 0) AS is_dust
    FROM g GROUP BY 1, 2
    """,
)
def dust_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST rule mining (operators/dust.py::dust_param_rules, WWW'09
    "Do Not Crawl in the DUST"): learn per-(host, param) strip rules
    from (url, content-fingerprint) evidence — the sid param is
    provably content-free (is_dust), page provably carries content
    (conflicts), id/ref never vary within a residual class (no rule).
    The operator parses real URL strings; the oracle re-derives the
    same residual experiments arithmetically — any parsing drift
    breaks the hash."""
    from news_please_spark.operators.dust import dust_param_rules

    return dust_param_rules(_dust_urls(spark, sf_dir), min_support=2)


@register(
    "fetch_anomaly",
    """
    WITH hourly AS (
      SELECT 'h' || CAST(user_id % 7 AS VARCHAR) AS host,
             date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n_fetches
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT host, hour, n_fetches,
             CAST(coalesce(sum(n_fetches) OVER w, 0) AS BIGINT) AS trail_sum,
             CAST(count(*) OVER w AS BIGINT) AS trail_n
      FROM hourly
      WINDOW w AS (PARTITION BY host ORDER BY hour ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
    )
    SELECT host, hour, n_fetches, trail_sum, trail_n,
           (trail_n = 3 AND 10 * n_fetches * trail_n > 15 * trail_sum) AS is_anomaly
    FROM t
    """,
)
def fetch_anomaly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host hourly fetch-rate anomaly audit (operators/recrawl.py::
    fetch_rate_anomaly): events mapped to a 7-host fetch log; an hour
    alarms when it exceeds 1.5x the mean of the previous 3 observed
    hours (integer cross-multiplied verdict — no float ratio). One
    map-side-combinable count + one host-keyed trailing window."""
    from news_please_spark.operators.recrawl import fetch_rate_anomaly

    ev = load(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 7).cast("string")).alias("host"),
        "ts",
    )
    return fetch_rate_anomaly(ev, window_hours=3, threshold_x10=15)


@register(
    "tokenizer_fertility",
    r"""
    WITH d AS (
      SELECT source, lang,
             len(string_split_regex(trim(text), '\s+')) AS w,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS st,
             octet_length(encode(text)) AS b
      FROM documents
    )
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS n_words,
           CAST(sum(st) AS BIGINT) AS n_subtokens,
           CAST(sum(b) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN sum(w) > 0 THEN (10000 * sum(st)) // sum(w) END AS BIGINT) AS fertility_q,
           CAST(CASE WHEN sum(st) > 0 THEN (10000 * sum(b)) // sum(st) END AS BIGINT) AS bytes_per_subtoken_q
    FROM d GROUP BY 1, 2
    """,
)
def tokenizer_fertility_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per (source, lang) slice
    (operators/stats.py::tokenizer_fertility): subtokens-per-word and
    bytes-per-subtoken as integer-exact floor ratios over the same
    word/subtoken definitions as token_totals/bpe_token_totals — the
    pre-budget report that flags slices a tokenizer fragments."""
    from news_please_spark.operators.stats import tokenizer_fertility

    docs = load(spark, sf_dir, "documents").select("source", "lang", "text")
    return tokenizer_fertility(docs)


@register(
    "snapshot_url_diff",
    """
    WITH a AS (
      SELECT 'com,site)/p/' || CAST(doc_id AS VARCHAR) AS urlkey,
             md5('d' || CAST(doc_id AS VARCHAR)) AS digest
      FROM documents WHERE doc_id % 11 <> 0
    ),
    b AS (
      SELECT 'com,site)/p/' || CAST(doc_id AS VARCHAR) AS urlkey,
             CASE WHEN doc_id % 5 = 0
                  THEN md5('d' || CAST(doc_id AS VARCHAR) || 'x')
                  ELSE md5('d' || CAST(doc_id AS VARCHAR)) END AS digest
      FROM documents WHERE doc_id % 13 <> 0
    )
    SELECT coalesce(a.urlkey, b.urlkey) AS urlkey,
           a.digest AS old_digest, b.digest AS new_digest,
           CASE WHEN a.digest IS NULL THEN 'new'
                WHEN b.digest IS NULL THEN 'gone'
                WHEN a.digest <> b.digest THEN 'changed'
                ELSE 'same' END AS status
    FROM a FULL OUTER JOIN b ON a.urlkey = b.urlkey
    """,
)
def snapshot_url_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot URL ledger (operators/cdx.py::snapshot_diff):
    snapshot A = doc_id%11 survivors, B = doc_id%13 survivors with
    digests flipped on doc_id%5 — every status class (new/gone/
    changed/same) is populated. One full-outer join on SURT keys."""
    from news_please_spark.operators.cdx import snapshot_diff

    d = F.col("doc_id")
    key = F.concat(F.lit("com,site)/p/"), d.cast("string"))
    base = F.md5(F.concat(F.lit("d"), d.cast("string")))
    docs = load(spark, sf_dir, "documents")
    old = docs.filter(d % 11 != 0).select(
        key.alias("urlkey"), base.alias("digest")
    )
    new = docs.filter(d % 13 != 0).select(
        key.alias("urlkey"),
        F.when(
            d % 5 == 0, F.md5(F.concat(F.lit("d"), d.cast("string"), F.lit("x")))
        ).otherwise(base).alias("digest"),
    )
    return snapshot_diff(old, new)


_REP_RULES = [
    ("h0.rep.test", "disallow", "/private/*"),
    ("h0.rep.test", "allow", "/private/pub*"),
    ("h0.rep.test", "disallow", "/*.pdf$"),
    ("h1.rep.test", "disallow", "/"),
    ("h1.rep.test", "allow", "/articles/*"),
    ("h2.rep.test", "allow", "/folder"),
    ("h2.rep.test", "disallow", "/folder"),
    ("h3.rep.test", "disallow", "/*?sid=*"),
]

_REP_RULES_SQL = " UNION ALL ".join(
    f"SELECT '{h}' AS host, '{d}' AS directive, '{p}' AS pattern"
    for h, d, p in _REP_RULES
)

# URL world: host h(doc_id%4).rep.test, path class doc_id%7
_REP_PATH_SQL = """
    CASE doc_id % 7
      WHEN 0 THEN '/private/a' || CAST(doc_id AS VARCHAR)
      WHEN 1 THEN '/private/pub' || CAST(doc_id AS VARCHAR)
      WHEN 2 THEN '/articles/' || CAST(doc_id AS VARCHAR)
      WHEN 3 THEN '/folder/' || CAST(doc_id AS VARCHAR)
      WHEN 4 THEN '/doc' || CAST(doc_id AS VARCHAR) || '.pdf'
      WHEN 5 THEN '/page?sid=' || CAST(doc_id AS VARCHAR)
      ELSE '/ok/' || CAST(doc_id AS VARCHAR)
    END
"""


def _rep_url_col():
    d = F.col("doc_id")
    s = d.cast("string")
    cls = d % 7
    path = (
        F.when(cls == 0, F.concat(F.lit("/private/a"), s))
        .when(cls == 1, F.concat(F.lit("/private/pub"), s))
        .when(cls == 2, F.concat(F.lit("/articles/"), s))
        .when(cls == 3, F.concat(F.lit("/folder/"), s))
        .when(cls == 4, F.concat(F.lit("/doc"), s, F.lit(".pdf")))
        .when(cls == 5, F.concat(F.lit("/page?sid="), s))
        .otherwise(F.concat(F.lit("/ok/"), s))
    )
    return F.concat(
        F.lit("https://h"), (d % 4).cast("string"), F.lit(".rep.test"), path
    )


@register(
    "robots_rep_gate",
    rf"""
    WITH rules AS ({_REP_RULES_SQL}),
    rx AS (
      SELECT host, directive, pattern,
             '^' || replace(
               regexp_replace(
                 CASE WHEN pattern LIKE '%$'
                      THEN substring(pattern, 1, length(pattern) - 1)
                      ELSE pattern END,
                 '([.^$+?(){{}}\[\]|\\])', '\\\0', 'g'),
               '*', '.*')
             || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS rexp
      FROM rules
    ),
    u AS (
      SELECT 'https://h' || CAST(doc_id % 4 AS VARCHAR) || '.rep.test'
               || {_REP_PATH_SQL} AS url,
             'h' || CAST(doc_id % 4 AS VARCHAR) || '.rep.test' AS host,
             {_REP_PATH_SQL} AS path
      FROM documents
    ),
    hp AS (SELECT DISTINCT host, path FROM u),
    m AS (
      SELECT hp.host, hp.path, rx.directive, rx.pattern,
             row_number() OVER (
               PARTITION BY hp.host, hp.path
               ORDER BY length(rx.pattern) DESC, rx.directive ASC, rx.pattern ASC
             ) AS rn
      FROM hp JOIN rx ON rx.host = hp.host
      WHERE regexp_matches(hp.path, rx.rexp)
    ),
    w AS (SELECT host, path, directive, pattern FROM m WHERE rn = 1)
    SELECT u.url AS url, u.host AS host, u.path AS path,
           w.directive AS rep_verdict, w.pattern AS rep_pattern,
           coalesce(w.directive = 'allow', TRUE) AS rep_allowed
    FROM u LEFT JOIN w ON w.host = u.host AND w.path = u.path
    """,
)
def robots_rep_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots gate (operators/robots.py::rep_match): wildcard
    patterns, trailing-$ anchors, longest-match precedence with
    allow-wins ties, over a derived URL world that exercises every
    rule class (Allow override inside a Disallowed tree, $-anchored
    extension block, whole-host disallow with an allowed section,
    equal-length tie, query-string block, and a rule-free host).
    Pattern compilation and matching are native Columns — the oracle
    re-derives the translation in DuckDB's regex dialect, so only the
    RFC semantics can make the verdicts agree."""
    from news_please_spark.operators.robots import rep_match

    urls = load(spark, sf_dir, "documents").select(_rep_url_col().alias("url"))
    rules = spark.createDataFrame(
        _REP_RULES, "host string, directive string, pattern string"
    )
    return rep_match(urls, rules).select(
        "url", "host", "path", "rep_verdict", "rep_pattern", "rep_allowed"
    )


@register(
    "hyperball_balls",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    walk(root, node, d) AS (
      SELECT doc_id, doc_id, 0 FROM documents
      UNION ALL
      SELECT w.root, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < 2
    ),
    dist AS (SELECT root, node, min(d) AS d FROM walk GROUP BY 1, 2),
    h AS (
      SELECT root, d,
             ('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 8))::BIGINT AS hv
      FROM dist
    ),
    br AS (
      SELECT root, d, hv // 16777216 AS bucket,
             CASE WHEN hv % 16777216 = 0 THEN 25
                  ELSE 25 - length(bin(hv % 16777216)) END AS rho
      FROM h
    ),
    regs1 AS (
      SELECT root, bucket, max(rho) AS max_rho FROM br WHERE d <= 1 GROUP BY 1, 2
    ),
    est1 AS (
      SELECT root,
             CAST(4060558014027923456 AS BIGINT)
               // (2570790 * (sum(1::BIGINT << (25 - max_rho))
                              + (256 - count(*)) * 33554432)) AS ball_1_est
      FROM regs1 GROUP BY root
    ),
    regs2 AS (
      SELECT root, bucket, max(rho) AS max_rho FROM br GROUP BY 1, 2
    ),
    est2 AS (
      SELECT root,
             CAST(4060558014027923456 AS BIGINT)
               // (2570790 * (sum(1::BIGINT << (25 - max_rho))
                              + (256 - count(*)) * 33554432)) AS ball_2_est
      FROM regs2 GROUP BY root
    )
    SELECT d0.doc_id AS doc_id, est1.ball_1_est, est2.ball_2_est
    FROM documents d0
    LEFT JOIN est1 ON est1.root = d0.doc_id
    LEFT JOIN est2 ON est2.root = d0.doc_id
    """,
)
def hyperball_balls_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall neighborhood-function estimates at r = 1, 2
    (operators/graph.py::hyperball): per-node HLL register tables
    merged along out-edges each round — O(n * 2^p) state, the
    billion-node path the exact graph_balls entry calibrates. The
    integer-exact raw-HLL estimator makes even the APPROXIMATE path
    hash-checkable: the oracle rebuilds the registers from the exact
    dist<=r member sets, so the sketches must agree bucket-for-bucket."""
    from news_please_spark.operators.graph import hyperball

    edges = derived_edges(spark, sf_dir)
    nodes = load(spark, sf_dir, "documents").select("doc_id")
    return hyperball(edges, nodes, radius=2, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "ball_1_est", "ball_2_est"
    )


@register(
    "host_rank",
    f"""
    WITH edges AS ({_EDGES_SQL}),
    he AS (
      SELECT 'h' || CAST(src % 7 AS VARCHAR) AS src,
             'h' || CAST(dst % 7 AS VARCHAR) AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM edges GROUP BY 1, 2
    ),
    hosts AS (SELECT DISTINCT 'h' || CAST(doc_id % 7 AS VARCHAR) AS id FROM documents),
    ow AS (SELECT src AS id, sum(w) AS ow FROM he GROUP BY 1),
    r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM hosts),
    f1 AS (
      SELECT he.dst AS id, CAST(sum(((85 * r0.r) // 100) * he.w // ow.ow) AS BIGINT) AS fin
      FROM he JOIN r0 ON r0.id = he.src JOIN ow ON ow.id = he.src GROUP BY 1
    ),
    r1 AS (SELECT h.id, CAST(150000 + coalesce(f1.fin, 0) AS BIGINT) AS r
           FROM hosts h LEFT JOIN f1 ON f1.id = h.id),
    f2 AS (
      SELECT he.dst AS id, CAST(sum(((85 * r1.r) // 100) * he.w // ow.ow) AS BIGINT) AS fin
      FROM he JOIN r1 ON r1.id = he.src JOIN ow ON ow.id = he.src GROUP BY 1
    ),
    r2 AS (SELECT h.id, CAST(150000 + coalesce(f2.fin, 0) AS BIGINT) AS r
           FROM hosts h LEFT JOIN f2 ON f2.id = h.id),
    f3 AS (
      SELECT he.dst AS id, CAST(sum(((85 * r2.r) // 100) * he.w // ow.ow) AS BIGINT) AS fin
      FROM he JOIN r2 ON r2.id = he.src JOIN ow ON ow.id = he.src GROUP BY 1
    ),
    r3 AS (SELECT h.id, CAST(150000 + coalesce(f3.fin, 0) AS BIGINT) AS r
           FROM hosts h LEFT JOIN f3 ON f3.id = h.id)
    SELECT id AS host, r AS rank_scaled FROM r3
    """,
)
def host_rank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level authority for crawl budgeting (operators/graph.py::
    contract_to_hosts + pagerank_weighted_scaled): the page graph
    contracts to a weighted host graph (one aggregate), then 3
    iterations of integer-exact WEIGHTED PageRank — a host linked
    10,000 times inherits proportionally, which uniform-degree
    pagerank3 cannot express. Budget_allocate consumes this ranking."""
    from news_please_spark.operators.graph import (
        contract_to_hosts,
        pagerank_weighted_scaled,
    )

    edges = derived_edges(spark, sf_dir)
    he = contract_to_hosts(
        edges,
        F.concat(F.lit("h"), (F.col("src") % 7).cast("string")),
        F.concat(F.lit("h"), (F.col("dst") % 7).cast("string")),
    )
    hosts = (
        load(spark, sf_dir, "documents")
        .select(F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias("id"))
        .distinct()
    )
    return pagerank_weighted_scaled(he, hosts, iters=3).select(
        F.col("id").alias("host"), F.col("r").alias("rank_scaled")
    )


@register(
    "sentence_chunks",
    r"""
    WITH RECURSIVE s0 AS (
      SELECT doc_id,
             list_transform(
               list_filter(regexp_extract_all(text, '[^.!?]+[.!?]*'),
                           x -> trim(x) <> ''),
               x -> trim(x)) AS sents
      FROM documents
    ),
    sx AS (
      SELECT doc_id, CAST(generate_subscripts(sents, 1) AS BIGINT) AS idx,
             unnest(sents) AS sent
      FROM s0
    ),
    chain(doc_id, idx, chunk_id, cur) AS (
      SELECT doc_id, idx, 0, length(sent) FROM sx WHERE idx = 1
      UNION ALL
      SELECT s.doc_id, s.idx,
             CASE WHEN c.cur + 1 + length(s.sent) <= 200
                  THEN c.chunk_id ELSE c.chunk_id + 1 END,
             CASE WHEN c.cur + 1 + length(s.sent) <= 200
                  THEN c.cur + 1 + length(s.sent) ELSE length(s.sent) END
      FROM chain c JOIN sx s ON s.doc_id = c.doc_id AND s.idx = c.idx + 1
    )
    SELECT c.doc_id, CAST(c.chunk_id AS INT) AS chunk_id,
           string_agg(s.sent, ' ' ORDER BY c.idx) AS chunk_text,
           CAST(length(string_agg(s.sent, ' ' ORDER BY c.idx)) AS BIGINT) AS n_chars
    FROM chain c JOIN sx s ON s.doc_id = c.doc_id AND s.idx = c.idx
    GROUP BY 1, 2
    """,
)
def sentence_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-boundary greedy chunking at 200 chars
    (operators/sampling.py::sentence_chunks): the RAG/fine-tune
    complement to pack_sequences' exact-offset cuts. The entire
    sequential fold runs inside one codegen'd F.aggregate per document
    — zero shuffle; the oracle replays the same greedy recurrence as a
    DuckDB recursive CTE, so chunk boundaries must agree exactly."""
    from news_please_spark.operators.sampling import sentence_chunks

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    return sentence_chunks(docs, max_chars=200)


@register(
    "passage_chunks",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    w AS (
      SELECT doc_id, toks, len(toks) AS n,
             CAST(greatest(ceil((len(toks) - 64) / 48.0) + 1, 1) AS INT) AS nc
      FROM t
    )
    SELECT doc_id,
           CAST(c AS INT) AS chunk_id,
           CAST(c * 48 AS INT) AS start_tok,
           CAST(least(64, n - c * 48) AS INT) AS n_tok,
           array_to_string(list_slice(toks, c * 48 + 1, least(c * 48 + 64, n)), ' ')
             AS chunk_text
    FROM w, LATERAL (SELECT unnest(range(0, nc)) AS c)
    """,
)
def passage_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window passage chunking, 64-token windows at stride 48
    (operators/sampling.py::passage_chunks): overlapping RAG/embedding
    passages on the same window lattice as rolling_fingerprint, so a
    passage index aligns 1:1 with the containment fingerprints. Pure
    per-row array transforms — zero shuffle, zero Python."""
    from news_please_spark.operators.sampling import passage_chunks

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    return passage_chunks(docs, window_tokens=64, stride=48)


@register(
    "mirror_hosts",
    """
    WITH raw AS (
      SELECT 'm' || CAST(doc_id % 6 AS VARCHAR) || '.mir.test' AS host,
             '/p/' || CAST(doc_id % 40 AS VARCHAR) AS pathq,
             CASE
               WHEN doc_id % 6 IN (0, 3) THEN md5('m/p/' || CAST(doc_id % 40 AS VARCHAR))
               WHEN doc_id % 6 = 1 THEN md5('n/p/' || CAST(doc_id % 40 AS VARCHAR))
               WHEN doc_id % 6 = 4 THEN
                 CASE WHEN doc_id % 40 < 6
                      THEN md5('q/p/' || CAST(doc_id % 40 AS VARCHAR))
                      ELSE md5('n/p/' || CAST(doc_id % 40 AS VARCHAR)) END
               ELSE md5('u' || CAST(doc_id % 6 AS VARCHAR) || '/p/' || CAST(doc_id % 40 AS VARCHAR))
             END AS fp
      FROM documents
    ),
    u AS (SELECT host, pathq, max(fp) AS fp FROM raw GROUP BY 1, 2),
    ag AS (
      SELECT a.host AS host_a, b.host AS host_b, CAST(count(*) AS BIGINT) AS n_agree
      FROM u a JOIN u b ON a.pathq = b.pathq AND a.fp = b.fp AND a.host < b.host
      GROUP BY 1, 2
    ),
    cm AS (
      SELECT a.host AS host_a, b.host AS host_b, CAST(count(*) AS BIGINT) AS n_common
      FROM u a JOIN u b ON a.pathq = b.pathq AND a.host < b.host
      JOIN ag ON ag.host_a = a.host AND ag.host_b = b.host
      GROUP BY 1, 2
    )
    SELECT ag.host_a, ag.host_b, ag.n_agree,
           CAST(cm.n_common - ag.n_agree AS BIGINT) AS n_conflict,
           (ag.n_agree >= 3 AND cm.n_common = ag.n_agree) AS is_mirror
    FROM ag JOIN cm ON cm.host_a = ag.host_a AND cm.host_b = ag.host_b
    """,
)
def mirror_hosts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-host detection (operators/dust.py::mirror_hosts): hosts
    m0/m3 serve identical content (pure mirror), m1/m4 agree except on
    6 planted conflict paths (near-mirror, rejected), m2/m5 are unique.
    Candidates come from the (path, fp) join — fp spreads the key, so
    a popular path never builds a quadratic host cell; conflicts are
    counted only over candidate hosts."""
    from news_please_spark.operators.dust import mirror_hosts

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    c = d % 6
    path = F.concat(F.lit("/p/"), s(d % 40))
    fp = (
        F.when(c.isin(0, 3), F.md5(F.concat(F.lit("m"), path)))
        .when(c == 1, F.md5(F.concat(F.lit("n"), path)))
        .when(
            c == 4,
            F.when(d % 40 < 6, F.md5(F.concat(F.lit("q"), path))).otherwise(
                F.md5(F.concat(F.lit("n"), path))
            ),
        )
        .otherwise(F.md5(F.concat(F.lit("u"), s(c), path)))
    )
    urls = load(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://m"), s(c), F.lit(".mir.test"), path).alias("url"),
        fp.alias("content_fp"),
    )
    return mirror_hosts(urls, min_support=3)


@register(
    "compaction_plan",
    """
    WITH RECURSIVE inv AS (
      SELECT 'p' || CAST(doc_id % 8 AS VARCHAR) AS part,
             'f' || CAST(doc_id AS VARCHAR) AS file,
             CAST((n_chars * 131) % 9000 + 500 AS BIGINT) AS size_bytes
      FROM documents
    ),
    o AS (
      SELECT part, file, size_bytes,
             row_number() OVER (PARTITION BY part ORDER BY size_bytes DESC, file ASC) AS rn
      FROM inv
    ),
    chain(part, rn, file, size_bytes, bin_id, load) AS (
      SELECT part, rn, file, size_bytes, 0, size_bytes FROM o WHERE rn = 1
      UNION ALL
      SELECT n.part, n.rn, n.file, n.size_bytes,
             CASE WHEN c.load + n.size_bytes <= 16000 THEN c.bin_id ELSE c.bin_id + 1 END,
             CASE WHEN c.load + n.size_bytes <= 16000 THEN c.load + n.size_bytes ELSE n.size_bytes END
      FROM chain c JOIN o n ON n.part = c.part AND n.rn = c.rn + 1
    )
    SELECT part, file, size_bytes, CAST(bin_id AS INT) AS bin_id FROM chain
    """,
)
def compaction_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (operators/compaction.py): a
    synthetic per-partition file inventory (sizes 500-9499 bytes) packs
    into 16 kB rewrite groups by next-fit decreasing — the whole
    sequential policy runs as an O(n) per-group applyInPandas loop
    (one exchange); the oracle replays the recurrence as a recursive
    CTE over the same (size desc, name) order."""
    from news_please_spark.operators.compaction import compaction_plan

    inv = load(spark, sf_dir, "documents").select(
        F.concat(F.lit("p"), (F.col("doc_id") % 8).cast("string")).alias("part"),
        F.concat(F.lit("f"), F.col("doc_id").cast("string")).alias("file"),
        ((F.col("n_chars") * 131) % 9000 + 500).cast("long").alias("size_bytes"),
    )
    return compaction_plan(inv, target_bytes=16000)


@register(
    "distance_distribution",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    walk(root, node, d) AS (
      SELECT doc_id, doc_id, 0 FROM documents
      UNION ALL
      SELECT w.root, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < 3
    ),
    dist AS (SELECT root, node, min(d) AS d FROM walk GROUP BY 1, 2),
    per_r AS (SELECT d AS r, CAST(count(*) AS BIGINT) AS n_at FROM dist GROUP BY 1)
    SELECT r,
           CAST(sum(n_at) OVER (ORDER BY r) AS BIGINT) AS pairs_within,
           CAST((10000 * sum(n_at) OVER (ORDER BY r))
                // (SELECT sum(n_at) FROM per_r) AS BIGINT) AS frac_q
    FROM per_r
    """,
)
def distance_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distance distribution to radius 3 (the neighborhood
    function N(r) = reachable pairs within r, plus its fraction of all
    reached pairs in basis points) — the effective-diameter curve
    HyperBall was built to produce, here from the exact wave loop
    (operators/graph.py::ball_sizes machinery): cumulative sums over
    the per-depth min-distance pair counts."""
    from news_please_spark.operators.graph import ball_sizes

    edges = derived_edges(spark, sf_dir)
    nodes = load(spark, sf_dir, "documents").select("doc_id")
    balls = ball_sizes(edges, nodes, radius=3, id_col="doc_id")
    per_r = balls.select(
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("r"), F.lit(1).cast("long").alias("n")),
                F.struct(F.lit(1).alias("r"), (F.col("ball_1") - 1).alias("n")),
                F.struct(
                    F.lit(2).alias("r"), (F.col("ball_2") - F.col("ball_1")).alias("n")
                ),
                F.struct(
                    F.lit(3).alias("r"), (F.col("ball_3") - F.col("ball_2")).alias("n")
                ),
            )
        ).alias("e")
    ).groupBy(F.col("e.r").alias("r")).agg(F.sum("e.n").cast("long").alias("n_at"))
    total = per_r.agg(F.sum("n_at")).first()[0]
    w = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    return per_r.select(
        "r",
        F.sum("n_at").over(w).cast("long").alias("pairs_within"),
    ).withColumn(
        "frac_q", F.expr(f"(10000 * pairs_within) DIV CAST({total} AS BIGINT)")
    )


@register(
    "harmonic_centrality",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    walk(root, node, d) AS (
      SELECT doc_id, doc_id, 0 FROM documents
      UNION ALL
      SELECT w.root, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < 3
    ),
    dist AS (SELECT root, node, min(d) AS d FROM walk GROUP BY 1, 2)
    SELECT root AS doc_id,
           CAST(sum(CASE d WHEN 1 THEN 6 WHEN 2 THEN 3 WHEN 3 THEN 2 ELSE 0 END)
                AS BIGINT) AS harmonic_x6
    FROM dist GROUP BY 1
    """,
)
def harmonic_centrality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated harmonic centrality (Boldi & Vigna's centrality of
    choice for webgraphs — finite on disconnected graphs, unlike
    closeness): sum over reachable nodes of 1/d, truncated at radius 3
    and scaled by lcm(1,2,3)=6 so every term is an integer (6, 3, 2) —
    no float division crosses the engine boundary. Derived from the
    same exact ball loop as graph_balls; at 10^10 nodes the HyperBall
    register swap applies identically (harmonic sums are differences
    of consecutive neighborhood-function estimates)."""
    from news_please_spark.operators.graph import ball_sizes

    edges = derived_edges(spark, sf_dir)
    nodes = load(spark, sf_dir, "documents").select("doc_id")
    balls = ball_sizes(edges, nodes, radius=3, id_col="doc_id")
    return balls.select(
        F.col("id").alias("doc_id"),
        (
            6 * (F.col("ball_1") - 1)
            + 3 * (F.col("ball_2") - F.col("ball_1"))
            + 2 * (F.col("ball_3") - F.col("ball_2"))
        )
        .cast("long")
        .alias("harmonic_x6"),
    )


# rel=canonical world: five markup variants (attr order, quote style,
# case, a decoy stylesheet link, absence)
_CANON_HTML_SQL = """
    CASE doc_id % 5
      WHEN 0 THEN '<head><link rel="canonical" href="https://c.test/p/'
                  || CAST(doc_id % 50 AS VARCHAR) || '"/></head>'
      WHEN 1 THEN '<head><link href=''https://c.test/p/'
                  || CAST(doc_id % 50 AS VARCHAR) || ''' rel=''canonical''></head>'
      WHEN 2 THEN '<head><LINK REL="canonical" HREF="https://c.test/p/'
                  || CAST(doc_id % 50 AS VARCHAR) || '" /></head>'
      WHEN 3 THEN '<head><link rel="stylesheet" href="https://x.test/s.css">'
                  || '<link rel="canonical" href="https://c.test/p/'
                  || CAST(doc_id % 50 AS VARCHAR) || '"></head>'
      ELSE '<head><title>t</title></head>'
    END
"""


def _canon_html_col():
    d = F.col("doc_id")
    s = (d % 50).cast("string")
    v = d % 5
    return (
        F.when(v == 0, F.concat(F.lit('<head><link rel="canonical" href="https://c.test/p/'), s, F.lit('"/></head>')))
        .when(v == 1, F.concat(F.lit("<head><link href='https://c.test/p/"), s, F.lit("' rel='canonical'></head>")))
        .when(v == 2, F.concat(F.lit('<head><LINK REL="canonical" HREF="https://c.test/p/'), s, F.lit('" /></head>')))
        .when(v == 3, F.concat(F.lit('<head><link rel="stylesheet" href="https://x.test/s.css"><link rel="canonical" href="https://c.test/p/'), s, F.lit('"></head>')))
        .otherwise(F.lit("<head><title>t</title></head>"))
    )


@register(
    "canonical_links",
    rf"""
    WITH h AS (SELECT doc_id, {_CANON_HTML_SQL} AS html FROM documents),
    x AS (
      SELECT doc_id,
             regexp_extract(html,
               '(?i)<link[^>]*rel\s*=\s*[''"]canonical[''"][^>]*href\s*=\s*[''"]([^''"]+)[''"]', 1) AS a,
             regexp_extract(html,
               '(?i)<link[^>]*href\s*=\s*[''"]([^''"]+)[''"][^>]*rel\s*=\s*[''"]canonical[''"]', 1) AS b
      FROM h
    )
    SELECT doc_id,
           CASE WHEN a <> '' THEN a WHEN b <> '' THEN b END AS canonical_href
    FROM x
    """,
)
def canonical_links_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=canonical extraction (functions/urls.py::canonical_link_of):
    the publisher's own dedup signal, read with one native regexp pass
    robust to attribute order, quote style, case, decoy links, and
    absence (NULL) — the five planted markup variants. A crawler that
    honors it collapses AMP/print/tracking variants before any dup
    fetch; feeds url_dedup_key/dup_canonical."""
    from news_please_spark.functions.urls import canonical_link_of

    h = load(spark, sf_dir, "documents").select(
        "doc_id", _canon_html_col().alias("html")
    )
    return h.select("doc_id", canonical_link_of(F.col("html")).alias("canonical_href"))


_HREFLANG_LANGS = ["en", "de", "fr", "es"]


def _hreflang_world_cols():
    """(url, html) for the hreflang DocWorld: docs group into 4-page
    language clusters (en/de/fr/es) whose pages cross-declare each
    other via rel=alternate hreflang links in three markup variants
    (attr order / quote style / case); every doc_id % 17 == 0 page
    OMITS its 'es' declaration — the planted reciprocity break."""
    d = F.col("doc_id")
    langs = F.array(*[F.lit(x) for x in _HREFLANG_LANGS])
    grp = (d - d % 4).cast("string")
    own = F.element_at(langs, (d % 4 + 1).cast("int"))
    url = F.concat(F.lit("https://h.test/"), own, F.lit("/"), grp)
    nl = F.when(d % 17 == 0, F.lit(3)).otherwise(F.lit(4))
    v = d % 3

    def tag(m):
        lang = F.element_at(langs, (m + 1).cast("int"))
        u = F.concat(F.lit("https://h.test/"), lang, F.lit("/"), grp)
        return (
            F.when(
                v == 0,
                F.concat(
                    F.lit('<link rel="alternate" hreflang="'), lang,
                    F.lit('" href="'), u, F.lit('"/>'),
                ),
            )
            .when(
                v == 1,
                F.concat(
                    F.lit("<link hreflang='"), lang,
                    F.lit("' href='"), u, F.lit("' rel='alternate'>"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit('<LINK REL="alternate" HREF="'), u,
                    F.lit('" HREFLANG="'), lang, F.lit('">'),
                )
            )
        )

    html = F.array_join(F.transform(F.sequence(F.lit(0), nl - 1), tag), "")
    return url.alias("url"), html.alias("html")


@register(
    "hreflang_audit",
    r"""
    WITH d AS (
      SELECT doc_id,
             doc_id - doc_id % 4 AS grp,
             CASE WHEN doc_id % 17 = 0 THEN 3 ELSE 4 END AS nl
      FROM documents
    ),
    h AS (
      SELECT 'https://h.test/' || ['en','de','fr','es'][CAST(doc_id % 4 AS INT) + 1]
               || '/' || CAST(grp AS VARCHAR) AS url,
             array_to_string(list_transform(range(0, nl), m ->
               CASE CAST(doc_id % 3 AS INT)
                 WHEN 0 THEN '<link rel="alternate" hreflang="'
                             || ['en','de','fr','es'][CAST(m AS INT) + 1]
                             || '" href="https://h.test/'
                             || ['en','de','fr','es'][CAST(m AS INT) + 1]
                             || '/' || CAST(grp AS VARCHAR) || '"/>'
                 WHEN 1 THEN '<link hreflang=''' || ['en','de','fr','es'][CAST(m AS INT) + 1]
                             || ''' href=''https://h.test/'
                             || ['en','de','fr','es'][CAST(m AS INT) + 1]
                             || '/' || CAST(grp AS VARCHAR) || ''' rel=''alternate''>'
                 ELSE '<LINK REL="alternate" HREF="https://h.test/'
                      || ['en','de','fr','es'][CAST(m AS INT) + 1]
                      || '/' || CAST(grp AS VARCHAR) || '" HREFLANG="'
                      || ['en','de','fr','es'][CAST(m AS INT) + 1] || '">'
               END), '') AS html
      FROM d
    ),
    tags AS (
      SELECT url, unnest(regexp_extract_all(html, '(?i)<link[^>]*>')) AS tg FROM h
    ),
    e0 AS (
      SELECT url,
             lower(regexp_extract(tg, '(?i)hreflang\s*=\s*[''"]([^''"]+)[''"]', 1)) AS lang,
             regexp_extract(tg, '(?i)href\s*=\s*[''"]([^''"]+)[''"]', 1) AS href,
             lower(regexp_extract(tg, '(?i)rel\s*=\s*[''"]([^''"]+)[''"]', 1)) AS rel
      FROM tags
    ),
    alt AS (SELECT DISTINCT url, lang, href FROM e0
            WHERE rel = 'alternate' AND lang <> '' AND href <> ''),
    conf AS (
      SELECT a.url, a.lang, a.href FROM alt a
      WHERE EXISTS (SELECT 1 FROM alt b WHERE b.url = a.href AND b.href = a.url)
    ),
    nd AS (SELECT url, count(*) AS n_declared FROM alt GROUP BY 1),
    nc AS (SELECT url, count(*) AS n_confirmed FROM conf GROUP BY 1)
    SELECT nd.url, nd.n_declared,
           COALESCE(nc.n_confirmed, 0) AS n_confirmed,
           nd.n_declared = COALESCE(nc.n_confirmed, 0) AS reciprocal_ok
    FROM nd LEFT JOIN nc ON nc.url = nd.url
    """,
)
def hreflang_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hreflang reciprocal-confirmation audit
    (operators/dust.py::hreflang_reciprocity over
    functions/urls.py::hreflang_alternates_of): language-variant
    clusters are only trusted when pages declare each other BACK —
    the published trust rule, and the crawler's variant-dedup gate.
    DocWorld: 4-page en/de/fr/es clusters in three markup variants;
    every doc_id % 17 == 0 page omits its 'es' declaration, so the
    corresponding es pages must surface as reciprocal_ok = false with
    n_confirmed < n_declared."""
    from news_please_spark.operators.dust import hreflang_reciprocity

    docs = spread(load(spark, sf_dir, "documents").select("doc_id"), spark)
    url, html = _hreflang_world_cols()
    return hreflang_reciprocity(docs.select(url, html))


_REVAL_NOW = "2026-06-01 00:00:00"


@register(
    "revalidation_plan",
    f"""
    WITH f AS (
      SELECT 'https://r.test/p/' || CAST(event_id AS VARCHAR) AS url,
             ts AS fetched_at,
             CASE event_id % 4 WHEN 0 THEN 3600 WHEN 1 THEN 604800
                               WHEN 3 THEN 0 END AS max_age_s,
             CASE WHEN event_id % 3 = 0 THEN 'W/"' || CAST(event_id AS VARCHAR) || '"' END AS etag,
             CASE WHEN event_id % 5 <> 0 THEN ts END AS last_modified
      FROM events
    ),
    a AS (
      SELECT *,
             CAST(epoch(TIMESTAMP '{_REVAL_NOW}') AS BIGINT)
               - CAST(floor(epoch(fetched_at)) AS BIGINT) AS age_s
      FROM f
    )
    SELECT url, age_s,
           CASE
             WHEN max_age_s IS NOT NULL AND age_s < max_age_s THEN 'fresh'
             WHEN etag IS NOT NULL OR last_modified IS NOT NULL THEN 'revalidate'
             ELSE 'refetch'
           END AS action,
           CASE
             WHEN max_age_s IS NOT NULL AND age_s < max_age_s THEN NULL
             WHEN etag IS NOT NULL THEN 'etag'
             WHEN last_modified IS NOT NULL THEN 'last-modified'
           END AS validator
    FROM a
    """,
)
def revalidation_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP revalidation planner (operators/recrawl.py::
    revalidation_plan): events map to a fetch-metadata table with four
    max-age classes (1h, 7d, none, 0) and independent ETag /
    Last-Modified presence — every (action, validator) combination is
    populated. One codegen'd CASE, zero shuffle; `now` is an explicit
    literal (determinism/replay contract)."""
    from news_please_spark.operators.recrawl import revalidation_plan

    ev = load(spark, sf_dir, "events").select(
        F.concat(F.lit("https://r.test/p/"), F.col("event_id").cast("string")).alias("url"),
        F.col("ts").alias("fetched_at"),
        F.when(F.col("event_id") % 4 == 0, 3600)
        .when(F.col("event_id") % 4 == 1, 604800)
        .when(F.col("event_id") % 4 == 3, 0)
        .cast("long")
        .alias("max_age_s"),
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit('W/"'), F.col("event_id").cast("string"), F.lit('"')),
        ).alias("etag"),
        F.when(F.col("event_id") % 5 != 0, F.col("ts")).alias("last_modified"),
    )
    return revalidation_plan(ev, _REVAL_NOW)


@register(
    "seed_select",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    he AS (
      SELECT 'h' || CAST(src % 7 AS VARCHAR) AS src,
             'h' || CAST(dst % 7 AS VARCHAR) AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM edges GROUP BY 1, 2
    ),
    hosts AS (SELECT DISTINCT 'h' || CAST(doc_id % 7 AS VARCHAR) AS id FROM documents),
    ow AS (SELECT src AS id, sum(w) AS ow FROM he GROUP BY 1),
    r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM hosts),
    f1 AS (
      SELECT he.dst AS id, CAST(sum(((85 * r0.r) // 100) * he.w // ow.ow) AS BIGINT) AS fin
      FROM he JOIN r0 ON r0.id = he.src JOIN ow ON ow.id = he.src GROUP BY 1
    ),
    r1 AS (SELECT h.id, CAST(150000 + coalesce(f1.fin, 0) AS BIGINT) AS r
           FROM hosts h LEFT JOIN f1 ON f1.id = h.id),
    f2 AS (
      SELECT he.dst AS id, CAST(sum(((85 * r1.r) // 100) * he.w // ow.ow) AS BIGINT) AS fin
      FROM he JOIN r1 ON r1.id = he.src JOIN ow ON ow.id = he.src GROUP BY 1
    ),
    r2 AS (SELECT h.id, CAST(150000 + coalesce(f2.fin, 0) AS BIGINT) AS r
           FROM hosts h LEFT JOIN f2 ON f2.id = h.id),
    f3 AS (
      SELECT he.dst AS id, CAST(sum(((85 * r2.r) // 100) * he.w // ow.ow) AS BIGINT) AS fin
      FROM he JOIN r2 ON r2.id = he.src JOIN ow ON ow.id = he.src GROUP BY 1
    ),
    rank3 AS (SELECT h.id AS host, CAST(150000 + coalesce(f3.fin, 0) AS BIGINT) AS rank_scaled
              FROM hosts h LEFT JOIN f3 ON f3.id = h.id),
    walk(root, node, d) AS (
      SELECT doc_id, doc_id, 0 FROM documents
      UNION ALL
      SELECT w.root, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < 2
    ),
    dist AS (SELECT root, node, min(d) AS d FROM walk GROUP BY 1, 2),
    balls AS (SELECT root AS doc_id, CAST(count(*) AS BIGINT) AS ball_2
              FROM dist GROUP BY 1),
    cand AS (
      SELECT b.doc_id, 'h' || CAST(b.doc_id % 7 AS VARCHAR) AS host, b.ball_2,
             row_number() OVER (PARTITION BY b.doc_id % 7
                                ORDER BY b.ball_2 DESC, b.doc_id ASC) AS rn
      FROM balls b
    )
    SELECT c.host, c.doc_id, c.ball_2, r.rank_scaled,
           CAST(row_number() OVER (
             ORDER BY r.rank_scaled DESC, c.host ASC, c.rn ASC
           ) - 1 AS BIGINT) AS pick_order
    FROM cand c JOIN rank3 r ON r.host = c.host
    WHERE c.rn <= 2
    """,
)
def seed_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier seed selection — the new graph signals composed into
    the crawl's actual first decision: per host take the 2 pages with
    the largest 2-balls (widest immediate reach; ties on id), then
    order the global seed list by weighted host rank (the budget
    signal), host, local rank. WITH RECURSIVE oracle replays both
    signals; the Spark side composes ball_sizes +
    contract_to_hosts/pagerank_weighted_scaled + one window."""
    from news_please_spark.operators.graph import (
        ball_sizes,
        contract_to_hosts,
        pagerank_weighted_scaled,
    )

    edges = derived_edges(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    he = contract_to_hosts(
        edges,
        F.concat(F.lit("h"), (F.col("src") % 7).cast("string")),
        F.concat(F.lit("h"), (F.col("dst") % 7).cast("string")),
    )
    hosts = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias("id")
    ).distinct()
    ranks = pagerank_weighted_scaled(he, hosts, iters=3).select(
        F.col("id").alias("host"), F.col("r").alias("rank_scaled")
    )
    balls = ball_sizes(edges, docs, radius=2, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "ball_2"
    )
    cand = balls.withColumn(
        "host", F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"))
    )
    w = Window.partitionBy("host").orderBy(
        F.col("ball_2").desc(), F.col("doc_id").asc()
    )
    top2 = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    joined = top2.join(F.broadcast(ranks), "host")
    order = Window.orderBy(
        F.col("rank_scaled").desc(), F.col("host").asc(), F.col("rn").asc()
    )
    return joined.select(
        "host",
        "doc_id",
        "ball_2",
        "rank_scaled",
        (F.row_number().over(order) - 1).cast("long").alias("pick_order"),
    )


@register(
    "rrf_fuse",
    """
    WITH items AS (
      SELECT doc_id, CAST(doc_id % 5 AS BIGINT) AS query,
             'd' || CAST(doc_id AS VARCHAR) AS item
      FROM documents
    ),
    ra AS (
      SELECT query, item,
             row_number() OVER (PARTITION BY query ORDER BY md5('a' || item)) AS rank
      FROM items QUALIFY rank <= 10
    ),
    rb AS (
      SELECT query, item,
             row_number() OVER (PARTITION BY query ORDER BY md5('b' || item)) AS rank
      FROM items WHERE doc_id % 3 <> 0 QUALIFY rank <= 10
    ),
    sa AS (SELECT query, item, CAST(10000000 // (60 + rank) AS BIGINT) AS ra FROM ra),
    sb AS (SELECT query, item, CAST(10000000 // (60 + rank) AS BIGINT) AS rb FROM rb),
    f AS (
      SELECT coalesce(sa.query, sb.query) AS query,
             coalesce(sa.item, sb.item) AS item,
             CAST(coalesce(sa.ra, 0) + coalesce(sb.rb, 0) AS BIGINT) AS rrf_q
      FROM sa FULL OUTER JOIN sb ON sa.query = sb.query AND sa.item = sb.item
    )
    SELECT query, item, rrf_q,
           CAST(row_number() OVER (PARTITION BY query ORDER BY rrf_q DESC, item ASC) AS INT) AS fused_rank
    FROM f
    """,
)
def rrf_fuse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (operators/terms.py::rrf_fuse, SIGIR'09):
    two deterministic top-10 runs per query (md5-salted orderings; run
    B misses a third of the items, exercising the missing-run term)
    fuse by integer-exact floor(10^7/(60+rank)) sums. The hybrid
    lexical+dense combiner for bm25_topk x *_topk outputs."""
    from news_please_spark.operators.terms import rrf_fuse

    items = load(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 5).cast("long").alias("query"),
        F.concat(F.lit("d"), F.col("doc_id").cast("string")).alias("item"),
        "doc_id",
    )
    wa = Window.partitionBy("query").orderBy(F.md5(F.concat(F.lit("a"), F.col("item"))))
    wb = Window.partitionBy("query").orderBy(F.md5(F.concat(F.lit("b"), F.col("item"))))
    ra = (
        items.withColumn("rank", F.row_number().over(wa))
        .filter(F.col("rank") <= 10)
        .select("query", "item", "rank")
    )
    rb = (
        items.filter(F.col("doc_id") % 3 != 0)
        .withColumn("rank", F.row_number().over(wb))
        .filter(F.col("rank") <= 10)
        .select("query", "item", "rank")
    )
    return rrf_fuse(ra, rb).select(
        "query", "item", "rrf_q", F.col("fused_rank").cast("int").alias("fused_rank")
    )


@register(
    "bbit_near_dup",
    rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents WHERE doc_id % 29 = 0
    ),
    s AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
      FROM t WHERE len(toks) >= 3
    ),
    b AS (
      SELECT s.doc_id, i.i,
             CASE WHEN ('0x' || substr(
                    list_aggregate(
                      list_transform(s.shingles,
                                     sh -> md5(CAST(i.i AS VARCHAR) || '|' || sh)),
                      'min'),
                    32, 1))::BIGINT % 2 = 1 THEN 1 ELSE 0 END AS bit
      FROM s, (SELECT unnest(range(32)) AS i) i
    ),
    sig AS (
      SELECT doc_id, CAST(sum(CAST(bit AS BIGINT) << i) AS BIGINT) AS sig
      FROM b GROUP BY doc_id
    ),
    p AS (
      SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
             CAST(32 - bit_count(xor(a.sig, b2.sig)) AS BIGINT) AS matched_bits
      FROM sig a JOIN sig b2 ON a.doc_id < b2.doc_id
    )
    SELECT doc_a, doc_b, matched_bits,
           CAST(CASE WHEN 2 * matched_bits - 32 <= 0 THEN 0
                     ELSE (10000 * (2 * matched_bits - 32)) // 32 END AS BIGINT) AS sim_est_q
    FROM p
    """,
)
def bbit_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit minhash near-dup estimation (operators/dedup.py::
    bbit_minhash_sigs/_sim, Li & König WWW'10): k=32 low bits packed
    into ONE BIGINT per doc — the 64x-compressed signature that makes
    the 10^10-doc signature table joinable; all-pairs over the
    doc_id%29 sample (sample-sized cost contract, as lsh_recall_audit).
    Bit arithmetic is engine-portable (md5 parity, XOR, popcount), so
    even the ESTIMATOR is hash-checked cross-engine."""
    from news_please_spark.operators.dedup import (
        bbit_minhash_sigs,
        bbit_minhash_sim,
    )

    docs = spread(
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 29 == 0),
        spark,
    )
    sigs = bbit_minhash_sigs(docs, k=32)
    ids = sigs.select("doc_id")
    pairs = (
        ids.select(F.col("doc_id").alias("doc_a"))
        .join(ids.select(F.col("doc_id").alias("doc_b")))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    return bbit_minhash_sim(pairs, sigs, k=32)


@register(
    "lang_segments",
    r"""
    WITH m AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 2 = 0 THEN ' Der die und der. Die und der die.' ELSE '' END
               || CASE WHEN doc_id % 3 = 0 THEN ' El los y el los.' ELSE '' END AS text
      FROM documents
    ),
    s0 AS (
      SELECT doc_id,
             list_transform(
               list_filter(regexp_extract_all(text, '[^.!?]+[.!?]*'),
                           x -> trim(x) <> ''),
               x -> trim(x)) AS sents
      FROM m
    ),
    sx AS (
      SELECT doc_id, CAST(generate_subscripts(sents, 1) AS BIGINT) AS idx,
             unnest(sents) AS sent
      FROM s0
    ),
    lv AS (
      SELECT doc_id, idx, sent,
             len(list_filter(string_split_regex(trim(sent), '\s+'),
                             x -> x IN ('the', 'a', 'of', 'and'))) AS s_en,
             len(list_filter(string_split_regex(trim(sent), '\s+'),
                             x -> x IN ('der', 'die', 'und'))) AS s_de,
             len(list_filter(string_split_regex(trim(sent), '\s+'),
                             x -> x IN ('el', 'los', 'y'))) AS s_es
      FROM sx
    ),
    lg AS (
      SELECT doc_id, idx, sent,
             CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
                  WHEN s_de >= s_es AND s_de > 0 THEN 'de'
                  WHEN s_es > 0 THEN 'es'
                  ELSE 'und' END AS lang
      FROM lv
    ),
    runs AS (
      SELECT doc_id, idx, sent, lang,
             CASE WHEN lag(lang) OVER w IS DISTINCT FROM lang THEN 1 ELSE 0 END AS brk
      FROM lg WINDOW w AS (PARTITION BY doc_id ORDER BY idx)
    ),
    segd AS (
      SELECT doc_id, idx, sent, lang,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY idx) - 1 AS seg_id
      FROM runs
    )
    SELECT doc_id, CAST(seg_id AS INT) AS seg_id, lang,
           CAST(count(*) AS BIGINT) AS n_sentences,
           string_agg(sent, ' ' ORDER BY idx) AS seg_text
    FROM segd GROUP BY doc_id, seg_id, lang
    """,
)
def lang_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switch segmentation (operators/stats.py::lang_segments):
    documents get planted German and/or Spanish sentence runs appended
    (doc_id%2 / %3), then per-sentence stopword-vote lang-id merges
    into maximal same-language runs — one codegen'd fold per document,
    zero shuffle. The oracle replays sentence split, voting, and the
    run-length grouping with windows."""
    from news_please_spark.operators.stats import lang_segments

    d = F.col("doc_id")
    mixed = F.concat(
        F.col("text"),
        F.when(d % 2 == 0, F.lit(" Der die und der. Die und der die.")).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.lit(" El los y el los.")).otherwise(F.lit("")),
    )
    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", mixed.alias("text")),
        spark,
    )
    return lang_segments(docs)


# ---------------------------------------------------------------------------
# deterministic two-level epoch shuffle (training-loader tier)


@register(
    "epoch_shard_shuffle",
    """
    WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),
    e AS (SELECT doc_id, unnest(range(0, 3)) AS epoch FROM ids),
    k AS (
      SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
             md5('shuf:' || CAST(epoch AS VARCHAR) || ':' || doc_id) AS skey
      FROM e
    ),
    s AS (
      SELECT epoch, doc_id, skey,
             CAST(('0x' || substr(skey, 1, 8))::BIGINT % 64 AS BIGINT) AS shard
      FROM k
    )
    SELECT epoch, doc_id, shard,
           CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY skey) - 1
                AS BIGINT) AS pos
    FROM s
    """,
)
def epoch_shard_shuffle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic two-level epoch shuffle
    (operators/shuffle.py::epoch_shard_shuffle): 3 epochs x 64 shards over
    the documents ids. Every (epoch, id) is keyed by md5(salt:e:id);
    the key's top 32 bits pick the shard, the full key orders the
    cell — the global epoch order is (shard, pos). ONE exchange on
    (epoch, shard) and a bounded per-cell sort; no global row_number,
    no RNG, bit-identical on rerun/resume. The oracle replays key,
    shard route, and cell rank."""
    from news_please_spark.operators.shuffle import epoch_shard_shuffle

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return epoch_shard_shuffle(docs, id_col="doc_id", epochs=3, n_shards=64, salt="shuf")


# ---------------------------------------------------------------------------
# soft-404 / error-template detection (content-side complement of
# crawl_traps' URL-side template_fanout)

_S404_PG_SQL = """
  SELECT 'h' || CAST(doc_id % 6 AS VARCHAR) || '.example.com' AS host,
         CASE WHEN doc_id % 6 = 2 THEN '/q/' || CAST(doc_id % 3 AS VARCHAR)
              ELSE '/p/' || CAST(doc_id AS VARCHAR) END AS path,
         CASE WHEN doc_id % 6 = 0 THEN
                CASE WHEN doc_id % 30 = 0
                     THEN 'live-' || CAST(doc_id AS VARCHAR)
                     ELSE 'tmpl-err-h0' END
              WHEN doc_id % 6 = 1 THEN
                CASE WHEN doc_id % 30 = 1
                     THEN 'live-' || CAST(doc_id AS VARCHAR)
                     ELSE 'tmpl-long-h1' END
              WHEN doc_id % 6 = 2 THEN 'tmpl-few-h2'
              ELSE 'u-' || CAST(doc_id AS VARCHAR) END AS fp,
         CASE WHEN doc_id % 6 = 0 AND doc_id % 30 <> 0 THEN 90
              WHEN doc_id % 6 = 2 THEN 90
              WHEN doc_id % 6 = 1 THEN 3000
              WHEN doc_id % 6 = 0 THEN 3000
              ELSE 500 END AS n_chars
  FROM documents
"""


def _s404_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    host = F.concat(F.lit("h"), s(d % 6), F.lit(".example.com"))
    path = F.when(d % 6 == 2, F.concat(F.lit("/q/"), s(d % 3))).otherwise(
        F.concat(F.lit("/p/"), s(d))
    )
    fp = (
        F.when(
            d % 6 == 0,
            F.when(d % 30 == 0, F.concat(F.lit("live-"), s(d))).otherwise(
                F.lit("tmpl-err-h0")
            ),
        )
        .when(
            d % 6 == 1,
            F.when(d % 30 == 1, F.concat(F.lit("live-"), s(d))).otherwise(
                F.lit("tmpl-long-h1")
            ),
        )
        .when(d % 6 == 2, F.lit("tmpl-few-h2"))
        .otherwise(F.concat(F.lit("u-"), s(d)))
    )
    chars = (
        F.when((d % 6 == 0) & (d % 30 != 0), F.lit(90))
        .when(d % 6 == 2, F.lit(90))
        .when(d % 6 == 1, F.lit(3000))
        .when(d % 6 == 0, F.lit(3000))
        .otherwise(F.lit(500))
    )
    return load(spark, sf_dir, "documents").select(
        host.alias("host"), path.alias("path"), fp.alias("fp"),
        chars.alias("n_chars"),
    )


@register(
    "soft_404",
    f"""
    WITH pg AS ({_S404_PG_SQL}),
    cells AS (
      SELECT host, fp,
             CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
             CAST(count(*) AS BIGINT) AS n_urls,
             CAST(max(n_chars) AS BIGINT) AS chars_max
      FROM pg GROUP BY host, fp
    ),
    tot AS (
      SELECT host, CAST(sum(n_urls) AS BIGINT) AS host_urls
      FROM cells GROUP BY host
    )
    SELECT c.host, c.fp, c.n_paths, c.n_urls, t.host_urls,
           CAST((10000 * c.n_urls) // t.host_urls AS BIGINT) AS share_q,
           c.chars_max,
           CAST(CASE WHEN c.n_paths >= 10
                      AND (10000 * c.n_urls) // t.host_urls >= 2000
                      AND c.chars_max <= 200
                     THEN 1 ELSE 0 END AS BIGINT) AS is_soft404
    FROM cells c JOIN tot t USING (host)
    """,
)
def soft_404_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection (operators/soft404.py::soft404_cells) on a
    planted page world: h0 serves one short error template under many
    distinct paths (flagged); h1's dominant template is article-length
    (size cap rejects); h2's short template sits under only 3 paths
    (path-diversity rejects); other hosts are all-unique. Every
    exchange is over (host, fp) CELL tables — page rows aggregate
    exactly once."""
    from news_please_spark.operators.soft404 import soft404_cells

    return soft404_cells(
        _s404_pages(spark, sf_dir), min_paths=10, min_share_bp=2000, max_chars=200
    )


# ---------------------------------------------------------------------------
# IP-pooled politeness admission (CDN / shared-hosting pooling)


@register(
    "ip_politeness",
    """
    WITH c AS (
      SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) AS host,
             'ip-' || CAST((doc_id % 20) % 7 AS VARCHAR) AS ip,
             'https://h' || CAST(doc_id % 20 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 1000 AS BIGINT) AS prio
      FROM documents
    )
    SELECT host, url, prio, ip,
           CAST(CASE WHEN row_number() OVER (PARTITION BY ip
                                             ORDER BY prio, url) <= 5
                     THEN 1 ELSE 0 END AS BIGINT) AS is_admitted
    FROM c
    """,
)
def ip_politeness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP-pooled politeness (operators/ippool.py::ip_pooled_admission):
    20 vhosts resolve onto 7 addresses (CDN/shared-hosting shape), and
    admission ranks top-5 per ADDRESS, not per host — the quota hosts
    behind one edge share. One host-grain DNS-map join + the salted
    two-phase top-k (no single-task sort of a fat CDN cell); the
    oracle replays the pooled ranking with a plain window."""
    from news_please_spark.operators.ippool import ip_pooled_admission

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    host = F.concat(F.lit("h"), s(d % 20))
    docs = load(spark, sf_dir, "documents")
    candidates = docs.select(
        host.alias("host"),
        F.concat(
            F.lit("https://h"), s(d % 20), F.lit(".example.com/p/"), s(d)
        ).alias("url"),
        (
            F.conv(F.substring(F.md5(s(d)), 1, 8), 16, 10).cast("long")
            % 1000
        ).alias("prio"),
    )
    host_ip = docs.select(
        host.alias("host"),
        F.concat(F.lit("ip-"), s((d % 20) % 7)).alias("ip"),
    ).distinct()
    return ip_pooled_admission(candidates, host_ip, k=5, salt_buckets=4)


# ---------------------------------------------------------------------------
# hygiene drop-reason ledger over the planted corpus (pipeline
# observability: the first stage that dropped each doc)

_AUDIT_TAIL = """SELECT c.doc_id,
           CASE WHEN s4.doc_id IS NOT NULL THEN 'kept'
                WHEN s3.doc_id IS NOT NULL THEN 'repetitive'
                WHEN s2.doc_id IS NOT NULL THEN 'contaminated'
                WHEN s1.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'exact_dup' END AS verdict
    FROM corpus c
    LEFT JOIN s1 ON s1.doc_id = c.doc_id
    LEFT JOIN s2 ON s2.doc_id = c.doc_id
    LEFT JOIN s3 ON s3.doc_id = c.doc_id
    LEFT JOIN s4 ON s4.doc_id = c.doc_id"""


@register("clean_audit", None)
def clean_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-reason ledger (pipeline.clean_corpus_audit) over the SAME
    planted corpus as corpus_clean: one row per input doc, verdict =
    first hygiene stage that dropped it (exact_dup | near_dup |
    contaminated | repetitive) or kept. Built on the identical
    _clean_stages plan the pipeline executes, so the ledger cannot
    drift from its decisions; the oracle rewrites corpus_clean's CTE
    chain tail into a four-way survivor-presence CASE. One id-keyed
    left join per stage — the corpus text never re-shuffles."""
    from news_please_spark.pipeline import clean_corpus_audit

    corpus, bench = _planted_corpus(spark, sf_dir)
    return clean_corpus_audit(
        corpus, bench, jaccard_threshold=0.5, top_bigram_q_max=2000,
        materialize_stages=True,
    )


assert _CLEAN_TAIL in ORACLES["corpus_clean"]
ORACLES["clean_audit"] = ORACLES["corpus_clean"].replace(_CLEAN_TAIL, _AUDIT_TAIL)


# ---------------------------------------------------------------------------
# loader-side shard manifest over the epoch_shard_shuffle schedule


@register(
    "shard_manifest",
    """
    WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),
    e AS (SELECT doc_id, unnest(range(0, 3)) AS epoch FROM ids),
    k AS (
      SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
             md5('shuf:' || CAST(epoch AS VARCHAR) || ':' || doc_id) AS skey
      FROM e
    ),
    s AS (
      SELECT epoch, doc_id, skey,
             CAST(('0x' || substr(skey, 1, 8))::BIGINT % 64 AS BIGINT) AS shard
      FROM k
    ),
    sched AS (
      SELECT epoch, doc_id, shard,
             CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY skey)
                  - 1 AS BIGINT) AS pos
      FROM s
    )
    SELECT epoch, shard, CAST(count(*) AS BIGINT) AS n_items,
           md5(string_agg(CAST(pos AS VARCHAR) || ':' || doc_id, ','
                          ORDER BY pos)) AS digest
    FROM sched GROUP BY epoch, shard
    """,
)
def shard_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard integrity manifest (operators/shuffle.py::shard_manifest)
    over the 3x64 epoch_shard_shuffle schedule: per-cell item count +
    order-sensitive md5 of the "pos:id" stream — what a loader worker
    verifies before training on its shard. One cell-grain aggregation
    on top of the schedule's single exchange."""
    from news_please_spark.operators.shuffle import (
        epoch_shard_shuffle,
        shard_manifest,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    sched = epoch_shard_shuffle(
        docs, id_col="doc_id", epochs=3, n_shards=64, salt="shuf"
    )
    return shard_manifest(sched)


# ---------------------------------------------------------------------------
# per-host BYTE-budget admission for media fetches (interleaved tier)


@register(
    "media_byte_budget",
    """
    WITH c AS (
      SELECT 'h' || CAST(doc_id % 8 AS VARCHAR) AS host,
             'm/' || CAST(doc_id AS VARCHAR) AS media_ref,
             CAST(CASE WHEN doc_id % 11 = 0 THEN 5000000
                       ELSE 50000 + (doc_id % 7) * 1000 END AS BIGINT)
               AS est_bytes,
             CAST(doc_id % 97 AS BIGINT) AS prio
      FROM documents
    )
    SELECT host, media_ref, est_bytes, prio,
           CAST(sum(est_bytes) OVER (PARTITION BY host ORDER BY prio, media_ref
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_bytes,
           CAST(CASE WHEN sum(est_bytes) OVER (PARTITION BY host
                          ORDER BY prio, media_ref
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          <= 300000
                     THEN 1 ELSE 0 END AS BIGINT) AS is_admitted
    FROM c
    """,
)
def media_byte_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget media admission
    (operators/ordering.py::admit_by_byte_budget): per-host greedy
    prefix under a 300 kB budget over a media population where every
    11th ref is a 5 MB video — the case request-count politeness
    mis-prices. Video rows blow the budget and block their suffix
    (order-stable, no re-pack); image-only hosts admit a few. One
    exchange on host; the oracle replays the inclusive running sum."""
    from news_please_spark.operators.ordering import admit_by_byte_budget

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    cands = load(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), s(d % 8)).alias("host"),
        F.concat(F.lit("m/"), s(d)).alias("media_ref"),
        F.when(d % 11 == 0, F.lit(5000000))
        .otherwise(F.lit(50000) + (d % 7) * 1000)
        .cast("long")
        .alias("est_bytes"),
        (d % 97).cast("long").alias("prio"),
    )
    return admit_by_byte_budget(cands, budget_bytes=300000)


# ---------------------------------------------------------------------------
# stride-scheduler mixture interleave (training-loader tier)


@register(
    "mixture_interleave",
    """
    WITH j AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
               AS j
      FROM documents
    ),
    v AS (
      SELECT doc_id, source, j,
             CAST((2 * j + 1) *
                  (12 // (1 + (CAST(substr(source, 4) AS BIGINT) % 4)))
                  AS BIGINT) AS vtime
      FROM j
    )
    SELECT doc_id, source, j, vtime,
           CAST(row_number() OVER (ORDER BY vtime, source, j) - 1 AS BIGINT)
             AS mix_pos
    FROM v
    """,
)
def mixture_interleave_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-scheduler mixture interleave
    (operators/sampling.py::mixture_interleave): source srcN gets
    integer weight 1+(N%4), L=lcm(1..4)=12, and its j-th item (dense
    per-source md5 rank via the scale-safe with_group_seq) lands at
    vtime (2j+1)*(L/w) — every prefix of the mix_pos order holds
    sources in weight proportion within one item. All-BIGINT; the
    oracle replays rank, stride, and global order with windows."""
    from news_please_spark.operators.sampling import mixture_interleave

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    weights = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (
                1 + F.substring("source", 4, 10).cast("long") % 4
            ).cast("long").alias("weight"),
        )
    )
    out = mixture_interleave(docs, weights)
    return out.select("doc_id", "source", "j", "vtime", "mix_pos")


# ---------------------------------------------------------------------------
# sentence-segment content diff between crawl snapshots


@register(
    "segment_diff",
    """
    WITH a0 AS (
      SELECT 'com,site)/p/' || CAST(doc_id AS VARCHAR) AS urlkey, text
      FROM documents WHERE doc_id % 11 <> 0
    ),
    b0 AS (
      SELECT 'com,site)/p/' || CAST(doc_id AS VARCHAR) AS urlkey,
             CASE WHEN doc_id % 5 = 0
                  THEN text || ' Zz added tail sentence.'
                  ELSE text END AS text
      FROM documents WHERE doc_id % 13 <> 0
    ),
    sa AS (
      SELECT urlkey, md5(s) AS seg_md5, CAST(count(*) AS BIGINT) AS n_old
      FROM (
        SELECT urlkey,
               unnest(list_filter(
                 list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'),
                                x -> trim(x)),
                 x -> x <> '')) AS s
        FROM a0
      ) GROUP BY 1, 2
    ),
    sb AS (
      SELECT urlkey, md5(s) AS seg_md5, CAST(count(*) AS BIGINT) AS n_new
      FROM (
        SELECT urlkey,
               unnest(list_filter(
                 list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'),
                                x -> trim(x)),
                 x -> x <> '')) AS s
        FROM b0
      ) GROUP BY 1, 2
    )
    SELECT coalesce(sa.urlkey, sb.urlkey) AS urlkey,
           coalesce(sa.seg_md5, sb.seg_md5) AS seg_md5,
           CAST(coalesce(n_old, 0) AS BIGINT) AS n_old,
           CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
           CASE WHEN sa.seg_md5 IS NULL THEN 'added'
                WHEN sb.seg_md5 IS NULL THEN 'removed'
                ELSE 'kept' END AS status
    FROM sa FULL OUTER JOIN sb
      ON sa.urlkey = sb.urlkey AND sa.seg_md5 = sb.seg_md5
    """,
)
def segment_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level content delta (operators/cdx.py::segment_diff)
    between two synthetic captures: snapshot B appends a sentence to
    every 5th page, pages %11 are new in B, pages %13 are gone — the
    added/removed/kept classes all populate, at segment grain (the
    re-index delta snapshot_url_diff's page digest can't give). Only
    fixed-width (urlkey, md5) keys shuffle."""
    from news_please_spark.operators.cdx import segment_diff

    d = F.col("doc_id")
    key = F.concat(F.lit("com,site)/p/"), d.cast("string"))
    docs = load(spark, sf_dir, "documents")
    old = docs.filter(d % 11 != 0).select(key.alias("urlkey"), "text")
    new = docs.filter(d % 13 != 0).select(
        key.alias("urlkey"),
        F.when(d % 5 == 0, F.concat(F.col("text"), F.lit(" Zz added tail sentence.")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return segment_diff(old, new)


# ---------------------------------------------------------------------------
# GCRA (token-bucket) fetch admission with exact recursive replay


@register(
    "rate_limit_gcra",
    """
    WITH RECURSIVE e AS (
      SELECT 'h' || CAST(user_id AS VARCHAR) AS host, event_id,
             epoch_us(ts) AS t_us
      FROM events
    ),
    o AS (
      SELECT host, event_id, t_us,
             CAST(row_number() OVER (PARTITION BY host
                                     ORDER BY t_us, event_id) AS BIGINT) AS idx
      FROM e
    ),
    chain(host, idx, event_id, t_us, adm, tat) AS (
      SELECT host, idx, event_id, t_us, TRUE, t_us + 60000000
      FROM o WHERE idx = 1
      UNION ALL
      SELECT o.host, o.idx, o.event_id, o.t_us,
             o.t_us >= c.tat - 120000000,
             CASE WHEN o.t_us >= c.tat - 120000000
                  THEN greatest(o.t_us, c.tat) + 60000000
                  ELSE c.tat END
      FROM chain c JOIN o ON o.host = c.host AND o.idx = c.idx + 1
    )
    SELECT host, event_id, CAST(t_us AS BIGINT) AS t_us,
           CAST(CASE WHEN adm THEN 1 ELSE 0 END AS BIGINT) AS admitted,
           CAST(tat AS BIGINT) AS tat_after
    FROM chain
    """,
)
def rate_limit_gcra_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst-aware token-bucket admission
    (operators/ratelimit.py::gcra_admission): events become per-host
    fetch arrivals (one host per user id — keeps every cell ~10^2
    rows at ALL scale factors), GCRA at 1 req/min with a 2-min burst
    allowance. The sequential recurrence runs as one Arrow batch per
    host cell (the documented politeness-state grain); the oracle
    replays the identical integer recurrence as a recursive CTE."""
    from news_please_spark.operators.ratelimit import gcra_admission

    ev = load(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), F.col("user_id").cast("string")).alias("host"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    )
    return gcra_admission(ev, rate_interval_us=60_000_000, burst_us=120_000_000)


# ---------------------------------------------------------------------------
# discovery-source attribution (crawl acquisition provenance)


@register(
    "first_discovery",
    """
    WITH disc AS (
      SELECT 'u' || CAST(doc_id % 300 AS VARCHAR) AS url,
             CASE doc_id % 3 WHEN 0 THEN 'sitemap'
                             WHEN 1 THEN 'link' ELSE 'feed' END AS channel,
             CAST((doc_id // 3) % 5 AS BIGINT) AS wave,
             's' || CAST(doc_id % 50 AS VARCHAR) AS src
      FROM documents
    ),
    r AS (
      SELECT *, CASE channel WHEN 'sitemap' THEN 0
                             WHEN 'feed' THEN 1 ELSE 2 END AS crank
      FROM disc
    )
    SELECT url, wave AS first_wave, channel, src FROM (
      SELECT *, row_number() OVER (PARTITION BY url
                                   ORDER BY wave, crank, src) AS rn
      FROM r
    ) WHERE rn = 1
    """,
)
def first_discovery_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discovery attribution (operators/stats.py::first_discovery):
    every URL's earliest (wave, channel-preference, src) discovery
    over a log where each URL is seen by several channels across
    waves (sitemap > feed > link on ties). Spark computes it as ONE
    map-side-combinable min(struct) on url — the oracle replays it
    with a window; same total order."""
    from news_please_spark.operators.stats import first_discovery

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    disc = load(spark, sf_dir, "documents").select(
        F.concat(F.lit("u"), s(d % 300)).alias("url"),
        F.when(d % 3 == 0, F.lit("sitemap"))
        .when(d % 3 == 1, F.lit("link"))
        .otherwise(F.lit("feed"))
        .alias("channel"),
        ((d / 3).cast("long") % 5).cast("long").alias("wave"),
        F.concat(F.lit("s"), s(d % 50)).alias("src"),
    )
    return first_discovery(disc, {"sitemap": 0, "feed": 1, "link": 2})


# ---------------------------------------------------------------------------
# declared-vs-detected language mismatch audit


@register(
    "lang_mismatch",
    r"""
    WITH t AS (
      SELECT source, lang, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    s AS (
      SELECT source, lang,
             len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) AS s_en,
             len(list_filter(toks, x -> x IN ('der', 'die', 'und'))) AS s_de,
             len(list_filter(toks, x -> x IN ('el', 'los', 'y'))) AS s_es
      FROM t
    ),
    p AS (
      SELECT source, lang,
             CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
                  WHEN s_de >= s_es AND s_de > 0 THEN 'de'
                  WHEN s_es > 0 THEN 'es'
                  ELSE 'und' END AS pred
      FROM s
    ),
    a AS (
      SELECT source, lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN pred <> 'und' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_det,
             CAST(sum(CASE WHEN pred <> 'und' AND pred <> lang
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
      FROM p GROUP BY 1, 2
    )
    SELECT source, lang, n_docs, n_det, n_mismatch,
           CAST(CASE WHEN n_det > 0 THEN (10000 * n_mismatch) // n_det
                     END AS BIGINT) AS mismatch_bp
    FROM a
    """,
)
def lang_mismatch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit (operators/stats.py::lang_mismatch_audit):
    per (source, declared-lang) slice, how often the oracle-gated
    stopword-vote detector (same votes as lang_id) contradicts the
    metadata tag — the gate before language-balanced sampling trusts
    labels. One map-side-combinable aggregation, detector fully
    codegen'd."""
    from news_please_spark.operators.stats import lang_mismatch_audit

    return lang_mismatch_audit(
        load(spark, sf_dir, "documents").select("source", "lang", "text")
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking (operators/rerank.py) — greedy integer MMR
# over exact quantized top-25 candidates; the DuckDB oracle replays the
# greedy as a recursive CTE with tagged working rows ('c' = remaining
# candidate state carrying the running max-sim-to-selected, 'p' = pick
# emissions), the crawl_politeness oracle's state pattern.
_MMR_LAM_NUM, _MMR_MU, _MMR_NCAND, _MMR_K = 7, 3, 25, 10
_MMR_ORACLE = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
q AS (SELECT vec_id, v FROM e WHERE vec_id % 101 = 0),
relall AS (
  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
         CAST(floor(10000 * (
           list_dot_product(q.v, e.v)
           / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v)))
         )) AS BIGINT) AS rel_q
  FROM q, e WHERE q.vec_id <> e.vec_id
),
cand AS (
  SELECT query_id, doc_id, rel_q FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY rel_q DESC, doc_id
    ) AS rk FROM relall
  ) WHERE rk <= {_MMR_NCAND}
),
ps AS (
  SELECT c1.query_id, c1.doc_id AS a, c2.doc_id AS b,
         CAST(floor(10000 * (
           list_dot_product(ea.v, eb.v)
           / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
         )) AS BIGINT) AS sim_q
  FROM cand c1
  JOIN cand c2 ON c1.query_id = c2.query_id AND c1.doc_id <> c2.doc_id
  JOIN e ea ON ea.vec_id = c1.doc_id
  JOIN e eb ON eb.vec_id = c2.doc_id
),
g(typ, query_id, doc_id, rel_q, max_sim, rnk, score) AS (
  SELECT 'c', query_id, doc_id, rel_q, NULL::BIGINT, 0::BIGINT, NULL::BIGINT
  FROM cand
  UNION ALL
  (
    WITH w AS (SELECT * FROM g),
    scored AS (
      SELECT query_id, doc_id, rel_q, max_sim, rnk,
             {_MMR_LAM_NUM}*rel_q - {_MMR_MU}*coalesce(max_sim, 0) AS score,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY ({_MMR_LAM_NUM}*rel_q - {_MMR_MU}*coalesce(max_sim, 0)) DESC,
                        doc_id
             ) AS rn
      FROM w WHERE typ = 'c'
    ),
    pick AS (
      SELECT query_id, doc_id, rnk + 1 AS rnk, score
      FROM scored WHERE rn = 1 AND rnk < {_MMR_K}
    ),
    rest AS (
      SELECT s.query_id, s.doc_id, s.rel_q,
             CASE WHEN s.max_sim IS NULL THEN p.sim_q
                  ELSE greatest(s.max_sim, p.sim_q) END AS max_sim,
             pk.rnk
      FROM scored s
      JOIN pick pk ON pk.query_id = s.query_id AND s.rn > 1
      JOIN ps p ON p.query_id = s.query_id
               AND p.a = s.doc_id AND p.b = pk.doc_id
    )
    SELECT 'c', query_id, doc_id, rel_q, max_sim, rnk, NULL::BIGINT FROM rest
    UNION ALL
    SELECT 'p', query_id, doc_id, NULL::BIGINT, NULL::BIGINT, rnk, score
    FROM pick
  )
)
SELECT query_id, doc_id, rnk AS mmr_rank, score AS mmr_q
FROM g WHERE typ = 'p'
"""


@register("mmr_rerank", _MMR_ORACLE)
def mmr_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval (operators/rerank.py::mmr_topk): exact
    quantized top-25 candidates per query (vec_id % 101), then the
    integer MMR greedy (lam = 7/10, k = 10) inside one cogrouped
    applyInPandas — near-duplicate neighbors are demoted in favor of
    novel ones, the post-ANN stage a dedup-aware retrieval pipeline
    runs. The corpus is touched only by the candidate generator; the
    greedy sees |Q| bounded groups of <= 25 integer rows."""
    from news_please_spark.operators.rerank import mmr_topk

    emb = spread(load(spark, sf_dir, "embeddings"), spark)
    q = emb.filter(F.col("vec_id") % 101 == 0)
    out = mmr_topk(
        q, emb, n_cand=_MMR_NCAND, k=_MMR_K,
        lam_num=_MMR_LAM_NUM, lam_den=_MMR_LAM_NUM + _MMR_MU,
    )
    return out.select(
        "query_id", "doc_id", F.col("rank").alias("mmr_rank"), "mmr_q"
    )


# ---------------------------------------------------------------------------
# Bounded-SCC cycle clusters on the derived webgraph — spider-trap
# detection (operators/graph.py::mutual_reach_clusters): hop-bounded
# directed closure ∩ its transpose, then connected components.
@register(
    "cycle_clusters",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    walk(root, node, d) AS (
      SELECT doc_id, doc_id, 0 FROM documents
      UNION ALL
      SELECT w.root, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < 3
    ),
    reach AS (SELECT DISTINCT root AS a, node AS b FROM walk WHERE root <> node),
    mut AS (
      SELECT r1.a, r1.b FROM reach r1
      JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
    ),
    cc(src, node) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM mut)
      UNION
      SELECT c.src, m.b FROM cc c JOIN mut m ON m.a = c.node
    )
    SELECT src AS doc_id, CAST(min(node) AS BIGINT) AS root
    FROM cc GROUP BY src
    """,
)
def cycle_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap cycle clusters: nodes mutually reachable within 3
    hops on the derived webgraph, merged into components (two cycles
    sharing a node = one trap neighborhood). The closure is the wave
    loop's own anti-join BFS; only (node, node) pairs shuffle; the CC
    rounds are pointer-doubled. A frontier scheduler demotes these
    clusters wholesale instead of per-URL."""
    from news_please_spark.operators.graph import mutual_reach_clusters

    return mutual_reach_clusters(
        derived_edges(spark, sf_dir), max_hops=3
    ).select(F.col("id").alias("doc_id"), "root")


# ---------------------------------------------------------------------------
# Per-host template spans over the interleaved span table
# (operators/spans.py::host_template_spans) — the site-template grain
# of span_boilerplate: relative share of the HOST's docs, not a global
# absolute doc-frequency.
@register(
    "host_templates",
    _SPAN_ROWS_SQL
    + """
    , th AS (
      SELECT DISTINCT s.doc_id, d.source,
             md5(lower(trim(s.text))) AS span_md5
      FROM span_rows s JOIN documents d ON d.doc_id = s.doc_id
      WHERE s.kind = 'text'
    ),
    hd AS (
      SELECT source, CAST(count(*) AS BIGINT) AS host_docs
      FROM documents GROUP BY source
    ),
    ag AS (
      SELECT source, span_md5, CAST(count(*) AS BIGINT) AS n_docs
      FROM th GROUP BY source, span_md5
    )
    SELECT a.source, a.span_md5, a.n_docs, h.host_docs,
           CAST((10000 * a.n_docs) // h.host_docs AS BIGINT) AS share_bp
    FROM ag a JOIN hd h ON h.source = a.source
    WHERE a.n_docs >= 2 AND (10000 * a.n_docs) // h.host_docs >= 2000
    """,
)
def host_templates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host template spans: a text span in >= 20% of its host's
    docs (and >= 2 of them) is site chrome — the planted banner
    surfaces per host at ~2500 bp while cross-host quote collisions
    stay below threshold. Only md5 keys + host keys shuffle, counts
    map-side combine, denominator = full host doc count including
    span-free docs."""
    from news_please_spark.operators.spans import host_template_spans

    docs = load(spark, sf_dir, "documents")
    return host_template_spans(
        _synth_spans_df(spark, sf_dir),
        docs.select("doc_id", "source"),
        min_docs=2,
        min_share_bp=2000,
    )


# ---------------------------------------------------------------------------
# Hop-bounded bow-tie decomposition of the derived webgraph (Broder et
# al. 2000) — operators/graph.py::bowtie_regions.
@register(
    "bowtie_regions",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    walk(root, node, d) AS (
      SELECT doc_id, doc_id, 0 FROM documents
      UNION ALL
      SELECT w.root, e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < 3
    ),
    reach AS (SELECT DISTINCT root AS a, node AS b FROM walk WHERE root <> node),
    mut AS (
      SELECT r1.a, r1.b FROM reach r1
      JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
    ),
    cc(src, node) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM mut)
      UNION
      SELECT c.src, m.b FROM cc c JOIN mut m ON m.a = c.node
    ),
    cl AS (SELECT src AS id, min(node) AS root FROM cc GROUP BY src),
    cs AS (SELECT root, CAST(count(*) AS BIGINT) AS n FROM cl GROUP BY root),
    coreroot AS (SELECT root FROM cs ORDER BY n DESC, root LIMIT 1),
    core AS (SELECT id FROM cl WHERE root = (SELECT root FROM coreroot)),
    inr AS (SELECT DISTINCT a AS id FROM reach WHERE b IN (SELECT id FROM core)),
    outr AS (SELECT DISTINCT b AS id FROM reach WHERE a IN (SELECT id FROM core))
    SELECT d.doc_id,
           CASE WHEN d.doc_id IN (SELECT id FROM core) THEN 'core'
                WHEN d.doc_id IN (SELECT id FROM inr)
                     AND d.doc_id IN (SELECT id FROM outr) THEN 'bridge'
                WHEN d.doc_id IN (SELECT id FROM inr) THEN 'in'
                WHEN d.doc_id IN (SELECT id FROM outr) THEN 'out'
                ELSE 'other' END AS region
    FROM documents d
    """,
)
def bowtie_regions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-structure map at crawl-planning grain: the largest bounded
    mutual-reach cluster is the core; every page classifies as
    core/in/out/bridge/other by 3-hop reachability to/from it — the
    seed-selection and budget-shaping view (seeds in 'in'/'core' cover
    'out' for free; 'other' needs its own seeds). One bounded closure
    reused for clustering and both reach tests; only the single
    (root, size) row that names the core reaches the driver."""
    from news_please_spark.operators.graph import bowtie_regions

    return bowtie_regions(
        derived_edges(spark, sf_dir),
        load(spark, sf_dir, "documents").select("doc_id"),
        max_hops=3,
        id_col="doc_id",
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy record linkage on title surrogates
# (operators/joins.py::fuzzy_link) — edit-distance pairs minhash misses
# when the edit is inside a token.
@register(
    "title_link",
    r"""
    WITH t AS (
      SELECT doc_id,
             array_to_string(
               list_slice(string_split_regex(trim(lower(text)), '\s+'), 1, 6),
               ' ') AS title,
             string_split_regex(trim(lower(text)), '\s+')[1] AS blk
      FROM documents WHERE trim(text) <> ''
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
    FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.title, b.title) <= 8
    """,
)
def title_link_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy title linkage: 6-token title surrogates, blocked on the
    first token, verified with levenshtein <= 8 (a codegen'd JVM
    builtin in both engines — parity-tested). The cross product only
    forms within a block; at web scale add a salt/band column like the
    LSH banding. Catches headline variants whose edit lives inside a
    token (typo, pluralization), invisible to whitespace-token
    minhash."""
    from news_please_spark.functions.text import tokens
    from news_please_spark.operators.joins import fuzzy_link

    docs = load(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    toks = tokens(F.col("text"))
    recs = docs.select(
        F.col("doc_id").alias("id"),
        F.array_join(F.slice(toks, 1, 6), " ").alias("key"),
        F.element_at(toks, 1).alias("block"),
    )
    out = fuzzy_link(recs, max_dist=8)
    return out.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "dist"
    )


# ---------------------------------------------------------------------------
# Directory-prefix crawl-budget rollup (operators/stats.py::path_rollup)
@register(
    "path_rollup",
    """
    WITH u AS (
      SELECT source AS host,
             's' || (doc_id % 7) AS s1,
             'c' || (doc_id % 29) AS s2,
             CASE WHEN doc_id % 3 = 0 THEN 'x' || (doc_id % 5) END AS s3,
             n_chars
      FROM documents
    ),
    seg AS (
      SELECT host, n_chars,
             CASE WHEN s3 IS NULL THEN [s1, s2] ELSE [s1, s2, s3] END AS segs
      FROM u
    ),
    d AS (
      SELECT host, n_chars, segs,
             unnest(range(0, least(3, len(segs)) + 1)) AS depth
      FROM seg
    )
    SELECT host, CAST(depth AS BIGINT) AS depth,
           '/' || coalesce(array_to_string(list_slice(segs, 1, depth), '/'),
                           '') AS prefix,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM d GROUP BY host, depth, prefix
    """,
)
def path_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-directory crawl-budget rollup: URL counts and byte mass at
    every path-prefix depth 0..3 over a derived URL hierarchy (2-3
    segments per URL) — the aggregate that finds the low-quality
    /calendar/-style subtrees per-site regex rules then demote. The
    explode is a bounded map-side flat map; the one exchange is the
    (host, prefix) count, map-side combinable."""
    from news_please_spark.operators.stats import path_rollup

    d = load(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("/s"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("/c"),
        (F.col("doc_id") % 29).cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("/x"), (F.col("doc_id") % 5).cast("string")),
        ).otherwise(F.lit("")),
    )
    urls = d.select(
        F.col("source").alias("host"), path.alias("path"), "n_chars"
    )
    return path_rollup(urls, max_depth=3, weight_col="n_chars").select(
        "host", "depth", "prefix", "n_urls", F.col("total_w").alias("total_chars")
    )


# ---------------------------------------------------------------------------
# Per-source distribution drift between epochs
# (operators/stats.py::histogram_drift)
@register(
    "dist_drift",
    """
    WITH b AS (
      SELECT source, least(n_chars // 100, 20) AS bkt, doc_id % 2 AS ep
      FROM documents
    ),
    c AS (
      SELECT source, bkt,
             sum(CASE WHEN ep = 0 THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN ep = 1 THEN 1 ELSE 0 END) AS bb
      FROM b GROUP BY source, bkt
    ),
    t AS (SELECT source, sum(a) AS ta, sum(bb) AS tb FROM c GROUP BY source)
    SELECT c.source,
           CAST(max(t.ta) AS BIGINT) AS n_epoch0,
           CAST(max(t.tb) AS BIGINT) AS n_epoch1,
           CAST(CASE WHEN max(t.ta) > 0 AND max(t.tb) > 0 THEN
                (10000 * sum(abs(c.a * t.tb - c.bb * t.ta)))
                  // (2 * max(t.ta) * max(t.tb))
           END AS BIGINT) AS drift_bp
    FROM c JOIN t ON c.source = t.source
    GROUP BY c.source
    """,
)
def dist_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-monitoring drift gate: per source, the total-variation
    distance (floor basis points, pure BIGINT — no logs) between the
    even- and odd-epoch length-bucket histograms. Catches a source
    whose mix shifted between snapshots before it poisons a mixture;
    vocab_drift's distributional twin. Two map-side-combinable
    aggregations; only histogram rows cross the wire."""
    from news_please_spark.operators.stats import histogram_drift

    d = load(spark, sf_dir, "documents").select(
        "source",
        F.least(F.expr("n_chars div 100"), F.lit(20)).alias("bkt"),
        (F.col("doc_id") % 2).alias("ep"),
    )
    return histogram_drift(d, "source", "bkt", "ep")


# ---------------------------------------------------------------------------
# Politeness-constrained drain plan (operators/ordering.py::drain_plan)
@register(
    "drain_plan",
    """
    WITH s AS (
      SELECT source AS host, CAST(count(*) AS BIGINT) AS n_urls
      FROM documents GROUP BY source
    ),
    p AS (
      SELECT host, n_urls,
             CAST((n_urls + 7) // 8 AS BIGINT) AS waves,
             CAST(((n_urls + 7) // 8)
                  * ((CAST(substr(host, 4) AS BIGINT) % 7 + 1) * 50000)
                  AS BIGINT) AS finish_us
      FROM s
    )
    SELECT host, n_urls, waves, finish_us,
           finish_us = (SELECT max(finish_us) FROM p) AS critical
    FROM p
    """,
)
def drain_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl capacity plan: per host, waves = ceil(frontier/8) under
    the per-wave politeness budget and finish time under the host's
    crawl delay; critical marks the makespan-bounding tail hosts a
    scheduler shards (ip_pooled_admission) or sheds. Map-side
    arithmetic plus ONE single-row global max broadcast back."""
    from news_please_spark.operators.ordering import drain_plan

    counts = (
        load(spark, sf_dir, "documents")
        .groupBy(F.col("source").alias("host"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
        .withColumn(
            "delay_us",
            ((F.substring("host", 4, 10).cast("long") % 7) + 1) * 50000,
        )
    )
    return drain_plan(counts, 8, delay_us_col="delay_us")


# ---------------------------------------------------------------------------
# WCC size histogram (operators/graph.py::component_size_histogram)
@register(
    "component_sizes",
    f"""
    WITH RECURSIVE edges AS (
      SELECT doc_id AS src,
             (doc_id // 32) * 32 + ((doc_id*3 + 17) % 32) AS dst
      FROM documents
      UNION ALL
      SELECT doc_id, (doc_id // 32) * 32 + ((doc_id*5 + 34) % 32)
      FROM documents
      UNION ALL
      SELECT doc_id, (doc_id // 32) * 32 + ((doc_id*7 + 51) % 32)
      FROM documents
    ),
    e2 AS (SELECT src, dst FROM edges
           WHERE src % 11 < 4 AND dst % 11 < 4 AND src <> dst
             AND dst <= (SELECT max(doc_id) FROM documents)),
    und AS (SELECT src AS a, dst AS b FROM e2 UNION SELECT dst, src FROM e2),
    cc(src, node) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM und)
      UNION
      SELECT c.src, u.b FROM cc c JOIN und u ON u.a = c.node
    ),
    lab AS (SELECT src AS id, min(node) AS root FROM cc GROUP BY src),
    alln AS (
      SELECT d.doc_id AS id, coalesce(l.root, d.doc_id) AS root
      FROM documents d LEFT JOIN lab l ON l.id = d.doc_id
    ),
    sz AS (SELECT root, count(*) AS size FROM alln GROUP BY root)
    SELECT CAST(size AS BIGINT) AS size,
           CAST(count(*) AS BIGINT) AS n_components
    FROM sz GROUP BY size
    """,
)
def component_sizes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-fragmentation summary: the weakly-connected-component size
    histogram of a sparse BLOCK-LOCAL derived subgraph (links stay
    inside 32-page site blocks, endpoints % 11 < 4 — the site-island
    world, so component diameter is bounded by the block), isolated
    pages included as size-1 — bowtie_regions' companion table (one
    giant component + singleton tail = healthy seed coverage; many
    mid-size islands = the seed list under-covers). Pointer-doubled
    CC then two map-side-combinable counts; the result is bounded by
    the number of DISTINCT sizes."""
    from news_please_spark.operators.graph import component_size_histogram

    docs = load(spark, sf_dir, "documents").select("doc_id")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    block = F.expr("doc_id div 32") * 32
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[block + (F.col("doc_id") * m + a) % 32
                  for m, a in EDGE_PARAMS]
            )
        ).alias("dst"),
    ).filter(
        (F.col("src") % 11 < 4)
        & (F.col("dst") % 11 < 4)
        & (F.col("dst") <= max_id)
    )
    nodes = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    return component_size_histogram(edges, nodes)


# ---------------------------------------------------------------------------
# BadRank: anti-trust propagated backwards (operators/graph.py::badrank)


def _badrank_sql(iters: int = 3, deg: int = 3, damping_pct: int = 85) -> str:
    parts = [
        "b0 AS (SELECT doc_id AS id, CAST(CASE WHEN doc_id % 97 = 3 THEN 1"
        " ELSE 0 END AS BIGINT) AS r FROM documents)"
    ]
    for k in range(iters):
        teleport = (100 - damping_pct) * deg * (100 * deg) ** k
        parts.append(
            f"bc{k + 1} AS (SELECT e.src AS id, SUM(b{k}.r) AS c FROM edges e"
            f" JOIN b{k} ON b{k}.id = e.dst GROUP BY e.src)"
        )
        parts.append(
            f"b{k + 1} AS (SELECT d.doc_id AS id,"
            f" CAST(CASE WHEN d.doc_id % 97 = 3 THEN {teleport} ELSE 0 END"
            f" + {damping_pct} * COALESCE(bc{k + 1}.c, 0) AS BIGINT) AS r"
            f" FROM documents d LEFT JOIN bc{k + 1} ON bc{k + 1}.id = d.doc_id)"
        )
    return (
        f"WITH edges AS ({_EDGES_SQL}), "
        + ", ".join(parts)
        + f" SELECT id AS doc_id, r AS badrank_s{iters} FROM b{iters}"
    )


@register("badrank", _badrank_sql())
def badrank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward anti-trust: pages feeding rank INTO the flagged set
    (doc_id % 97 = 3, ~1%) inherit badness along TRANSPOSED edges —
    the demotion signal complementary to spam_mass's forward trust.
    One integer-exact pagerank_scaled run on the transpose (the
    derived webgraph's bijective edge maps give the uniform in-degree
    the transpose needs); only the rank table shuffles per
    iteration."""
    from news_please_spark.operators.graph import badrank

    edges = derived_edges(spark, sf_dir)
    nodes = load(spark, sf_dir, "documents").select("doc_id")
    bad = nodes.filter(F.col("doc_id") % 97 == 3)
    ranks = badrank(
        edges,
        nodes,
        bad,
        out_degree=len(EDGE_PARAMS),
        iters=3,
        id_col="doc_id",
        materialize=False,
    )
    return ranks.select(
        F.col("id").alias("doc_id"), F.col("r").alias("badrank_s3")
    )


# ---------------------------------------------------------------------------
# Local clustering coefficient
# (operators/graph.py::clustering_coefficients)
@register(
    "clustering_coeff",
    f"""
    WITH edges AS ({_TRI_EDGES_SQL}),
    h AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
          FROM edges WHERE src <> dst GROUP BY 1, 2),
    und AS (SELECT a, b FROM h UNION ALL SELECT b, a FROM h),
    deg AS (SELECT a, count(*) AS d FROM und GROUP BY 1),
    o AS (SELECT u.a AS u, u.b AS v, db.d AS dv
          FROM und u JOIN deg da ON da.a = u.a JOIN deg db ON db.a = u.b
          WHERE (da.d < db.d) OR (da.d = db.d AND u.a < u.b)),
    w AS (SELECT x.u, x.v AS p, y.v AS q
          FROM o x JOIN o y ON x.u = y.u
          AND ((x.dv < y.dv) OR (x.dv = y.dv AND x.v < y.v))),
    t AS (SELECT w.u, w.p, w.q FROM w
          WHERE EXISTS (SELECT 1 FROM o WHERE o.u = w.p AND o.v = w.q)),
    n AS (SELECT u AS node FROM t
          UNION ALL SELECT p FROM t UNION ALL SELECT q FROM t),
    tri AS (SELECT node, count(*) AS n_tri FROM n GROUP BY 1)
    SELECT deg.a AS node, CAST(deg.d AS BIGINT) AS deg,
           CAST(coalesce(tri.n_tri, 0) AS BIGINT) AS n_tri,
           CAST(CASE WHEN deg.d >= 2 THEN
                (10000 * 2 * coalesce(tri.n_tri, 0)) // (deg.d * (deg.d - 1))
           END AS BIGINT) AS clust_bp
    FROM deg LEFT JOIN tri ON tri.node = deg.a
    """,
)
def clustering_coeff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node neighborhood interlink density in floor basis points
    over the triangle world (derived webgraph + two ring edge
    families): link-farm cliques read near 10^4, organic hubs near 0
    — the per-node refinement beside triangle_counts/kcore_peel.
    Integer ratio, hub-safe degree-oriented triangle plan."""
    from news_please_spark.operators.graph import clustering_coefficients

    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    ring = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array((F.col("doc_id") + 1) % n, (F.col("doc_id") + 2) % n)
        ).alias("dst"),
    )
    edges = derived_edges(spark, sf_dir).unionByName(ring)
    return clustering_coefficients(edges)


# ---------------------------------------------------------------------------
# Shuffle-key skew audit (operators/stats.py::key_skew_audit)
@register(
    "skew_gini",
    """
    WITH u AS (
      SELECT CASE WHEN doc_id % 5 = 0 THEN 'big' || (doc_id % 3)
                  ELSE 'h' || (doc_id % 211) END AS k
      FROM documents
    ),
    c AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY k),
    r AS (SELECT c, row_number() OVER (ORDER BY c, k) AS i,
                 count(*) OVER () AS n FROM c),
    g AS (SELECT max(n) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
                 sum((2*i - n - 1) * c) AS num
          FROM r),
    t AS (SELECT max(c) AS top1, sum(c) AS topn
          FROM (SELECT c FROM c ORDER BY c DESC, k LIMIT 10))
    SELECT CAST(n_keys AS BIGINT) AS n_keys, n_rows,
           CAST((10000 * num) // (n_keys * n_rows) AS BIGINT) AS gini_bp,
           CAST((10000 * top1) // n_rows AS BIGINT) AS top1_bp,
           CAST((10000 * topn) // n_rows AS BIGINT) AS top10_bp
    FROM g, t
    """,
)
def skew_gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle skew report on the deliberately skewed derived host
    key (three 'big' head hosts + a 211-host tail, host_shards'
    world): exact integer Gini of per-host row counts plus head
    shares — the measurement that decides salting / AQE skew-join /
    IP-pool splits BEFORE a join commits to the key. Ranks ride the
    two-phase global sequence; the driver holds per-partition counts
    only."""
    from news_please_spark.operators.stats import key_skew_audit

    u = load(spark, sf_dir, "documents").select(
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("big"), (F.col("doc_id") % 3).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("h"), (F.col("doc_id") % 211).cast("string"))
        )
        .alias("host")
    )
    return key_skew_audit(u, "host", top_n=10)


# ---------------------------------------------------------------------------
# Webgraph degree histogram (operators/graph.py::degree_distribution)
@register(
    "degree_distribution",
    f"""
    WITH edges AS ({_EDGES_SQL}),
    e2 AS (SELECT src, dst FROM edges WHERE dst % 11 < 4 AND src <> dst),
    o AS (SELECT 'out' AS direction, CAST(count(*) AS BIGINT) AS degree
          FROM e2 GROUP BY src),
    i AS (SELECT 'in' AS direction, CAST(count(*) AS BIGINT) AS degree
          FROM e2 GROUP BY dst),
    a AS (SELECT * FROM o UNION ALL SELECT * FROM i)
    SELECT direction, degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM a GROUP BY 1, 2
    """,
)
def degree_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In/out-degree histogram of the sparse derived webgraph (dst %
    11 < 4 so degrees vary 1..3 instead of the full graph's uniform
    3): the first-look webgraph shape report beside skew_gini. Two
    map-side-combinable counts; output bounded by distinct degrees."""
    from news_please_spark.operators.graph import degree_distribution

    edges = derived_edges(spark, sf_dir).filter(F.col("dst") % 11 < 4)
    return degree_distribution(edges)


# ---------------------------------------------------------------------------
# Matryoshka prefix-dimension recall audit
# (operators/similarity.py::dim_truncation_audit)
@register(
    "matryoshka_audit",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % 101 = 0),
    pfull AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             CAST(floor(10000 * (
               list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(e.v, e.v)))
             )) AS BIGINT) AS s
      FROM q, e WHERE q.vec_id <> e.vec_id
    ),
    tfull AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY s DESC, neighbor_id) AS rk FROM pfull
      ) WHERE rk <= 5
    ),
    ppref AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             CAST(floor(10000 * (
               list_dot_product(list_slice(q.v, 1, 16), list_slice(e.v, 1, 16))
               / (sqrt(list_dot_product(list_slice(q.v, 1, 16),
                                        list_slice(q.v, 1, 16)))
                  * sqrt(list_dot_product(list_slice(e.v, 1, 16),
                                          list_slice(e.v, 1, 16))))
             )) AS BIGINT) AS s
      FROM q, e WHERE q.vec_id <> e.vec_id
    ),
    tpref AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY s DESC, neighbor_id) AS rk FROM ppref
      ) WHERE rk <= 5
    )
    SELECT f.query_id,
           CAST(sum(CASE WHEN p.neighbor_id IS NULL THEN 0 ELSE 1 END)
                AS BIGINT) AS n_hits,
           CAST((10000 * sum(CASE WHEN p.neighbor_id IS NULL THEN 0 ELSE 1
                END)) // 5 AS BIGINT) AS recall_bp
    FROM tfull f LEFT JOIN tpref p
      ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def matryoshka_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-dimension safety check for the embedding column: per
    query (vec_id % 101 = 0), how much of the exact cosine top-5
    survives ranking on the first 16 of 32 dimensions — the go/no-go
    before a cheap prefix index (IVF on 16 dims + full re-rank) is
    trusted at corpus scale. Quantized sims, engine-exact ranking;
    queries broadcast, the corpus never shuffles."""
    from news_please_spark.operators.similarity import dim_truncation_audit

    e = spread(load(spark, sf_dir, "embeddings"), spark)
    q = e.filter(F.col("vec_id") % 101 == 0)
    return dim_truncation_audit(e, q, k=5, prefix_dims=16)


# ---------------------------------------------------------------------------
# Syndication clusters: fuzzy title linkage -> components -> source spread
@register(
    "syndication_clusters",
    r"""
    WITH RECURSIVE t AS (
      SELECT doc_id,
             array_to_string(
               list_slice(string_split_regex(trim(lower(text)), '\s+'), 1, 6),
               ' ') AS title,
             string_split_regex(trim(lower(text)), '\s+')[1] AS blk
      FROM documents WHERE trim(text) <> ''
    ),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db
      FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE levenshtein(a.title, b.title) <= 4
    ),
    und AS (SELECT da AS a, db AS b FROM pairs
            UNION SELECT db, da FROM pairs),
    cc(src, node) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM und)
      UNION
      SELECT c.src, u.b FROM cc c JOIN und u ON u.a = c.node
    ),
    lab AS (SELECT src AS id, min(node) AS root FROM cc GROUP BY src)
    SELECT lab.root AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources
    FROM lab JOIN documents d ON d.doc_id = lab.id
    GROUP BY lab.root
    """,
)
def syndication_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """News-syndication detection: blocked fuzzy title pairs
    (title_link's linkage) closed into clusters, each reported with
    its document count and cross-SOURCE spread — n_sources > 1 is the
    wire-copy signal (same story republished across outlets), the
    dedup class where near-identical headlines matter more than body
    similarity. Pair generation never leaves its block; the CC rounds
    are pointer-doubled; the source join touches only clustered
    docs."""
    from news_please_spark.operators.graph import connected_components
    from news_please_spark.operators.joins import fuzzy_link
    from news_please_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    toks = tokens(F.col("text"))
    recs = docs.select(
        F.col("doc_id").alias("id"),
        F.array_join(F.slice(toks, 1, 6), " ").alias("key"),
        F.element_at(toks, 1).alias("block"),
    )
    pairs = fuzzy_link(recs, max_dist=4)
    labels = connected_components(pairs, src="id_a", dst="id_b")
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        labels.join(src, labels["id"] == src["doc_id"])
        .groupBy(F.col("root").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
    )


# ---------------------------------------------------------------------------
# URL template mining (operators/dust.py::url_pattern_stats)
@register(
    "url_pattern_mine",
    """
    WITH u AS (
      SELECT source AS host,
             '/s' || (doc_id % 7) || '/c' || (doc_id % 29)
               || CASE WHEN doc_id % 4 = 0 THEN '/p' || doc_id ELSE '' END
               AS path
      FROM documents
    ),
    b AS (
      SELECT host,
             regexp_replace(path, '[0-9]+', 'N', 'g') AS pattern,
             list_extract(list_filter(string_split(path, '/'), x -> x <> ''), -1)
               AS leaf
      FROM u
    ),
    g AS (
      SELECT host, pattern,
             CAST(count(*) AS BIGINT) AS n_urls,
             CAST(count(DISTINCT leaf) AS BIGINT) AS n_leaves
      FROM b GROUP BY host, pattern
    )
    SELECT host, pattern, n_urls, n_leaves,
           CAST((10000 * n_leaves) // n_urls AS BIGINT) AS leaf_bp,
           n_urls >= 5 AND (10000 * n_leaves) // n_urls >= 9000 AS trappy
    FROM g
    """,
)
def url_pattern_mine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enumeration-trap candidate mining over a derived URL world
    where every 4th doc carries a fresh /p<id> leaf: the digit-
    collapsed /sN/cN/pN family is populous AND leaf-injective ->
    trappy, the /sN/cN templates repeat leaves -> clean. Generates
    the per-site ignore-regex candidates the reference encodes by
    hand. One (host, pattern) exchange, exact distinct via pre-agg."""
    from news_please_spark.operators.dust import url_pattern_stats

    d = load(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("/s"), (F.col("doc_id") % 7).cast("string"),
        F.lit("/c"), (F.col("doc_id") % 29).cast("string"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("/p"), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
    )
    urls = d.select(F.col("source").alias("host"), path.alias("path"))
    return url_pattern_stats(urls, min_urls=5, distinct_bp=9000)


# ---------------------------------------------------------------------------
# Host co-citation pairs (operators/graph.py::host_cocitation)
@register(
    "host_cocitation",
    f"""
    WITH edges AS ({_EDGES_SQL}),
    he AS (SELECT DISTINCT src, 'h' || (dst % 13) AS dst_host FROM edges),
    p AS (
      SELECT a.dst_host AS host_a, b.dst_host AS host_b
      FROM he a JOIN he b ON a.src = b.src AND a.dst_host < b.dst_host
    )
    SELECT host_a, host_b, CAST(count(*) AS BIGINT) AS n_pages
    FROM p GROUP BY host_a, host_b
    HAVING count(*) >= 2
    """,
)
def host_cocitation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosts linked together from the same page (13-host mapping over
    the derived webgraph): the co-citation matrix whose dense cliques
    fingerprint link networks — host-level companion to
    clustering_coeff. Pair explosion bounded by out-degree^2 per
    page; one map-side-combinable pair count."""
    from news_please_spark.operators.graph import host_cocitation

    e = derived_edges(spark, sf_dir).select(
        "src",
        F.concat(F.lit("h"), (F.col("dst") % 13).cast("string")).alias(
            "dst_host"
        ),
    )
    return host_cocitation(e, min_pages=2)


# ---------------------------------------------------------------------------
# TPC-H Q3-shaped shipping priority (broadcast-dim multi-join breadth)
@register(
    "shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(strftime(o.o_orderdate, '%Y-%m-%d') AS VARCHAR) AS order_date,
           o.o_orderpriority,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_c
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
      AND l.l_shipdate > TIMESTAMP '1999-01-01'
    GROUP BY l.l_orderkey, order_date, o.o_orderpriority
    ORDER BY revenue_c DESC, l.l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers broadcast into
    orders, orders' surviving keys into lineitem, cent-quantized
    revenue top-10 via TakeOrdered — the classic selective-dim join
    chain where predicate pushdown + broadcast keep the fact table
    unshuffled until the final (small) aggregation."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    j = (
        li.join(
            F.broadcast(o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
    )
    rev = F.sum(
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
            "long"
        )
    ).cast("long")
    return (
        j.groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(rev.alias("revenue_c"))
        .orderBy(F.desc("revenue_c"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Survivor-bias audit of the hygiene pipeline: what cleaning did to
# the per-source mixture (histogram_drift over before/after)
@register(
    "clean_mixture_shift",
    "placeholder",  # replaced below: derived from the corpus_clean oracle
)
def clean_mixture_shift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivor bias, measured: per source, the TV distance
    (floor bp) between the corpus's length-bucket mix BEFORE
    clean_corpus and the mix of its base-doc SURVIVORS — the audit
    that catches a hygiene pipeline quietly reshaping a source's
    length profile (near-dup removal preferentially kills templated
    short docs) before the shifted mixture trains. Composes the
    planted-corpus clean plan with histogram_drift; only histogram
    rows cross the wire after the (left_semi) survivor join."""
    from news_please_spark.operators.stats import histogram_drift

    kept_ids = _cleaned_planted_corpus(spark, sf_dir).select("doc_id")
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.least(F.expr("n_chars div 100"), F.lit(20)).alias("bkt"),
    )
    kept = d.join(kept_ids, "doc_id", "left_semi")
    u = d.select("source", "bkt", F.lit(0).alias("ep")).unionByName(
        kept.select("source", "bkt", F.lit(1).alias("ep"))
    )
    return histogram_drift(u, "source", "bkt", "ep")


_SHIFT_TAIL = """SELECT * FROM (
    WITH kept AS (SELECT doc_id FROM s4),
    u AS (
      SELECT d.source, least(d.n_chars // 100, 20) AS bkt, 0 AS ep
      FROM documents d
      UNION ALL
      SELECT d.source, least(d.n_chars // 100, 20), 1
      FROM documents d JOIN kept k ON k.doc_id = d.doc_id
    ),
    cnt AS (
      SELECT source, bkt,
             sum(CASE WHEN ep = 0 THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN ep = 1 THEN 1 ELSE 0 END) AS bb
      FROM u GROUP BY source, bkt
    ),
    tt AS (SELECT source, sum(a) AS ta, sum(bb) AS tb
           FROM cnt GROUP BY source)
    SELECT cnt.source,
           CAST(max(tt.ta) AS BIGINT) AS n_epoch0,
           CAST(max(tt.tb) AS BIGINT) AS n_epoch1,
           CAST(CASE WHEN max(tt.ta) > 0 AND max(tt.tb) > 0 THEN
                (10000 * sum(abs(cnt.a * tt.tb - cnt.bb * tt.ta)))
                  // (2 * max(tt.ta) * max(tt.tb))
           END AS BIGINT) AS drift_bp
    FROM cnt JOIN tt ON cnt.source = tt.source
    GROUP BY cnt.source
)"""


def _clean_mixture_shift_oracle() -> str:
    base = ORACLES["corpus_clean"]
    assert _CLEAN_TAIL in base
    return base.replace(_CLEAN_TAIL, _SHIFT_TAIL)


ORACLES["clean_mixture_shift"] = _clean_mixture_shift_oracle()


# ---------------------------------------------------------------------------
# Retrieval evaluation: precision@k + MRR against label relevance
@register(
    "retrieval_eval",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % 101 = 0),
    p AS (
      SELECT q.vec_id AS query_id, q.label AS qlab,
             e.vec_id AS neighbor_id, e.label AS nlab,
             CAST(floor(10000 * (
               list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(e.v, e.v)))
             )) AS BIGINT) AS s
      FROM q, e WHERE q.vec_id <> e.vec_id
    ),
    r AS (
      SELECT query_id, qlab, nlab,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s DESC, neighbor_id) AS rk
      FROM p
    ),
    t AS (SELECT query_id, qlab, nlab, rk FROM r WHERE rk <= 10)
    SELECT query_id,
           CAST(sum(CASE WHEN nlab = qlab THEN 1 ELSE 0 END) AS BIGINT)
             AS n_relevant,
           CAST((10000 * sum(CASE WHEN nlab = qlab THEN 1 ELSE 0 END)) // 10
             AS BIGINT) AS precision_bp,
           CAST(min(CASE WHEN nlab = qlab THEN rk END) AS BIGINT)
             AS first_rel_rank,
           CAST(coalesce(10000 // min(CASE WHEN nlab = qlab THEN rk END), 0)
             AS BIGINT) AS mrr_bp
    FROM t GROUP BY query_id
    """,
)
def retrieval_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval quality of the embedding space itself: per query
    (vec_id % 101 = 0), precision@10 and floor-MRR treating
    same-label corpus vectors as relevant — the eval that gates an
    embedding column BEFORE semantic dedup / hard-negative mining
    trust its geometry. All metrics integer (MRR as 10000 div rank —
    no floats past the quantized sims); queries broadcast, corpus
    unshuffled."""
    e = spread(load(spark, sf_dir, "embeddings"), spark).select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    q = e.filter(F.col("vec_id") % 101 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlab"),
        F.col("v").alias("qv"),
    )
    sims = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "qlab",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("nlab"),
            F.floor(
                10000
                * (
                    dot(F.col("qv"), F.col("v"))
                    / (
                        F.sqrt(dot(F.col("qv"), F.col("qv")))
                        * F.sqrt(dot(F.col("v"), F.col("v")))
                    )
                )
            ).cast("long").alias("s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    t = sims.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 10)
    rel = F.when(F.col("nlab") == F.col("qlab"), 1).otherwise(0)
    return t.groupBy("query_id").agg(
        F.sum(rel).cast("long").alias("n_relevant"),
        F.expr(
            "(10000 * sum(CASE WHEN nlab = qlab THEN 1 ELSE 0 END)) div 10"
        ).cast("long").alias("precision_bp"),
        F.min(F.when(F.col("nlab") == F.col("qlab"), F.col("rk"))).cast(
            "long"
        ).alias("first_rel_rank"),
        F.coalesce(
            F.expr(
                "10000 div min(CASE WHEN nlab = qlab THEN rk END)"
            ),
            F.lit(0),
        ).cast("long").alias("mrr_bp"),
    )


# ---------------------------------------------------------------------------
# Cluster purity: majority-label share per k-means cell
@register(
    "cluster_purity",
    _kmeans_ctes(k=8, iters=2)
    + """
    , lab AS (
      SELECT a2.cl AS cluster, e.label
      FROM a2 JOIN embeddings e ON e.vec_id = a2.vid
    ),
    cnt AS (
      SELECT cluster, label, CAST(count(*) AS BIGINT) AS c
      FROM lab GROUP BY cluster, label
    ),
    tot AS (SELECT cluster, CAST(sum(c) AS BIGINT) AS n FROM cnt
            GROUP BY cluster),
    mx AS (SELECT cluster, max(c) AS m FROM cnt GROUP BY cluster)
    SELECT CAST(tot.cluster AS INT) AS cluster, tot.n AS n_vecs,
           CAST(mx.m AS BIGINT) AS n_majority,
           CAST((10000 * mx.m) // tot.n AS BIGINT) AS purity_bp
    FROM tot JOIN mx ON mx.cluster = tot.cluster
    """,
)
def cluster_purity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised-vs-labels agreement per k-means cell: the
    majority-label share in floor bp — the quality gate on the
    codebook semantic_dedup/IVF route through (a low-purity cell
    means cosine neighborhoods cross label boundaries there). Rides
    the SAME deterministic 2-round Lloyd assignment the
    kmeans_clusters oracle checks; two map-side-combinable counts
    after the id equi-join for labels."""
    from news_please_spark.operators.clustering import kmeans_assign

    e = spread(load(spark, sf_dir, "embeddings"), spark)
    asg = kmeans_assign(e, k=8, iters=2).select("vec_id", "cluster")
    lab = asg.join(e.select("vec_id", "label"), "vec_id")
    cnt = lab.groupBy("cluster", "label").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        cnt.groupBy("cluster")
        .agg(
            F.sum("c").cast("long").alias("n_vecs"),
            F.max("c").cast("long").alias("n_majority"),
        )
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            "n_vecs",
            "n_majority",
            F.expr("(10000 * n_majority) div n_vecs").cast("long").alias(
                "purity_bp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Media-reference integrity (operators/spans.py::dangling_media_refs)
@register(
    "media_ref_integrity",
    _SPAN_ROWS_SQL
    + """
    , media AS (
      SELECT doc_id, media_ref FROM span_rows WHERE media_ref IS NOT NULL
    ),
    cls AS (
      SELECT m.doc_id, d.source,
             CASE WHEN substr(md5(m.media_ref), 1, 1) >= 'c'
                  THEN 1 ELSE 0 END AS dangling
      FROM media m JOIN documents d ON d.doc_id = m.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_refs,
           CAST(sum(dangling) AS BIGINT) AS n_dangling,
           CAST((10000 * sum(dangling)) // count(*) AS BIGINT) AS dangling_bp
    FROM cls GROUP BY source
    """,
)
def media_ref_integrity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob-store reconciliation before any decode pass: media spans
    whose ref is missing from the (derived ~75%) manifest, rated per
    source — the re-fetch queue generator, the interleaved analogue
    of the WARC completed-set check. The Spark side runs the REAL
    left_anti against the manifest (operators/spans.py::
    dangling_media_refs); the oracle classifies by the same md5
    predicate that defines the manifest."""
    from news_please_spark.operators.spans import dangling_media_refs

    rows = _synth_spans_df(spark, sf_dir).select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.*")
    # three consumers (manifest derivation, anti-join probe, per-source
    # base counts) — persisted so the span synthesis + explode runs
    # once inside this entry's evaluation instead of three times
    media = rows.filter(F.col("media_ref").isNotNull()).persist()
    manifest = media.select("media_ref").filter(
        F.substring(F.md5("media_ref"), 1, 1) < "c"
    )
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    base = media.select("doc_id").join(src, "doc_id").select("source", "doc_id")
    dang = (
        dangling_media_refs(media, manifest)
        .join(src, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dangling"))
    )
    return (
        base.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_refs"))
        .join(dang, "source", "left")
        .select(
            "source",
            "n_refs",
            F.coalesce(F.col("n_dangling"), F.lit(0)).cast("long").alias(
                "n_dangling"
            ),
            F.expr(
                "(10000 * coalesce(n_dangling, 0)) div n_refs"
            ).cast("long").alias("dangling_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Harvest rate: per-source crawl yield (the classic focused-crawl KPI)
@register(
    "harvest_rate",
    r"""
    WITH t AS (
      SELECT doc_id, source, text,
             string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    cls AS (
      SELECT source, length(text) AS nc,
             CASE WHEN len(toks) >= 20 AND
                  floor(10000.0 * length(regexp_replace(text, '[^a-z]', '', 'g'))
                        / length(text)) >= 5000
                  THEN 1 ELSE 0 END AS kept
      FROM t
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_fetched,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST((10000 * sum(kept)) // count(*) AS BIGINT) AS harvest_bp,
           CAST(CASE WHEN sum(kept) > 0
                THEN sum(CASE WHEN kept = 1 THEN nc ELSE 0 END) // sum(kept)
           END AS BIGINT) AS chars_per_kept
    FROM cls GROUP BY source
    """,
)
def harvest_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl yield per source: share of fetched pages that survive the
    quality gate (>= 20 tokens, alpha ratio >= 50%) and the byte cost
    of each survivor — the focused-crawl KPI (Chakrabarti et al. 1999
    call it harvest rate) that decides which hosts keep their budget
    next cycle. Rides the same quality_struct columns doc_quality
    oracle-checks; one map-side-combinable aggregation."""
    from news_please_spark.functions.text import quality_struct

    d = load(spark, sf_dir, "documents").select(
        "source", quality_struct(F.col("text")).alias("q")
    )
    kept = (
        (F.col("q.n_tokens") >= 20) & (F.col("q.alpha_q") >= 5000)
    ).cast("long")
    return (
        d.select(
            "source",
            kept.alias("_k"),
            F.when(kept == 1, F.col("q.n_chars")).otherwise(0).alias("_kc"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetched"),
            F.sum("_k").cast("long").alias("n_kept"),
            F.sum("_kc").alias("_kchars"),
        )
        .select(
            "source",
            "n_fetched",
            "n_kept",
            F.expr("(10000 * n_kept) div n_fetched").cast("long").alias(
                "harvest_bp"
            ),
            F.when(
                F.col("n_kept") > 0, F.expr("_kchars div n_kept")
            ).cast("long").alias("chars_per_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Dup-cluster size histogram over the REAL minhash near-dup graph


def _dup_cluster_sizes_oracle() -> str:
    pairs = ORACLES["minhash_lsh_pairs"]
    return f"""
    WITH RECURSIVE p AS MATERIALIZED ({pairs}),
    und AS (SELECT doc_a AS a, doc_b AS b FROM p
            UNION SELECT doc_b, doc_a FROM p),
    cc(src, node) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM und)
      UNION
      SELECT c.src, u.b FROM cc c JOIN und u ON u.a = c.node
    ),
    lab AS (SELECT src AS id, min(node) AS root FROM cc GROUP BY src),
    sz AS (SELECT root, count(*) AS size FROM lab GROUP BY root)
    SELECT CAST(size AS BIGINT) AS size,
           CAST(count(*) AS BIGINT) AS n_clusters
    FROM sz GROUP BY size
    """


@register("dup_cluster_sizes", "placeholder")
def dup_cluster_sizes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster SIZE distribution over the LSH candidate graph
    — the one-table answer to 'is our duplication a few mega-clusters
    or a long pair tail?', which decides whether dup_canonical's
    exemplar selection or a cluster-cap policy governs (a 10^6-doc
    boilerplate cluster wants capping, a pair tail wants canonicals).
    Reuses the oracle-checked minhash_lsh_pairs candidate generator
    and the pointer-doubled CC; output is bounded by distinct sizes."""
    from news_please_spark.operators.graph import component_size_histogram

    pairs = QUERIES["minhash_lsh_pairs"](spark, sf_dir)
    return component_size_histogram(
        pairs, src="doc_a", dst="doc_b"
    ).withColumnRenamed("n_components", "n_clusters")


ORACLES["dup_cluster_sizes"] = _dup_cluster_sizes_oracle()


# ---------------------------------------------------------------------------
# Quality decay by crawl depth (frontier_bfs3 ∘ quality gate)
@register(
    "depth_yield",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    bfs(id, depth) AS (
      SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
      UNION ALL
      SELECT e.dst, b.depth + 1 FROM bfs b JOIN edges e ON e.src = b.id
      WHERE b.depth < 3
    ),
    reach AS (SELECT id, CAST(min(depth) AS INT) AS depth FROM bfs GROUP BY id),
    t AS (
      SELECT r.depth, d.text,
             string_split_regex(trim(d.text), '\\s+') AS toks
      FROM reach r JOIN documents d ON d.doc_id = r.id
    ),
    cls AS (
      SELECT depth,
             CASE WHEN len(toks) >= 20 AND
                  floor(10000.0 * length(regexp_replace(text, '[^a-z]', '', 'g'))
                        / length(text)) >= 5000
                  THEN 1 ELSE 0 END AS kept
      FROM t
    )
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST((10000 * sum(kept)) // count(*) AS BIGINT) AS kept_bp
    FROM cls GROUP BY depth
    """,
)
def depth_yield_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality decay along the crawl frontier: pages grouped by their
    BFS discovery depth (frontier_bfs3's world, min-depth semantics)
    and rated with harvest_rate's quality gate — the measurement
    behind depth caps and focused crawling (if kept_bp falls off a
    cliff past depth 2, deep budget is waste). The BFS is the wave
    loop's anti-join expansion; the quality columns are harvest
    rate's; one map-side-combinable count per depth."""
    from news_please_spark.functions.text import quality_struct

    depths = QUERIES["frontier_bfs3"](spark, sf_dir).select(
        F.col("node_id").alias("doc_id"), "depth"
    )
    d = load(spark, sf_dir, "documents").select(
        "doc_id", quality_struct(F.col("text")).alias("q")
    )
    kept = (
        (F.col("q.n_tokens") >= 20) & (F.col("q.alpha_q") >= 5000)
    ).cast("long")
    return (
        depths.join(d, "doc_id")
        .select("depth", kept.alias("_k"))
        .groupBy("depth")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.sum("_k").cast("long").alias("n_kept"),
        )
        .withColumn(
            "kept_bp", F.expr("(10000 * n_kept) div n_pages").cast("long")
        )
    )
