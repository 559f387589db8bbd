"""Oracle-backed registry entries for the extraction chain, heuristics
gate, SimHash near-dup, and multimodal featurization.

DocWorld (synth.py) is one arithmetic spec with three views: pure-Python
(golden tests), Spark (distributed HTML render + real extraction chain),
and — here — ANSI SQL. The oracle SQL below re-derives the EXPECTED
articles/spans/verdicts from the same LCG arithmetic inside DuckDB, so
the driver's correctness gate checks the full pipeline end to end:
Spark renders HTML and runs the real regex/voting extractors, DuckDB
recomputes the ground truth independently, and the value hashes must
match bit for bit.

The SQL is generated programmatically (the mixer appears dozens of
times); every generated query is a single SELECT statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_please_spark.plans.queries import load, register, spread

# ---------------------------------------------------------------------------
# SQL images of world._mix_py and the DocWorld spec (synth.py)

_WORDS = (
    "news", "market", "election", "storm", "science", "city", "health",
    "game", "culture", "travel", "energy", "court", "film", "music",
    "space", "tech", "food", "art", "trade", "policy",
)
_WORDS_SQL = "[" + ", ".join(f"'{w}'" for w in _WORDS) + "]"


def _mix(a: str, b: str) -> str:
    """SQL image of world._mix_py — BIGINT-safe (every intermediate
    < 2^63, matching Spark/Python exactly)."""
    return (
        f"((((CAST({a} AS BIGINT) * 1103515245 + CAST({b} AS BIGINT) * 12345"
        f" + 31337) % 2147483648) * 69069 + 1) % 2147483648)"
    )


def _word(salt: str) -> str:
    """ws[1 + mix(d, salt) % 20] — one DocWorld vocabulary word."""
    return f"ws[1 + {_mix('d', salt)} % 20]"


def _cap(expr: str) -> str:
    return f"upper(({expr})[1:1]) || ({expr})[2:]"


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# entity-axis suffixes — imported from the spec so the two engines can
# never drift (the SQL literal is generated from the Python constant)
from news_please_spark.synth import DESC_SUFFIX, TITLE_SUFFIX  # noqa: E402

_TITLE_SUFFIX_SQL = _sql_str(TITLE_SUFFIX)
_DESC_SUFFIX_SQL = _sql_str(DESC_SUFFIX)


# spec CTE chain: one row per synthetic document, mirroring
# DocWorld.spec / expected_article / expected_spans (synth.py)
_SPEC_CTES = f"""
w AS (SELECT {_WORDS_SQL} AS ws),
ids AS (SELECT unnest(range(0, (SELECT count(*) FROM documents))) AS d),
s0 AS (
  SELECT d, ws,
    'h' || CAST({_mix('d', '21')} % 20 AS VARCHAR) || '.news-example.org' AS host,
    d % 17 AS v_date,
    d % 5 AS v_lang,
    CASE WHEN d % 5 = 4 THEN (['en', 'de', 'es'])[1 + {_mix('d', '24')} % 3]
         ELSE (['en', 'de', 'es', 'fr', 'it'])[1 + {_mix('d', '24')} % 5]
    END AS language,
    TIMESTAMP '2020-01-01'
      + ({_mix('d', '22')} % 1500) * INTERVAL '1 day'
      + ({_mix('d', '23')} % 86400) * INTERVAL '1 second' AS dt,
    list_transform(range(0, 4 + d % 3), i -> {_word('100 + i')}) AS title_words,
    array_to_string(list_transform(range(0, 8), i -> {_word('200 + i')}), ' ')
      || CASE WHEN {_mix('d', '62')} % 4 = 0 THEN {_DESC_SUFFIX_SQL} ELSE '' END
      AS description,
    2 + {_mix('d', '25')} % 3 AS n_para
  FROM ids, w
),
s1 AS (
  SELECT *,
    CASE WHEN v_lang = 4 THEN
      CASE language WHEN 'de' THEN 'der' WHEN 'es' THEN 'el' ELSE 'the' END
    ELSE 'the' END AS filler,
    array_to_string(list_transform(title_words, x -> {_cap('x')}), ' ')
      || CASE WHEN {_mix('d', '62')} % 4 = 0 THEN {_TITLE_SUFFIX_SQL} ELSE '' END
      AS title,
    array_to_string(title_words, '-') AS slug,
    array_to_string(
      list_transform(range(0, 1 + {_mix('d', '26')} % 3),
                     i -> 'Alex ' || {_cap(f"ws[1 + ({_mix('d', '27')} + i * 7) % 20]")}),
      ';') AS author,
    CASE WHEN d % 4 = 0 THEN
      'https://' || 'h' || CAST({_mix('d', '21')} % 20 AS VARCHAR)
      || '.news-example.org' || '/media/img' || CAST(d AS VARCHAR) || '.jpg'
    END AS image_url
  FROM s0
),
s2 AS (
  SELECT *,
    list_transform(range(0, n_para), i ->
      filler || ' ' || array_to_string(
        list_transform(range(0, 24 + {_mix('d', '30 + i')} % 16),
                       j -> {_word('(3 + i) * 100 + j')}), ' ')
    ) AS paragraphs,
    CASE WHEN v_date IN (5, 13, 14, 16) THEN strftime(dt, '%Y-%m-%d') || ' 00:00:00'
         WHEN v_date = 15 THEN strftime(dt, '%Y-%m-%d %H:%M') || ':00'
         ELSE strftime(dt, '%Y-%m-%d %H:%M:%S') END AS date_publish,
    CASE WHEN v_date = 5 THEN strftime(dt, '/%Y/%m/%d/') || slug || '.html'
         ELSE '/articles/' || slug || '-' || CAST(d AS VARCHAR) || '.html'
    END AS path
  FROM s1
)
"""

_ARTICLES_SQL = f"""
WITH {_SPEC_CTES}
SELECT 'doc' || CAST(d AS VARCHAR) AS doc_id,
       'https://' || host || path AS url,
       host AS source_domain,
       title,
       description,
       array_to_string(paragraphs, chr(10)) AS maintext,
       author AS authors,
       date_publish,
       image_url,
       language
FROM s2
"""

_SPANS_SQL = f"""
WITH {_SPEC_CTES},
sp AS (
  SELECT d,
    [{{'kind': 'title', 'text': title, 'media_ref': '', 'offset': 0}},
     {{'kind': 'description', 'text': description, 'media_ref': '', 'offset': 1}}]
    || CASE WHEN image_url IS NOT NULL
         THEN [{{'kind': 'media', 'text': '', 'media_ref': image_url, 'offset': 2}}]
         ELSE [] END
    || list_transform(range(0, n_para), i -> {{
         'kind': 'text', 'text': paragraphs[i + 1], 'media_ref': '',
         'offset': CAST((CASE WHEN image_url IS NULL THEN 2 ELSE 3 END) + i AS INT)
       }}) AS spans
  FROM s2
)
SELECT 'doc' || CAST(d AS VARCHAR) AS doc_id, unnest(spans, recursive := true)
FROM sp
"""

# heuristics F7 expected verdict from the spec arithmetic: og:type is
# present iff d%7!=0; the page has 1 h1 + (2 + d%7) h2 headlines of
# which mix(d,28) % (3 + d%7) are linked (all to the same host, so
# linked == self_linked); min_headlines=5 auto-pass; ratio <= 0.65
# compared as 20*linked <= 13*all (exact — no float boundary)
_HEURISTICS_SQL = f"""
WITH ids AS (SELECT unnest(range(0, (SELECT count(*) FROM documents))) AS d)
SELECT 'doc' || CAST(d AS VARCHAR) AS doc_id,
       ((d % 7) <> 0) AND (
         ((3 + d % 7) < 5)
         OR (20 * ({_mix('d', '28')} % (3 + d % 7)) <= 13 * (3 + d % 7))
       ) AS is_article
FROM ids
"""


# ---------------------------------------------------------------------------
# multimodal: SQL image of multimodal._fake_features — md5 hex →
# little-endian uint32s → (u/2^32 - 0.5) / ||v|| → float32 → floor(x*1e4)

def _hexval(pos: str) -> str:
    return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"


def _u32(k: str) -> str:
    """Little-endian uint32 k of the md5 digest (hex pair j of byte
    4k+j sits at 1-based position 8k + 2j + 1)."""
    bytes_ = [
        f"({_hexval(f'8 * ({k}) + {2 * j + 1}')} * 16 + {_hexval(f'8 * ({k}) + {2 * j + 2}')})"
        for j in range(4)
    ]
    mults = [1, 256, 65536, 16777216]
    return " + ".join(f"{b} * {m}" for b, m in zip(bytes_, mults))


# explicit 16-term left-fold of squares (v repeats its 4 uint32-derived
# values 4 times) — matches the Python accumulation order exactly
_SS_CHAIN = " + ".join(f"v4[{(i % 4) + 1}] * v4[{(i % 4) + 1}]" for i in range(16))

_MULTIMODAL_SQL = f"""
WITH m AS (
  SELECT doc_id AS did, md5(text) AS h FROM documents WHERE doc_id % 4 = 0
),
u AS (
  SELECT did, list_transform(range(0, 4), k -> CAST({_u32('k')} AS BIGINT)) AS us
  FROM m
),
v AS (
  SELECT did, list_transform(us, x -> CAST(x AS DOUBLE) / 4294967296.0 - 0.5) AS v4
  FROM u
),
n AS (SELECT did, v4, {_SS_CHAIN} AS ss FROM v),
q AS (
  SELECT did, v4, CASE WHEN ss = 0 THEN 1.0 ELSE sqrt(ss) END AS nrm FROM n
)
SELECT 'doc' || CAST(did AS VARCHAR) AS doc_id,
       'img://' || CAST(did AS VARCHAR) AS media_ref,
       'image' AS kind,
       CAST(k AS INT) AS dim,
       CAST(floor(CAST(CAST(v4[1 + CAST(k % 4 AS INT)] / nrm AS FLOAT) AS DOUBLE)
                  * 10000) AS BIGINT) AS f_q,
       true AS decode_ok
FROM q, (SELECT unnest(range(0, 16)) AS k)
"""


# ---------------------------------------------------------------------------
# SimHash near-dup: SQL image of dedup.simhash64 (md5 token hash) — per
# (token, bit) votes, sign per bit, signed-long signature, all-pairs
# hamming filter. The all-pairs oracle equals the banded Spark join
# because (max_hamming + 1)-band pigeonhole candidate generation is
# complete.
_BIT = "((strpos('0123456789abcdef', substr(h, CAST(16 - (j // 4) AS INT), 1)) - 1) >> CAST(j % 4 AS INT)) & 1"
_BITVAL = "CASE WHEN j = 63 THEN (-9223372036854775807 - 1) ELSE (CAST(1 AS BIGINT) << CAST(j AS INT)) END"

_SIMHASH_SQL = f"""
WITH corp AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT count(*) FROM documents) AS doc_id,
         text || ' extra' AS text
  FROM documents WHERE doc_id % 5 = 0
),
tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
  FROM corp
),
th AS (SELECT doc_id, md5(t) AS h FROM tok),
tb AS (SELECT doc_id, h, unnest(range(0, 64)) AS j FROM th),
bs AS (
  SELECT doc_id, j,
         sum(CASE WHEN ({_BIT}) = 1 THEN 1 ELSE -1 END) AS s
  FROM tb GROUP BY doc_id, j
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN {_BITVAL} ELSE 0 END) AS BIGINT) AS sg
  FROM bs GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sg, b.sg)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sg, b.sg)) <= 6
"""


# ---------------------------------------------------------------------------
# LSH ANN: SQL image of similarity.lsh_buckets/lsh_topk — the md5-derived
# hyperplane coefficients, OR-amplified (table, bucket) candidate join,
# and quantized cosine ranking, all re-derived in DuckDB.

_LSH_PLANES = 4
_LSH_TABLES = 8


def _hex32(md5_expr: str) -> str:
    """First 8 hex chars of an md5 VARCHAR expression as a BIGINT."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({md5_expr}, {c + 1}, 1)) - 1) * {16 ** (7 - c)}"
        for c in range(8)
    )


# coefficient for plane s = t*1000 + p, dimension i (1-based):
# (hex32(md5('plane{s}_{i}')) % 2001 - 1000) / 1000.0
_COEF = (
    "(("
    + _hex32("md5('plane' || CAST(t * 1000 + p AS VARCHAR) || '_' || CAST(i AS VARCHAR))")
    + ") % 2001 - 1000) / 1000.0"
)

_LSH_ANN_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bkt AS (
  SELECT vec_id, v, t,
    list_aggregate(list_transform(range(0, {_LSH_PLANES}), p ->
      CASE WHEN list_dot_product(
             v, list_transform(range(1, len(v) + 1), i -> {_COEF})) > 0
           THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
           ELSE CAST(0 AS BIGINT) END), 'sum') AS b
  FROM e, (SELECT unnest(range(0, {_LSH_TABLES})) AS t)
),
q AS (SELECT vec_id AS query_id, t, b FROM bkt WHERE vec_id % 101 = 0),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM q JOIN bkt c ON q.t = c.t AND q.b = c.b AND q.query_id <> c.vec_id
),
sims AS (
  SELECT cand.query_id, cand.neighbor_id,
    CAST(floor(10000 * (
      list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
    )) AS BIGINT) AS sim_q
  FROM cand
  JOIN e a ON a.vec_id = cand.query_id
  JOIN e b ON b.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, sim_q FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_q DESC, neighbor_id) AS rk
  FROM sims
) WHERE rk <= 5
"""


# ---------------------------------------------------------------------------
# Spark-side entries

@register("extract_articles", _ARTICLES_SQL)
def extract_articles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1-E5 + V1-V7 extraction chain over distributed-rendered DocWorld
    HTML. Array/timestamp columns are serialized at the entry boundary
    (authors → joined string, date → formatted string) so the driver's
    hash canonicalizer sees scalars only."""
    from news_please_spark.extraction.extract import extract_articles
    from news_please_spark.synth import DocWorld

    n_docs = load(spark, sf_dir, "documents").count()
    art = extract_articles(DocWorld(n_docs).responses_df(spark))
    return art.select(
        "doc_id",
        "url",
        "source_domain",
        "title",
        "description",
        "maintext",
        F.array_join("authors", ";").alias("authors"),
        F.date_format("date_publish", "yyyy-MM-dd HH:mm:ss").alias("date_publish"),
        "image_url",
        "language",
    )


@register("extract_spans", _SPANS_SQL)
def extract_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint span documents (kind, text, media_ref, offset) from
    the extracted articles, exploded to one scalar row per span —
    span-sequence equality is what the offset column encodes."""
    from news_please_spark.extraction.extract import article_to_spans, extract_articles
    from news_please_spark.synth import DocWorld

    n_docs = load(spark, sf_dir, "documents").count()
    art = extract_articles(DocWorld(n_docs).responses_df(spark))
    return (
        article_to_spans(art)
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
        )
    )


@register("heuristics_gate", _HEURISTICS_SQL)
def heuristics_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 article gate (H1-H7 + condition compiler) over DocWorld HTML;
    the oracle derives the expected verdict from the spec arithmetic."""
    from news_please_spark.extraction.heuristics import pass_heuristics
    from news_please_spark.synth import DocWorld

    n_docs = load(spark, sf_dir, "documents").count()
    fetched = DocWorld(n_docs).responses_df(spark)
    return fetched.select(
        "doc_id", pass_heuristics(F.col("html"), F.col("url")).alias("is_article")
    )


@register("simhash_near_dup", _SIMHASH_SQL)
def simhash_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding near-dup pairs over documents plus planted
    perturbed copies (the raw table has no dups). max_hamming=6 → 7
    bands (complete by pigeonhole), so the banded join equals the
    oracle's all-pairs filter exactly."""
    from news_please_spark.operators.dedup import simhash_near_dups

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    n = docs.count()
    planted = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    pairs = simhash_near_dups(docs.unionByName(planted), max_hamming=6)
    return pairs.select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


@register("lsh_ann_topk", _LSH_ANN_SQL)
def lsh_ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH approximate top-k (the scale path of
    ann_cosine_topk): md5-derived hyperplanes make bucketing
    engine-portable, so DuckDB re-derives the SAME candidate set and
    quantized ranking — the approximate operator is equality-checked,
    not just recall-bounded."""
    from news_please_spark.operators.similarity import lsh_topk

    emb = spread(load(spark, sf_dir, "embeddings"), spark)
    queries_df = emb.filter(F.col("vec_id") % 101 == 0)
    return lsh_topk(
        queries_df, emb, k=5, planes=_LSH_PLANES, tables=_LSH_TABLES, quantize=True
    )


@register("multimodal_features", _MULTIMODAL_SQL)
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media columns → feature vectors via mapInPandas
    (deterministic codec stub; Spark-side plumbing real). Features are
    exploded and quantized (floor(f*10^4) per element) so the gate
    compares exact integers."""
    from news_please_spark.operators.multimodal import decode_and_featurize

    docs = load(spark, sf_dir, "documents")
    media = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("data"),
        F.struct(
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("image/png").alias("mime"),
        ).alias("meta"),
    )
    feats = decode_and_featurize(media)
    return feats.select(
        "doc_id",
        "media_ref",
        "kind",
        "decode_ok",
        F.posexplode("features").alias("dim", "f"),
    ).select(
        "doc_id",
        "media_ref",
        "kind",
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("f").cast("double") * 10000).cast("long").alias("f_q"),
        "decode_ok",
    )


# ---------------------------------------------------------------------------
# Per-site config gate: the sitelist.hjson override layer end to end.
# Three of DocWorld's twenty hosts get overrides (two swap the whole
# condition to H2-only with the ratio heuristics disabled, one tightens
# the ratio comparators); the oracle re-derives each host group's
# verdict from the spec arithmetic (host index = mix(d,21) % 20):
#   H2 "meta contains article" ⟺ og:type meta present (d % 7 != 0) OR
#   the article:published_time date variant (d % 17 == 1) — the only
#   two <meta> tags whose markup contains the string 'article'.

_SITE_SITELIST = """{"base_urls": [
  {"url": "https://h3.news-example.org",
   "pass_heuristics_condition": "meta_contains_article_keyword",
   "overwrite_heuristics": {"og_type": false, "linked_headlines": false,
                            "self_linked_headlines": false}},
  {"url": "https://h7.news-example.org",
   "pass_heuristics_condition": "meta_contains_article_keyword",
   "overwrite_heuristics": {"og_type": false, "linked_headlines": false,
                            "self_linked_headlines": false}},
  {"url": "https://h5.news-example.org",
   "overwrite_heuristics": {"linked_headlines": "<=0.4",
                            "self_linked_headlines": "<=0.4"}}
]}"""

_SITE_GATE_SQL = f"""
WITH ids AS (SELECT unnest(range(0, (SELECT count(*) FROM documents))) AS d),
hx AS (SELECT d, {_mix('d', '21')} % 20 AS hn FROM ids)
SELECT 'doc' || CAST(d AS VARCHAR) AS doc_id,
  CASE
    WHEN hn IN (3, 7) THEN ((d % 7) <> 0) OR ((d % 17) = 1)
    WHEN hn = 5 THEN ((d % 7) <> 0) AND (
      ((3 + d % 7) < 5)
      OR (5 * ({_mix('d', '28')} % (3 + d % 7)) <= 2 * (3 + d % 7))
    )
    ELSE ((d % 7) <> 0) AND (
      ((3 + d % 7) < 5)
      OR (20 * ({_mix('d', '28')} % (3 + d % 7)) <= 13 * (3 + d % 7))
    )
  END AS is_article
FROM hx
"""


@register("site_gate", _SITE_GATE_SQL)
def site_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 with the per-site config layer: sitelist overrides compiled
    into one chained-CASE Column over native heuristics (reference
    sitelist.hjson + heuristics_manager merge)."""
    from news_please_spark.siteconfig import SiteConfigs
    from news_please_spark.synth import DocWorld

    cfg = SiteConfigs.from_sitelist(_SITE_SITELIST)
    n_docs = load(spark, sf_dir, "documents").count()
    fetched = DocWorld(n_docs).responses_df(spark)
    return fetched.select(
        "doc_id",
        cfg.gate_column(F.col("html"), F.col("url")).alias("is_article"),
    )
