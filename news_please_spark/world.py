"""Deterministic synthetic web world (FIXTURES.md §2-5).

One arithmetic spec, two implementations that must agree bit-for-bit:
  * pure-Python functions (used by the crawl oracle in tests), and
  * Spark Column expressions (used to *generate the world distributed* —
    at bench scale the webgraph is built by `spark.range`, never on the
    driver).

The mixer is a small LCG composed twice; every intermediate stays far
below 2^63 so Spark long arithmetic and Python ints agree exactly.

Graph properties engineered to exercise the engine (SURVEY.md §2.2/§4):
  * 40%% of pages land on host 0 → deliberate host skew (salting/AQE),
  * ~4%% URLs end in an ignored extension (filter F2,
    reference newsplease/config/config.cfg:74),
  * ~2%% are mailto: junk (filter F3, reference config.cfg:78),
  * ~8%% are off-domain (filter F4, scrapy OffsiteMiddleware analogue),
  * ~4%% live under /private/ which robots.txt disallows on every third
    host (filter F11, reference config.cfg:345),
  * duplicate edges are injected (URL-seen dedup D1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

M31 = 2**31

# mirrors the reference's default filters:
# extension regex — reference newsplease/config/config.cfg:74
# NO leading .*: under search semantics (Spark rlike / re.search) it is
# redundant, and the greedy-prefix retry from every start position made
# rlike O(len²) — a 180 KB URL took ~3×10^10 regex steps. Anchored-suffix
# only is the same predicate in O(len).
IGNORE_EXTENSIONS = (
    r"(?i)\.(pdf|docx?|xlsx?|pptx?|zip|gz|img|jpe?g|png|gif|mp3|mp4|avi|css|js)$"
)
# scheme junk regex — reference newsplease/config/config.cfg:78
IGNORE_REGEX = r"^(mailto|javascript|tel|fax):"
ALLOWED_DOMAIN_SUFFIX = ".example.com"


def _mix_py(a: int, b: int) -> int:
    x = (a * 1103515245 + b * 12345 + 31337) % M31
    return (x * 69069 + 1) % M31


def _mix_col(a: Column, b) -> Column:
    bc = b if isinstance(b, Column) else F.lit(int(b))
    x = (a * F.lit(1103515245) + bc * F.lit(12345) + F.lit(31337)) % F.lit(M31)
    return (x * F.lit(69069) + F.lit(1)) % F.lit(M31)


@dataclass
class World:
    n_pages: int
    n_seeds: int = 8
    n_hosts: int = 0
    robots_rules: list[tuple[str, str]] = field(init=False)

    def __post_init__(self) -> None:
        if self.n_hosts <= 0:
            self.n_hosts = max(4, self.n_pages // 50)
        self.robots_rules = [
            (f"h{h}.example.com", "/private/")
            for h in range(self.n_hosts)
            if h % 3 == 0
        ]

    # ---- python side ------------------------------------------------
    def host_id(self, p: int) -> int:
        if _mix_py(p, 1) % 10 < 4:
            return 0
        return _mix_py(p, 2) % self.n_hosts

    def url_of(self, p: int) -> str:
        h = self.host_id(p)
        t = _mix_py(p, 3) % 100
        if t < 4:
            return f"https://h{h}.example.com/f/{p}.pdf"
        if t < 6:
            return f"mailto:user{p}@h{h}.example.com"
        if t < 14:
            return f"https://ext{_mix_py(p, 4) % 50}.other.net/p/{p}"
        if t < 18:
            return f"https://h{h}.example.com/private/{p}"
        return f"https://h{h}.example.com/p/{p}"

    def degree(self, p: int) -> int:
        return 2 + _mix_py(p, 5) % 6

    def edges_of(self, p: int) -> list[tuple[str, int]]:
        """(dst_url, link_index) pairs in link order; last edge of
        high-degree pages duplicates edge 0 (exercises D1 dedup)."""
        deg = self.degree(p)
        out = []
        for k in range(deg):
            if deg >= 4 and k == deg - 1:
                q = _mix_py(p, 10) % self.n_pages
            else:
                q = _mix_py(p, 10 + k) % self.n_pages
            out.append((self.url_of(q), k))
        return out

    def seed_urls(self) -> list[str]:
        stride = max(1, self.n_pages // self.n_seeds)
        seeds = []
        for p in range(0, self.n_pages, stride):
            if _mix_py(p, 3) % 100 >= 18:  # normal page only
                seeds.append(self.url_of(p))
        return seeds

    # ---- spark side (same arithmetic as Column expressions) ----------
    def _host_col(self, p: Column) -> Column:
        return F.when(_mix_col(p, 1) % 10 < 4, F.lit(0)).otherwise(
            _mix_col(p, 2) % F.lit(self.n_hosts)
        )

    def url_col(self, p: Column) -> Column:
        h = self._host_col(p).cast("string")
        ps = p.cast("string")
        t = _mix_col(p, 3) % 100
        ext = _mix_col(p, 4) % 50
        return (
            F.when(t < 4, F.concat(F.lit("https://h"), h, F.lit(".example.com/f/"), ps, F.lit(".pdf")))
            .when(t < 6, F.concat(F.lit("mailto:user"), ps, F.lit("@h"), h, F.lit(".example.com")))
            .when(t < 14, F.concat(F.lit("https://ext"), ext.cast("string"), F.lit(".other.net/p/"), ps))
            .when(t < 18, F.concat(F.lit("https://h"), h, F.lit(".example.com/private/"), ps))
            .otherwise(F.concat(F.lit("https://h"), h, F.lit(".example.com/p/"), ps))
        )

    def webgraph_df(self, spark: SparkSession, num_partitions: int | None = None) -> DataFrame:
        """Distributed webgraph generation — one row per hyperlink.

        spark.range → explode(sequence) keeps generation fully on
        executors; at 10^10-URL design scale this is the only viable
        path (never materialize the graph on the driver).
        """
        n = self.n_pages
        pages = spark.range(0, n, 1, num_partitions or max(8, n // 250_000))
        p = F.col("id")
        deg = (F.lit(2) + _mix_col(p, 5) % 6).alias("deg")
        df = pages.select(p.alias("pid"), deg)
        k = F.col("link_index")
        pid = F.col("pid")
        q = F.when(
            (F.col("deg") >= 4) & (k == F.col("deg") - 1),
            _mix_col(pid, 10) % n,
        ).otherwise(_mix_col(pid, F.lit(10) + k) % n)
        return (
            df.select(
                pid,
                F.explode(F.sequence(F.lit(0), F.col("deg") - 1)).alias("link_index"),
                F.col("deg"),
            )
            .select(
                self.url_col(pid).alias("src_url"),
                self.url_col(q).alias("dst_url"),
                k.cast("int").alias("link_index"),
            )
        )

    def seeds_range_df(self, spark: SparkSession, n_seed_pages: int) -> DataFrame:
        """Distributed seed generation: all normal pages with id <
        n_seed_pages. Used to pre-load a large frontier for throughput
        benchmarks (BFS warmup from a handful of seeds measures wave
        overhead, not engine throughput)."""
        p = F.col("id")
        return (
            spark.range(0, min(n_seed_pages, self.n_pages))
            .filter(_mix_col(p, 3) % 100 >= 18)
            .select(self.url_col(p).alias("url"))
        )

    def robots_df(self, spark: SparkSession) -> DataFrame:
        from news_please_spark.schemas import ROBOTS

        rows = [(h, pfx, None) for h, pfx in self.robots_rules]
        return spark.createDataFrame(rows, ROBOTS)

    def seeds_df(self, spark: SparkSession) -> DataFrame:
        from news_please_spark.schemas import SEEDS

        rows = [(u, "RecursiveCrawler", None, None) for u in self.seed_urls()]
        return spark.createDataFrame(rows, SEEDS)
