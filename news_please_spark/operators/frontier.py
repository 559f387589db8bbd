"""The crawl frontier engine — waves of set-oriented DataFrame jobs.

Replaces the reference's scrapy scheduler + RFPDupeFilter + per-domain
concurrency caps (reference newsplease/single_crawler.py:170-187,
helper_classes/parse_crawler.py:90-120, config/config.cfg:350-354) with
an explicit frontier table and a deterministic total order that the
pure-Python oracle (oracle.py) reproduces bit-for-bit.

Per wave:
  politeness  — skew-safe top-B per host (operators/ordering.top_k_per_key)
  seq         — scalable global row numbering (ordering.with_global_seq)
  expansion   — join fetch-set × webgraph edges (fetch side broadcast
                when small), native filters F2/F3/F4, robots gate F11
                (broadcast prefix-array join), min-disc_key dedup of
                in-wave duplicates
  URL-seen    — optional partitioned-bloom prefilter + exact left_anti
                confirm against the `seen` table (D1)
  checkpoint  — frontier/seen/order/metrics parquet snapshots per wave
                (resume = read the last complete wave)

Scale notes (100 TB / 10^10 URLs):
  * `seen` and `frontier` would live in Iceberg, bucketed by
    pmod(xxhash64(url), B) so the per-wave anti-join is co-partitioned;
    local parquet snapshots keep the same layout (.repartition on the
    bucket expression before write).
  * lineage is cut every wave via the checkpoint write — no
    ever-growing union chain on the driver.
  * per-wave metrics (rows fetched, per-host max, skew ratio) are
    computed with `observe()`-style aggregations, one tiny job.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from news_please_spark.functions.urls import url_host, url_path
from news_please_spark.operators.cacheutil import release_df
from news_please_spark.operators.ordering import (
    mark_top_k_by_threshold,
    mark_top_k_per_key,
    with_global_seq,
)
from news_please_spark.world import (
    ALLOWED_DOMAIN_SUFFIX,
    IGNORE_EXTENSIONS,
    IGNORE_REGEX,
)

BROADCAST_FETCH_LIMIT = 100_000  # rows; above this the driver-side broadcast
# build (collect + hash-relation + serialize, ~3-5 s at 150k rows) becomes the
# SERIAL floor of every wave — larger fetch sets use a shuffle-hash join
# against src_url-co-partitioned edges instead (all phases parallel)
BROADCAST_SEEN_URL_BYTES = 32 << 20  # raw URL bytes; below this the URL-seen
# anti-join may broadcast the seen side (hash-relation overhead ≈ 3-4× raw
# keeps the driver build well under the 64 MB broadcast budget) — above it
# the engine forces shuffle_hash, never trusting Catalyst's schema-default
# estimate of a checkpointed leaf
SMALL_SEQ_LIMIT = 500_000  # below this a single-partition window beats two-phase
SMALL_SEQ_BYTES = 64 << 20  # ... but only while the whole fetch set also fits
# one task's sort buffer comfortably — fat rows (multi-KB URLs) must take the
# two-phase path even at low row counts


def estimated_fetch_bytes(n_rows: int, url_bytes: int) -> int:
    """Wave fetch-set size estimate from the stats the per-wave count
    job already computes: URL chars dominate a fetch row (url + derived
    host ≈ 2×) plus fixed depth/disc_key/struct overhead. (Catalyst's
    sizeInBytes was tried and rejected: for a localCheckpointed RDD it
    falls back to schema-default column widths — a 90 MB fat-URL table
    estimated as 8.4 KB.)"""
    return 2 * url_bytes + 32 * n_rows


def use_single_partition_seq(n_rows: int, est_bytes: int) -> bool:
    """True when the global fetch-order numbering should take the
    one-task window (cheapest for typical waves); False → the scalable
    two-phase numbering. Keyed on rows AND estimated bytes so fat rows
    can't ride the single-task path."""
    return n_rows <= SMALL_SEQ_LIMIT and est_bytes <= SMALL_SEQ_BYTES
# discovery-key encoding: children get (parent_seq + 1) * DISC_STRIDE +
# link_index, seeds get their url-rank 0..n_seeds-1. Child keys start at
# DISC_STRIDE, so keys stay unique within any frontier as long as
# n_seeds < DISC_STRIDE (asserted at seed numbering) and every page has
# < DISC_STRIDE outlinks (enforced per row by a raise_error branch in
# the expansion select). Uniqueness is the precondition of the exact
# 'threshold' politeness path. 64-bit headroom: parent seq < 2^41
# (~2.2e12 fetched pages — unreachable before the multiply overflows).
# 2^22 admits multi-million-URL seed lists (a 10^10-URL frontier is
# seeded from CC-scale URL dumps, not a hand-curated file).
DISC_STRIDE = 1 << 22
# (a one-task sort of 500k rows is ~0.3 s; the two-phase numbering costs
# two extra jobs + a shuffle — only worth it for genuinely huge waves)


@dataclass
class FrontierConfig:
    budget_per_host: int = 4          # reference config.cfg:354
    max_depth: int = 4
    max_waves: int = 10_000
    use_bloom: bool = False
    # which approximate-membership filter backs the prefilter when
    # use_bloom is on: "bloom" (OR-mergeable bit array, ~1.2 B/URL at
    # 1% FPR) or "cuckoo" (deletable 16-bit fingerprints, ~3 B/URL at
    # ~5e-4 FPR — the variant that can follow a store that RETRACTS
    # documents without a rebuild). Both share bucketing, hash lanes,
    # probe strategies, and the exactness contract.
    seen_filter: str = "bloom"
    bloom_capacity: int = 1 << 17     # expected per-bucket rows; fixes (m, k)
    # so per-wave blob deltas OR-merge — each wave hashes only its delta
    # "broadcast": all blobs in one task broadcast (small filters);
    # "copartition": cogroup probe, one blob per task — the 10^10-URL
    # design point where total blob bytes exceed any single JVM
    bloom_distribute: str = "broadcast"
    salt_buckets: int = 1             # >1 enables skew-safe two-phase top-k
    state_dir: str | None = None      # enables checkpoint/resume
    # wave-history retention: keep only the newest N wave snapshots
    # (None = keep all). Long crawls otherwise accrete one frontier
    # copy per wave forever; expiry folds each expired wave's seen
    # DELTA into the state dir's base area first (resume needs the
    # full layered seen set), then expires the snapshot — see
    # expire_waves.
    retain_waves: int | None = None
    seen_buckets: int = 32            # hash-bucket layout of the seen table
    checkpoint_every: int = 8         # waves between lineage truncations
    # politeness marking: "window" = salted two-phase row_number (default;
    # fastest when the per-wave frontier fits task memory after salting);
    # "threshold" = aggregate k-th-smallest + join (no frontier-wide sort;
    # exact because disc_key is unique — for extreme per-host skew where
    # even salted sort groups blow past task memory). A/B at 600k pages:
    # window ~5-6k URLs/s, threshold ~2-5k (the self-join shuffle costs
    # more than the sort it avoids at this scale).
    politeness_impl: str = "window"
    # fold the global seq numbering INTO the politeness-mark checkpoint
    # job when the wave's fetch set is predicted small enough for the
    # one-task window (see the fused branch in _run_waves): saves one
    # full driver job barrier + one checkpoint round-trip per wave —
    # the wave-count-proportional control-plane floor that dominates
    # small-wave runs at high parallelism. Predicted-large waves keep
    # the separate two-phase numbering (the 10^10-URL path).
    fuse_seq: bool = True
    verbose: bool = False


def _seen_filter_fns(cfg: "FrontierConfig"):
    """(build, merge, prefilter) for the configured approximate URL-seen
    filter — bloom and cuckoo share one call contract, so the wave loop
    is filter-agnostic."""
    if cfg.seen_filter == "cuckoo":
        from news_please_spark.operators.cuckoo import (
            build_cuckoo_blobs,
            cuckoo_prefilter,
            merge_cuckoo_blobs,
        )

        return build_cuckoo_blobs, merge_cuckoo_blobs, cuckoo_prefilter
    if cfg.seen_filter == "bloom":
        from news_please_spark.operators.urlseen import (
            bloom_prefilter,
            build_bloom_blobs,
            merge_bloom_blobs,
        )

        return build_bloom_blobs, merge_bloom_blobs, bloom_prefilter
    raise ValueError(f"unknown seen_filter: {cfg.seen_filter!r}")


@dataclass
class CrawlResult:
    order: DataFrame
    seen: DataFrame
    waves: int
    fetched: int
    metrics: list[dict] = field(default_factory=list)
    # checkpoint leaves backing order/seen — released via release()
    _caches: list[DataFrame] = field(default_factory=list)

    def release(self) -> None:
        """Free every checkpoint block backing `order`/`seen`. Call when
        done consuming the result (or use the engine as a context
        manager and call result.release() before exit); `order`/`seen`
        are unusable afterwards. Without this the result's state lives
        until driver GC — an accretion on long-lived sessions that run
        many crawls."""
        from news_please_spark.operators.cacheutil import release_df

        for df in self._caches:
            release_df(df)
        self._caches.clear()

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        """Per-wave engine metrics as a DataFrame — the metrics contract
        (wave, fetched, new_urls, seq_path, …) in queryable form, the
        library-mode analogue of the reference's crawler log lines."""
        rows = [
            (
                int(m["wave"]),
                int(m["fetched"]),
                int(m["new_urls"]),
                int(m["seen_chunks"]),
                str(m["seq_path"]),
                int(m["seq_next"]),
            )
            for m in self.metrics
        ]
        return spark.createDataFrame(
            rows,
            "wave int, fetched long, new_urls long, seen_chunks int, "
            "seq_path string, seq_next long",
        )


def allowed_url(url_col) -> F.Column:
    """Filters F2 (extension), F3 (scheme junk), F4 (domain scope) as one
    native boolean Column — codegen'd, no Python."""
    return (
        ~url_col.rlike(IGNORE_REGEX)
        & ~url_col.rlike(IGNORE_EXTENSIONS)
        & url_host(url_col).endswith(ALLOWED_DOMAIN_SUFFIX)
    )


def robots_blocked(path_col, prefixes_col) -> F.Column:
    """F11: true when any disallow prefix matches the URL path."""
    return F.when(
        prefixes_col.isNull(), F.lit(False)
    ).otherwise(F.exists(prefixes_col, lambda p: path_col.startswith(p)))


class FrontierEngine:
    def __init__(
        self,
        spark: SparkSession,
        webgraph: DataFrame,
        robots: DataFrame | None = None,
        cfg: FrontierConfig | None = None,
        edges_partitioned_by_src: bool = False,
        site_configs=None,
    ):
        """edges_partitioned_by_src: pass True when `webgraph` is already
        hash-partitioned/bucketed by src_url (the Iceberg-table layout at
        scale) — the big-wave shuffle-hash join then uses it directly
        instead of building a second co-partitioned cached copy.

        site_configs: optional siteconfig.SiteConfigs whose per-host
        ignore_regex ANDs into the URL gate (sitelist.hjson analogue) —
        compiled into the same codegen'd Column, no join."""
        self.spark = spark
        self.cfg = cfg or FrontierConfig()
        self.site_configs = site_configs
        # edges keyed by src_url; at scale this is an Iceberg table
        # bucketed by src_url so the per-wave join is co-partitioned.
        self.edges = webgraph
        self._edges_coparted: DataFrame | None = (
            webgraph if edges_partitioned_by_src else None
        )
        self._exp_edges: DataFrame | None = None
        self._exp_owned = False  # True when _exp_edges is OUR persist()
        if robots is not None:
            # persist: rebuilt-per-wave robots aggregation was a serial
            # job in every wave's critical path
            self.robots_by_host = (
                robots.groupBy("host")
                .agg(F.collect_list("disallow_prefix").alias("prefixes"))
                .persist()
            )
        else:
            self.robots_by_host = None

    def _url_gate(self, url_col) -> F.Column:
        """Global allowed_url AND any per-site ignore_regex — still one
        codegen'd boolean Column."""
        gate = allowed_url(url_col)
        if self.site_configs is not None:
            gate = gate & self.site_configs.ignore_column(url_col)
        return gate

    def _expansion_edges(self) -> DataFrame:
        """The edge table the wave loop expands through: hash-partitioned
        by src_url, ROBOTS-PREFILTERED, cached. Robots are static for the
        duration of a crawl, so the F11 gate is applied ONCE here instead
        of per wave — a blocked dst edge is dead forever. This removes a
        driver-serial ~O(hosts) broadcast build AND an O(edges-probed)
        prefix scan from EVERY wave (both used to sit in the expand
        phase's critical path). The shuffle-hash expansion join then
        exchanges only the small fetch side; the edge scan stays
        partition-local every wave. At 100 TB this is the Iceberg edges
        table bucketed by src_url, robots-joined once at crawl start
        (or maintained incrementally as robots change)."""
        if self._exp_edges is not None:
            return self._exp_edges
        base = self._edges_coparted
        if base is None:
            n = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            base = self.edges.repartition(n, "src_url")
        if self.robots_by_host is None:
            # nothing to filter: reuse the caller's co-partitioned cache
            # as-is when they provided one
            if self._edges_coparted is not None:
                self._exp_edges = self._edges_coparted
                return self._exp_edges
            filtered = base
        else:
            # filter preserves the src_url partitioning — no new shuffle
            filtered = (
                base.withColumn("_dhost", url_host(F.col("dst_url")))
                .join(F.broadcast(self.robots_by_host),
                      F.col("_dhost") == F.col("host"), "left")
                .filter(
                    ~robots_blocked(url_path(F.col("dst_url")), F.col("prefixes"))
                )
                .drop("_dhost", "host", "prefixes")
            )
        self._exp_edges = filtered.persist()
        self._exp_owned = True
        self._exp_edges.count()
        return self._exp_edges

    def prepare(self) -> None:
        """Materialize the one-time caches (robots-filtered co-partitioned
        edges) outside the timed crawl loop — table prep, not crawling."""
        self._expansion_edges()

    def close(self) -> None:
        """Release the engine's long-lived caches (robots aggregate +
        the robots-filtered co-partitioned edge cache). Call when the
        engine is done — on a long-lived session the caches otherwise
        accrete across engines. Caches the CALLER handed in
        (edges_partitioned_by_src=True with no robots filtering) are
        the caller's to release and are left alone. Idempotent; the
        engine stays usable (both caches are plain persists over live
        plans — a later run() transparently rebuilds them)."""
        if self._exp_owned and self._exp_edges is not None:
            release_df(self._exp_edges)
            self._exp_edges = None
            self._exp_owned = False
        if self.robots_by_host is not None:
            release_df(self.robots_by_host)

    def __enter__(self) -> "FrontierEngine":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- state snapshots ------------------------------------------------
    # Per-wave checkpoints are snapshots in a SnapshotCatalog (state.py):
    # stage → atomic rename commit, with compare-and-swap on the wave id
    # so two crawlers resuming the same state dir cannot both commit a
    # wave — one gets CommitConflict (the Iceberg commit protocol the
    # 100-TB deployment would run on the catalog's metadata pointer).
    def _wave_catalog(self):
        from news_please_spark.state import SnapshotCatalog

        return SnapshotCatalog(self.cfg.state_dir, prefix="wave=", width=5)

    def _wave_dir(self, wave: int) -> str:
        return self._wave_catalog().snapshot_dir(wave)

    def _save_wave(self, wave, frontier, seen, order_wave, meta) -> None:
        tx = self._wave_catalog().begin(expected=wave - 1)
        bucket = F.pmod(F.xxhash64("url"), F.lit(self.cfg.seen_buckets))
        frontier.write.mode("overwrite").parquet(tx.path("frontier"))
        seen.repartition(self.cfg.seen_buckets, bucket).write.mode(
            "overwrite"
        ).parquet(tx.path("seen"))
        order_wave.write.mode("overwrite").parquet(tx.path("order"))
        tx.commit(meta)  # raises state.CommitConflict on a racing writer
        if self.cfg.retain_waves is not None:
            self.expire_waves(self.cfg.retain_waves)

    def expire_waves(self, keep_last: int) -> list[int]:
        """Retention for the wave history: keep the newest `keep_last`
        wave snapshots, folding each expired wave's seen DELTA into the
        state dir's `base/` area first (a directory rename, no data
        rewrite — the append-only seen layout survives expiry intact;
        resume reads init ∪ base/* ∪ surviving wave deltas), then
        expire the snapshot dirs via the catalog. A crash between the
        fold and the expiry leaves a wave dir without its seen table —
        resume's per-wave existence check is on the seen SUBDIR, so
        nothing is double-counted or lost. Returns the expired ids."""
        cat = self._wave_catalog()
        snaps = cat.snapshots()
        expired = snaps[:-keep_last] if len(snaps) > keep_last else []
        if not expired:
            return []
        base = os.path.join(self.cfg.state_dir, "base")
        os.makedirs(base, exist_ok=True)
        for w in expired:
            src = os.path.join(cat.snapshot_dir(w), "seen")
            dst = os.path.join(base, f"seen-w{w:05d}")
            if os.path.isdir(src) and not os.path.isdir(dst):
                os.rename(src, dst)
        return cat.expire_snapshots(keep_last=keep_last)

    @staticmethod
    def latest_wave(state_dir: str) -> int | None:
        from news_please_spark.state import SnapshotCatalog

        return SnapshotCatalog(state_dir, prefix="wave=", width=5).latest()

    # -- main loop --------------------------------------------------------
    def run(
        self, seed_urls: list[str] | DataFrame, resume: bool = False
    ) -> CrawlResult:
        spark, cfg = self.spark, self.cfg
        metrics: list[dict] = []
        order_parts: list[DataFrame] = []

        start_wave = 0
        seq_base = 0
        frontier = seen = None
        _seed_caches: list[DataFrame] = []
        if resume and cfg.state_dir:
            # a crash mid _save_wave leaves a wave=NNNNN.tmp* staging
            # dir; it must neither count as a wave (the catalog's
            # listing skips it) nor contribute its partially-written
            # seen delta — globbing wave=*/seen would silently mark the
            # re-run wave's URLs as already seen. Sweep stale staging,
            # then enumerate committed waves only.
            self._wave_catalog().sweep_staging()
            last = self.latest_wave(cfg.state_dir)
            if last is not None:
                d = self._wave_dir(last)
                with open(os.path.join(d, "meta.json")) as f:
                    meta = json.load(f)
                frontier = spark.read.parquet(os.path.join(d, "frontier"))
                # seen = initial seeds ∪ deltas folded to base/ by wave
                # expiry ∪ per-wave deltas of surviving COMPLETE waves
                # (append-only layout: what Iceberg appends would be at
                # scale). Existence is checked on the seen SUBDIR —
                # a wave mid-expiry may have lost its delta to base/
                # while the snapshot dir still exists.
                base_dir = os.path.join(cfg.state_dir, "base")
                base_paths = (
                    sorted(
                        os.path.join(base_dir, n)
                        for n in os.listdir(base_dir)
                        if n.startswith("seen-w")
                    )
                    if os.path.isdir(base_dir)
                    else []
                )
                seen_paths = (
                    [os.path.join(cfg.state_dir, "init", "seen")]
                    + base_paths
                    + [
                        os.path.join(self._wave_dir(w), "seen")
                        for w in range(last + 1)
                        if os.path.isdir(os.path.join(self._wave_dir(w), "seen"))
                    ]
                )
                seen = spark.read.parquet(*seen_paths)
                start_wave = last + 1
                seq_base = meta["seq_next"]
        if frontier is None:
            # seeds: sorted by url, disc_key = rank (mirrors oracle)
            if isinstance(seed_urls, DataFrame):
                seeds = seed_urls.select("url")
            else:
                seeds = spark.createDataFrame(
                    [(u,) for u in seed_urls], "url string"
                )
            seeds = seeds.filter(self._url_gate(F.col("url")))
            if self.robots_by_host is not None:
                seeds = (
                    seeds.withColumn("host", url_host(F.col("url")))
                    .join(F.broadcast(self.robots_by_host), "host", "left")
                    .filter(~robots_blocked(url_path(F.col("url")), F.col("prefixes")))
                    .select("url")
                )
            seeds, n_seeds = with_global_seq(
                seeds, ["url"], 0, out="disc_key", caches=_seed_caches
            )
            if n_seeds >= DISC_STRIDE:
                raise ValueError(
                    f"{n_seeds} seeds ≥ DISC_STRIDE={DISC_STRIDE}: seed "
                    "disc_keys would collide with child keys; raise "
                    "DISC_STRIDE or split the seed list"
                )
            frontier = seeds.select(
                F.col("url"),
                url_host(F.col("url")).alias("host"),
                F.lit(0).alias("depth"),
                F.col("disc_key"),
            )
            seen = frontier.select("url")
            if cfg.state_dir:
                seen.write.mode("overwrite").parquet(
                    os.path.join(cfg.state_dir, "init", "seen")
                )

        # `seen` is kept as a LIST of checkpointed chunks — never copied
        # per wave (copying the full seen set every wave would be O(seen)
        # × waves; at 10^10 URLs that is the difference between a crawl
        # and a heat lamp). The anti-join probes the union of chunks, so
        # the per-wave cost scales with the CHUNK COUNT (each chunk is
        # its own exchange + stage barrier): chunks merge LSM-style —
        # adjacent chunks within 2× of each other fold together — which
        # bounds the count at O(log seen) and the total merge work at
        # O(seen·log seen) amortized, measured 3-8× faster late waves
        # than the old fixed every-N-waves full fold.
        frontier = frontier.localCheckpoint(eager=True)
        _obs_seen = Observation()
        seen_chunks: list[DataFrame] = [
            seen.observe(
                _obs_seen,
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum(F.length("url")), F.lit(0)).alias("b"),
            ).localCheckpoint(eager=True)
        ]
        chunk_sizes: list[int] = [int(_obs_seen.get["n"])]
        seen_url_bytes: int = int(_obs_seen.get["b"])
        # frontier + seen chunk 0 are checkpointed above — the seed
        # numbering's internal range-partitioned cache is now dead state
        for c in _seed_caches:
            release_df(c)
        _seed_caches.clear()

        # incremental bloom state: blobs are built once from the initial
        # seen set with a FIXED (m, k), then OR-merged with each wave's
        # delta — per-wave bloom cost is O(wave), never O(seen)
        blob_state: DataFrame | None = None
        if cfg.use_bloom:
            build_blobs, _, _ = _seen_filter_fns(cfg)
            blob_state = build_blobs(
                seen_chunks[0], cfg.seen_buckets, capacity=cfg.bloom_capacity
            ).localCheckpoint(eager=True)

        def seen_df() -> DataFrame:
            s = seen_chunks[0]
            for c in seen_chunks[1:]:
                s = s.unionByName(c)
            return s

        import time as _time

        # AQE is valuable for ad-hoc queries, but inside the wave loop
        # every join is already routed by engine-held statistics
        # (broadcast/shuffle-hash by measured bytes) and every input is
        # a checkpointed leaf AQE cannot re-measure — so adaptive
        # re-planning contributes only extra query-stage barriers per
        # wave (and was observed sporadically mis-planning long stages:
        # 16-core crawls measured 88-125 s with AQE off vs 88-395 s
        # with it on). Scope it off for the loop, restore after.
        _aqe_key = "spark.sql.adaptive.enabled"
        _aqe_prev = spark.conf.get(_aqe_key)
        spark.conf.set(_aqe_key, "false")
        try:
            return self._run_waves(
                spark, cfg, frontier, seen_chunks, chunk_sizes,
                seen_url_bytes, blob_state, order_parts, metrics,
                start_wave, seq_base, seen_df,
            )
        finally:
            spark.conf.set(_aqe_key, _aqe_prev)

    def _run_waves(
        self, spark, cfg, frontier, seen_chunks, chunk_sizes,
        seen_url_bytes, blob_state, order_parts, metrics,
        start_wave, seq_base, seen_df,
    ) -> "CrawlResult":
        import time as _time

        wave = start_wave
        # superseded-state tracking: the previous wave's politeness
        # checkpoint dies the moment the current one materializes (its
        # only consumers — fetch/deferred/frontier/save — have all run);
        # per-wave fetch checkpoints die at the next order-part
        # compaction. Releasing them deterministically keeps storage at
        # O(frontier + seen), not O(waves · frontier).
        # the incoming frontier checkpoint's only consumer is wave 0's
        # politeness checkpoint — chain it into the same release slot
        prev_ann: DataFrame | None = frontier
        order_leaves: list[DataFrame] = []
        # chunk_backing[i]: the wave's `new` checkpoint whose blocks back
        # seen_chunks[i] when the chunk is a projection over it (None for
        # chunks that own their root: the initial chunk and fold
        # products). A folded-away wave-delta chunk can't free its
        # backing checkpoint immediately — the next frontier still
        # shares it — so it retires one wave later, once the next
        # politeness checkpoint has consumed that frontier.
        chunk_backing: list[DataFrame | None] = [None] * len(seen_chunks)
        retire_next: list[DataFrame] = []
        # a fused ann checkpoint (politeness mark + seq in ONE job)
        # backs its wave's order part, so it retires at order compaction
        # like a fetch checkpoint — not at the next wave like a
        # mark-only checkpoint
        prev_ann_fused = False
        # fused-seq routing state: the seq plan must be chosen BEFORE
        # the mark job runs, so the router works from engine-held
        # statistics — an EXACT frontier-size bound (fetch ⊆ frontier;
        # maintained from the same Observations that feed the seen-join
        # routing) as the catastrophe cap, and last wave's measured
        # fetch size ×2 as the predictor. A misprediction only makes
        # one wave's one-task sort bigger (bounded by the frontier cap,
        # self-corrects next wave); it can never change results.
        frontier_rows = sum(chunk_sizes)
        frontier_url_bytes = seen_url_bytes
        fuse_rows_pred = frontier_rows
        fuse_bytes_pred = frontier_url_bytes
        while wave < cfg.max_waves:
            _t0 = _time.time()
            fuse = (
                cfg.fuse_seq
                and use_single_partition_seq(
                    fuse_rows_pred,
                    estimated_fetch_bytes(fuse_rows_pred, fuse_bytes_pred),
                )
                and frontier_rows <= 16 * SMALL_SEQ_LIMIT
            )
            # politeness: each host fetches at most B URLs per wave (O2).
            # disc_key is globally unique, so the threshold variant
            # (aggregate + join, no frontier-wide sort) is exact.
            # One checkpoint per wave bounds the logical-plan depth —
            # otherwise Catalyst re-analyzes an exponentially growing
            # tree even though the data is cached.
            if cfg.politeness_impl == "threshold":
                marked = mark_top_k_by_threshold(
                    frontier,
                    key="host",
                    order_col="disc_key",
                    k=cfg.budget_per_host,
                    salt_buckets=max(cfg.salt_buckets, 8),
                    flag="_fetch",
                )
            else:
                marked = mark_top_k_per_key(
                    frontier,
                    key="host",
                    order_cols=["disc_key", "url"],
                    k=cfg.budget_per_host,
                    salt_buckets=cfg.salt_buckets,
                    salt_on="url",
                    flag="_fetch",
                )
            # fused seq: number the fetch rows INSIDE the mark job — a
            # one-task window over ONLY the _fetch branch (the deferred
            # branch bypasses it; the politeness shuffle is shared by
            # both branches via ReuseExchange). One checkpoint job
            # instead of two removes a full driver job barrier + a
            # checkpoint round-trip per wave — the control-plane floor
            # that dominates small-wave runs at high parallelism.
            if fuse:
                from pyspark.sql import Window

                # LINEAR plan, no branch: fetch rows land in ONE window
                # bucket (the one-task global numbering), deferred rows
                # spread across parallel buckets whose row_numbers are
                # discarded (their per-task sorts are tiny). A branched
                # filter-union would recompute the politeness windows
                # once per branch (ReuseExchange shares only the
                # shuffle, not the window stages) — measured SLOWER
                # than the job it saves.
                _wkey = F.when(F.col("_fetch"), F.lit(-1)).otherwise(
                    F.pmod(
                        F.xxhash64("url"),
                        F.lit(spark.sparkContext.defaultParallelism * 4),
                    )
                )
                wseq = Window.partitionBy(_wkey).orderBy(
                    "depth", "disc_key", "url"
                )
                marked = marked.withColumn(
                    "seq",
                    F.when(
                        F.col("_fetch"),
                        F.row_number().over(wseq) - 1 + F.lit(seq_base),
                    ).cast("long"),
                )
            # the row count AND byte estimate the sequencing guard needs
            # ride the checkpoint job itself as an Observation — zero
            # extra jobs, zero extra scans (a separate .first() job per
            # wave was one of the four per-wave driver barriers)
            _obs = Observation()
            ann = marked.observe(
                _obs,
                F.count_if(F.col("_fetch")).alias("n"),
                F.coalesce(
                    F.sum(F.when(F.col("_fetch"), F.length("url"))), F.lit(0)
                ).alias("b"),
            ).localCheckpoint(eager=True)
            if prev_ann_fused:
                # a fused checkpoint still backs its order part — retire
                # at the next order compaction, not now
                order_leaves.append(prev_ann)
            else:
                release_df(prev_ann)
            prev_ann, prev_ann_fused = ann, fuse
            for df in retire_next:
                release_df(df)
            retire_next.clear()
            _t_mark = _time.time()
            if fuse:
                deferred = ann.filter(~F.col("_fetch")).drop("_fetch", "seq")
            else:
                deferred = ann.filter(~F.col("_fetch")).drop("_fetch")
            _stats = _obs.get
            n_fetched = int(_stats["n"])
            fetch_url_bytes = int(_stats["b"])
            fetch_bytes = estimated_fetch_bytes(n_fetched, fetch_url_bytes)
            if n_fetched == 0:
                break
            # deterministic global fetch order (O1): fused = already
            # numbered in the mark job; otherwise a single-partition
            # window is cheapest for the usual budget×hosts-sized fetch
            # set, falling back to the scalable two-phase numbering when
            # the wave is genuinely large.
            if fuse:
                seq_path = "fused_window"
                fetch = ann.filter(F.col("_fetch")).drop("_fetch")
                seq_next = seq_base + n_fetched
            elif use_single_partition_seq(n_fetched, fetch_bytes):
                from pyspark.sql import Window

                seq_path = "window"
                w = Window.orderBy("depth", "disc_key", "url")
                fetch = (
                    ann.filter(F.col("_fetch"))
                    .drop("_fetch")
                    .coalesce(1)
                    .withColumn(
                        "seq",
                        (F.row_number().over(w) - 1 + F.lit(seq_base)).cast("long"),
                    )
                )
                seq_next = seq_base + n_fetched
                fetch = fetch.localCheckpoint(eager=True)
            else:
                seq_path = "two_phase"
                fetch, seq_next = with_global_seq(
                    ann.filter(F.col("_fetch")).drop("_fetch"),
                    ["depth", "disc_key", "url"],
                    seq_base,
                    materialize=True,
                )
            _t_seq = _time.time()
            order_wave = fetch.select(
                "url", "host", "depth", "seq", F.lit(wave).alias("wave")
            )
            order_parts.append(order_wave)
            if not fuse:
                order_leaves.append(fetch)
            # engine-held stats for next wave's routing (exact deltas)
            frontier_rows = frontier_rows - n_fetched
            frontier_url_bytes = max(0, frontier_url_bytes - fetch_url_bytes)
            fuse_rows_pred = 2 * n_fetched
            fuse_bytes_pred = 2 * fetch_url_bytes

            # expansion: fetch-set × edges (S9); broadcast the small side
            expandable = fetch.filter(F.col("depth") < cfg.max_depth).select(
                F.col("url").alias("p_url"),
                F.col("depth").alias("p_depth"),
                F.col("seq").alias("p_seq"),
            )
            edges = self._expansion_edges()
            if n_fetched <= BROADCAST_FETCH_LIMIT:
                expandable = F.broadcast(expandable)
            else:
                # big wave: shuffle-hash join on co-partitioned edges —
                # no driver-serial broadcast build in the wave loop
                expandable = expandable.hint("shuffle_hash")
            cand = (
                edges.join(
                    expandable, edges.src_url == expandable.p_url
                )
                .select(
                    F.col("dst_url").alias("url"),
                    # (p_seq + 1)*DISC_STRIDE keeps child keys disjoint
                    # from the seed keys 0..n_seeds-1 (seeds deferred by
                    # politeness would otherwise collide with children of
                    # early parents), so disc_key is unique WITHIN EVERY
                    # HOST — the precondition of the exact threshold
                    # politeness path
                    # the < DISC_STRIDE outlink precondition is enforced
                    # here, per row, inside codegen (a branch, not a
                    # scan) — a page with ≥ 2^20 outlinks would silently
                    # corrupt disc_key uniqueness otherwise
                    F.when(
                        F.col("link_index") < DISC_STRIDE,
                        (F.col("p_seq") + 1) * DISC_STRIDE + F.col("link_index"),
                    )
                    .otherwise(
                        F.raise_error(
                            F.concat(
                                F.lit("link_index >= DISC_STRIDE on "),
                                F.col("dst_url"),
                                F.lit(" — raise DISC_STRIDE for pages with >4M outlinks"),
                            )
                        )
                    )
                    .alias("disc_key"),
                    (F.col("p_depth") + 1).alias("depth"),
                )
                .filter(self._url_gate(F.col("url")))
                .withColumn("host", url_host(F.col("url")))
            )
            # robots gate F11: already applied — _expansion_edges
            # prefilters blocked dst edges once for the whole crawl
            # in-wave dedup: the lowest disc_key parent wins (its depth rides
            # along in the struct — disc_key is globally unique)
            cand = (
                cand.groupBy("url", "host")
                .agg(F.min(F.struct("disc_key", "depth")).alias("m"))
                .select(
                    "url",
                    "host",
                    F.col("m.depth").cast("int").alias("depth"),
                    F.col("m.disc_key").alias("disc_key"),
                )
            )
            # URL-seen D1: optional bloom/cuckoo prefilter, exact
            # anti-join confirm
            seen = seen_df()
            if cfg.use_bloom:
                _, _, prefilter = _seen_filter_fns(cfg)
                cand = prefilter(
                    cand,
                    seen,
                    self.cfg.seen_buckets,
                    blobs=blob_state,
                    distribute=cfg.bloom_distribute,
                )
            # the seen side is a union of localCheckpointed chunks, and a
            # LogicalRDD leaf has NO usable size statistics — Catalyst
            # estimates it at schema-default width and would happily
            # BROADCAST a multi-million-row (at design scale, multi-TB)
            # seen set, building the hash relation serially on the
            # driver every wave (measured: random 40-170 s CPU-burn
            # spikes; AQE cannot fix a leaf estimate because there is no
            # shuffle stage to re-measure). The engine carries the
            # statistics Catalyst lacks (exact chunk row/byte counts via
            # per-wave Observations) and routes the join itself: a
            # genuinely small seen set broadcasts — the cheap and
            # correct local plan — while anything larger takes the
            # scale-safe shuffle-hash join (cand streams, each task
            # builds only its own seen partition).
            if seen_url_bytes > BROADCAST_SEEN_URL_BYTES:
                seen = seen.hint("shuffle_hash")
            _obs_new = Observation()
            new = (
                cand.join(seen, "url", "left_anti")
                .select("url", "host", "depth", "disc_key")
                .observe(
                    _obs_new,
                    F.count(F.lit(1)).alias("n"),
                    F.coalesce(F.sum(F.length("url")), F.lit(0)).alias("b"),
                )
                .localCheckpoint(eager=True)
            )
            n_new = int(_obs_new.get["n"])
            seen_url_bytes += int(_obs_new.get["b"])
            frontier_rows += n_new
            frontier_url_bytes += int(_obs_new.get["b"])
            if n_new > 0:
                seen_chunks.append(new.select("url"))
                chunk_sizes.append(n_new)
                chunk_backing.append(new)
            else:
                # nothing new: the checkpoint still backs this wave's
                # frontier union, so it retires after the next
                # politeness checkpoint like a folded delta (tail waves
                # that only drain deferred URLs hit this every wave)
                retire_next.append(new)
            # size-tiered merge: fold the tail while neighbors are within
            # 2× — the big old chunks are rewritten only O(log) times
            while len(seen_chunks) > 1 and chunk_sizes[-2] < 2 * chunk_sizes[-1]:
                replaced = list(zip(seen_chunks[-2:], chunk_backing[-2:]))
                folded = (
                    seen_chunks[-2]
                    .unionByName(seen_chunks[-1])
                    .localCheckpoint(eager=True)
                )
                seen_chunks[-2:] = [folded]
                chunk_sizes[-2:] = [chunk_sizes[-2] + chunk_sizes[-1]]
                chunk_backing[-2:] = [None]
                # the fold is eager, so the replaced chunks are dead AS
                # SEEN STATE — release their blocks deterministically
                # instead of waiting for driver GC + ContextCleaner (at
                # design scale a fold transiently holding 2× the seen
                # set is a spill). Owned roots (chunk 0, fold products)
                # free now; a wave-delta chunk shares its `new`
                # checkpoint with the live frontier, so its backing
                # retires after the NEXT politeness checkpoint.
                for c, b in replaced:
                    if b is None:
                        release_df(c)
                    else:
                        retire_next.append(b)
            if cfg.use_bloom:
                build_blobs, merge_blobs, _ = _seen_filter_fns(cfg)
                delta = build_blobs(
                    new.select("url"), cfg.seen_buckets, capacity=cfg.bloom_capacity
                )
                prev_blobs = blob_state
                blob_state = merge_blobs(blob_state, delta).localCheckpoint(
                    eager=True
                )
                # the superseded blob checkpoint has no consumers once
                # the merged state is eagerly materialized (this wave's
                # prefilter already ran inside the `new` checkpoint) —
                # release it like every other superseded wave cache
                # instead of accreting one blob checkpoint per wave
                release_df(prev_blobs)
            frontier = deferred.unionByName(new)

            if cfg.state_dir:
                self._save_wave(
                    wave,
                    frontier,
                    new.select("url"),
                    order_wave,
                    {"seq_next": seq_next, "wave": wave},
                )
            _t_end = _time.time()
            metrics.append(
                {
                    "wave": wave,
                    "fetched": n_fetched,
                    "new_urls": n_new,
                    "seen_chunks": len(seen_chunks),
                    "fetch_bytes_est": fetch_bytes,
                    "seq_path": seq_path,
                    "seq_next": seq_next,
                    "wave_secs": round(_t_end - _t0, 3),
                    "mark_secs": round(_t_mark - _t0, 3),
                    "seq_secs": round(_t_seq - _t_mark, 3),
                    "expand_secs": round(_t_end - _t_seq, 3),
                }
            )
            if cfg.verbose:
                print(f"[wave {wave}] {metrics[-1]}", flush=True)
            seq_base = seq_next
            wave += 1
            # periodic compaction of the order-part list (one leaf per
            # wave); the seen chunks self-compact via the size-tiered
            # merge above
            if wave % cfg.checkpoint_every == 0:
                if order_parts:
                    old_parts = order_parts
                    merged = order_parts[0]
                    for part in order_parts[1:]:
                        merged = merged.unionByName(part)
                    order_parts = [merged.localCheckpoint(eager=True)]
                    # the compacted checkpoint supersedes the per-wave
                    # fetch checkpoints and any prior compaction root
                    for df in order_leaves:
                        release_df(df)
                    order_leaves.clear()
                    for df in old_parts:
                        release_df(df)

        # the last politeness checkpoint (and any still-pending retired
        # wave checkpoint) has no consumers after the loop — every
        # wave's fetch/deferred/save actions already ran. A FUSED last
        # checkpoint still backs its order part, so it retires with the
        # result instead.
        if prev_ann_fused:
            order_leaves.append(prev_ann)
        else:
            release_df(prev_ann)
        for df in retire_next:
            release_df(df)
        order = order_parts[0] if order_parts else self.spark.createDataFrame(
            [], "url string, host string, depth int, seq long, wave int"
        )
        for part in order_parts[1:]:
            order = order.unionByName(part)
        result_caches = [
            (c if b is None else b) for c, b in zip(seen_chunks, chunk_backing)
        ] + order_leaves + order_parts
        if blob_state is not None:
            # the final filter-blob checkpoint retires with the result
            result_caches.append(blob_state)
        return CrawlResult(
            order=order,
            seen=seen_df(),
            waves=wave - start_wave,
            fetched=seq_base,
            metrics=metrics,
            _caches=result_caches,
        )
