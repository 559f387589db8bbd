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
  This implementation aggregates to the (group, score) histogram first
  (bounded cardinality: quality scores are quantized), computes the
  per-group admission threshold on the histogram, and only runs a
  row_number over the single boundary (group, score) cell.  Result is
  bit-identical to the naive window (ties broken by id ascending) while
  every shuffle stage stays bounded.

Both are pure Column/DataFrame compositions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# deterministic hash-fraction sampling


def rate_to_hex8(rate: float) -> str:
    """Map a keep-rate in [0, 1] to the 8-hex-digit threshold string
    such that `md5(id)[:8] < threshold` keeps ~rate of uniformly-hashed
    ids.  Lowercase-hex string comparison is monotonic with the value,
    so the comparison itself needs no hex→int conversion — portable to
    any engine that has md5 and string `<`."""
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

    Sources absent from `rates` are dropped (rate 0).  The rates dim is
    tiny → broadcast hash join; the fact table never shuffles, the
    filter is map-side, and the decision depends only on (id, rate):
    deterministic across runs, partitionings, and engines."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(s, rate_to_hex8(r)) for s, r in sorted(rates.items())],
        f"{source_col} string, _thr string",
    )
    return (
        df.join(F.broadcast(dim), [source_col])
        .filter(hash_frac_hex8(F.col(id_col)) < F.col("_thr"))
        .drop("_thr")
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
    (score DESC, id ASC) — equal to
    `row_number() OVER (PARTITION BY g ORDER BY s DESC, id) <= k_g`
    but computed skew-safely:

      1. histogram = groupBy(group, score).count()        (bounded)
      2. running count of strictly-better rows per group   (tiny window
         over the histogram, not the data)
      3. every row whose score cell fits entirely under k_g passes with
         no per-row ranking at all; only the ONE boundary cell per
         group ranks its rows by id to take the remainder.

    frac_pct is an integer percentage so k_g = ⌈n_g·frac_pct/100⌉ is
    exact integer arithmetic — no float boundary flicker between
    engines."""
    g, s = F.col(group_col), F.col(score_col)
    hist = df.groupBy(group_col, score_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wk = Window.partitionBy(group_col)
    hist = hist.select(
        g,
        s,
        F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_above"),
        # k = ceil(n * frac_pct / 100), integer-exact
        ((F.sum("_cnt").over(wk) * frac_pct + 99) / 100)
        .cast("long")
        .alias("_k"),
    )
    # Per-row admission: a row passes iff (strictly-better rows) +
    # (its rank among equal-score rows, by id) fits under k.  The only
    # row_number runs inside one (group, score) CELL — bounded by the
    # score quantization — never over a whole group.  Cells that are
    # fully out were already cut by the _above < _k semi-condition.
    joined = df.join(hist, [group_col, score_col]).filter(
        F.col("_above") < F.col("_k")
    )
    rn = F.row_number().over(
        Window.partitionBy(group_col, score_col).orderBy(F.col(id_col).asc())
    )
    return (
        joined.withColumn("_adm", F.col("_above") + rn <= F.col("_k"))
        .filter(F.col("_adm"))
        .select(*df.columns)
    )
