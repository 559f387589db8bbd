"""Deterministic two-level epoch shuffle for training-data loaders.

A 100-TB training corpus cannot be globally shuffled with one total
order per epoch (a single row_number() over the whole corpus serializes
on one reducer in ANY engine). The standard scale design — the one
public streaming-dataset loaders use (shard shuffle + intra-shard
shuffle) — is two-level:

  1. every (epoch, id) pair is keyed by md5(salt:epoch:id);
  2. the key's top 32 bits route the row to one of `n_shards` shards;
  3. rows are ordered *within* their (epoch, shard) cell by the full
     key, giving a dense position 0..|cell|-1.

The global epoch order is then (shard, pos) lexicographically: a
reader walks shards in order and streams each shard's rows by pos.
Because md5 is uniform, shard sizes concentrate around n/n_shards, so
picking n_shards ≈ corpus_size / shard_capacity bounds every window
cell regardless of corpus size — the ONLY exchange is one hash
partition on (epoch, shard), and the per-cell sort is a bounded
in-memory sort. No driver state, no RNG: two runs (or a resumed run)
produce bit-identical orders, and any epoch/shard can be regenerated
independently — exactly the property a resumable training job needs.

Relation to `operators/ordering.py::epoch_shuffle`: that operator
materializes ONE dense global order (md5 sort + two-phase numbering) —
the schedule a single logical reader consumes; this one materializes
the sharded multi-epoch schedule a fleet of loader workers consumes
(each worker claims shards, needs only its own cells). Complementary
surfaces, one hash-key convention.

Reference scope: news-please has no training-loader tier; this is part
of the beyond-reference LLM-pipeline surface (SURVEY.md §2 extras).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def epoch_shard_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epochs: int = 2,
    n_shards: int = 64,
    salt: str = "shuf",
) -> DataFrame:
    """Assign every id a deterministic (shard, pos) per epoch.

    Returns one row per (epoch, id): columns
      epoch   BIGINT  0..epochs-1
      <id_col> STRING  the input id (cast to string — hash domain)
      shard   BIGINT  0..n_shards-1
      pos     BIGINT  dense 0-based rank within the (epoch, shard) cell

    Plan shape: one projection (explode of a literal epoch sequence —
    no join), one Exchange hashpartitioning(epoch, shard), one window
    sort per cell. Cell size is ~n/n_shards by md5 uniformity; choose
    n_shards so that cells fit an executor's sort buffer and the plan
    is corpus-size-invariant.
    """
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    ids = df.select(F.col(id_col).cast("string").alias(id_col))
    e = ids.select(
        id_col, F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))).alias("epoch")
    ).withColumn("epoch", F.col("epoch").cast("long"))
    key = F.md5(
        F.concat_ws(":", F.lit(salt), F.col("epoch").cast("string"), F.col(id_col))
    )
    keyed = e.withColumn("skey", key).withColumn(
        "shard",
        (F.conv(F.substring("skey", 1, 8), 16, 10).cast("long") % n_shards).cast(
            "long"
        ),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("skey")
    return keyed.select(
        "epoch",
        id_col,
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )


def shard_manifest(schedule: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-(epoch, shard) manifest over an epoch_shard_shuffle schedule:
    item count + an ORDER-SENSITIVE content digest (md5 of the
    "pos:id" sequence in pos order). The loader-side integrity
    contract: a worker streams its shard, recomputes the digest, and
    refuses to train on a torn/reordered/partially-written shard —
    the same role a snapshot manifest plays for table files.

    One aggregation at (epoch, shard) grain; the per-cell list build
    is bounded by the shard capacity n_shards was chosen to enforce,
    so the manifest costs one exchange regardless of corpus size."""
    items = F.sort_array(F.collect_list(F.struct("pos", id_col)))
    digest = F.md5(
        F.array_join(
            F.transform(
                items,
                lambda s: F.concat_ws(":", s["pos"].cast("string"), s[id_col]),
            ),
            ",",
        )
    )
    return schedule.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        digest.alias("digest"),
    )
