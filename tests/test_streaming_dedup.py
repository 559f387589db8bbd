"""Streaming dedup ledger (applyInPandasWithState): first-arrival-wins
canonical assignment + duplicate ranks, state across micro-batches and
query restarts, bit-exact against the static twin."""

from __future__ import annotations

from news_please_spark.streaming.dedup import (
    dedup_ledger_batch,
    dedup_ledger_stream,
)

DOC_SCHEMA = "fp string, doc_id string"

BATCH1 = [
    ("f1", "d03"),
    ("f1", "d01"),  # same batch: id ASC wins the canonical slot
    ("f2", "d02"),
]
BATCH2 = [
    ("f1", "d00"),  # EARLIER id arriving later must NOT steal canonical
    ("f2", "d04"),
    ("f3", "d05"),
]


def _run_stream(spark, tmp_path):
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")

    def one_pass(rows):
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        q = (
            dedup_ledger_stream(
                spark.readStream.schema(DOC_SCHEMA).parquet(inp)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    one_pass(BATCH1)
    one_pass(BATCH2)  # separate query start: state restored from ckpt
    return {
        (r.fp, r.doc_id): (r.canonical_id, r.dup_rank, r.is_canonical)
        for r in spark.read.parquet(out).collect()
    }


def test_ledger_state_survives_restart(spark, tmp_path):
    got = _run_stream(spark, tmp_path)
    # batch 1: d01 beats d03 inside the batch (id ASC)
    assert got[("f1", "d01")] == ("d01", 1, True)
    assert got[("f1", "d03")] == ("d01", 2, False)
    assert got[("f2", "d02")] == ("d02", 1, True)
    # batch 2 after restart: arrival order governs — d00 is a DUP of
    # d01 (rank 3), not a new canonical; the state survived shutdown
    assert got[("f1", "d00")] == ("d01", 3, False)
    assert got[("f2", "d04")] == ("d02", 2, False)
    assert got[("f3", "d05")] == ("d05", 1, True)
    assert len(got) == 6


def test_stream_matches_static_twin(spark, tmp_path):
    got = _run_stream(spark, tmp_path)
    batched = spark.createDataFrame(
        [(1, *r) for r in BATCH1] + [(2, *r) for r in BATCH2],
        "batch int, " + DOC_SCHEMA,
    )
    twin = {
        (r.fp, r.doc_id): (r.canonical_id, r.dup_rank, r.is_canonical)
        for r in dedup_ledger_batch(batched, batch_col="batch").collect()
    }
    assert got == twin


def test_batch_twin_single_batch_semantics(spark):
    df = spark.createDataFrame(BATCH1 + BATCH2, DOC_SCHEMA)
    rows = {
        (r.fp, r.doc_id): (r.canonical_id, r.dup_rank)
        for r in dedup_ledger_batch(df).collect()
    }
    # one global batch: d00 IS the canonical for f1 (id ASC overall)
    assert rows[("f1", "d00")] == ("d00", 1)
    assert rows[("f1", "d01")] == ("d00", 2)
    assert rows[("f1", "d03")] == ("d00", 3)
