"""Build a scaled measurement dataset approximating the driver's sf1.0.

The driver generates its own deterministic data (seed=42) at whatever sf it
escalates to (BENCH_r05.json records sf=1.0). That generator is not in the
repo, so for *measurement only* (never correctness -- the oracle gates run at
sf0.001/0.01/0.1 on the driver's own files) this script replicates
/root/testdata/sf0.1 10x with the observed scaling laws:

  documents  5,000 -> 50,000      (50000*sf, text ~ bag of 31-token vocab)
  embeddings 2,000 -> 20,000      (20000*sf, unit-norm 64-d)
  events   100,000 -> 1,000,000   (1e6*sf, fixed 30-day window, users 15000*sf)
  lineitem 600,000 -> 6,000,000   (TPC-H-ish ratios preserved)
  orders/customer/part/supplier   10x with consistent FK offsets
  region/nation                   fixed

Replica k shifts every key by k*n so FK joins stay consistent.  Documents
and embeddings are fresh i.i.d. draws from the distributions observed in
the real files (each sf is an independent draw there too -- sf0.01 is not
a prefix of sf0.1); see the inline notes for the rejected replica-mutation
variant.  Files are written with pyarrow's default (1M-row) row groups,
matching the driver's layout at both small and large row counts.

Usage: python tools/make_scaled_sf.py /root/sf1 10
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def write(tbl: pa.Table, out: str, name: str) -> None:
    # pyarrow's default 1M-row groups: the driver's own files show the
    # same behavior (600k-row sf0.1 lineitem = 1 row group), so a 6M-row
    # sf1 lineitem has ~6 groups => ~6 scan splits. Forcing one giant
    # row group serialized every lineitem-scan map stage onto one core
    # (crawl_traps read 19.6s vs the driver's 3.9s at the same size).
    pq.write_table(tbl, f"{out}/{name}.parquet", compression="snappy")
    print(f"{name}: {tbl.num_rows} rows", flush=True)


def rep_offset(tbl: pa.Table, k: int, offsets: dict[str, int]) -> pa.Table:
    cols = {}
    for fname in tbl.schema.names:
        col = tbl.column(fname)
        if fname in offsets and k > 0:
            col = pc.add(col, offsets[fname] * k)
        cols[fname] = col
    return pa.table(cols)


def main() -> None:
    out, reps = sys.argv[1], int(sys.argv[2])
    import os

    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    # -- small dims: copy as-is -------------------------------------------
    for name in ("region", "nation"):
        write(pq.read_table(f"{SRC}/{name}.parquet"), out, name)

    # -- TPC-H-ish fact/dim tables: replicate with consistent FK offsets --
    plans = {
        "customer": {"c_custkey": 15000},
        "supplier": {"s_suppkey": 1000},
        "part": {"p_partkey": 20000},
        "orders": {"o_orderkey": 150000, "o_custkey": 15000},
        "lineitem": {"l_orderkey": 150000, "l_partkey": 20000,
                     "l_suppkey": 1000},
    }
    for name, offs in plans.items():
        base = pq.read_table(f"{SRC}/{name}.parquet")
        parts = [rep_offset(base, k, offs) for k in range(reps)]
        write(pa.concat_tables(parts), out, name)

    # -- events: same 30-day window, 10x density, new users per replica ---
    base = pq.read_table(f"{SRC}/events.parquet")
    n = base.num_rows
    parts = []
    for k in range(reps):
        t = rep_offset(base, k, {"event_id": n, "user_id": 15000})
        if k > 0:
            jitter = rng.integers(-30_000_000, 30_000_000, size=n)  # +/-30s us
            ts = pc.add(t.column("ts").cast(pa.int64()), pa.array(jitter))
            t = t.set_column(t.schema.get_field_index("ts"), "ts",
                             ts.cast(pa.timestamp("us")))
        parts.append(t)
    ev = pa.concat_tables(parts).sort_by("ts")
    # re-number event_id in ts order like a generator would
    ev = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                       pa.array(np.arange(ev.num_rows, dtype=np.int64)))
    write(ev, out, "events")

    # -- documents: i.i.d. draws matching the driver generator's model ----
    # Observed structure of the real files (sf0.01 is NOT a prefix of
    # sf0.1 -- each sf is an independent draw): token bag i.i.d. from a
    # ~uniform 31-word vocab, length ~ Uniform{10..100}, lang from the
    # empirical dist, source = src{doc_id % 20}, ~0.16% of docs are
    # byte-exact copies of an earlier doc (planted exact dups).
    # Replica-mutation (the first version of this script) made every
    # doc a near-dup of its base -- quadratically exploding the
    # LSH/winnow bucket occupancy far beyond the real generator's shape
    # (winnow_pairs 794 s vs the driver's 3 s at sf=1.0).
    base = pq.read_table(f"{SRC}/documents.parquet")
    texts = base.column("text").to_pylist()
    vocab: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            vocab[w] = vocab.get(w, 0) + 1
    words = np.array(list(vocab))
    freqs = np.array([vocab[w] for w in words], dtype=float)
    freqs /= freqs.sum()
    langs = base.column("lang").to_pylist()
    lang_vals, lang_counts = np.unique(np.array(langs), return_counts=True)
    lang_p = lang_counts / lang_counts.sum()
    nd = base.num_rows
    n_total = nd * reps
    new_texts = list(texts)
    lens = rng.integers(10, 101, size=n_total - nd)
    for L in lens:
        new_texts.append(" ".join(rng.choice(words, size=L, p=freqs)))
    # planted exact dups at the observed rate
    n_dup = int(0.0016 * n_total)
    for _ in range(n_dup):
        i = int(rng.integers(nd, n_total))
        j = int(rng.integers(0, i))
        new_texts[i] = new_texts[j]
    new_langs = langs + list(rng.choice(lang_vals, size=n_total - nd, p=lang_p))
    doc_ids = np.arange(n_total, dtype=np.int64)
    docs = pa.table({
        "doc_id": pa.array(doc_ids),
        "text": pa.array(new_texts),
        "lang": pa.array(new_langs),
        "source": pa.array([f"src{i % 20}" for i in range(n_total)]),
        "n_chars": pa.array([len(x) for x in new_texts], type=pa.int64()),
    })
    write(docs, out, "documents")

    # -- embeddings: i.i.d. random unit vectors (labels are uniform and
    # uncorrelated with geometry in the real files: same-label mean cos
    # ~= cross-label mean cos ~= 0)
    base = pq.read_table(f"{SRC}/embeddings.parquet")
    ne = base.num_rows
    n_emb = ne * reps
    v = rng.normal(0, 1, size=(n_emb - ne, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    vecs = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    allv = np.concatenate([vecs, v])
    emb = pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(allv), type=pa.list_(pa.float32())),
        "label": pa.array(
            np.concatenate([
                np.array(base.column("label").to_pylist(), dtype=np.int32),
                rng.integers(0, 10, size=n_emb - ne).astype(np.int32),
            ])
        ),
    })
    write(emb, out, "embeddings")

    with open(f"{out}/_DONE", "w") as f:
        f.write("ok\n")


if __name__ == "__main__":
    main()
