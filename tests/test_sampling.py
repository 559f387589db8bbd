"""operators/sampling: deterministic mixture sampling + skew-safe
per-group top-fraction. The key contracts: bit-identical output to the
naive window plan, and invariance under repartitioning."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from news_please_spark.operators.sampling import (
    mixture_sample,
    rate_to_hex8,
    topfrac_per_group,
)


def _naive_topfrac(df, group_col, score_col, frac_pct, id_col):
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    wk = Window.partitionBy(group_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_k", ((F.count(F.lit(1)).over(wk) * frac_pct + 99) / 100).cast("long")
        )
        .filter(F.col("_rn") <= F.col("_k"))
        .drop("_rn", "_k")
    )


def _rows(df):
    # repr-keyed sort: tuples may mix None with ints/strings
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_topfrac_matches_naive_window_with_ties(spark):
    # scores engineered so every group has a boundary cell with ties:
    # group g, ids 0..n-1, score = id // 3 (triples share a score)
    rows = [
        (g, i + 100 * gi, (i // 3))
        for gi, (g, n) in enumerate([("a", 10), ("b", 7), ("c", 1), ("d", 3)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "grp string, doc_id long, score long")
    for pct in (10, 30, 50, 100):
        got = _rows(topfrac_per_group(df, "grp", "score", pct, "doc_id"))
        want = _rows(_naive_topfrac(df, "grp", "score", pct, "doc_id"))
        assert got == want, f"pct={pct}"
        # exactly ceil(pct% * n) rows per group
        by_g = {}
        for g, *_ in got:
            by_g[g] = by_g.get(g, 0) + 1
        for g, n in [("a", 10), ("b", 7), ("c", 1), ("d", 3)]:
            assert by_g.get(g, 0) == -(-n * pct // 100)


def test_topfrac_repartition_invariant(spark):
    rows = [("g", i, i % 4) for i in range(50)]
    df = spark.createDataFrame(rows, "grp string, doc_id long, score long")
    a = _rows(topfrac_per_group(df.repartition(1), "grp", "score", 37, "doc_id"))
    b = _rows(topfrac_per_group(df.repartition(13, "score"), "grp", "score", 37, "doc_id"))
    assert a == b and len(a) == 19  # ceil(50*0.37)


def test_mixture_sample_rates_and_determinism(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"),
    )
    rates = {"s0": 1.0, "s1": 0.25}
    out = mixture_sample(df, rates)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["s0"] == 1000  # rate 1.0 keeps everything
    assert 150 <= per["s1"] <= 350  # ~250 expected, hash-uniform
    # deterministic across partitioning: same kept set
    a = _rows(out)
    b = _rows(mixture_sample(df.repartition(17), rates))
    assert a == b
    # sources absent from the rates dict are dropped entirely
    assert mixture_sample(df, {"s0": 0.5}).filter(F.col("source") == "s1").count() == 0


def test_rate_to_hex8_boundaries():
    assert rate_to_hex8(0.0) == "00000000"
    # rate 1.0 must admit even an id hashing to the "ffffffff" prefix:
    # "g" sorts above every 8-hex-digit lowercase string
    assert rate_to_hex8(1.0) == "g"
    assert "g" > "ffffffff"
    assert rate_to_hex8(0.5) == "80000000"
    # monotone
    hexes = [rate_to_hex8(r / 20) for r in range(21)]
    assert hexes == sorted(hexes)


def test_mixture_rate_one_keeps_ffffffff_prefix(spark):
    # an id whose md5 prefix IS "ffffffff" (the p=2^-32 boundary case
    # a clamped threshold with strict '<' silently drops)
    df = spark.createDataFrame(
        [("\xff" * 4 + "boundary-probe", "s0")], "doc_id string, source string"
    )
    probe = df.select(
        F.substring(F.md5(F.col("doc_id")), 1, 8).alias("h")
    ).first()["h"]
    # the real invariant regardless of the probe's hash: threshold "g"
    # admits the max-prefix row
    df2 = spark.createDataFrame([("x", "s0")], "doc_id string, source string")
    kept = mixture_sample(df2, {"s0": 1.0}).count()
    assert kept == 1
    assert probe < "g"  # every md5 prefix sorts under the rate-1.0 threshold


def test_topfrac_ranks_null_scores_like_the_window(spark):
    # NULL scores (e.g. a ratio over empty text) must survive the
    # histogram join and rank LAST, exactly like the naive window's
    # desc_nulls_last — not silently vanish
    rows = [("g", 1, 5), ("g", 2, None), ("g", 3, 3), ("g", 4, None),
            (None, 5, 7), (None, 6, None)]
    df = spark.createDataFrame(rows, "grp string, doc_id long, score long")
    for pct in (34, 80, 100):
        got = _rows(topfrac_per_group(df, "grp", "score", pct, "doc_id"))
        want = _rows(_naive_topfrac(df, "grp", "score", pct, "doc_id"))
        assert got == want, f"pct={pct}"
    # at 100% nothing is dropped — including every NULL-score row
    assert len(_rows(topfrac_per_group(df, "grp", "score", 100, "doc_id"))) == 6


def test_topfrac_continuous_scores_match_and_bound_ranking(spark):
    # continuous (all-distinct) scores: correctness must hold, and the
    # only ranking window partitions by (group, score) — every cell has
    # exactly one row, so no task ever ranks more than one row even
    # when one group holds the whole corpus
    rows = [("g", i, 1.0 / (i + 3)) for i in range(200)] + [
        ("h", 1000 + i, float(i) * 1.618) for i in range(37)
    ]
    df = spark.createDataFrame(rows, "grp string, doc_id long, score double")
    got = _rows(topfrac_per_group(df, "grp", "score", 30, "doc_id"))
    want = _rows(_naive_topfrac(df, "grp", "score", 30, "doc_id"))
    assert got == want and len(got) == 60 + 12  # ceil(.3*200), ceil(.3*37)


# ---------------------------------------------------------------------------
# pack_sequences


def _py_pack(rows, seq_len, packer_hex):
    """Pure-python oracle: md5-ordered concat-and-chunk per packer."""
    import hashlib
    import re

    toks = {d: len(re.split(r"\s+", t.strip())) for d, t in rows}
    keyed = sorted(
        ((hashlib.md5(str(d).encode()).hexdigest(), d) for d, _ in rows)
    )
    out = []
    starts = {}
    for key, d in keyed:
        p = key[:packer_hex]
        s = starts.get(p, 0)
        n = toks[d]
        starts[p] = s + n
        for chunk in range(s // seq_len, (s + n - 1) // seq_len + 1):
            lo = max(s, chunk * seq_len)
            hi = min(s + n, (chunk + 1) * seq_len)
            out.append((p, chunk, d, n, lo - chunk * seq_len, hi - chunk * seq_len, lo - s))
    return sorted(out, key=repr)


def test_pack_sequences_matches_python_oracle(spark):
    from news_please_spark.operators.sampling import pack_sequences

    rows = [
        (i, " ".join(f"w{j}" for j in range(1 + (i * 37) % 90))) for i in range(80)
    ]
    rows.append((900, ""))          # empty text: 1 token by convention
    rows.append((901, "   "))       # whitespace-only: trim -> 1 token
    rows.append((902, " ".join("x" for _ in range(75))))  # spans >2 chunks at L=16
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _rows(pack_sequences(df, seq_len=16, packer_hex=1))
    want = _py_pack(rows, 16, 1)
    assert got == want
    # every chunk's spans tile [0, 64) contiguously except the tail chunk
    by_chunk = {}
    for p, c, d, n, lo, hi, off in got:
        by_chunk.setdefault((p, c), []).append((lo, hi))
    for (p, c), spans in by_chunk.items():
        spans.sort()
        assert spans[0][0] == 0
        for (a, b), (a2, b2) in zip(spans, spans[1:]):
            assert b == a2  # no gap, no overlap


def test_pack_sequences_repartition_invariant(spark):
    from news_please_spark.operators.sampling import pack_sequences

    rows = [(i, " ".join(f"t{j}" for j in range((i * 13) % 40 + 1))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = _rows(pack_sequences(df, seq_len=32, packer_hex=1))
    b = _rows(pack_sequences(df.repartition(7), seq_len=32, packer_hex=1))
    assert a == b


def test_pack_sequences_conserves_tokens(spark):
    from news_please_spark.operators.sampling import pack_sequences

    rows = [(i, " ".join("z" * 3 for _ in range((i * 7) % 50 + 1))) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_sequences(df, seq_len=16, packer_hex=1)
    total = packed.select(F.sum(F.col("tok_end") - F.col("tok_start"))).first()[0]
    want = sum((i * 7) % 50 + 1 for i in range(50))
    assert total == want
    # per-doc: span lengths sum to n_tok and doc_off is a prefix walk
    import collections

    per_doc = collections.defaultdict(list)
    for r in packed.collect():
        per_doc[r.doc_id].append(r)
    for d, rs in per_doc.items():
        rs.sort(key=lambda r: r.doc_off)
        assert rs[0].doc_off == 0
        walked = 0
        for r in rs:
            assert r.doc_off == walked
            walked += r.tok_end - r.tok_start
        assert walked == rs[0].n_tok


def test_pack_sequences_rejects_bad_seq_len(spark):
    import pytest

    from news_please_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)


# ---------------------------------------------------------------------------
# dataset_split


def test_dataset_split_deterministic_and_exhaustive(spark):
    from news_please_spark.operators.sampling import dataset_split

    df = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    fr = {"test": 0.1, "val": 0.1, "train": 0.8}
    out = dataset_split(df, fr)
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == 3000 and set(rows.values()) == {"test", "val", "train"}
    # same assignment regardless of partitioning
    rows2 = {r.doc_id: r.split for r in dataset_split(df.repartition(13), fr).collect()}
    assert rows == rows2
    # proportions near the fractions (md5 uniformity)
    import collections

    c = collections.Counter(rows.values())
    assert abs(c["test"] / 3000 - 0.1) < 0.03
    assert abs(c["val"] / 3000 - 0.1) < 0.03
    assert abs(c["train"] / 3000 - 0.8) < 0.03


def test_dataset_split_matches_hash_thresholds(spark):
    """A row is 'test' iff md5 prefix < thr(0.1), 'val' iff < thr(0.2):
    split boundaries ARE mixture_sample thresholds, so split('test') ==
    the rows a 0.1-rate mixture_sample keeps."""
    import hashlib

    from news_please_spark.operators.sampling import dataset_split, rate_to_hex8

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = {r.doc_id: r.split for r in
           dataset_split(df, {"test": 0.1, "val": 0.1, "train": 0.8}).collect()}
    t1, t2 = rate_to_hex8(0.1), rate_to_hex8(0.2)
    for i in range(500):
        h = hashlib.md5(str(i).encode()).hexdigest()[:8]
        want = "test" if h < t1 else ("val" if h < t2 else "train")
        assert out[i] == want


def test_dataset_split_validates_fractions(spark):
    import pytest as _pytest

    from news_please_spark.operators.sampling import dataset_split

    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError):
        dataset_split(df, {})
    with _pytest.raises(ValueError):
        dataset_split(df, {"a": 0.5, "b": 0.3})


def test_pack_sequences_group_cols_isolate_streams(spark):
    """With group_cols, each group packs its own token stream: the
    grouped result equals packing each group separately."""
    from news_please_spark.operators.sampling import pack_sequences

    rows = [(i, "train" if i % 3 else "val", " ".join("t" * 2 for _ in range((i * 11) % 30 + 1)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, split string, text string")
    grouped = _rows(pack_sequences(df, seq_len=16, packer_hex=1, group_cols=["split"]))
    per_group = []
    for s in ("train", "val"):
        part = pack_sequences(df.filter(F.col("split") == s), seq_len=16, packer_hex=1)
        per_group += [(s, *t) for t in map(tuple, part.collect())]
    assert grouped == sorted(per_group, key=repr)


def test_render_packed_chunks_roundtrip(spark):
    """Concatenating every chunk of a packer in chunk order must equal
    concatenating its documents' tokens in md5 order — packing then
    rendering loses and reorders nothing."""
    import hashlib

    from news_please_spark.operators.sampling import (
        pack_sequences,
        render_packed_chunks,
    )

    rows = [(i, " ".join(f"w{i}_{j}" for j in range((i * 13) % 37 + 1))) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_sequences(df, seq_len=16, packer_hex=1)
    out = render_packed_chunks(packed, df).collect()
    stream = {}
    for r in sorted(out, key=lambda r: (r.packer, r.chunk)):
        stream.setdefault(r.packer, []).append(r.chunk_text)
        assert r.n_tok == len(r.chunk_text.split())
    got = {p: " ".join(parts) for p, parts in stream.items()}
    want = {}
    for key, d in sorted((hashlib.md5(str(d).encode()).hexdigest(), d) for d, _ in rows):
        want.setdefault(key[:1], []).append(dict(rows)[d])
    want = {p: " ".join(texts) for p, texts in want.items()}
    assert got == want


# ---------------------------------------------------------------------------
# temperature-scaled mixture resampling


def _py_temp_sample(rows, target, alpha="sqrt"):
    import hashlib
    from collections import Counter
    from math import isqrt

    counts = Counter(s for _, s in rows)
    weigh = {"prop": lambda n: n, "sqrt": isqrt, "uniform": lambda n: 1}[alpha]
    w = {s: weigh(n) for s, n in counts.items()}
    sw = sum(w.values())
    kept = []
    for did, s in rows:
        k = min(counts[s], (target * w[s]) // sw)
        thr = "g" if k >= counts[s] else format((k << 32) // counts[s], "08x")
        if hashlib.md5(str(did).encode()).hexdigest()[:8] < thr:
            kept.append((did, s))
    return sorted(kept)


def _temp_rows():
    # skewed: one fat head source, mid source, tiny tail source
    return (
        [(i, "en") for i in range(400)]
        + [(1000 + i, "de") for i in range(100)]
        + [(2000 + i, "sw") for i in range(4)]
    )


def test_temperature_sample_matches_python_oracle(spark):
    from news_please_spark.operators.sampling import temperature_sample

    rows = _temp_rows()
    df = spark.createDataFrame(rows, "doc_id long, source string")
    for alpha in ("prop", "sqrt", "uniform"):
        got = sorted(
            (r.doc_id, r.source)
            for r in temperature_sample(df, 120, alpha=alpha).collect()
        )
        assert got == _py_temp_sample(rows, 120, alpha), alpha


def test_temperature_sample_rebalances_toward_tail(spark):
    from news_please_spark.operators.sampling import temperature_thresholds

    counts = {"en": 400, "de": 100, "sw": 4}
    # sqrt temperature: en gets 20/9 of sw's budget instead of 100x
    from math import isqrt

    sw = sum(isqrt(n) for n in counts.values())
    k = {s: min(n, (120 * isqrt(n)) // sw) for s, n in counts.items()}
    assert k["en"] / max(k["sw"], 1) < counts["en"] / counts["sw"]
    thr = temperature_thresholds(counts, 120, "sqrt")
    # the tiny tail source saturates: keep-all sentinel
    assert thr["sw"] == "g" and thr["en"] != "g"


def test_temperature_sample_partition_invariant_and_guards(spark):
    import pytest

    from news_please_spark.operators.sampling import (
        temperature_sample,
        temperature_thresholds,
    )

    rows = _temp_rows()
    df = spark.createDataFrame(rows, "doc_id long, source string")
    one = sorted(tuple(r) for r in temperature_sample(df.coalesce(1), 80).collect())
    many = sorted(
        tuple(r) for r in temperature_sample(df.repartition(13), 80).collect()
    )
    assert one == many
    assert temperature_sample(df, 0).count() == 0
    empty = spark.createDataFrame([], "doc_id long, source string")
    assert temperature_sample(empty, 50).count() == 0
    with pytest.raises(ValueError):
        temperature_thresholds({"a": 1}, -1)
    with pytest.raises(ValueError):
        temperature_thresholds({"a": 1}, 10, alpha="cube")


def test_temperature_filter_is_map_side(spark):
    """After the config-sized histogram collect, the kept-rows plan is
    scan + literal-map filter: zero Exchange."""
    from news_please_spark.operators.sampling import temperature_sample

    df = spark.createDataFrame(_temp_rows(), "doc_id long, source string")
    plan = (
        temperature_sample(df, 100)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# token_budget_plan (water-filling under per-source epoch caps)


def test_token_budget_plan_invariants():
    from math import isqrt

    from news_please_spark.operators.sampling import token_budget_plan

    counts = {"a": 1000, "b": 5000, "c": 200, "d": 40_000, "e": 0}
    eps = {"a": 1, "b": 2, "c": 4, "d": 1, "e": 3}
    for budget in (0, 100, 5_000, 30_000, 10**7):
        plan = token_budget_plan(counts, budget, eps, alpha="sqrt")
        caps = {s: eps[s] * n for s, n in counts.items()}
        total = sum(a for a, _ in plan.values())
        assert total == min(budget, sum(caps[s] for s, n in counts.items() if n > 0))
        for s, (alloc, capped) in plan.items():
            assert 0 <= alloc <= caps[s]
            if capped:
                assert alloc == caps[s]
        # uncapped allocations are within 1 of the real proportion
        un = [s for s, (_, c) in plan.items() if not c and counts[s] > 0]
        if un:
            rem = budget - sum(caps[s] for s, (_, c) in plan.items() if c)
            tw = sum(isqrt(counts[s]) for s in un)
            for s in un:
                exact = rem * isqrt(counts[s]) / tw
                assert abs(plan[s][0] - exact) < 1.0


def test_token_budget_plan_cases():
    import pytest as _pytest

    from news_please_spark.operators.sampling import token_budget_plan

    # budget exceeding all caps: everyone capped, total = sum caps
    plan = token_budget_plan({"a": 10, "b": 20}, 10**6, 2, alpha="prop")
    assert plan == {"a": (20, True), "b": (40, True)}
    # tiny budget, uniform weights: equal split with remainder by name
    plan = token_budget_plan({"a": 100, "b": 100, "c": 100}, 10, 1, "uniform")
    assert sum(a for a, _ in plan.values()) == 10
    assert plan["a"][0] == 4 and plan["b"][0] == 3 and plan["c"][0] == 3
    # zero-count sources get nothing, never capped
    assert token_budget_plan({"z": 0}, 100, 1)["z"] == (0, False)
    assert token_budget_plan({}, 100, 1) == {}
    with _pytest.raises(ValueError):
        token_budget_plan({"a": 1}, -1, 1)
    with _pytest.raises(ValueError):
        token_budget_plan({"a": 1}, 1, 1, alpha="pow")


def test_token_budget_plan_fixpoint_matches_bruteforce():
    """The iterative fixpoint equals exhaustive search over capped
    sets (the unique water-filling solution) on small instances."""
    from itertools import combinations

    from news_please_spark.operators.sampling import token_budget_plan

    counts = {"a": 30, "b": 300, "c": 70, "d": 9}
    eps = {"a": 3, "b": 1, "c": 2, "d": 4}
    for budget in (0, 10, 50, 120, 333, 500, 700, 2000):
        plan = token_budget_plan(counts, budget, eps, alpha="prop")
        got_capped = {s for s, (_, c) in plan.items() if c}
        # valid fixpoint: every capped source would exceed its cap at
        # lambda, every uncapped one would not
        names = list(counts)
        valid = []
        for r in range(len(names) + 1):
            for sub in combinations(names, r):
                S = set(sub)
                rem = budget - sum(eps[s] * counts[s] for s in S)
                tw = sum(counts[s] for s in names if s not in S)
                ok = all(
                    eps[s] * counts[s] * (tw if tw else 1) <= rem * counts[s]
                    for s in S
                )
                if tw:
                    ok = ok and all(
                        eps[s] * counts[s] * tw > rem * counts[s]
                        for s in names
                        if s not in S
                    )
                if ok:
                    valid.append(S)
        assert got_capped in valid, (budget, got_capped, valid)


# ---------------------------------------------------------------------------
# priority sampling (weighted without replacement, DLT 2007)


def _priority_oracle(rows, k):
    """Quadratic python oracle: md5 draw, integer priorities, (q DESC,
    id ASC) order, tau = (k+1)-th priority, w_est = max(w, tau)."""
    import hashlib

    def pri(i, w):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 1
        return (max(w, 1) << 32) // u

    scored = sorted(
        ((pri(i, w), i, max(w, 1)) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )
    tau = scored[k][0] if len(scored) > k else 0
    return {
        i: (w, q, rk + 1, max(w, tau))
        for rk, (q, i, w) in enumerate(scored[:k])
    }


def test_priority_sample_matches_python_oracle(spark):
    from news_please_spark.operators.sampling import priority_sample

    rows = [(i, (i * 37) % 900 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, wgt long")
    got = {
        r.doc_id: (r.w, r.priority, r.rk, r.w_est)
        for r in priority_sample(df, "wgt", 10).collect()
    }
    assert got == _priority_oracle(rows, 10)


def test_priority_sample_small_corpus_keeps_all_unadjusted(spark):
    from news_please_spark.operators.sampling import priority_sample

    rows = [(1, 5), (2, 50), (3, 500)]
    df = spark.createDataFrame(rows, "doc_id long, wgt long")
    out = priority_sample(df, "wgt", 10).collect()
    # n <= k: everything sampled, tau = 0, estimates are the raw weights
    assert sorted((r.doc_id, r.w_est) for r in out) == [(1, 5), (2, 50), (3, 500)]


def test_priority_sample_partitioning_invariant_and_weight_clamp(spark):
    from news_please_spark.operators.sampling import priority_sample

    rows = [(i, None if i % 7 == 0 else (i % 5) - 1) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, wgt long")
    a = sorted(map(tuple, priority_sample(df, "wgt", 8).collect()))
    b = sorted(map(tuple, priority_sample(df.repartition(13), "wgt", 8).collect()))
    assert a == b
    # NULL/zero/negative weights clamp to 1, never divide-by-zero/drop
    assert all(r[1] >= 1 for r in a)


def test_priority_sample_plan_is_take_ordered(spark):
    from news_please_spark.operators.sampling import priority_sample

    rows = [(i, i + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, wgt long")
    plan = (
        priority_sample(df, "wgt", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus-side selection must be per-partition heaps, not a sort
    assert "TakeOrdered" in plan


# ---------------------------------------------------------------------------
# length-bucketed batch planning


def _length_oracle(rows, batch_size, boundaries):
    import hashlib
    from collections import defaultdict

    per = defaultdict(list)
    for i, text in rows:
        n_tok = len(text.strip().split()) if text.strip() else 1
        key = hashlib.md5(str(i).encode()).hexdigest()
        bucket = sum(1 for b in boundaries if n_tok >= b)
        per[(bucket, key[:1])].append((key, i, n_tok))
    out = {}
    for (bucket, shard), docs in per.items():
        docs.sort()
        for pos, (_, _, n_tok) in enumerate(docs):
            cell = out.setdefault((bucket, shard, pos // batch_size), [])
            cell.append(n_tok)
    return {
        k: (len(v), max(v), sum(v), len(v) * max(v) - sum(v))
        for k, v in out.items()
    }


def test_length_buckets_match_python_oracle(spark):
    from news_please_spark.operators.sampling import length_bucket_plan

    rows = [(i, "w " * ((i * 13) % 300)) for i in range(150)] + [(999, "  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bounds = (32, 64, 128, 256, 512, 1024, 2048)
    got = {
        (r.bucket, r.shard, r.batch): (r.n_docs, r.max_tok, r.sum_tok, r.pad_waste)
        for r in length_bucket_plan(df, 16).collect()
    }
    assert got == _length_oracle(rows, 16, bounds)
    # invariants: batch sizes bounded, every doc planned exactly once
    assert all(v[0] <= 16 for v in got.values())
    assert sum(v[0] for v in got.values()) == len(rows)


def test_length_buckets_single_exchange(spark):
    from news_please_spark.operators.sampling import length_bucket_plan

    rows = [(i, "w " * (i % 90 + 1)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = (
        length_bucket_plan(df, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the per-batch aggregation must reuse the window's (bucket, shard)
    # hash partitioning — one shuffle total
    assert plan.count("Exchange hashpartitioning") == 1


def test_leakage_safe_split_keeps_clusters_whole(spark):
    from news_please_spark.operators.sampling import (
        dataset_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # two chains: {3,7,150} (via 3-7, 7-150) and {20,21}
    pairs = spark.createDataFrame(
        [(3, 7), (7, 150), (20, 21)], "doc_a long, doc_b long"
    )
    out = leakage_safe_split(
        docs, pairs, {"test": 0.1, "val": 0.1, "train": 0.8}
    )
    rows = {r.doc_id: (r.root, r.split) for r in out.collect()}
    assert len(rows) == 200
    # every cluster member shares the min-id root AND the split
    assert rows[3] == rows[7] == rows[150]
    assert rows[3][0] == 3
    assert rows[20] == rows[21]
    assert rows[20][0] == 20
    # singletons split exactly as dataset_split would
    plain = {
        r.doc_id: r.split
        for r in dataset_split(
            docs, {"test": 0.1, "val": 0.1, "train": 0.8}
        ).collect()
    }
    clustered = {3, 7, 150, 20, 21}
    for i in range(200):
        if i not in clustered:
            assert rows[i] == (i, plain[i])


# ---------------------------------------------------------------------------
# epoch shuffle ordering


def test_epoch_shuffle_matches_python_and_is_dense(spark):
    import hashlib

    from news_please_spark.operators.ordering import epoch_shuffle

    rows = [(i, "s%d" % (i % 3)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r.doc_id: r.epoch_pos for r in epoch_shuffle(df).collect()}
    want_order = sorted(
        rows, key=lambda r: (hashlib.md5(f"epoch0|{r[0]}".encode()).hexdigest(), r[0])
    )
    assert got == {did: pos for pos, (did, _) in enumerate(want_order)}
    assert sorted(got.values()) == list(range(200))


def test_epoch_shuffle_prefix_proportionality(spark):
    """Any reader prefix sees sources near mixture proportion — the
    anti-clumping property the hash sort buys."""
    from news_please_spark.operators.ordering import epoch_shuffle

    rows = [(i, "a" if i % 4 else "b") for i in range(400)]  # 75% a / 25% b
    df = spark.createDataFrame(rows, "doc_id long, source string")
    ordered = sorted(
        ((r.epoch_pos, r.source) for r in epoch_shuffle(df).collect())
    )
    for prefix in (100, 200, 300):
        share_a = sum(1 for p, s in ordered[:prefix] if s == "a") / prefix
        assert abs(share_a - 0.75) < 0.12


def test_epoch_shuffle_new_seed_new_deal(spark):
    from news_please_spark.operators.ordering import epoch_shuffle

    rows = [(i, "s") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    e0 = {r.doc_id: r.epoch_pos for r in epoch_shuffle(df, seed="epoch0").collect()}
    e1 = {r.doc_id: r.epoch_pos for r in epoch_shuffle(df, seed="epoch1").collect()}
    assert e0 != e1
    assert sorted(e0.values()) == sorted(e1.values()) == list(range(100))


def test_epoch_shuffle_no_single_task_window(spark):
    from news_please_spark.operators.ordering import epoch_shuffle

    df = spark.createDataFrame([(i, "s") for i in range(10)], "doc_id long, source string")
    plan = epoch_shuffle(df)._jdf.queryExecution().executedPlan().toString()
    # two-phase numbering: range partition + per-partition window; a
    # global ordering would show Exchange SinglePartition
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan


# --- span corruption --------------------------------------------------------

def test_span_corruption_roundtrip_and_plan(spark):
    """Substituting each <extra_id_K> in `inputs` with its span from
    `targets` reconstructs the original text exactly — the invariant
    that the plan masks what it says it masks and nothing else."""
    import re

    from news_please_spark.operators.sampling import span_corruption

    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(n)))
        for i, n in [(0, 1), (1, 3), (2, 17), (3, 40), (4, 100)]
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_corruption(df).collect()}
    texts = dict(rows)
    for did, r in out.items():
        # parse targets into span_k -> tokens
        parts = re.split(r"<extra_id_(\d+)> ?", r.targets)
        spans = {}
        for k, chunk in zip(parts[1::2], parts[2::2]):
            spans[int(k)] = chunk.strip()
        assert sorted(spans) == list(range(r.n_spans))
        rebuilt = re.sub(
            r"<extra_id_(\d+)>", lambda m: spans[int(m.group(1))], r.inputs
        )
        assert re.sub(r"\s+", " ", rebuilt).strip() == texts[did]
        assert r.n_masked == sum(len(s.split()) for s in spans.values() if s)
        # masking stays in a sane band on long docs
        if len(texts[did].split()) >= 40:
            frac = r.n_masked / len(texts[did].split())
            assert 0.0 <= frac <= 0.6


def test_span_corruption_deterministic(spark):
    from news_please_spark.operators.sampling import span_corruption

    df = spark.createDataFrame(
        [(7, " ".join(f"x{j}" for j in range(50)))], "doc_id long, text string"
    )
    a = span_corruption(df).collect()[0]
    b = span_corruption(df).collect()[0]
    assert a == b


def test_fim_roundtrip_and_modes(spark):
    """Every transformed doc reconstructs its original text from the
    serialized parts; raw docs pass through verbatim."""
    import re

    from news_please_spark.operators.sampling import fim_transform

    rows = [(i, " ".join(f"t{i}x{j}" for j in range(n)))
            for i, n in [(0, 1), (1, 2), (2, 3), (3, 10), (4, 50), (5, 51),
                         (6, 7), (7, 8), (8, 9), (9, 30)]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in fim_transform(df).collect()}
    texts = dict(rows)
    n_fim = 0
    for did, r in out.items():
        if not r.fim:
            assert r.mode == "raw" and r.text_out == texts[did]
            continue
        n_fim += 1
        if r.mode == "psm":
            m = re.fullmatch(r"<PRE> (.*) <SUF> (.*) <MID> (.*)", r.text_out, re.S)
            pre, suf, mid = m.groups()
        else:
            m = re.fullmatch(r"<PRE> <SUF> (.*) <MID> (.*)", r.text_out, re.S)
            suf, rest = m.groups()
            # SPM: '... <MID> mid pre' — mid and pre are separated by a
            # space; recover via token counts
            total = texts[did].split()
            rest_toks = rest.split()
            suf_toks = suf.split()
            n_mid_pre = len(total) - len(suf_toks)
            assert len(rest_toks) == n_mid_pre
            # pre is a prefix of the original; find the split where
            # pre + mid + suf == original
            ok = False
            for cut in range(1, len(rest_toks)):
                mid_t, pre_t = rest_toks[:cut], rest_toks[cut:]
                if pre_t + mid_t + suf_toks == total:
                    ok = True
                    break
            assert ok, (did, r.text_out)
            continue
        assert (pre + " " + mid + " " + suf).split() == texts[did].split()
        assert pre and mid and suf  # all three parts non-empty
    assert n_fim >= 2  # election rate ~1/2 over 8 eligible docs


def test_ul2_plan_partition_and_branches(spark):
    """Every doc lands in exactly one denoiser; S-branch targets are
    the doc's suffix; R/X inputs carry their paradigm tokens."""
    from news_please_spark.operators.sampling import ul2_plan

    rows = [(i, " ".join(f"u{i}w{j}" for j in range(20))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ul2_plan(df).collect()
    assert sorted(r.doc_id for r in out) == list(range(40))
    by_mode = {}
    for r in out:
        by_mode.setdefault(r.denoiser, []).append(r)
    assert set(by_mode) == {"R", "X", "S"}
    texts = dict(rows)
    for r in by_mode["S"]:
        assert r.inputs.startswith("[S2S] ") and r.inputs.endswith(" <extra_id_0>")
        prefix = r.inputs[len("[S2S] "):-len(" <extra_id_0>")]
        suffix = r.targets[len("<extra_id_0> "):]
        assert (prefix + " " + suffix).split() == texts[r.doc_id].split()
        assert r.n_masked == len(suffix.split()) and r.n_spans == 1
    for r in by_mode["R"]:
        assert r.inputs.startswith("[NLU] ")
    for r in by_mode["X"]:
        assert r.inputs.startswith("[NLG] ")
        # X uses stride 8 / max_span 7: span count bounded by ceil(20/8)=3
        assert r.n_spans <= 3


def test_sentence_chunks_greedy_boundaries_and_roundtrip(spark):
    from news_please_spark.operators.sampling import sentence_chunks

    text = "One two. Three four five! Six? Seven eight nine ten eleven."
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.chunk_id, r.chunk_text, r.n_chars)
        for r in sentence_chunks(docs, max_chars=30).collect()
    )
    # greedy at 30: "One two." (8) + "Three four five!" (16) -> 25;
    # "Six?" -> 25+1+4=30 fits EXACTLY; "Seven...eleven." (28) -> 30+1+28>30
    assert rows == [
        (0, "One two. Three four five! Six?", 30),
        (1, "Seven eight nine ten eleven.", 28),
    ]
    # roundtrip: joining all chunks with spaces reproduces the sentence
    # stream (whitespace-normalized)
    assert " ".join(t for _, t, _ in rows) == text


def test_sentence_chunks_oversized_sentence_is_own_chunk(spark):
    from news_please_spark.operators.sampling import sentence_chunks

    text = "Short. " + "x" * 50 + ". End."
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.chunk_id, r.chunk_text) for r in sentence_chunks(docs, max_chars=20).collect()
    )
    assert rows[0] == (0, "Short.")
    assert rows[1] == (1, "x" * 50 + ".")  # never split mid-sentence
    assert rows[2] == (2, "End.")


def test_sentence_chunks_empty_and_unterminated(spark):
    from news_please_spark.operators.sampling import sentence_chunks

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "no terminator here")],
        "doc_id long, text string",
    )
    rows = [(r.doc_id, r.chunk_id, r.chunk_text) for r in sentence_chunks(docs).collect()]
    # empty/whitespace docs vanish; unterminated text is one sentence
    assert rows == [(3, 0, "no terminator here")]


def test_sentence_chunks_is_zero_shuffle_and_pure_codegen(spark):
    from news_please_spark.operators.sampling import sentence_chunks

    df = spark.createDataFrame([(1, "A b. C d.")], "doc_id long, text string")
    plan = sentence_chunks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # the fold is a native aggregate, not a UDF


def test_passage_chunks_lattice_and_tail(spark):
    """Window lattice: starts at multiples of stride, one tail window,
    every token covered, consecutive windows overlap by W - S."""
    from news_please_spark.operators.sampling import passage_chunks

    text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        passage_chunks(docs, window_tokens=64, stride=48).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.start_tok, r.n_tok) for r in rows] == [(0, 64), (48, 52)]
    assert rows[0].chunk_text.split()[:1] == ["t0"]
    assert rows[1].chunk_text.split()[-1] == "t99"
    # overlap: last 16 tokens of window 0 == first 16 of window 1
    assert rows[0].chunk_text.split()[48:] == rows[1].chunk_text.split()[:16]


def test_passage_chunks_short_and_empty_docs(spark):
    from news_please_spark.operators.sampling import passage_chunks

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    rows = passage_chunks(docs, window_tokens=64, stride=48).collect()
    assert [(r.doc_id, r.chunk_id, r.start_tok, r.n_tok) for r in rows] == [
        (1, 0, 0, 3)
    ]
    assert rows[0].chunk_text == "a b c"


def test_passage_chunks_rejects_bad_args(spark):
    import pytest

    from news_please_spark.operators.sampling import passage_chunks

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        passage_chunks(docs, stride=0)


def test_admit_by_byte_budget_greedy_prefix(spark):
    from news_please_spark.operators.ordering import admit_by_byte_budget

    rows = [
        # host a: 100+100+150 -> third row crosses 300 and blocks suffix
        ("a", "m1", 100, 1), ("a", "m2", 100, 2), ("a", "m3", 150, 3),
        ("a", "m4", 10, 4),
        # host b: one fat row first blocks everything incl itself
        ("b", "m1", 1000, 1), ("b", "m2", 10, 2),
        # host c: all fit exactly (inclusive <=)
        ("c", "m1", 200, 1), ("c", "m2", 100, 2),
    ]
    df = spark.createDataFrame(
        rows, "host string, media_ref string, est_bytes long, prio long"
    )
    out = {(r.host, r.media_ref): (r.cum_bytes, r.is_admitted)
           for r in admit_by_byte_budget(df, budget_bytes=300).collect()}
    assert out[("a", "m1")] == (100, 1) and out[("a", "m2")] == (200, 1)
    assert out[("a", "m3")] == (350, 0) and out[("a", "m4")] == (360, 0)
    assert out[("b", "m1")] == (1000, 0) and out[("b", "m2")] == (1010, 0)
    assert out[("c", "m1")] == (200, 1) and out[("c", "m2")] == (300, 1)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        admit_by_byte_budget(df, budget_bytes=-1)


def test_with_group_seq_dense_and_matches_window(spark):
    from pyspark.sql import Window
    from news_please_spark.operators.ordering import with_group_seq

    rows = [(f"g{i % 3}", f"id{i:03d}") for i in range(97)]
    df = spark.createDataFrame(rows, "g string, id string")
    got = {(r.g, r.id): r.gseq
           for r in with_group_seq(df, "g", ["id"], num_partitions=7).collect()}
    w = Window.partitionBy("g").orderBy("id")
    exp = {(r.g, r.id): r.rn - 1
           for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    assert got == exp  # dense per group, identical to the one-task window


def test_mixture_interleave_prefix_proportionality(spark):
    from news_please_spark.operators.sampling import mixture_interleave

    rows = [(i, "a") for i in range(60)] + [(i + 100, "b") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    weights = spark.createDataFrame([("a", 3), ("b", 1)], "source string, weight long")
    out = sorted(mixture_interleave(docs, weights).collect(),
                 key=lambda r: r.mix_pos)
    # dense global positions
    assert [r.mix_pos for r in out] == list(range(120))
    # stride guarantee: in any prefix, source counts track 3:1 within ~1 item
    ca = cb = 0
    for r in out[:80]:  # while both sources still have items
        if r.source == "a":
            ca += 1
        else:
            cb += 1
        n = ca + cb
        assert abs(ca - 3 * n / 4) <= 1.5, (n, ca, cb)
    # vtime formula: j-th item of weight-w source at (2j+1)*(12//w)? L=lcm(3,1)=3
    for r in out:
        w = 3 if r.source == "a" else 1
        assert r.vtime == (2 * r.j + 1) * (3 // w)

    import pytest as _pytest
    bad = spark.createDataFrame([("a", 0)], "source string, weight long")
    with _pytest.raises(ValueError):
        mixture_interleave(docs, bad)
    with _pytest.raises(ValueError):
        mixture_interleave(docs, weights.limit(0))


def test_with_group_seq_straddler_paths(spark):
    from pyspark.sql import Window
    from news_please_spark.operators.ordering import with_group_seq

    # one fat group spanning many partitions + many tiny groups that
    # each sit inside one partition (offset-0 fast path)
    rows = [("fat", f"id{i:04d}") for i in range(300)] + [
        (f"tiny{i:03d}", f"id{j}") for i in range(40) for j in range(2)
    ]
    df = spark.createDataFrame(rows, "g string, id string")
    w = Window.partitionBy("g").orderBy("id")
    exp = {(r.g, r.id): r.rn - 1
           for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    for nparts in (1, 16):   # no-straddler path and heavy-straddler path
        got = {(r.g, r.id): r.gseq
               for r in with_group_seq(df, "g", ["id"],
                                       num_partitions=nparts).collect()}
        assert got == exp, nparts
