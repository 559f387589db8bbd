"""clean_corpus end-to-end: every stage fires on its planted class and
nothing else is touched."""

from news_please_spark.pipeline import clean_corpus

BASE = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"),
    (1, "one two three four five six seven eight nine ten eleven twelve"),
    (2, "red orange yellow green blue indigo violet cyan magenta white gray black"),
    (3, "north south east west up down left right front back inner outer"),
]
N = 10  # id offset stride


def _rows():
    rows = list(BASE)
    rows.append((0 + N, BASE[0][1]))                        # exact copy of 0
    rows.append((1 + 2 * N, BASE[1][1] + " zz extra tail"))  # near copy of 1
    rows.append((3 + 3 * N, " ".join(["spam"] * 40)))        # junk
    return rows


def _df(spark):
    return spark.createDataFrame(_rows(), "doc_id long, text string")


def test_clean_corpus_stages(spark):
    bench = spark.createDataFrame([(100, BASE[2][1])], "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in clean_corpus(_df(spark), bench).collect())
    # 0+N exact-dup gone; 1+2N near-dup gone; 2 contaminated (its text IS
    # the benchmark) gone; junk gone; 0, 1, 3 survive
    assert kept == [0, 1, 3]
    # materialized stages (the 3x-faster plan-cut mode) are bit-identical
    kept_mat = sorted(
        r["doc_id"]
        for r in clean_corpus(_df(spark), bench, materialize_stages=True).collect()
    )
    assert kept_mat == kept


def test_clean_corpus_shuffle_hash_route_bit_identical(spark, monkeypatch):
    # force every measured drop set over the broadcast threshold so the
    # removal anti-joins take the scale-safe shuffle_hash branch — the
    # survivor set must not change (routing is a physical-plan choice)
    import news_please_spark.pipeline as pl

    bench = spark.createDataFrame([(100, BASE[2][1])], "doc_id long, text string")
    monkeypatch.setattr(pl, "BROADCAST_DROP_ROWS", 0)
    kept = sorted(
        r["doc_id"]
        for r in clean_corpus(_df(spark), bench, materialize_stages=True).collect()
    )
    assert kept == [0, 1, 3]


def test_clean_corpus_no_benchmark_skips_decontam(spark):
    kept = sorted(r["doc_id"] for r in clean_corpus(_df(spark), None).collect())
    assert kept == [0, 1, 2, 3]


def test_clean_corpus_preserves_schema_and_content(spark):
    df = _df(spark)
    out = clean_corpus(df, None)
    assert out.columns == df.columns
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert texts[0] == BASE[0][1]  # rows pass through unmodified


def test_transitive_near_dup_differs_on_chains_exactly(spark):
    """Planted chain 2—5—1 (1<2<5, no 1-2 edge): greedy keeps doc 2
    (its only similar doc, 5, is larger); transitive drops it
    (component min is 1). Everything else identical."""
    from news_please_spark.pipeline import clean_corpus

    # texts engineered so jaccard(1,5) and jaccard(2,5) >= 0.5 but
    # jaccard(1,2) < 0.5: 5 shares half its shingles with each
    base = ["w%d" % i for i in range(40)]
    t1 = " ".join(base[:24])                      # shingles from first block
    t2 = " ".join(base[16:40])                    # shingles from last block
    t5 = " ".join(base[4:36])                     # overlaps both heavily
    other = " ".join(f"u{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, t1), (2, t2), (5, t5), (9, other)], "doc_id long, text string"
    )
    greedy = {r.doc_id for r in clean_corpus(df, jaccard_threshold=0.4).collect()}
    trans = {
        r.doc_id
        for r in clean_corpus(df, jaccard_threshold=0.4, transitive_near_dup=True).collect()
    }
    assert 9 in greedy and 9 in trans and 1 in greedy and 1 in trans
    assert 5 not in greedy and 5 not in trans
    # the chain member: greedy keeps, transitive drops
    assert 2 in greedy and 2 not in trans


def test_publish_training_corpus_wap_gate(spark, tmp_path):
    """Facade loop: hygiene -> split -> pack -> AUDITED publish.  A
    healthy refresh publishes atomically; a gutted refresh is rejected
    and readers keep the previous snapshot."""
    import pytest

    from news_please_spark import publish_training_corpus
    from news_please_spark.state import AuditFailed, SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path / "corpus"))
    snap = publish_training_corpus(
        spark, cat, _df(spark), min_rows=3, seq_len=8, packer_hex=1
    )
    assert snap == 0
    corpus0 = cat.read_table(spark, "corpus")
    n0 = corpus0.count()
    assert n0 >= 3 and "split" in corpus0.columns
    assert cat.read_table(spark, "packed").count() > 0
    assert cat.read_meta(0)["op"] == "publish_training_corpus"

    # second refresh: only ONE healthy doc survives a tiny input — the
    # row-delta gate must reject it and latest() must not move
    tiny = spark.createDataFrame([_rows()[0]], "doc_id long, text string")
    with pytest.raises(AuditFailed):
        publish_training_corpus(
            spark, cat, tiny, min_rows=1, max_drop_pct=50,
            seq_len=8, packer_hex=1,
        )
    assert cat.latest() == 0
    assert cat.read_table(spark, "corpus").count() == n0


def test_clean_audit_ledger_matches_pipeline(spark):
    """audit verdicts: every planted class labeled with ITS stage, and
    audit['kept'] ids == clean_corpus output ids (same plan, no drift)."""
    from news_please_spark.pipeline import clean_corpus_audit

    bench = spark.createDataFrame([(100, BASE[2][1])], "doc_id long, text string")
    verdicts = {
        r.doc_id: r.verdict
        for r in clean_corpus_audit(
            _df(spark), bench, materialize_stages=True
        ).collect()
    }
    assert verdicts == {
        0: "kept",
        1: "kept",
        3: "kept",
        2: "contaminated",          # its text IS the benchmark
        0 + N: "exact_dup",
        1 + 2 * N: "near_dup",
        3 + 3 * N: "repetitive",
    }
    kept_ids = sorted(
        r.doc_id
        for r in clean_corpus(_df(spark), bench, materialize_stages=True).collect()
    )
    assert sorted(i for i, v in verdicts.items() if v == "kept") == kept_ids


def test_clean_audit_no_benchmark_has_no_contaminated(spark):
    from news_please_spark.pipeline import clean_corpus_audit

    verdicts = {
        r.doc_id: r.verdict
        for r in clean_corpus_audit(_df(spark), None).collect()
    }
    assert "contaminated" not in set(verdicts.values())
    assert verdicts[2] == "kept"
    # every input doc gets exactly one ledger row
    assert len(verdicts) == len(_rows())
