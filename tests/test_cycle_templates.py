"""mutual_reach_clusters (bounded-SCC cycle detection) and
host_template_spans (per-host template mining): hand-built graphs and
span tables with known expected output."""

from pyspark.sql import functions as F

from news_please_spark.operators.graph import mutual_reach_clusters
from news_please_spark.operators.spans import host_template_spans


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_cycle_clusters_basic_shapes(spark):
    # 3-cycle 1→2→3→1; 2-cycle 3↔10 sharing node 3 (merges with the
    # 3-cycle); chain 20→21→22 (no cycle); self-loop 30→30 (ignored);
    # 8-cycle 40..47 (every mutual pair needs >3 hops one way — absent)
    pairs = (
        [(1, 2), (2, 3), (3, 1), (3, 10), (10, 3), (20, 21), (21, 22), (30, 30)]
        + [(40 + i, 40 + (i + 1) % 8) for i in range(8)]
    )
    out = {
        r["id"]: r["root"]
        for r in mutual_reach_clusters(_edges(spark, pairs), max_hops=3).collect()
    }
    assert set(out) == {1, 2, 3, 10}
    assert set(out.values()) == {1}


def test_cycle_clusters_two_disjoint_cycles(spark):
    pairs = [(5, 6), (6, 5), (8, 9), (9, 8)]
    out = {
        r["id"]: r["root"]
        for r in mutual_reach_clusters(_edges(spark, pairs), max_hops=2).collect()
    }
    assert out == {5: 5, 6: 5, 8: 8, 9: 8}


def test_cycle_clusters_long_cycle_found_at_wider_radius(spark):
    pairs = [(40 + i, 40 + (i + 1) % 8) for i in range(8)]
    assert mutual_reach_clusters(_edges(spark, pairs), max_hops=3).count() == 0
    # radius 7 covers dist(a→b) + dist(b→a) = 8 for every pair
    out = {
        r["id"]: r["root"]
        for r in mutual_reach_clusters(_edges(spark, pairs), max_hops=7).collect()
    }
    assert set(out) == set(range(40, 48))
    assert set(out.values()) == {40}


def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_host_templates_relative_threshold(spark):
    schema = (
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    banner = "Subscribe NOW"
    rows = []
    # host A: 4 docs, banner in all 4 (share 10000bp)
    for d in range(4):
        rows.append(
            (d, [_span("text", banner, None, 0), _span("text", f"body {d}", None, 1)])
        )
    # host B: 10 docs, banner only in 1 (share 1000bp < 2000)
    for d in range(10, 20):
        spans = [_span("text", f"content {d}", None, 0)]
        if d == 10:
            spans.append(_span("text", banner, None, 1))
        # a media span that must never count as a template
        spans.append(_span("image", None, f"img://{d}", 2))
        rows.append((d, spans))
    # host C: 2 docs, one EMPTY doc in the denominator + shared footer
    rows.append((30, [_span("text", "footer c", None, 0)]))
    rows.append((31, []))
    spans_df = spark.createDataFrame(rows, schema)
    hosts = spark.createDataFrame(
        [(d, "a.com") for d in range(4)]
        + [(d, "b.com") for d in range(10, 20)]
        + [(30, "c.com"), (31, "c.com")],
        "doc_id long, source string",
    )
    out = host_template_spans(spans_df, hosts, min_docs=2, min_share_bp=2000)
    got = {(r["source"], r["n_docs"], r["host_docs"], r["share_bp"]) for r in out.collect()}
    # only host A's banner passes: B's share too low, C's footer is 1 doc
    assert got == {("a.com", 4, 4, 10000)}


def test_host_templates_share_counts_docs_not_occurrences(spark):
    schema = (
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    # the same span TWICE in one doc counts once (distinct doc grain)
    rows = [
        (1, [_span("text", "dup", None, 0), _span("text", "dup", None, 1)]),
        (2, [_span("text", "dup", None, 0)]),
        (3, [_span("text", "other", None, 0)]),
    ]
    spans_df = spark.createDataFrame(rows, schema)
    hosts = spark.createDataFrame(
        [(1, "h"), (2, "h"), (3, "h")], "doc_id long, source string"
    )
    out = host_template_spans(
        spans_df, hosts, min_docs=2, min_share_bp=5000
    ).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["share_bp"] == 6666


def test_host_templates_normalizes_case_and_whitespace(spark):
    schema = (
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    rows = [
        (1, [_span("text", "  Footer Text ", None, 0)]),
        (2, [_span("text", "footer text", None, 0)]),
    ]
    spans_df = spark.createDataFrame(rows, schema)
    hosts = spark.createDataFrame([(1, "h"), (2, "h")], "doc_id long, source string")
    out = host_template_spans(spans_df, hosts, min_docs=2, min_share_bp=5000).collect()
    assert len(out) == 1 and out[0]["n_docs"] == 2


def test_bowtie_regions_hand_graph(spark):
    from news_please_spark.operators.graph import bowtie_regions

    # core 1<->2; in-tendril 0->1 and 9->10->1; out chain 2->3->4->5;
    # bridge 6 (2->7->8->6 inbound, 6->9->10->1 outbound, both exactly
    # 3 hops so 6 is never MUTUALLY reachable with the core within 3)
    pairs = [
        (1, 2), (2, 1), (0, 1), (2, 3), (3, 4), (4, 5),
        (2, 7), (7, 8), (8, 6), (6, 9), (9, 10), (10, 1),
        (20, 21),
    ]
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 20, 21, 30]],
        "id long",
    )
    got = {
        r["id"]: r["region"]
        for r in bowtie_regions(
            _edges(spark, pairs), nodes, max_hops=3
        ).collect()
    }
    assert got == {
        0: "in", 1: "core", 2: "core", 3: "out", 4: "out", 5: "out",
        6: "bridge", 7: "out", 8: "out", 9: "in", 10: "in",
        20: "other", 21: "other", 30: "other",
    }


def test_bowtie_regions_no_cycle_all_other(spark):
    from news_please_spark.operators.graph import bowtie_regions

    pairs = [(1, 2), (2, 3)]
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    got = {
        r["id"]: r["region"]
        for r in bowtie_regions(_edges(spark, pairs), nodes).collect()
    }
    assert got == {1: "other", 2: "other", 3: "other"}


def test_bowtie_core_is_largest_cluster_tie_to_min_root(spark):
    from news_please_spark.operators.graph import bowtie_regions

    # two 2-cycles, equal size: core must be the one with min root (5)
    pairs = [(5, 6), (6, 5), (8, 9), (9, 8)]
    nodes = spark.createDataFrame([(i,) for i in (5, 6, 8, 9)], "id long")
    got = {
        r["id"]: r["region"]
        for r in bowtie_regions(_edges(spark, pairs), nodes).collect()
    }
    assert got[5] == "core" and got[6] == "core"
    assert got[8] == "other" and got[9] == "other"
