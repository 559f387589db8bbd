"""operators/graph: connected components vs a union-find oracle —
chains (transitivity), cliques, self-loops, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_please_spark.operators.graph import connected_components


def _py_cc(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            find(a)
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id root per node (path-compress to true roots first)
    roots = {x: find(x) for x in parent}
    comp_min = {}
    for x, r in roots.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    return sorted((x, comp_min[roots[x]]) for x in parent if any(
        a != b for a, b in edges if x in (a, b)
    ))


def test_cc_matches_union_find_on_mixed_graph(spark):
    # a 7-node chain (diameter test), an 8-clique, pairs, and shared ids
    edges = (
        [(i, i + 1) for i in range(100, 107)]
        + [(200 + i, 200 + j) for i in range(8) for j in range(i + 1, 8)]
        + [(300, 301), (400, 401), (106, 300)]  # chain joins a pair
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = sorted((r.id, r.root) for r in connected_components(df).collect())
    assert got == _py_cc(edges)
    # the chain+pair megacomponent all roots at 100
    roots = dict(got)
    for n in list(range(100, 108)) + [300, 301]:
        assert roots[n] == 100


def test_cc_ignores_self_loops_and_is_partition_invariant(spark):
    edges = [(1, 1), (2, 3), (3, 4), (9, 9)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = sorted((r.id, r.root) for r in connected_components(df).collect())
    # self-loop-only nodes (1, 9) don't appear; 2-3-4 one cluster
    assert got == [(2, 2), (3, 2), (4, 2)]
    got2 = sorted(
        (r.id, r.root)
        for r in connected_components(df.repartition(5)).collect()
    )
    assert got == got2


def test_cc_raises_when_not_converged(spark):
    edges = [(i, i + 1) for i in range(20)]  # diameter 20 chain
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iters=3)
    # but converges with enough rounds
    out = connected_components(df, max_iters=30)
    assert out.filter(F.col("root") != 0).count() == 0


# ---------------------------------------------------------------------------
# PageRank


def _py_pagerank_scaled(edges, nodes, deg, iters=3, damping_pct=85):
    """Exact-integer reference of pagerank_scaled's recurrence."""
    ranks = {n: 1 for n in nodes}
    for k in range(iters):
        teleport = (100 - damping_pct) * deg * (100 * deg) ** k
        contrib = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + ranks[s]
        ranks = {n: teleport + damping_pct * contrib.get(n, 0) for n in nodes}
    return ranks


def test_pagerank_scaled_matches_integer_oracle_and_conserves_mass(spark):
    from news_please_spark.operators.graph import pagerank_scaled

    n, deg = 40, 3
    nodes = list(range(n))
    edges = [(s, (s * m + a) % n) for s in nodes for m, a in [(3, 17), (5, 34), (7, 51)]]
    edf = spark.createDataFrame(edges, "src long, dst long")
    ndf = spark.createDataFrame([(x,) for x in nodes], "id long")
    got = {r.id: r.r for r in pagerank_scaled(edf, ndf, out_degree=deg, iters=3).collect()}
    want = _py_pagerank_scaled(edges, nodes, deg, iters=3)
    assert got == want
    # total mass conserved exactly: sum R_k = N * (100*D)^k
    assert sum(got.values()) == n * (100 * deg) ** 3
    # partition invariance (integer sums are order-free)
    got2 = {
        r.id: r.r
        for r in pagerank_scaled(
            edf.repartition(7), ndf.repartition(5), out_degree=deg, iters=3
        ).collect()
    }
    assert got2 == want


def test_pagerank_double_matches_numpy_power_iteration_with_dangling(spark):
    import numpy as np

    from news_please_spark.operators.graph import pagerank

    # non-uniform degrees + node 5 dangling (no out-edges)
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 0), (4, 1), (4, 5), (3, 5)]
    nodes = list(range(6))
    n, d = len(nodes), 0.85
    M = np.zeros((n, n))
    outdeg = {}
    for s, t in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    for s, t in edges:
        M[t, s] += 1.0 / outdeg[s]
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        dangling = sum(r[i] for i in nodes if i not in outdeg)
        r = (1 - d) / n + d * (M @ r + dangling / n)
    edf = spark.createDataFrame(edges, "src long, dst long")
    ndf = spark.createDataFrame([(x,) for x in nodes], "id long")
    got = {row.id: row.rank for row in pagerank(edf, ndf, iters=10).collect()}
    for i in nodes:
        assert abs(got[i] - r[i]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_cc_pointer_doubling_converges_logarithmically(spark):
    # a 200-node chain: hooking alone needs ~200 rounds; with per-round
    # pointer doubling it must finish in <= 12
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df, max_iters=12)
    assert out.filter(F.col("root") != 0).count() == 0
    assert out.count() == 201


# ---------------------------------------------------------------------------
# HITS


def _py_hits(edges, nodes, iters=2):
    h = {n: 1 for n in nodes}
    a = {}
    for _ in range(iters):
        a = {n: 0 for n in nodes}
        for s, d in edges:
            if d in a and s in h:
                a[d] += h[s]
        h = {n: 0 for n in nodes}
        for s, d in edges:
            if s in h and d in a:
                h[s] += a[d]
    return {n: (a[n], h[n]) for n in nodes}


def test_hits_matches_python_oracle(spark):
    from news_please_spark.operators.graph import hits_scaled

    # star: 0 -> {1,2,3}; chain 3 -> 4; 4 -> 0 closes a loop
    edges = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 0)]
    nodes = list(range(5))
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long")
    got = {
        r.id: (r.authority, r.hub) for r in hits_scaled(e, n, iters=2).collect()
    }
    assert got == _py_hits(edges, nodes, 2)
    # the star center is the best hub; its targets carry authority
    assert got[0][1] == max(v[1] for v in got.values())


def test_hits_rejects_bad_iters(spark):
    import pytest

    from news_please_spark.operators.graph import hits_scaled

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    n = spark.createDataFrame([(0,), (1,)], "id long")
    with pytest.raises(ValueError):
        hits_scaled(e, n, iters=0)


def test_anchor_terms_topk_and_skew_collapse(spark):
    from news_please_spark.operators.graph import anchor_terms

    edges = spark.createDataFrame(
        [
            (1, 10, ["home", "page"]),
            (2, 10, ["home"]),
            (3, 10, ["home", "news"]),
            (4, 10, ["news"]),
            (5, 20, ["about"]),
            (6, 20, []),
        ],
        "src long, dst long, anchor array<string>",
    )
    out = {
        (r.dst_id, r.term): (r.cnt, r.rk)
        for r in anchor_terms(edges, None, top_k=2).collect()
    }
    assert out == {
        (10, "home"): (3, 1),
        (10, "news"): (2, 2),
        (20, "about"): (1, 1),
    }


def test_anchor_terms_tiebreak_by_term(spark):
    from news_please_spark.operators.graph import anchor_terms

    edges = spark.createDataFrame(
        [(1, 7, ["b"]), (2, 7, ["a"]), (3, 7, ["c"])],
        "src long, dst long, anchor array<string>",
    )
    rows = sorted(
        anchor_terms(edges, None, top_k=2).collect(), key=lambda r: r.rk
    )
    assert [(r.term, r.rk) for r in rows] == [("a", 1), ("b", 2)]


# ---------------------------------------------------------------------------
# spam mass (Gyöngyi et al. 2006): uniform vs good-seeded rank


def _py_rank(nodes, edges, deg, iters, damping, teleport):
    r = {n: (1 if teleport[n] else 0) for n in nodes}
    for k in range(iters):
        t = (100 - damping) * deg * (100 * deg) ** k
        c = {n: 0 for n in nodes}
        for s, d in edges:
            c[d] += r[s]
        r = {n: (t if teleport[n] else 0) + damping * c[n] for n in nodes}
    return r


def test_spam_mass_matches_python_oracle(spark):
    from news_please_spark.operators.graph import spam_mass

    nodes = list(range(12))
    # ring + two chords; nodes 0,4,8 are flagged (uniform out-degree 2)
    edges = [(i, (i + 1) % 12) for i in nodes] + [(i, (i + 5) % 12) for i in nodes]
    bad = {0, 4, 8}
    ndf = spark.createDataFrame([(n,) for n in nodes], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    bdf = spark.createDataFrame([(b,) for b in bad], "id long")
    got = {
        r.id: (r.rank_all, r.rank_good, r.spam_abs, r.spam_bp)
        for r in spam_mass(edf, ndf, bdf, out_degree=2, iters=3).collect()
    }
    r_all = _py_rank(nodes, edges, 2, 3, 85, {n: True for n in nodes})
    r_good = _py_rank(nodes, edges, 2, 3, 85, {n: n not in bad for n in nodes})
    want = {
        n: (
            r_all[n],
            r_good[n],
            r_all[n] - r_good[n],
            (r_all[n] - r_good[n]) * 10000 // r_all[n] if r_all[n] else 0,
        )
        for n in nodes
    }
    assert got == want
    # monotonicity: seeded teleport is componentwise <= uniform
    assert all(v[0] >= v[1] for v in got.values())
    # flagged nodes inherit NO teleport, so every one carries positive
    # mass
    assert all(got[b][3] > 0 for b in bad)
    # and a fully clean graph carries zero mass everywhere
    none = spam_mass(edf, ndf, bdf.limit(0), out_degree=2, iters=3).collect()
    assert all(r.spam_abs == 0 and r.spam_bp == 0 for r in none)


def test_seeded_pagerank_zero_seed_set_is_all_zero(spark):
    from news_please_spark.operators.graph import pagerank_scaled

    ndf = spark.createDataFrame([(n,) for n in range(5)], "id long")
    edf = spark.createDataFrame([(i, (i + 1) % 5) for i in range(5)], "src long, dst long")
    empty = ndf.limit(0)
    out = pagerank_scaled(edf, ndf, 1, iters=2, teleport_nodes=empty)
    assert [r.r for r in out.collect()] == [0, 0, 0, 0, 0]


# ---------------------------------------------------------------------------
# reciprocal links


def test_reciprocal_links_semantics(spark):
    from news_please_spark.operators.graph import reciprocal_links

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 1),          # mutual
            (3, 4),                  # one-way
            (5, 5),                  # self-loop: never mutual
            (6, 7), (6, 7), (7, 6),  # duplicate directed edges collapse
            (8, 9), (9, 8), (8, 9),  # mutual with dup
        ],
        "src long, dst long",
    )
    got = sorted((r.a, r.b) for r in reciprocal_links(edges).collect())
    assert got == [(1, 2), (6, 7), (8, 9)]


def test_reciprocal_links_no_self_join(spark):
    from news_please_spark.operators.graph import reciprocal_links

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    plan = reciprocal_links(edges)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan  # canonical-key aggregation, not a self-join


# ---------------------------------------------------------------------------
# k-core peeling


def _py_kcore(edges, k, rounds):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    for _ in range(rounds):
        deg = {}
        for a, _b in und:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, c in deg.items() if c >= k}
        und = {(a, b) for a, b in und if a in keep and b in keep}
    out = {}
    for a, _b in und:
        out[a] = out.get(a, 0) + 1
    return out


def test_kcore_peel_matches_python(spark):
    from news_please_spark.operators.graph import kcore_peel

    # triangle core {1,2,3} + a tendril 4-5 + a self-loop + parallels
    edges = [
        (1, 2), (2, 3), (3, 1),
        (1, 4), (4, 5),
        (6, 6),
        (2, 3), (3, 2),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.deg for r in kcore_peel(df, k=2, rounds=3).collect()}
    assert got == _py_kcore(edges, 2, 3)
    # the tendril and self-loop peel away; the triangle survives at deg 2
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_peel_round_budget_converges_from_above(spark):
    from news_please_spark.operators.graph import kcore_peel

    # a chain: each peel removes the exposed endpoints only
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for rounds in (1, 2, 3):
        got = {r.node for r in kcore_peel(df, k=2, rounds=rounds).collect()}
        assert got == set(_py_kcore(edges, 2, rounds))
    # the 2-core of a chain is empty: enough rounds reach the fixpoint
    assert kcore_peel(df, k=2, rounds=3).count() == 0


# ---------------------------------------------------------------------------
# multi-hop redirect resolution (pointer doubling)


def _py_resolve(edges, max_hops):
    nxt = dict(edges)
    out = {}
    for u in nxt:
        cur, hops = u, 0
        seen = {u}
        while cur in nxt and hops < max_hops:
            cur = nxt[cur]
            hops += 1
            if cur in seen:
                break
            seen.add(cur)
        out[u] = (cur, hops, cur not in nxt)
    return out


def test_resolve_redirects_matches_python_walk(spark):
    from news_please_spark.operators.graph import resolve_redirects

    # three chains of different lengths sharing a terminal, plus a fan-in
    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a3", "end"),
        ("b1", "end"),
        ("c1", "c2"), ("c2", "a3"),  # fan-in onto the a-chain
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.src: (r.final_url, r.hops, r.resolved)
        for r in resolve_redirects(df, rounds=3).collect()
    }
    assert got == _py_resolve(edges, 1 << 3)


def test_resolve_redirects_long_chain_needs_log_rounds(spark):
    from news_please_spark.operators.graph import resolve_redirects

    edges = [(f"n{i}", f"n{i+1}") for i in range(20)]  # 20-hop chain
    df = spark.createDataFrame(edges, "src string, dst string")
    # rounds=5 covers 32 hops: everything resolves to the terminal
    done = resolve_redirects(df, rounds=5).collect()
    assert all(r.final_url == "n20" and r.resolved for r in done)
    assert {r.hops for r in done} == set(range(1, 21))
    # rounds=4 covers only 16 hops: the head of the chain is short
    part = {r.src: r.resolved for r in resolve_redirects(df, rounds=4).collect()}
    assert part["n19"] and not part["n0"]


def test_resolve_redirects_cycle_flagged_unresolved(spark):
    from news_please_spark.operators.graph import resolve_redirects

    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("y", "x"), ("t", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.src: (r.final_url, r.resolved) for r in resolve_redirects(df, rounds=4).collect()}
    assert got["a"] == ("c", True)
    # cycle members and anything draining INTO the cycle never resolve
    assert not got["x"][1] and not got["y"][1] and not got["t"][1]


def test_resolve_redirects_materialize_matches_lazy(spark):
    from news_please_spark.operators.graph import resolve_redirects

    edges = [(f"m{i}", f"m{i+1}") for i in range(9)] + [("q1", "q2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    lazy = sorted(tuple(r) for r in resolve_redirects(df, rounds=4).collect())
    mat = sorted(
        tuple(r) for r in resolve_redirects(df, rounds=4, materialize=True).collect()
    )
    assert lazy == mat


def test_label_propagation_two_triangles(spark):
    """Two triangles bridged by one edge resolve to two communities;
    the exact labels are the hand-traced synchronous-LPA fixture
    (min-label tie-breaks, 3 rounds)."""
    from news_please_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
        "src long, dst long",
    )
    out = {r.id: r.label for r in label_propagation(edges, rounds=3).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 2, 4: 2, 5: 2}


def test_label_propagation_star_and_self_loop(spark):
    """A star collapses to the hub's ... min-label community in one
    round from the leaves' side; self-loops and duplicate edges are
    ignored."""
    from news_please_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(10, 11), (10, 12), (10, 13), (10, 10), (11, 10)],
        "src long, dst long",
    )
    out = {r.id: r.label for r in label_propagation(edges, rounds=2).collect()}
    # round 1: leaves adopt 10, hub adopts min leaf 11;
    # round 2: leaves adopt 11 (hub is their only neighbor), hub sees
    # {10,10,10} -> 10
    assert out == {10: 10, 11: 11, 12: 11, 13: 11}


def test_opic_star_hand_traced(spark):
    """0->1, 0->2, 1->0, 2->0 with scale 1e6: hand-traced two rounds
    (see docstring semantics: floor division, remainder kept)."""
    from news_please_spark.operators.graph import opic_scores

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 0), (2, 0)], "src long, dst long"
    )
    out = {r.id: (r.cash, r.history) for r in opic_scores(edges, rounds=2).collect()}
    assert out == {
        0: (1_000_000, 3_000_000),
        1: (1_000_000, 1_500_000),
        2: (1_000_000, 1_500_000),
    }
    # conservation
    assert sum(c for c, _ in out.values()) == 3_000_000


def test_opic_conservation_and_sink(spark):
    """Cash is conserved every round; a sink node hoards (keeps) cash;
    remainders from floor division stay with the giver."""
    from news_please_spark.operators.graph import opic_scores

    # 0 -> 1,2,3 (outdeg 3: floor(1e6/3) leaves remainder 1); 1 -> 0;
    # 2,3 are sinks
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 0)], "src long, dst long"
    )
    for rounds in (1, 3):
        rows = opic_scores(edges, rounds=rounds).collect()
        assert sum(r.cash for r in rows) == 4_000_000, rounds
    one = {r.id: r.cash for r in opic_scores(edges, rounds=1).collect()}
    # node0: kept remainder 1 + 1e6 incoming from node1
    assert one[0] == 1_000_001
    # sinks received floor(1e6/3) on top of their own hoarded cash
    assert one[2] == one[3] == 1_000_000 + 333_333


def test_triangle_counts_k4_square_tail(spark):
    from news_please_spark.operators.graph import triangle_counts

    # K4 on {0,1,2,3}: every node sits in C(3,2)=3 triangles
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    out = {r.node: r.n_tri for r in triangle_counts(
        spark.createDataFrame(k4, "src long, dst long")).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    # square 0-1-2-3-0: no triangles
    sq = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    assert triangle_counts(sq).count() == 0

    # one triangle + pendant tail; duplicate/reversed/self edges collapse
    g = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (2, 2), (2, 3)],
        "src long, dst long",
    )
    out = {r.node: r.n_tri for r in triangle_counts(g).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def _py_salsa(edges, nodes, iters=2, scale=1_000_000):
    from collections import defaultdict

    ind, outd = defaultdict(int), defaultdict(int)
    for s, d in edges:
        outd[s] += 1
        ind[d] += 1
    a = {v: scale for v in ind}
    h = {}
    for _ in range(iters):
        h = defaultdict(int)
        for s, d in edges:
            if d in a:
                h[s] += a[d] // ind[d]
        h = dict(h)
        a = defaultdict(int)
        for s, d in edges:
            if s in h:
                a[d] += h[s] // outd[s]
        a = dict(a)
    return sorted((n, a.get(n, 0), h.get(n, 0)) for n in nodes)


def test_salsa_matches_python_oracle(spark):
    # star hub (1 -> 10..14), a 3-cycle, and a dangling receiver
    edges = [(1, 10), (1, 11), (1, 12), (1, 13), (1, 14),
             (10, 11), (11, 12), (12, 10), (13, 99)]
    nodes = sorted({x for e in edges for x in e})
    from news_please_spark.operators.graph import salsa_scaled

    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long")
    got = sorted(
        (r.id, r.authority, r.hub) for r in salsa_scaled(e, n, iters=2).collect()
    )
    assert got == _py_salsa(edges, nodes)


def test_salsa_resists_tight_knit_community(spark):
    """The TKC effect: a k-clique link farm saturates HITS but under
    SALSA's degree normalization each farm page's authority share is
    divided by its in-degree, so a genuinely widely-cited page (many
    INDEPENDENT single-link endorsers) outranks farm members."""
    from news_please_spark.operators.graph import hits_scaled, salsa_scaled

    farm = [(100 + i, 100 + j) for i in range(7) for j in range(7) if i != j]
    # 12 independent endorsers each link ONLY to page 7
    honest = [(200 + i, 7) for i in range(12)]
    edges = farm + honest
    nodes = sorted({x for e in edges for x in e})
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long")
    salsa = {r.id: r.authority for r in salsa_scaled(e, n, iters=2).collect()}
    hits = {r.id: r.authority for r in hits_scaled(e, n, iters=2).collect()}
    # HITS: the 7-clique's multiplicative amplification ((k-1)^3 = 216)
    # beats the honest page's 12 independent endorsements (12^2 = 144)
    assert hits[100] > hits[7]
    # SALSA's walk conserves mass per step (each share is DIVIDED by
    # degree), so the farm gains nothing from its density: the honest
    # page is never dominated (equal up to floor shedding)
    assert salsa[7] >= salsa[100]
    # and the walk keeps every authority at ~scale (mass conservation):
    assert salsa[7] >= 999_000 and salsa[100] <= 1_000_000


def test_salsa_rejects_bad_iters(spark):
    from news_please_spark.operators.graph import salsa_scaled

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    n = spark.createDataFrame([(1,), (2,)], "id long")
    with pytest.raises(ValueError):
        salsa_scaled(e, n, iters=0)


def test_ball_sizes_hand_traced_chain_and_cycle(spark):
    """Chain 1->2->3->4 plus 3-cycle 10->11->12->10; radius 2."""
    from news_please_spark.operators.graph import ball_sizes

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)]
    nodes = [1, 2, 3, 4, 10, 11, 12]
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long")
    got = {r.id: (r.ball_1, r.ball_2) for r in ball_sizes(e, n, radius=2).collect()}
    assert got == {
        1: (2, 3),   # {1,2}, {1,2,3}
        2: (2, 3),
        3: (2, 2),   # 4 has no outlinks
        4: (1, 1),
        10: (2, 3),  # cycle: whole component within r=2
        11: (2, 3),
        12: (2, 3),
    }


def test_ball_sizes_min_distance_not_path_count(spark):
    """Diamond 1->{2,3}->4: node 4 reachable two ways but counted once;
    a back-edge 4->1 must not re-count 1 (already in its own ball)."""
    from news_please_spark.operators.graph import ball_sizes

    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 1)]
    nodes = [1, 2, 3, 4]
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long")
    got = {r.id: (r.ball_1, r.ball_2) for r in ball_sizes(e, n, radius=2).collect()}
    assert got[1] == (3, 4)   # {1,2,3}, then +4 (once)
    assert got[4] == (2, 4)   # {4,1}, then {4,1,2,3}


def test_hyperball_calibrates_against_exact_balls(spark):
    """In the raw estimator's valid regime (ball >> register count m:
    degree-20 expander, p=4 so m=16), HyperBall must track exact ball
    sizes — aggregate within the sketch's error, per-node bounded."""
    from news_please_spark.operators.graph import ball_sizes, hyperball

    n = 400
    params = [(3, 17), (5, 34), (7, 51), (11, 8), (13, 29), (17, 41),
              (19, 3), (23, 25), (29, 14), (31, 37), (37, 6), (41, 22),
              (43, 11), (47, 33), (53, 2), (59, 19), (61, 44), (67, 7),
              (71, 28), (73, 46)]
    edges = [(i, (i * m + a) % n) for i in range(n) for m, a in params]
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(i,) for i in range(n)], "id long")
    exact = {r.id: r.ball_2 for r in ball_sizes(e, nd, radius=2).collect()}
    est = {r.id: r.ball_2_est for r in hyperball(e, nd, radius=2, p=4).collect()}
    assert set(est) == set(exact)
    assert min(exact.values()) > 16 * 2.5  # the regime raw HLL is built for
    tot_exact = sum(exact.values())
    tot_est = sum(est.values())
    assert abs(tot_est - tot_exact) / tot_exact < 0.20
    for k, b2 in exact.items():
        assert b2 / 3 <= est[k] <= b2 * 3  # per-node: within m=16's spread


def test_hyperball_is_monotone_and_rejects_bad_radius(spark):
    import pytest as _pytest

    from news_please_spark.operators.graph import hyperball

    edges = [(1, 2), (2, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    rows = {r.id: (r.ball_1_est, r.ball_2_est) for r in hyperball(e, nd, radius=2).collect()}
    # register union only grows: est_2 >= est_1 per node
    for b1, b2 in rows.values():
        assert b2 >= b1
    with _pytest.raises(ValueError):
        hyperball(e, nd, radius=0)


def _py_weighted_pr(edges_w, nodes, iters=3, scale=1_000_000, dpct=85):
    ow = {}
    for s, d, w in edges_w:
        ow[s] = ow.get(s, 0) + w
    r = {n: scale for n in nodes}
    tele = ((100 - dpct) * scale) // 100
    for _ in range(iters):
        inflow = {n: 0 for n in nodes}
        for s, d, w in edges_w:
            inflow[d] += ((dpct * r[s]) // 100) * w // ow[s]
        r = {n: tele + inflow[n] for n in nodes}
    return r


def test_weighted_pagerank_matches_python_and_respects_weights(spark):
    from news_please_spark.operators.graph import pagerank_weighted_scaled

    # host A splits 90/10 between B and C; D is dangling
    edges = [("A", "B", 9), ("A", "C", 1), ("B", "A", 1), ("C", "D", 5)]
    nodes = ["A", "B", "C", "D"]
    e = spark.createDataFrame(edges, "src string, dst string, weight long")
    n = spark.createDataFrame([(x,) for x in nodes], "id string")
    got = {r.id: r.r for r in pagerank_weighted_scaled(e, n, iters=3).collect()}
    assert got == _py_weighted_pr(edges, nodes)
    # 9x the link weight -> B far outranks C
    assert got["B"] > got["C"]


def test_contract_to_hosts_sums_multiplicities(spark):
    from news_please_spark.operators.graph import contract_to_hosts
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 8), (2, 9), (3, 8), (11, 8)], "src long, dst long"
    )
    he = contract_to_hosts(
        edges,
        F.concat(F.lit("h"), (F.col("src") % 10).cast("string")),
        F.concat(F.lit("h"), (F.col("dst") % 10).cast("string")),
    )
    got = {(r.src, r.dst): r.weight for r in he.collect()}
    assert got == {("h1", "h8"): 2, ("h2", "h9"): 1, ("h3", "h8"): 1}


# ---------------------------------------------------------------------------
# component_size_histogram


def test_component_sizes_with_isolated(spark):
    from news_please_spark.operators.graph import component_size_histogram

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 30)], "id long"
    )
    got = {
        r["size"]: r["n_components"]
        for r in component_size_histogram(edges, nodes).collect()
    }
    # {1,2,3} size 3; {10,11} size 2; 20 (self-loop only) and 30 isolated
    assert got == {3: 1, 2: 1, 1: 2}


def test_component_sizes_without_nodes(spark):
    from news_please_spark.operators.graph import component_size_histogram

    edges = spark.createDataFrame(
        [(1, 2), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {
        r["size"]: r["n_components"]
        for r in component_size_histogram(edges).collect()
    }
    assert got == {2: 1, 3: 1}


# ---------------------------------------------------------------------------
# badrank


def test_badrank_flows_backwards_only(spark):
    from news_please_spark.operators.graph import badrank

    # chain a -> b -> bad ; c receives FROM bad (no badness: links
    # INTO bad matter, links FROM bad do not)
    edges = spark.createDataFrame(
        [(1, 2), (2, 9), (9, 3)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 9)], "id long")
    bad = spark.createDataFrame([(9,)], "id long")
    got = {
        r["id"]: r["r"]
        for r in badrank(
            edges, nodes, bad, out_degree=1, iters=2, materialize=False
        ).collect()
    }
    # every page on a path INTO the bad node carries badness...
    assert got[9] > 0 and got[2] > 0 and got[1] > 0
    # ...and a page linked FROM bad only is clean: the asymmetry
    assert got[3] == 0


def test_badrank_equals_reversed_seeded_pagerank(spark):
    from news_please_spark.operators.graph import badrank, pagerank_scaled

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "id long")
    bad = spark.createDataFrame([(3,)], "id long")
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    a = {
        r["id"]: r["r"]
        for r in badrank(
            edges, nodes, bad, out_degree=1, iters=3, materialize=False
        ).collect()
    }
    b = {
        r["id"]: r["r"]
        for r in pagerank_scaled(
            rev, nodes, out_degree=1, iters=3,
            materialize=False, teleport_nodes=bad,
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# clustering_coefficients


def test_clustering_coefficients_triangle_and_path(spark):
    from news_please_spark.operators.graph import clustering_coefficients

    # triangle {1,2,3} plus pendant 4-1; 5-6 isolated edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1), (5, 6)], "src long, dst long"
    )
    got = {
        r["node"]: (r["deg"], r["n_tri"], r["clust_bp"])
        for r in clustering_coefficients(edges).collect()
    }
    # node 1: deg 3, 1 triangle of 3 possible pairs -> 3333 bp
    assert got[1] == (3, 1, 3333)
    assert got[2] == (2, 1, 10000)
    assert got[3] == (2, 1, 10000)
    assert got[4] == (1, 0, None)
    assert got[5] == (1, 0, None)


def test_clustering_coefficients_clique_is_10000(spark):
    from news_please_spark.operators.graph import clustering_coefficients

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4, "src long, dst long")
    got = clustering_coefficients(edges).collect()
    assert all(r["clust_bp"] == 10000 and r["n_tri"] == 3 for r in got)


# ---------------------------------------------------------------------------
# degree_distribution


def test_degree_distribution_counts(spark):
    from news_please_spark.operators.graph import degree_distribution

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 3)], "src long, dst long"
    )
    got = {
        (r["direction"], r["degree"]): r["n_nodes"]
        for r in degree_distribution(edges).collect()
    }
    # self loop (3,3) ignored; out: 1->2, 2->1; in: 2 has 1, 3 has 2
    assert got == {
        ("out", 2): 1, ("out", 1): 1,
        ("in", 1): 1, ("in", 2): 1,
    }


# ---------------------------------------------------------------------------
# host_cocitation


def test_host_cocitation_pairs_and_threshold(spark):
    from news_please_spark.operators.graph import host_cocitation

    edges = spark.createDataFrame(
        [
            (1, "a"), (1, "b"),          # page 1 co-cites a,b
            (2, "a"), (2, "b"),          # page 2 co-cites a,b
            (3, "a"), (3, "c"),          # a,c once only
            (4, "a"), (4, "a"),          # duplicate link: one host
        ],
        "src long, dst_host string",
    )
    got = {
        (r["host_a"], r["host_b"]): r["n_pages"]
        for r in host_cocitation(edges, min_pages=2).collect()
    }
    assert got == {("a", "b"): 2}
