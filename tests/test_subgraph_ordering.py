"""k-clique / motif census / densest / orderings / vertex cover vs
brute-force python oracles on small random graphs. The python oracles
enumerate motifs directly (itertools over vertex tuples), fully
independent of both the Spark join strategy and the DuckDB SQL, and
the greedy/peel algorithms are replayed step-for-step from the
reference semantics (flash/subgraph/*.h, flash/core/*-ordering.h,
flash/matching/min-cover.h)."""

from __future__ import annotations

import random
from itertools import combinations

import pytest

from linkgraph.algos.matching import min_edge_cover_size, min_vertex_cover
from linkgraph.algos.ordering import degeneracy_ordering, onion_layers
from linkgraph.algos.subgraph import densest_subgraph, kclique_counts, motif_census
from linkgraph.graph import Graph


def _rand_und(n=40, m=140, seed=7):
    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return sorted(pairs)


def _adj(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _graph(spark, pairs, directed=True):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return Graph.from_edges(df, directed=directed)


def _cores(adj):
    """Exact peel core numbers."""
    import heapq

    dd = {v: len(adj[v]) for v in adj}
    h = [(d, v) for v, d in dd.items()]
    heapq.heapify(h)
    seen, core, cur = set(), {}, 0
    while h:
        d, v = heapq.heappop(h)
        if v in seen or d != dd[v]:
            continue
        seen.add(v)
        cur = max(cur, d)
        core[v] = cur
        for u in adj[v]:
            if u not in seen:
                dd[u] -= 1
                heapq.heappush(h, (dd[u], u))
    return core


def test_kclique_counts(spark):
    pairs = _rand_und(30, 160, seed=3)
    adj = _adj(pairs)
    eset = set(pairs)

    def is_clique(vs):
        return all((min(a, b), max(a, b)) in eset for a, b in combinations(vs, 2))

    verts = sorted(adj)
    expect = {
        k: sum(1 for vs in combinations(verts, k) if is_clique(vs))
        for k in (3, 4, 5)
    }
    row = kclique_counts(_graph(spark, pairs), ks=(3, 4, 5)).collect()[0]
    assert (row["n_3"], row["n_4"], row["n_5"]) == (
        expect[3], expect[4], expect[5])


def test_motif_census_brute(spark):
    rng = random.Random(11)
    # directed simple graph with reciprocal pairs and cycles
    d = set()
    n = 26
    while len(d) < 150:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            d.add((a, b))
    d = sorted(d)
    dset = set(d)
    und = {(min(a, b), max(a, b)) for a, b in d}
    adj = _adj(und)
    recip = {(a, b) for a, b in d if (b, a) in dset and a < b}
    verts = sorted({x for e in d for x in e})

    trans = sum(
        1
        for a in verts
        for b in verts
        for c in verts
        if a != b and b != c and a != c
        and (a, b) in dset and (b, c) in dset and (a, c) in dset
    )
    cyc = (
        sum(
            1
            for a in verts
            for b in verts
            for c in verts
            if a != b and b != c and a != c
            and (a, b) in dset and (b, c) in dset and (c, a) in dset
        )
        // 3
    )
    in_plus = sum(
        1
        for (s, t) in recip
        for x in verts
        if x not in (s, t) and (s, x) in dset and (t, x) in dset
    )
    out_plus = sum(
        1
        for (s, t) in recip
        for x in verts
        if x not in (s, t) and (x, s) in dset and (x, t) in dset
    )
    cycle_plus = sum(
        1
        for (s, t) in d
        if (t, s) in dset
        for x in verts
        if x not in (s, t) and (x, s) in dset and (t, x) in dset
    )
    tris = [
        vs for vs in combinations(verts, 3)
        if all((min(a, b), max(a, b)) in und for a, b in combinations(vs, 2))
    ]
    tailed = sum(len(adj[v]) - 2 for t in tris for v in t)
    paths3 = 0
    for (a, b) in und:
        common = len(adj[a] & adj[b])
        paths3 += (len(adj[a]) - 1) * (len(adj[b]) - 1) - common
    rect = 0
    for a, b in combinations(verts, 2):
        w = len(adj.get(a, set()) & adj.get(b, set()))
        rect += w * (w - 1) // 2
    rect //= 2
    diamond = sum(
        (len(adj[a] & adj[b]) * (len(adj[a] & adj[b]) - 1)) // 2 for (a, b) in und
    )

    row = motif_census(_graph(spark, d)).collect()[0]
    assert row["n_trans"] == trans
    assert row["n_cyclic"] == cyc
    assert row["n_in_plus"] == in_plus
    assert row["n_out_plus"] == out_plus
    assert row["n_cycle_plus"] == cycle_plus
    assert row["n_tailed"] == tailed
    assert row["n_paths3"] == paths3
    assert row["n_rect"] == rect
    assert row["n_diamond"] == diamond


def test_densest_max_core_density(spark):
    pairs = _rand_und(40, 160, seed=5)
    adj = _adj(pairs)
    core = _cores(adj)
    cmax = max(core.values())
    S = {v for v, c in core.items() if c == cmax}
    ne = sum(1 for a, b in pairs if a in S and b in S) * 2
    row = densest_subgraph(_graph(spark, pairs)).collect()[0]
    assert row["n_sub"] == len(S)
    assert row["deg_sum"] == ne
    assert row["density"] == pytest.approx(ne / len(S), abs=1e-6)
    # 2-approx guarantee sanity: max-core density >= max degree / 2 is
    # not the claim; the claim is density >= rho*/2 — check against
    # the trivial whole-graph density lower bound instead
    assert row["density"] >= (2 * len(pairs) / len(adj)) / 2 - 1e-9


def test_degeneracy_and_onion(spark):
    pairs = _rand_und(45, 170, seed=9)
    adj = _adj(pairs)
    core = _cores(adj)
    dg = max(core.values())
    # python replay: degeneracy waves
    d2 = {v: len(adj[v]) for v in adj}
    active = set(adj)
    rank = {}
    r = 0
    while active:
        rem = {v for v in active if d2[v] <= dg}
        for v in rem:
            rank[v] = r
        for v in rem:
            for u in adj[v]:
                if u in active and u not in rem:
                    d2[u] -= 1
        active -= rem
        r += 1
    # python replay: onion layers
    d3 = {v: sum(1 for u in adj[v] if core[u] >= core[v]) for v in adj}
    active = set(adj)
    layer = {}
    r = 0
    while active:
        rem = {v for v in active if d3[v] <= core[v]}
        if not rem:
            break
        for v in rem:
            layer[v] = r
        for v in rem:
            for u in adj[v]:
                if u in active and u not in rem and core[u] == core[v]:
                    d3[u] -= 1
        active -= rem
        r += 1

    g = _graph(spark, pairs)
    got_r = {x["id"]: x["rank"] for x in degeneracy_ordering(g).state.collect()}
    got_l = {x["id"]: x["layer"] for x in onion_layers(g).state.collect()}
    assert got_r == rank
    assert got_l == layer


def test_min_vertex_cover_replay_and_validity(spark):
    pairs = _rand_und(50, 180, seed=13)
    adj = _adj(pairs)
    n = len(adj)
    # python replay of min-cover.h
    d4 = {v: len(adj[v]) for v in adj}
    c = set()
    A = {v for v in adj if d4[v] > 0}
    nowd = n // 2
    while A:
        B = {v for v in A if d4[v] >= nowd}
        c |= B
        for v in B:
            for u in adj[v]:
                d4[u] -= 1
        A = {v for v in A if v not in c and d4[v] > 0}
        nowd //= 2
    while True:
        B = {v for v in c if all(u in c for u in adj[v])}
        rem = {v for v in B if not any(u in B and u > v for u in adj[v])}
        if not rem:
            break
        c -= rem

    res = min_vertex_cover(_graph(spark, pairs))
    got = {x["id"] for x in res.state.collect() if x["in_cover"]}
    assert got == c
    # independent invariant: it IS a cover, and no vertex is redundant
    assert all(a in got or b in got for a, b in pairs)
    for v in got:
        assert any(u not in got for u in adj[v]) or any(
            u in got for u in adj[v]
        )  # non-degenerate


def test_min_edge_cover_size(spark):
    pairs = _rand_und(40, 110, seed=21)
    adj = _adj(pairs)
    g = _graph(spark, pairs)
    from linkgraph.algos.matching import maximal_matching

    mm = maximal_matching(g)
    m_sz = sum(1 for x in mm.state.collect() if x["match"] >= 0) // 2
    ec = min_edge_cover_size(g, matching=mm)
    assert ec == len(adj) - m_sz
    # bounds: Gallai for maximum matching gives n - m* <= ec' and a
    # maximal matching is >= m*/2, so ec is within [n/2, n]
    assert len(adj) / 2 <= ec <= len(adj)


def test_ordering_converged_flags(spark):
    pairs = _rand_und(24, 60, seed=31)
    g = _graph(spark, pairs)
    # a full run drains the peel and must report converged=True
    assert degeneracy_ordering(g).converged is True
    assert onion_layers(g).converged is True
    # max_rounds=0 leaves every vertex unranked (rank/layer -1): the
    # exhaustion must be reported, not silently marked converged
    r0 = degeneracy_ordering(g, max_rounds=0)
    assert r0.converged is False
    assert all(x["rank"] == -1 for x in r0.state.collect())
    l0 = onion_layers(g, max_rounds=0)
    assert l0.converged is False
    assert all(x["layer"] == -1 for x in l0.state.collect())
