"""MIS / maximal matching / min dominating set / MSF vs python
oracles. The greedy set algorithms are deterministic (id/degree
priorities), so the python oracles replay the reference semantics
exactly (flash/matching/{mis,mm,min-dominating-set}.h); independent
INVARIANT checks (independence+maximality, matching validity,
domination, forest validity + Kruskal weight) guard against
both implementations sharing a bug."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.algos.matching import mis, maximal_matching, min_dominating_set
from linkgraph.algos.msf import msf
from linkgraph.graph import Graph


def _adj(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    return adj


def py_mis(pairs):
    adj = _adj(pairs)
    # lexicographic (deg, id) — a strict total order even for sparse
    # ids (the deg*n+id arithmetic ties when id diff = n * deg diff)
    r = {v: (len(adj[v]), v) for v in adj}
    active = set(adj)
    out = set()
    while active:
        sel = {v for v in active if all(r[v] < r[u] for u in adj[v] if u in active)}
        out |= sel
        dom = {u for v in sel for u in adj[v]}
        active -= sel | dom
    return out


def py_mm(pairs):
    adj = _adj(pairs)
    active = set(adj)
    match = {}
    while True:
        p = {v: max((u for u in adj[v] if u in active), default=None) for v in active}
        pairs_sel = {(v, p[v]) for v in active
                     if p[v] is not None and p.get(p[v]) == v and v < p[v]}
        if not pairs_sel:
            break
        for a, b in pairs_sel:
            match[a] = b
            match[b] = a
        active -= {x for ab in pairs_sel for x in ab}
    return match


def py_mds(pairs):
    adj = _adj(pairs)
    active = set(adj)  # undominated
    cnt = {v: len(adj[v]) for v in adj}
    out = set()
    while active:
        m1 = {}
        for v in active:
            best = (cnt[v], v)
            for u in adj[v]:
                if u in active and (cnt[u], u) > best:
                    best = (cnt[u], u)
            m1[v] = best
        m2 = {}
        for v in active:
            best = m1[v]
            for u in adj[v]:
                if u in active and m1[u] > best:
                    best = m1[u]
            m2[v] = best
        sel = {v for v in active if m2[v][1] == v}
        out |= sel
        dom = sel | {u for v in sel for u in adj[v]}
        active -= dom
        cnt = {v: sum(1 for u in adj[v] if u in active) for v in active}
    return out


def py_kruskal_weight(wpairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    tot = 0.0
    for w, a, b in sorted(wpairs):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            tot += w
    return tot


@pytest.fixture(scope="module")
def pairs(small_edges_np):
    src, dst = small_edges_np
    return sorted({(min(a, b), max(a, b))
                   for a, b in zip(src.tolist(), dst.tolist()) if a != b})


@pytest.fixture(scope="module")
def gdf(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return Graph.from_edges(df, directed=False)


def test_mis(spark, gdf, pairs):
    res = mis(gdf)
    got = {r["id"] for r in res.state.collect() if r["in_mis"]}
    assert got == py_mis(pairs)
    # invariants: independent + maximal
    adj = _adj(pairs)
    assert all(u not in got or v not in got for u, v in pairs)
    assert all(v in got or any(u in got for u in adj[v]) for v in adj)


def test_maximal_matching(spark, gdf, pairs):
    res = maximal_matching(gdf)
    got = {r["id"]: r["match"] for r in res.state.collect()}
    exp = py_mm(pairs)
    assert {k: v for k, v in got.items() if v >= 0} == exp
    # invariants: symmetric partners over real edges; maximal
    es = set(pairs)
    for v, m in got.items():
        if m >= 0:
            assert got[m] == v
            assert (min(v, m), max(v, m)) in es
    unmatched = {v for v, m in got.items() if m < 0}
    assert all(u not in unmatched or v not in unmatched for u, v in pairs)


def test_min_dominating_set(spark, gdf, pairs):
    res = min_dominating_set(gdf)
    got = {r["id"] for r in res.state.collect() if r["in_mds"]}
    assert got == py_mds(pairs)
    adj = _adj(pairs)
    assert all(v in got or any(u in got for u in adj[v]) for v in adj)


def test_msf(spark, pairs):
    # deterministic pseudo-weights so the MSF is non-trivial
    wpairs = [(float((a * 7 + b * 13) % 20 + 1), a, b) for a, b in pairs]
    df = spark.createDataFrame(
        [(a, b, w) for w, a, b in wpairs], "src long, dst long, weight double"
    )
    g = Graph.from_edges(df, directed=False, weight_col="weight")
    res = msf(g, weight_col="weight")
    rows = res.state.collect()
    got_w = sum(r["weight"] for r in rows)
    assert got_w == pytest.approx(py_kruskal_weight(wpairs))
    # forest validity: edge count = V - C, and forest connects exactly
    # the graph's components
    adj = _adj(pairs)
    comp = {v: v for v in adj}
    changed = True
    while changed:
        changed = False
        for a, b in pairs:
            m = min(comp[a], comp[b])
            for x in (a, b):
                if comp[x] != m:
                    comp[x] = m
                    changed = True
    n_comp = len({comp[v] for v in adj})
    assert len(rows) == len(adj) - n_comp
    fcomp = {v: v for v in adj}
    fpairs = [(r["src"], r["dst"]) for r in rows]
    changed = True
    while changed:
        changed = False
        for a, b in fpairs:
            m = min(fcomp[a], fcomp[b])
            for x in (a, b):
                if fcomp[x] != m:
                    fcomp[x] = m
                    changed = True
    assert {frozenset(v for v in adj if comp[v] == c) for c in set(comp.values())} == \
           {frozenset(v for v in adj if fcomp[v] == c) for c in set(fcomp.values())}


def test_mis_sparse_ids_no_stall(spark):
    # Regression (ADVICE r3): with r = deg*n + id, ids 0/4/9/10 tie
    # (id diff = n * deg diff) and the loop stalled, returning a
    # non-maximal set {10} with converged=True.
    pairs = [(0, 4), (0, 9), (9, 10)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    res = mis(Graph.from_edges(df, directed=False))
    got = {r["id"] for r in res.state.collect() if r["in_mis"]}
    assert res.converged
    adj = _adj(pairs)
    # independent + maximal
    assert all(u not in got or v not in got for u, v in pairs)
    assert all(v in got or any(u in got for u in adj[v]) for v in adj)
    assert got == py_mis(pairs)
