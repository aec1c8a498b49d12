"""Bridges / articulation points / BCC vs classic DFS low-link python
oracles (implementation-independent: Tarjan's algorithms, not a
re-walk of the Spark construction). Reference semantics:
flash/connectivity/{bridge,cut-point,bcc}.h."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.algos.biconnectivity import biconnectivity
from linkgraph.graph import Graph


def _adj(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {v: sorted(ns) for v, ns in adj.items()}


def dfs_low_link(pairs):
    """Iterative Tarjan: returns (bridges set of (lo,hi) pairs,
    articulation-point set, list of edge-blocks (frozensets of
    normalized edge pairs))."""
    adj = _adj(pairs)
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    parent: dict[int, int] = {}
    timer = [0]
    bridges: set[tuple[int, int]] = set()
    arts: set[int] = set()
    blocks: list[frozenset] = []
    estack: list[tuple[int, int]] = []

    for root in sorted(adj):
        if root in disc:
            continue
        root_children = 0
        stack = [(root, iter(adj[root]))]
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        while stack:
            v, it = stack[-1]
            advanced = False
            for w in it:
                if w not in disc:
                    parent[w] = v
                    estack.append((min(v, w), max(v, w)))
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    stack.append((w, iter(adj[w])))
                    if v == root:
                        root_children += 1
                    advanced = True
                    break
                elif w != parent.get(v) and disc[w] < disc[v]:
                    estack.append((min(v, w), max(v, w)))
                    low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    u = stack[-1][0]
                    low[u] = min(low[u], low[v])
                    if low[v] > disc[u]:
                        bridges.add((min(u, v), max(u, v)))
                    if u != root and low[v] >= disc[u]:
                        arts.add(u)
                    if low[v] >= disc[u]:
                        blk = set()
                        while estack:
                            e = estack.pop()
                            blk.add(e)
                            if e == (min(u, v), max(u, v)):
                                break
                        blocks.append(frozenset(blk))
        if root_children >= 2:
            arts.add(root)
    return bridges, arts, blocks


def expected_bcc_labels(pairs, tree_parent):
    """Canonical (min child-side member) group label per vertex, built
    from the Tarjan edge-blocks and the ENGINE's tree: group(v) = the
    block containing tree edge {v, parent(v)} (roots: singleton)."""
    _, _, blocks = dfs_low_link(pairs)
    edge_block: dict[tuple[int, int], int] = {}
    for i, blk in enumerate(blocks):
        for e in blk:
            edge_block[e] = i
    members: dict[int, list[int]] = {}
    vert_block: dict[int, int] = {}
    for v, p in tree_parent.items():
        if p is None:
            continue
        bi = edge_block[(min(v, p), max(v, p))]
        members.setdefault(bi, []).append(v)
        vert_block[v] = bi
    out = {}
    for v, p in tree_parent.items():
        out[v] = v if p is None else min(members[vert_block[v]])
    return out


CASES = {
    # name: undirected pair list
    "path": [(0, 1), (1, 2), (2, 3)],
    "cycle": [(0, 1), (1, 2), (2, 3), (3, 0)],
    "barbell": [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)],
    "two_comps": [(0, 1), (1, 2), (2, 0), (10, 11)],
    "tree_plus_chord": [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5), (3, 4)],
}


@pytest.fixture(scope="module")
def rng_pairs():
    rng = np.random.default_rng(7)
    n = 60
    pairs = set()
    for _ in range(140):
        a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return sorted(pairs)


def _run(spark, pairs):
    df = spark.createDataFrame([(a, b) for a, b in pairs], "src long, dst long")
    res = biconnectivity(Graph.from_edges(df, directed=False))
    got_bridges = {(r["src"], r["dst"]) for r in res.bridges.collect()}
    got_cut = {r["id"] for r in res.cut_points.collect() if r["is_cut"]}
    got_bcc = {r["id"]: r["bcc"] for r in res.bcc.collect()}
    tree_parent = {r["id"]: r["parent"] for r in res.tree.collect()}
    return got_bridges, got_cut, got_bcc, tree_parent


@pytest.mark.parametrize("name", sorted(CASES))
def test_small_topologies(spark, name):
    pairs = CASES[name]
    got_bridges, got_cut, got_bcc, tree_parent = _run(spark, pairs)
    exp_bridges, exp_arts, _ = dfs_low_link(pairs)
    assert got_bridges == exp_bridges, name
    assert got_cut == exp_arts, name
    assert got_bcc == expected_bcc_labels(pairs, tree_parent), name


def test_random_graph(spark, rng_pairs):
    got_bridges, got_cut, got_bcc, tree_parent = _run(spark, rng_pairs)
    exp_bridges, exp_arts, _ = dfs_low_link(rng_pairs)
    assert got_bridges == exp_bridges
    assert got_cut == exp_arts
    assert got_bcc == expected_bcc_labels(rng_pairs, tree_parent)


def test_fixture_graph(spark, small_edges_np):
    src, dst = small_edges_np
    pairs = sorted({(min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist()) if a != b})
    got_bridges, got_cut, got_bcc, tree_parent = _run(spark, pairs)
    exp_bridges, exp_arts, _ = dfs_low_link(pairs)
    assert got_bridges == exp_bridges
    assert got_cut == exp_arts
    assert got_bcc == expected_bcc_labels(pairs, tree_parent)
