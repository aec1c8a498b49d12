"""SCC — multi-pivot forward/backward colouring vs an iterative
python Tarjan oracle (flash/connectivity/scc.h semantics: label =
min vertex id of the component)."""

from __future__ import annotations

import numpy as np

from linkgraph.algos.scc import scc
from linkgraph.graph import Graph


def tarjan_min_label(src: np.ndarray, dst: np.ndarray) -> dict[int, int]:
    """Iterative Tarjan; component label = min member id."""
    verts = sorted(set(src.tolist()) | set(dst.tolist()))
    adj: dict[int, list[int]] = {v: [] for v in verts}
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            adj[a].append(b)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]
    for root in verts:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                lbl = min(comp)
                for w in comp:
                    out[w] = lbl
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    res = scc(Graph.from_edges(df, directed=True))
    got = {r["id"]: r["scc"] for r in res.state.collect()}
    src = np.array([a for a, _ in edges])
    dst = np.array([b for _, b in edges])
    exp = tarjan_min_label(src, dst)
    assert got == exp


def test_scc_hand_graph(spark):
    # two 3-cycles bridged by a one-way edge, plus a dangling tail
    edges = [(1, 2), (2, 3), (3, 1),
             (3, 4),
             (4, 5), (5, 6), (6, 4),
             (6, 7), (7, 8)]
    _check(spark, edges)


def test_scc_random(spark, small_edges_np):
    src, dst = small_edges_np
    # parity-flip half the directions so real multi-vertex SCCs form
    edges = [
        ((int(a), int(b)) if (a + b) % 2 == 0 else (int(b), int(a)))
        for a, b in zip(src.tolist(), dst.tolist()) if a != b
    ]
    _check(spark, edges)


def test_scc_all_singletons(spark):
    # a DAG: every SCC is a singleton labelled by itself
    edges = [(i, i + 1) for i in range(1, 8)]
    _check(spark, edges)


def test_scc_mixed_colour_messages(spark):
    # Regression (ADVICE r3): vertex 10 receives a foreign label (5,
    # via 11) and its own-colour label in the same backward round; a
    # bare min-agg kept the foreign one and 10 was never assigned,
    # splitting the {5,10,11} SCC. Tarjan: scc(10) = 5.
    edges = [(3, 6), (6, 3), (5, 10), (10, 11), (11, 5), (10, 6)]
    _check(spark, edges)


def test_scc_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    res = scc(Graph.from_edges(df, directed=True))
    assert res.state.count() == 0
    assert res.converged
