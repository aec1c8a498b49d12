"""Property-based tests (hypothesis) over random small graphs.

Fixed-fixture oracle tests pin known graphs; these generate adversarial
ones — duplicate edges, self-loops, isolated pairs, and SPARSE ids (the
exact shape that broke MIS priorities and SCC label mixing in round 3's
advisor repros). Each property compares the Spark result against an
independent pure-Python oracle, or checks the defining invariant of the
output directly.

derandomize=True keeps the suite deterministic run-to-run; max_examples
is small because every example is a full iterative Spark job.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

# sparse, gappy id domain — ids are NOT dense in [0, n)
IDS = [0, 1, 2, 3, 5, 8, 13, 21, 34, 10_000_019, 99_999_999_999]

edge_lists = st.lists(
    st.tuples(st.sampled_from(IDS), st.sampled_from(IDS)),
    min_size=1,
    max_size=22,
)

SET = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, edges):
    return spark.createDataFrame(
        [(int(s), int(d)) for (s, d) in edges], "src long, dst long"
    )


def _union_find_components(edges):
    """Min-member component labels over the UNDIRECTED simple graph."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        find(s), find(d)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in parent}


def _tarjan_scc(edges):
    """Min-member SCC labels (recursive Tarjan; graphs here are tiny)."""
    adj = {}
    verts = set()
    for s, d in edges:
        verts.update((s, d))
        if s != d:
            adj.setdefault(s, set()).add(d)
    index, low, on, stack, comp = {}, {}, set(), [], {}
    counter = [0]

    def strong(v):
        index[v] = low[v] = counter[0]
        counter[0] += 1
        stack.append(v)
        on.add(v)
        for w in adj.get(v, ()):
            if w not in index:
                strong(w)
                low[v] = min(low[v], low[w])
            elif w in on:
                low[v] = min(low[v], index[w])
        if low[v] == index[v]:
            members = []
            while True:
                w = stack.pop()
                on.discard(w)
                members.append(w)
                if w == v:
                    break
            m = min(members)
            for w in members:
                comp[w] = m

    for v in sorted(verts):
        if v not in index:
            strong(v)
    return comp


def _sym_simple(edges):
    """Undirected simple adjacency (no self-loops)."""
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    return adj


@given(edges=edge_lists)
@SET
def test_wcc_matches_union_find(spark, edges):
    from linkgraph.algos.wcc import wcc
    from linkgraph.graph import Graph

    got = {
        (r["id"], r["comp"])
        for r in wcc(Graph.from_edges(_df(spark, edges), directed=True)).state.collect()
    }
    want = set(_union_find_components(edges).items())
    assert got == want


@given(edges=edge_lists)
@SET
def test_scc_matches_tarjan(spark, edges):
    from linkgraph.algos.scc import scc
    from linkgraph.graph import Graph

    got = {
        (r["id"], r["scc"])
        for r in scc(Graph.from_edges(_df(spark, edges), directed=True)).state.collect()
    }
    want = set(_tarjan_scc(edges).items())
    assert got == want


@given(edges=edge_lists)
@SET
def test_mis_is_independent_and_maximal(spark, edges):
    from linkgraph.algos.matching import mis
    from linkgraph.graph import Graph

    res = mis(Graph.from_edges(_df(spark, edges), directed=False))
    assert res.converged
    chosen = {r["id"] for r in res.state.where("in_mis").collect()}
    adj = _sym_simple(edges)
    verts = {v for (s, d) in edges for v in (s, d)}
    # independent: no two chosen vertices adjacent
    for v in chosen:
        assert not (adj.get(v, set()) & chosen)
    # maximal: every unchosen vertex has a chosen neighbor
    for v in verts - chosen:
        assert adj.get(v, set()) & chosen, f"{v} could join the set"


@given(edges=edge_lists)
@SET
def test_greedy_color_is_proper_and_degree_bounded(spark, edges):
    from linkgraph.algos.coloring import greedy_color
    from linkgraph.graph import Graph

    res = greedy_color(Graph.from_edges(_df(spark, edges), directed=False))
    assert res.converged
    color = {r["id"]: r["color"] for r in res.state.collect()}
    adj = _sym_simple(edges)
    for v, nbrs in adj.items():
        for u in nbrs:
            assert color[v] != color[u]
        assert 0 <= color[v] <= len(nbrs)


@given(edges=edge_lists, cut=st.integers(min_value=1, max_value=20))
@SET
def test_incremental_wcc_equals_batch_wcc(spark, tmp_path_factory, edges, cut):
    """Any 2-way split of the edge log, merged batch-by-batch, yields
    exactly the labels of batch wcc() over the whole log."""
    from linkgraph.streaming import merge_edges_into_components, wcc_snapshot

    state = str(tmp_path_factory.mktemp("incr") / "state")
    k = min(cut, len(edges))
    for batch in (edges[:k], edges[k:]):
        if batch:
            merge_edges_into_components(_df(spark, batch), state, retain_snapshots=2)
    got = {(r["id"], r["comp"]) for r in wcc_snapshot(spark, state).collect()}
    want = set(_union_find_components(edges).items())
    assert got == want


@given(edges=edge_lists)
@SET
def test_pagerank_allclose_1e6_vs_numpy(spark, edges):
    """The north-rule parity clause: per-vertex scores within 1e-6 of
    the golden implementation, on arbitrary graphs (dangling vertices,
    self-loops, duplicates)."""
    from linkgraph import oracle
    from linkgraph.algos.pagerank import pagerank
    from linkgraph.graph import Graph

    res = pagerank(Graph.from_edges(_df(spark, edges), directed=True), tol=1e-9)
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    ids, rank = oracle.pagerank(
        [s for s, _ in edges], [d for _, d in edges], directed=True, tol=1e-9
    )
    want = dict(zip(ids.tolist(), rank.tolist()))
    assert set(got) == set(want)
    for v, w in want.items():
        assert abs(got[v] - w) <= 1e-6, (v, got[v], w)


@given(edges=edge_lists)
@SET
def test_triangles_match_numpy(spark, edges):
    from linkgraph import oracle
    from linkgraph.algos.triangles import triangles
    from linkgraph.graph import Graph

    got = {
        (r["id"], r["tri"])
        for r in triangles(Graph.from_edges(_df(spark, edges), directed=False)).collect()
    }
    ids, cnt = oracle.triangles([s for s, _ in edges], [d for _, d in edges])
    want = set(zip(ids.tolist(), cnt.tolist()))
    assert got == want


@given(edges=edge_lists)
@SET
def test_kshell_matches_sequential_peel(spark, edges):
    from linkgraph import oracle
    from linkgraph.algos.cores import kshell
    from linkgraph.graph import Graph

    res = kshell(Graph.from_edges(_df(spark, edges), directed=False))
    got = {(r["id"], r["shell"]) for r in res.state.collect()}
    ids, core = oracle.core_numbers([s for s, _ in edges], [d for _, d in edges])
    want = set(zip(ids.tolist(), core.tolist()))
    assert got == want
