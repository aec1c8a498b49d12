"""CSR-block vectorized PageRank — must match the numpy oracle (and
therefore the join-mode implementation) at allclose 1e-6."""

from __future__ import annotations

import numpy as np

from linkgraph import oracle
from linkgraph.csr import adjacency_blocks, pagerank_csr
from linkgraph.graph import Graph


def test_adjacency_blocks_roundtrip(spark):
    e = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src long, dst long")
    adj = {r["src"]: sorted(r["nbrs"]) for r in adjacency_blocks(e, 4).collect()}
    assert adj == {1: [2, 3], 2: [3]}


def test_pagerank_csr_matches_oracle(spark, small_graph, small_edges_np):
    src, dst = small_edges_np
    g = Graph.from_edges(small_graph, directed=True)
    res = pagerank_csr(g, alpha=0.85, max_iter=100, tol=1e-6)
    assert res.converged
    ids, ranks = oracle.pagerank(src, dst, directed=True, alpha=0.85, max_iter=100, tol=1e-6)
    pdf = res.state.toPandas().sort_values("id").reset_index(drop=True)
    assert (pdf["id"].to_numpy() == ids).all()
    assert np.allclose(pdf["rank"].to_numpy(), ranks, atol=1e-6)
    assert all(m.get("mode") == "csr" for m in res.metrics)


def test_pagerank_csr_dangling(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    res = pagerank_csr(Graph.from_edges(e, directed=True), tol=1e-10)
    ids, ranks = oracle.pagerank([1, 2], [2, 3], directed=True, tol=1e-10)
    pdf = res.state.toPandas().sort_values("id").reset_index(drop=True)
    assert np.allclose(pdf["rank"].to_numpy(), ranks, atol=1e-9)


def test_pagerank_csr_hub_split_path(spark, small_graph, small_edges_np):
    """Plant an out-hub above the split threshold so the broadcast
    hub-block path executes, and check ranks against the oracle."""
    import numpy as np
    from pyspark.sql import functions as F
    from linkgraph import oracle
    from linkgraph.csr import pagerank_csr
    from linkgraph.graph import Graph

    src, dst = small_edges_np
    hub_targets = np.arange(1, 101)
    hub = spark.createDataFrame(
        [(1000, int(t)) for t in hub_targets], "src long, dst long"
    )
    e = small_graph.unionByName(hub)
    g = Graph.from_edges(e, directed=True)
    res = pagerank_csr(g, max_iter=20, tol=0.0, hub_degree=50)  # hub path active
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    s2 = np.concatenate([src, np.full(100, 1000)])
    d2 = np.concatenate([dst, hub_targets])
    ids, rank = oracle.pagerank(s2, d2, max_iter=20, tol=0.0)
    for i, v in zip(ids.tolist(), rank.tolist()):
        assert abs(got[i] - v) < 1e-9


def test_wcc_csr_matches_join_path(spark):
    """wcc_csr must produce the exact label set of algos.wcc on sparse
    arbitrary ids, multiple components, self-loops and an isolated pair."""
    from linkgraph.algos.wcc import wcc
    from linkgraph.csr import wcc_csr

    edges = [(100, 2), (2, 300), (7, 8), (8, 9), (9, 7), (42, 42), (1000000, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edges(e, directed=True)
    a = {r["id"]: r["comp"] for r in wcc(g).state.collect()}
    res = wcc_csr(g)
    b = {r["id"]: r["comp"] for r in res.state.collect()}
    assert a == b
    assert res.converged
    assert all(m.get("mode") == "csr" for m in res.metrics)


def test_wcc_csr_hub_split_path(spark):
    """Hub above the split threshold: the broadcast hub-block path must
    carry labels identically to the join path."""
    from linkgraph.algos.wcc import wcc
    from linkgraph.csr import wcc_csr

    he = [(0, i) for i in range(1, 200)] + [(500, 501)]
    g = Graph.from_edges(
        spark.createDataFrame(he, "src long, dst long"), directed=True
    )
    a = {r["id"]: r["comp"] for r in wcc(g).state.collect()}
    b = {r["id"]: r["comp"] for r in wcc_csr(g, hub_degree=50).state.collect()}
    assert a == b


def test_scatter_kernel_min_combine():
    """The min-combining Arrow kernel pre-combines per destination and
    keeps the input integer types end-to-end."""
    import pyarrow as pa

    from linkgraph.csr import make_scatter_kernel

    batch = pa.RecordBatch.from_pydict(
        {
            "nbrs": pa.array([[2, 3], [3], [2]], type=pa.list_(pa.int32())),
            "odeg": pa.array([2, 1, 1], type=pa.int32()),
            "w": pa.array([10, 7, 99], type=pa.int32()),
        }
    )
    out = list(make_scatter_kernel("min")([batch]))
    rows = {}
    for b in out:
        d = b.to_pydict()
        for k, v in zip(d["dst"], d["c"]):
            rows[k] = min(v, rows.get(k, v))
        assert b.schema.field("dst").type == pa.int32()
    assert rows == {2: 10, 3: 7}


def test_sssp_csr_matches_join_path(spark):
    """sssp_csr (min-plus kernel over weighted adjacency blocks) must
    match algos.sssp exactly: weighted undirected graph with parallel
    edges (lightest wins), a self-loop, an unreached island (-1.0) and
    sparse arbitrary ids."""
    from linkgraph.algos.traversal import sssp
    from linkgraph.csr import sssp_csr

    edges = [
        (100, 2, 1.0),
        (100, 2, 5.0),  # parallel edge: the lighter one must win
        (2, 300, 2.5),
        (300, 7, 0.5),
        (7, 100, 10.0),
        (42, 42, 3.0),  # self-loop: dropped
        (1000000, 5, 1.0),  # island, unreached from source
    ]
    e = spark.createDataFrame(edges, "src long, dst long, w double")
    g = Graph.from_edges(e, directed=False, weight_col="w")
    a = {r["id"]: r["dist"] for r in sssp(g, source=2, weight_col="w").state.collect()}
    res = sssp_csr(g, source=2, weight_col="w")
    b = {r["id"]: r["dist"] for r in res.state.collect()}
    assert a == b
    assert b[2] == 0.0 and b[100] == 1.0 and b[300] == 2.5 and b[7] == 3.0
    assert b[1000000] == -1.0 and b[5] == -1.0
    assert res.converged
    assert all(m.get("mode") == "csr" for m in res.metrics)


def test_sssp_csr_directed_unit_weights(spark):
    """Directed graph, no weight column → unit weights (BFS distances);
    back-edges must not relax."""
    from linkgraph.csr import sssp_csr

    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long")
    g = Graph.from_edges(e, directed=True)
    got = {r["id"]: r["dist"] for r in sssp_csr(g, source=1).state.collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 2.0, 4: -1.0}


def test_sssp_csr_hub_split_path(spark):
    """A weighted hub above the split threshold: broadcast hub blocks
    must relax identically to the join path."""
    from linkgraph.algos.traversal import sssp
    from linkgraph.csr import sssp_csr

    he = [(0, i, float(i % 7) + 0.5) for i in range(1, 200)] + [(3, 500, 1.0)]
    e = spark.createDataFrame(he, "src long, dst long, w double")
    g = Graph.from_edges(e, directed=True, weight_col="w")
    a = {r["id"]: r["dist"] for r in sssp(g, source=0, weight_col="w").state.collect()}
    b = {
        r["id"]: r["dist"]
        for r in sssp_csr(g, source=0, weight_col="w", hub_degree=50).state.collect()
    }
    assert a == b


def test_cdlp_csr_matches_join_path(spark):
    """cdlp_csr (label-count kernel) must reproduce algos.cdlp exactly:
    same most-frequent/min-tie labels on a two-community graph with
    sparse ids, a self-loop and an isolated vertex."""
    from linkgraph.algos.cdlp import cdlp
    from linkgraph.csr import cdlp_csr

    edges = [
        (10, 20), (20, 30), (10, 30),          # triangle community
        (100, 200), (200, 300), (100, 300),    # second triangle
        (30, 100),                              # weak bridge
        (7, 7),                                 # self-loop: ignored
        (555, 556),                              # pendant pair
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edges(e, directed=True)
    for rounds in (1, 3, 10):
        a = {r["id"]: r["label"] for r in cdlp(g, max_round=rounds).state.collect()}
        res = cdlp_csr(g, max_round=rounds)
        b = {r["id"]: r["label"] for r in res.state.collect()}
        assert a == b, f"rounds={rounds}"
    assert all(m.get("mode") == "csr" for m in res.metrics)


def test_cdlp_csr_hub_split_path(spark):
    """Star hub above the split threshold: broadcast hub blocks must
    produce the identical label fixpoint."""
    from linkgraph.algos.cdlp import cdlp
    from linkgraph.csr import cdlp_csr

    he = [(0, i) for i in range(1, 120)] + [(1, 2), (2, 3)]
    e = spark.createDataFrame(he, "src long, dst long")
    g = Graph.from_edges(e, directed=False)
    a = {r["id"]: r["label"] for r in cdlp(g, max_round=5).state.collect()}
    b = {
        r["id"]: r["label"]
        for r in cdlp_csr(g, max_round=5, hub_degree=50).state.collect()
    }
    assert a == b


def test_csr_kernels_on_int32_compacted_ids(spark):
    """All four kernels must run end-to-end on an int32-compacted edge
    table (the tuned at-scale layout): 4-byte keys through the kernel
    schemas, results matching the long-id run after mapping back."""
    from linkgraph.algos.cdlp import cdlp
    from linkgraph.csr import cdlp_csr, pagerank_csr, sssp_csr, wcc_csr
    from linkgraph.etl import compact_vertex_ids

    edges = [(100, 2), (2, 300), (300, 100), (7, 8), (8, 9), (100, 7)]
    e = spark.createDataFrame(edges, "src long, dst long")
    ce, mp = compact_vertex_ids(e, num_partitions=4)
    assert dict(ce.dtypes)["src"] == "int"
    fwd = {r["id"]: r["cid"] for r in mp.collect()}
    g_long = Graph.from_edges(e, directed=True)
    g_int = Graph.from_edges(ce, directed=True)

    pr_l = {r["id"]: r["rank"] for r in pagerank_csr(g_long, max_iter=15, tol=0.0).state.collect()}
    pr_i = {r["id"]: r["rank"] for r in pagerank_csr(g_int, max_iter=15, tol=0.0).state.collect()}
    for v, cid in fwd.items():
        assert abs(pr_l[v] - pr_i[cid]) < 1e-12

    wc_l = {r["id"]: r["comp"] for r in wcc_csr(g_long).state.collect()}
    wc_i = {r["id"]: r["comp"] for r in wcc_csr(g_int).state.collect()}
    # component labels are min member ids — compare the partitions, not labels
    from collections import defaultdict
    part_l, part_i = defaultdict(set), defaultdict(set)
    for v, c in wc_l.items():
        part_l[c].add(fwd[v])
    for v, c in wc_i.items():
        part_i[c].add(v)
    assert sorted(map(frozenset, part_l.values())) == sorted(map(frozenset, part_i.values()))

    cd_l = {r["id"]: r["label"] for r in cdlp(g_long, max_round=5).state.collect()}
    cd_i = {r["id"]: r["label"] for r in cdlp_csr(g_int, max_round=5).state.collect()}
    assert dict(cdlp_csr(g_int, max_round=5).state.dtypes)["label"] == "int"
    # label partitions must agree (labels themselves are id-space-relative);
    # compacting preserves id ORDER (dense rank), so min-tie-breaks agree
    lp_l, lp_i = defaultdict(set), defaultdict(set)
    for v, c in cd_l.items():
        lp_l[c].add(fwd[v])
    for v, c in cd_i.items():
        lp_i[c].add(v)
    assert sorted(map(frozenset, lp_l.values())) == sorted(map(frozenset, lp_i.values()))

    ss_l = {r["id"]: r["dist"] for r in sssp_csr(g_long, source=100).state.collect()}
    ss_i = {r["id"]: r["dist"] for r in sssp_csr(g_int, source=fwd[100]).state.collect()}
    for v, cid in fwd.items():
        assert ss_l[v] == ss_i[cid]
