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
