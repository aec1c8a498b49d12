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
