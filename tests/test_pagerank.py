"""PageRank golden tests — allclose 1e-6 vs the numpy oracle, the
validation style of python/graphscope/tests/unittest/test_app.py:206-215."""

from __future__ import annotations

import numpy as np
import pandas as pd

from linkgraph import oracle
from linkgraph.algos.pagerank import pagerank
from linkgraph.graph import Graph


def _check(result_df, ids, ranks, atol=1e-6):
    pdf = result_df.toPandas().sort_values("id").reset_index(drop=True)
    golden = pd.DataFrame({"id": ids, "rank": ranks}).sort_values("id").reset_index(drop=True)
    assert len(pdf) == len(golden)
    assert (pdf["id"].to_numpy() == golden["id"].to_numpy()).all()
    assert np.allclose(pdf["rank"].to_numpy(), golden["rank"].to_numpy(), atol=atol)
    # probability distribution: sums to 1
    assert abs(pdf["rank"].sum() - 1.0) < 1e-9


def test_pagerank_directed(spark, small_graph, small_edges_np):
    src, dst = small_edges_np
    g = Graph.from_edges(small_graph, directed=True)
    res = pagerank(g, alpha=0.85, max_iter=100, tol=1e-6)
    assert res.converged
    ids, ranks = oracle.pagerank(src, dst, directed=True, alpha=0.85, max_iter=100, tol=1e-6)
    _check(res.state, ids, ranks)


def test_pagerank_undirected(spark, small_graph, small_edges_np):
    src, dst = small_edges_np
    g = Graph.from_edges(small_graph, directed=False).to_undirected()
    res = pagerank(g, alpha=0.85, max_iter=100, tol=1e-6)
    assert res.converged
    ids, ranks = oracle.pagerank(src, dst, directed=False, alpha=0.85, max_iter=100, tol=1e-6)
    _check(res.state, ids, ranks)


def test_pagerank_dangling_mass(spark):
    # a 3-chain with a dangling sink: 1->2->3; node 3 redistributes
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    g = Graph.from_edges(e, directed=True)
    res = pagerank(g, tol=1e-10)
    ids, ranks = oracle.pagerank([1, 2], [2, 3], directed=True, tol=1e-10)
    _check(res.state, ids, ranks, atol=1e-9)


def test_pagerank_metrics_recorded(spark, small_graph):
    g = Graph.from_edges(small_graph, directed=True)
    res = pagerank(g, max_iter=5, tol=0.0)
    assert res.rounds == 5 and not res.converged
    assert all("l1_delta" in m and "edges_processed" in m for m in res.metrics)
    # l1 deltas shrink monotonically-ish; at least final < first
    assert res.metrics[-1]["l1_delta"] < res.metrics[0]["l1_delta"]
