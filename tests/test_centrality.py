"""Eigenvector / Katz centrality vs numpy oracles."""

from __future__ import annotations

import numpy as np

from linkgraph import oracle
from linkgraph.algos.centrality import eigenvector_centrality, katz_centrality
from linkgraph.graph import Graph


def _by_id(df):
    pdf = df.toPandas().sort_values("id").reset_index(drop=True)
    return pdf["id"].to_numpy(np.int64), pdf["centrality"].to_numpy()


def test_eigenvector_matches_oracle(spark, small_graph, small_edges_np):
    src, dst = small_edges_np
    g = Graph.from_edges(small_graph, directed=True)
    res = eigenvector_centrality(g, max_iter=50, tol=1e-8)
    ids, x = oracle.eigenvector_centrality(src, dst, directed=True, max_iter=50, tol=1e-8)
    got_ids, got = _by_id(res.state)
    assert (got_ids == ids).all()
    assert np.allclose(got, x, atol=1e-6)


def test_katz_matches_oracle(spark, small_graph, small_edges_np):
    src, dst = small_edges_np
    g = Graph.from_edges(small_graph, directed=True)
    res = katz_centrality(g, alpha=0.05, beta=1.0, max_iter=50, tol=1e-10)
    ids, x = oracle.katz_centrality(src, dst, alpha=0.05, beta=1.0, directed=True,
                                    max_iter=50, tol=1e-10)
    got_ids, got = _by_id(res.state)
    assert (got_ids == ids).all()
    assert np.allclose(got, x, atol=1e-8)
    # L2 normalized
    assert abs(np.linalg.norm(got) - 1.0) < 1e-9
