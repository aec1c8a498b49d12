"""Louvain — deterministic synchronous local moves vs the python
oracle (apps/pregel/louvain/louvain.h semantics), plus multi-level
coarsening sanity (modularity must beat the singleton partition and
the CDLP baseline on a planted two-community graph)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from linkgraph import oracle
from linkgraph.algos.louvain import louvain, louvain_phase1, modularity
from linkgraph.graph import Graph


def test_phase1_matches_oracle(spark, small_graph, small_edges_np):
    src, dst = small_edges_np
    g = Graph.from_edges(small_graph, directed=True)
    res = louvain_phase1(g, max_round=4)
    got = {r["id"]: r["community"] for r in res.state.collect()}
    ids, exp = oracle.louvain_local_move(src, dst, max_round=4)
    mism = [(i, got[i], int(x)) for i, x in zip(ids.tolist(), exp.tolist()) if got[i] != x]
    assert not mism, mism[:10]


def test_two_cliques(spark):
    # two 4-cliques joined by a single bridge edge
    import itertools

    e = [(a, b) for a, b in itertools.combinations(range(1, 5), 2)]
    e += [(a, b) for a, b in itertools.combinations(range(5, 9), 2)]
    e += [(4, 5)]
    df = spark.createDataFrame(e, "src long, dst long")
    g = Graph.from_edges(df, directed=True)
    res = louvain(g, max_round=8, max_levels=3)
    comm = {r["id"]: r["community"] for r in res.state.collect()}
    assert len({comm[i] for i in range(1, 5)}) == 1
    assert len({comm[i] for i in range(5, 9)}) == 1
    assert comm[1] != comm[8]
    q = modularity(g, res.state)
    assert q > 0.3  # optimal here is ~0.423; singleton partition is < 0


def test_multilevel_improves_modularity(spark, small_graph):
    g = Graph.from_edges(small_graph, directed=True)
    lv = louvain(g, max_round=6, max_levels=4)
    q_louvain = modularity(g, lv.state)
    singleton = g.deduced_vertices().select("id", F.col("id").alias("community"))
    q_single = modularity(g, singleton)
    assert q_louvain > q_single
    assert q_louvain > 0.0
