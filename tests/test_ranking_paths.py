"""VoteRank / lpa_u2i / DFS / path enumeration tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from linkgraph.algos.bipartite import lpa_u2i
from linkgraph.algos.pathenum import all_simple_paths, dfs, is_simple_path, sampling_path
from linkgraph.algos.ranking import voterank
from linkgraph.graph import Graph


def _py_dfs(edge_list, source, directed):
    adj: dict[int, set] = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    rank, parent = {source: 0}, {source: source}
    stack = [(source, iter(sorted(adj.get(source, ()))))]
    nxt = 1
    while stack:
        v, it = stack[-1]
        moved = False
        for u in it:
            if u not in rank:
                rank[u] = nxt
                parent[u] = v
                nxt += 1
                stack.append((u, iter(sorted(adj.get(u, ())))))
                moved = True
                break
        if not moved:
            stack.pop()
    return rank, parent


def test_dfs_matches_python(spark, small_graph, small_edges_np):
    src, dst = small_edges_np
    g = Graph.from_edges(small_graph, directed=True)
    source = int(min(src.min(), dst.min()))
    got = {r["id"]: (r["rank"], r["parent"]) for r in dfs(g, source, directed=False).collect()}
    # dedup edge list like the Spark side does
    edge_list = sorted(set(zip(src.tolist(), dst.tolist())))
    rank, parent = _py_dfs(edge_list, source, directed=False)
    assert got == {v: (rank[v], parent[v]) for v in rank}


def test_voterank_deterministic_and_distinct(spark, small_graph):
    g = Graph.from_edges(small_graph, directed=True)
    out1 = sorted(tuple(r) for r in voterank(g, num_seeds=5, directed=False).collect())
    out2 = sorted(tuple(r) for r in voterank(g, num_seeds=5, directed=False).collect())
    assert out1 == out2
    ids = [i for i, _ in out1]
    assert len(ids) == len(set(ids)) == 5
    # the first elected seed is a max-degree vertex (all abilities equal)
    deg = dict(
        small_graph.select(F.col("src").alias("id"))
        .unionAll(small_graph.select(F.col("dst").alias("id")))
        .groupBy("id").count().collect()
    )
    first = [i for i, r in out1 if r == 1][0]
    # degree on the deduped undirected view
    und = {(a, b) for a, b in set(
        [tuple(x) for x in small_graph.collect()]
    )}
    adj: dict[int, set] = {}
    for a, b in und:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    degs = {v: len(s) for v, s in adj.items()}
    assert degs[first] == max(degs.values())


def test_lpa_u2i_clamps_and_averages(spark):
    be = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12), (3, 11)], "user long, item long"
    )
    ul = spark.createDataFrame([(1, 1.0), (2, 0.5), (3, 0.0)], "user long, label double")
    out = {r["user"]: r["label"] for r in lpa_u2i(be, ul, max_round=3).state.collect()}
    assert out[1] == 1.0 and out[3] == 0.0  # seeds stay clamped
    # user 2 only shares items with user 1 -> converges to 1.0
    assert abs(out[2] - 1.0) < 1e-9


def test_path_enum_tiny(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (2, 5)], "src long, dst long")
    g = Graph.from_edges(e, directed=True)
    vl = spark.createDataFrame([(i, i % 2) for i in range(1, 6)], "id long, vl long")
    paths = sorted(tuple(r) for r in sampling_path(g, vl, [1, 0, 1]).collect())
    assert paths == [(1, 2, 3), (1, 2, 5)]
    assert is_simple_path(g, [1, 2, 3])
    assert not is_simple_path(g, [1, 3])
    asp = sorted(tuple(r["path"]) for r in all_simple_paths(g, 1, 4, cutoff=3).collect())
    assert asp == [(1, 2, 3, 4)]
