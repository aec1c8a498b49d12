"""Benchmark harness: headline link-graph jobs on the derived
co-occurrence graph at $SPARK_GRAFT_SF_DIR (default sf0.1), on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is PageRank time-to-convergence (tol 1e-6), the
BASELINE.json criterion; per-superstep edges/sec and the other three
flagship algorithms are reported alongside. Scaling-efficiency
evidence (same job at two parallelism levels) lives in
tools/scaling_bench.py → BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from linkgraph.session import get_spark  # noqa: E402
from linkgraph.tpch_graph import part_graph  # noqa: E402
from linkgraph.algos.pagerank import pagerank  # noqa: E402
from linkgraph.algos.wcc import wcc  # noqa: E402
from linkgraph.algos.cdlp import cdlp  # noqa: E402
from linkgraph.algos.triangles import triangle_corners  # noqa: E402
from linkgraph import pipeline as pl  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(
        app_name="linkgraph-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    g = part_graph(spark, sf_dir)
    g.edges = g.edges.persist()
    n_edges = g.num_edges()
    n_verts = g.num_vertices()

    queries: dict[str, float] = {}
    extra: dict[str, object] = {}

    t0 = time.time()
    pr = pagerank(g, alpha=0.85, max_iter=100, tol=1e-6)
    pr.state.count()
    pr_sec = time.time() - t0
    queries["pagerank_tol1e-6"] = round(pr_sec, 3)
    step_secs = [m["superstep_sec"] for m in pr.metrics]
    per_step = sum(step_secs) / max(1, len(step_secs))
    extra["pagerank_rounds"] = pr.rounds
    extra["pagerank_converged"] = pr.converged
    # directed edges scanned per superstep / mean superstep wall time
    extra["edges_per_sec_per_superstep"] = round(n_edges / per_step, 1)

    t0 = time.time()
    w = wcc(g)
    w.state.count()
    queries["wcc"] = round(time.time() - t0, 3)
    extra["wcc_rounds"] = w.rounds

    t0 = time.time()
    c = cdlp(g, max_round=10)
    c.state.count()
    queries["cdlp_10"] = round(time.time() - t0, 3)

    t0 = time.time()
    n_tri = triangle_corners(g).count()
    queries["triangles"] = round(time.time() - t0, 3)
    extra["n_triangles"] = n_tri

    t0 = time.time()
    from linkgraph.algos.louvain import louvain_phase1
    from linkgraph.graph import Graph
    from linkgraph.tpch_graph import part_edges

    lg = Graph.from_edges(part_edges(spark, sf_dir), directed=True, weight_col="weight")
    lv = louvain_phase1(lg, max_round=4)
    lv.state.count()
    queries["louvain_p1_4"] = round(time.time() - t0, 3)

    t0 = time.time()
    from linkgraph.algos.cores import kshell

    ks = kshell(g)
    ks.state.count()
    queries["kshell"] = round(time.time() - t0, 3)
    extra["kshell_rounds"] = ks.rounds

    t0 = time.time()
    from linkgraph.algos.paths import betweenness_centrality

    srcs = g.deduced_vertices().orderBy("id").limit(16)
    bw = betweenness_centrality(g, sources=srcs, directed=False)
    bw.state.count()
    queries["betweenness_16src"] = round(time.time() - t0, 3)

    t0 = time.time()
    from linkgraph.algos.scc import scc
    from pyspark.sql import functions as F

    e = g.edges.select("src", "dst")
    even = (F.col("src") + F.col("dst")) % 2 == 0
    de = e.select(
        F.when(even, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(even, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )
    sc = scc(Graph.from_edges(de, directed=True))
    sc.state.count()
    queries["scc"] = round(time.time() - t0, 3)
    extra["scc_rounds"] = sc.rounds

    t0 = time.time()
    from linkgraph.algos.biconnectivity import biconnectivity

    bi = biconnectivity(Graph.from_edges(e, directed=False))
    bi.bcc.count(), bi.bridges.count(), bi.cut_points.count()
    queries["biconnectivity"] = round(time.time() - t0, 3)

    t0 = time.time()
    pl.lsh_candidate_pairs(spark, sf_dir).count()
    queries["minhash_lsh"] = round(time.time() - t0, 3)

    t0 = time.time()
    pl.embedding_topk(spark, sf_dir).count()
    queries["embedding_topk"] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "pagerank_time_to_convergence_tol1e-6",
                "value": round(pr_sec, 3),
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
                "n_vertices": n_verts,
                "n_edges_directed": n_edges,
                **extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
