"""Traversal algorithms: BFS levels and SSSP (Bellman-Ford style
min-dist fixpoint) — frontier-based superstep jobs.

Semantics: grape::BFSOpt / grape::SSSPOpt as registered in
coordinator/gscoordinator/builtin/app/.gs_conf.yaml:34-49 and the
nx-compatible bfs_generic / sssp_projected apps
(analytical_engine/apps/bfs/bfs_generic.h,
apps/projected/sssp_projected.h): per-vertex distance from a single
source; unreached vertices get a sentinel (-1 here).

Both are delta-frontier jobs: only vertices whose distance improved
last round relax their out-edges (wcc_projected.h's curr_modified
pattern). BFS is SSSP with unit weights, so one implementation serves
both; level = superstep index.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, functions as F

from linkgraph.engine import SuperstepEngine, SuperstepResult, observed_count
from linkgraph.graph import Graph
from linkgraph.joins import scatter_join, state_join


def sssp(
    graph: Graph,
    source: int,
    weight_col: str | None = None,
    engine: SuperstepEngine | None = None,
    max_iter: int = 10_000,
    num_partitions: int | None = None,
    directed: bool | None = None,
) -> SuperstepResult:
    """Returns state (id: long, dist: double); unreached = -1.0.

    weight_col=None means unit weights (= BFS levels as doubles).
    """
    spark = graph.edges.sparkSession
    eng = engine or SuperstepEngine(spark)
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    use_directed = graph.directed if directed is None else directed

    w = weight_col or graph.weight_col
    cols = ["src", "dst"] + ([w] if w else [])
    base_edges = graph.edges.select(*cols)
    if not use_directed:
        base_edges = Graph.from_edges(base_edges, directed=True).symmetrized_edges()
    edges = (
        base_edges.select(
            "src", "dst", (F.col(w) if w else F.lit(1.0)).cast("double").alias("w")
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))  # parallel edges: keep the lightest
        .repartition(P, "src")
        .persist()
    )
    n_edges = edges.count()

    verts = graph.deduced_vertices()
    n_verts = verts.count()
    INF = float("inf")
    init = verts.select(
        "id",
        F.when(F.col("id") == source, F.lit(0.0)).otherwise(F.lit(INF)).alias("dist"),
        (F.col("id") == source).alias("changed"),
    ).repartition(P, "id")

    def step(state: DataFrame, round_: int):
        frontier = state.where(F.col("changed")).select(
            F.col("id").alias("src"), F.col("dist").alias("sd")
        )
        relax = (
            scatter_join(edges, frontier, "src", n_verts)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("sd") + F.col("w")).alias("cand"))
        )
        new_state = (
            state_join(state, relax)
            .select(
                "id",
                F.least(F.col("dist"), F.coalesce("cand", F.col("dist"))).alias("dist"),
                (F.coalesce("cand", F.lit(INF)) < F.col("dist")).alias("changed"),
            )
        )
        return new_state, observed_count("changed", n_edges)

    result = eng.run(init, step, max_rounds=max_iter)
    result.state = result.state.select(
        "id", F.when(F.col("dist") == INF, F.lit(-1.0)).otherwise(F.col("dist")).alias("dist")
    )
    edges.unpersist()
    return result


def bfs(
    graph: Graph,
    source: int,
    engine: SuperstepEngine | None = None,
    max_iter: int = 10_000,
    num_partitions: int | None = None,
    directed: bool | None = None,
) -> SuperstepResult:
    """BFS levels from source: (id: long, level: long); unreached = -1.

    Unit weights are forced: project_to_simple() keeps the graph's
    weight_col (its `or` fallback cannot express "explicitly None"),
    so the projection is stripped of it here — otherwise sssp's own
    fallback would silently turn BFS levels into weighted distances.
    """
    res = sssp(
        replace(
            graph.project_to_simple(weight_col=None),
            edges=graph.edges.select("src", "dst"),
            weight_col=None,
        ),
        source,
        weight_col=None,
        engine=engine,
        max_iter=max_iter,
        num_partitions=num_partitions,
        directed=directed,
    )
    res.state = res.state.select("id", F.col("dist").cast("long").alias("level"))
    return res


def bfs_tree(
    graph: Graph,
    source: int,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
    directed: bool | None = None,
) -> SuperstepResult:
    """BFS tree from ``source`` — the "predecessors"/"edges" output
    modes of apps/bfs/bfs_generic.h:125-155 (which emit (vertex,
    predecessor) pairs over the BFS tree). Returns state (id: long,
    parent: long, level: long) for every REACHED vertex; the source
    row has parent = NULL. The reference keeps whichever predecessor
    message arrived first (MPI-nondeterministic); here the MINIMUM
    level-(L-1) in-neighbor wins, making the tree deterministic and
    oracle-checkable.

    No extra iteration: the tree is one post-pass join over the
    converged level frame (edges ⋈ levels on both endpoints, keep
    level(src)+1 == level(dst), min(src) per dst).
    """
    res = bfs(graph, source, engine=engine,
              num_partitions=num_partitions, directed=directed)
    spark = graph.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    use_directed = graph.directed if directed is None else directed
    # symmetrize whenever the traversal is undirected (matching
    # _prep_edges): an undirected graph may store one direction per
    # pair, and levels reached via the unstored direction would
    # otherwise get parent = NULL.
    e = (graph.edges if use_directed else graph.symmetrized_edges()) \
        .select("src", "dst").where(F.col("src") != F.col("dst"))

    # res.state is already engine-materialized (localCheckpoint), so
    # the three reads below rescan a cached frame — no extra persist
    levels = res.state.where(F.col("level") >= 0)
    lv_src = levels.select(F.col("id").alias("src"), F.col("level").alias("ls"))
    lv_dst = levels.select(F.col("id").alias("dst"), F.col("level").alias("ld"))
    parents = (
        e.join(lv_src.hint("SHUFFLE_HASH"), "src")
        .join(lv_dst.hint("SHUFFLE_HASH"), "dst")
        .where(F.col("ls") + 1 == F.col("ld"))
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("src").alias("parent"))
    )
    tree = (
        levels.join(parents.hint("SHUFFLE_HASH"), "id", "left")
        .select("id", "parent", "level")
    )
    res.state = tree
    return res
