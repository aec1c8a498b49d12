"""k-core and k-shell decomposition.

Semantics per analytical_engine/apps/kcore/kcore.h (iterative
degree-prune: repeatedly delete vertices with degree < k on the
undirected simple graph; survivors form the k-core) and
apps/kshell/kshell.h (shell index = largest k whose k-core contains
the vertex).

The prune loop is a frontier job: each round removes vertices whose
remaining degree dropped below k; only neighbors of removed vertices
need their degree re-checked. Implemented dense (full recount per
round) — the recount is one groupBy over the shrinking edge set, and
AQE coalesces as it shrinks."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.engine import SuperstepEngine, SuperstepResult
from linkgraph.graph import Graph


def _und_edges(graph: Graph, P: int) -> DataFrame:
    return (
        graph.symmetrized_edges()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(P, "src")
    )


def kcore(
    graph: Graph,
    k: int,
    engine: SuperstepEngine | None = None,
    max_iter: int = 10_000,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """Returns state (id: long, in_core: boolean) — membership of the
    k-core (vertices with no incident edge are never in a k≥1 core)."""
    spark = graph.edges.sparkSession
    eng = engine or SuperstepEngine(spark)
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    all_verts = graph.deduced_vertices().persist()
    edges0 = _und_edges(graph, P).persist()
    n_edges = edges0.count()

    # state: surviving vertex set (id); edges induced on it each round
    init = all_verts.select("id")
    edge_box = {"e": edges0}

    def step(state: DataFrame, round_: int):
        e = edge_box["e"]
        deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
        keep = deg.where(F.col("d") >= k).select("id")
        survivors = state.join(keep, "id", "left_semi")
        removed = state.count() - survivors.count()
        if removed > 0:
            new_e = (
                e.join(survivors.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(survivors.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst")
                .persist()
            )
            new_e.count()
            if edge_box["e"] is not edges0:
                edge_box["e"].unpersist()
            edge_box["e"] = new_e
        return survivors, {
            "halt": removed == 0,
            "removed": int(removed),
            "edges_processed": n_edges,
        }

    result = eng.run(init, step, max_rounds=max_iter)
    core_ids = result.state
    result.state = all_verts.join(
        core_ids.select("id", F.lit(True).alias("in_core")), "id", "left"
    ).select("id", F.coalesce("in_core", F.lit(False)).alias("in_core"))
    if edge_box["e"] is not edges0:
        edge_box["e"].unpersist()
    edges0.unpersist()
    return result


def kshell(
    graph: Graph,
    max_k: int = 64,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Shell index per vertex: (id: long, shell: long) — the largest k
    such that the vertex is in the k-core. Driver loop over k
    (kshell.h's peeling), each level reusing the kcore prune."""
    verts = graph.deduced_vertices()
    spark = graph.edges.sparkSession
    shell = verts.select("id", F.lit(0).cast("long").alias("shell"))
    for k in range(1, max_k + 1):
        res = kcore(graph, k, engine=engine, num_partitions=num_partitions)
        members = res.state.where(F.col("in_core"))
        n = members.count()
        if n == 0:
            break
        shell = (
            shell.join(members.select("id", F.lit(k).cast("long").alias("k")), "id", "left")
            .select("id", F.coalesce("k", "shell").alias("shell"))
        )
    return shell
