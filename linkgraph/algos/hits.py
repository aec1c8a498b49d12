"""HITS hubs & authorities.

Semantics per analytical_engine/apps/hits/hits.h (gs::HITS, registry
.gs_conf.yaml:123-130): alternating power iteration on the directed
graph with L2 normalization of both vectors every round (the Sum
collectives at hits.h:163-178), stopping when the L1 change of the
authority vector falls below `tol` or after max_iter rounds.

Per superstep: two aggregations (auth from in-edges of hubs, hub from
out-edges of auths) + two scalar L2 norms — all one collect()."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.engine import SuperstepEngine, SuperstepResult
from linkgraph.graph import Graph


def hits(
    graph: Graph,
    max_iter: int = 100,
    tol: float = 1e-8,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """Returns state (id: long, hub: double, auth: double), both
    L2-normalized."""
    spark = graph.edges.sparkSession
    eng = engine or SuperstepEngine(spark)
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    edges = (
        graph.edges.select("src", "dst")
        .dropDuplicates(["src", "dst"])
        .repartition(P, "src")
        .persist()
    )
    n_edges = edges.count()
    verts = graph.deduced_vertices()
    n = verts.count()
    if n == 0:
        return SuperstepResult(
            state=verts.select("id", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")),
            rounds=0, converged=True,
        )

    init = verts.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")).repartition(P, "id")

    def step(state: DataFrame, round_: int):
        state = state.drop("prev_hub", "prev_auth")
        # auth'[v] = Σ_{u→v} hub[u], then L2 normalize
        raw_auth = (
            edges.join(state.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("ra"))
        )
        with_auth = state.join(raw_auth, "id", "left").select(
            "id", F.col("hub").alias("prev_hub"), F.col("auth").alias("prev_auth"),
            F.coalesce("ra", F.lit(0.0)).alias("ra"),
        )
        # hub'[u] = Σ_{u→v} auth'[v] (using the un-normalized auth';
        # normalization constants factor out and are applied jointly)
        raw_hub = (
            edges.join(with_auth.select(F.col("id").alias("dst"), F.col("ra")), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("ra").alias("rh"))
        )
        combined = with_auth.join(raw_hub, "id", "left").select(
            "id", "prev_hub", "prev_auth", "ra", F.coalesce("rh", F.lit(0.0)).alias("rh")
        ).persist()
        norms = combined.agg(
            F.sqrt(F.sum(F.col("ra") * F.col("ra"))).alias("na"),
            F.sqrt(F.sum(F.col("rh") * F.col("rh"))).alias("nh"),
        ).collect()[0]
        na = norms["na"] or 1.0
        nh = norms["nh"] or 1.0
        na = na if na > 0 else 1.0
        nh = nh if nh > 0 else 1.0
        new_state = combined.select(
            "id",
            (F.col("rh") / nh).alias("hub"),
            (F.col("ra") / na).alias("auth"),
            "prev_hub",
            "prev_auth",
        )

        def finalize(df: DataFrame) -> dict:
            # L1 change of BOTH vectors, like the reference's paired
            # Sum collectives (hits.h:163-178)
            eps = df.agg(
                F.sum(
                    F.abs(F.col("hub") - F.col("prev_hub"))
                    + F.abs(F.col("auth") - F.col("prev_auth"))
                ).alias("e")
            ).collect()[0]["e"] or 0.0
            combined.unpersist()
            return {
                "halt": eps < tol,
                "l1_delta": eps,
                "edges_processed": n_edges,
            }

        return new_state, finalize

    result = eng.run(init, step, max_rounds=max_iter)
    result.state = result.state.select("id", "hub", "auth")
    edges.unpersist()
    return result
