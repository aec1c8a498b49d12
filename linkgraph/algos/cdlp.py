"""CDLP — community detection by label propagation (LDBC semantics).

Semantics per the reference: python/graphscope/analytical/app/lpa.py:29-54
(`lpa(graph, max_round=10)`, alias cdlp at lpa.py:86) and the Flash
variant apps/flash/clustering/lpa.h:47-77 — init label[v] = v;
synchronous rounds; each vertex adopts the MOST FREQUENT label among
its neighbors with ties broken by MINIMUM label; stop after max_round
rounds or when no label changes. Isolated vertices keep their own
label. Undirected view (both edge directions, DEDUPED — a u↔v pair
counts each neighbor's label once; the numpy oracle and the DuckDB
gate oracle encode the same interpretation).

Spark plan per superstep — two aggregations, no window function:
  edges ⋈ state on dst  →  groupBy(src, label).count()   (histogram)
  →  groupBy(src).max(struct(cnt, -label))                (argmax)
The struct-max encodes "max count, then min label" deterministically —
never a nondeterministic first() (SURVEY.md §7.3 tie-break risk).
Both aggregations get map-side partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.engine import Observed, SuperstepEngine, SuperstepResult
from linkgraph.graph import Graph
from linkgraph.joins import scatter_join, state_join


def cdlp(
    graph: Graph,
    max_round: int = 10,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """Returns state (id: long, label: long)."""
    spark = graph.edges.sparkSession
    eng = engine or SuperstepEngine(spark)
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    edges = (
        graph.symmetrized_edges()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(P, "dst")
        .persist()
    )
    n_edges = edges.count()
    verts = graph.deduced_vertices()
    n_verts = verts.count()

    init = verts.select("id", F.col("id").alias("label")).repartition(P, "id")

    def step(state: DataFrame, round_: int):
        hist = (
            scatter_join(edges, state.select(F.col("id").alias("dst"), "label"), "dst", n_verts)
            .groupBy(F.col("src").alias("id"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        best = (
            hist.groupBy("id")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("b"))
            .select("id", (-F.col("b.neg")).alias("new_label"))
        )
        new_state = (
            state_join(state, best)
            .select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias("_chg"),
            )
        )

        def to_metrics(agg: dict) -> dict:
            changed = int(agg["c"] or 0)
            return {
                "halt": changed == 0,
                "changed": changed,
                "edges_processed": n_edges,
            }

        # changed-count rides the truncation action (engine.Observed)
        return new_state, Observed(
            exprs=[F.sum(F.col("_chg").cast("long")).alias("c")],
            to_metrics=to_metrics,
        )

    result = eng.run(init, step, max_rounds=max_round)
    result.state = result.state.select("id", "label")
    edges.unpersist()
    return result
