"""Degeneracy ordering and onion-layer ordering.

Transcribed SEMANTICS (not code) from the reference flash apps
analytical_engine/apps/flash/core/{degeneracy-ordering.h:44-113,
onion-layer-ordering.h:44-110}:

  * degeneracy ordering: compute core numbers (iterated H-index — the
    reference's inner loop is exactly the H-index update), take the
    degeneracy dg = max core, then peel in synchronized waves: round i
    removes every remaining vertex whose residual degree ≤ dg and
    stamps rank = i; removal decrements neighbours' residual degrees.
    Since the residual graph always contains a vertex of degree ≤ dg,
    every wave removes at least one vertex and every vertex is ranked.

  * onion layers: d(v) = #neighbours u with core(u) ≥ core(v); round i
    stamps layer = i on every remaining vertex with d(v) ≤ core(v) and
    decrements d only along SAME-core edges (higher-core neighbours
    are permanent, lower-core ones were never counted) — the
    per-shell peel depth, i.e. the onion decomposition.

Both are wave-synchronous peels: each round is one degree-filter +
one scatter-join + one groupBy decrement over a monotonically
shrinking active frame — the same superstep shape as kcore, keyed
joins only, so the plan is identical at 100 TB with the active frame
hash-partitioned by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.engine import SuperstepResult
from linkgraph.graph import Graph


def _und_edges(graph: Graph, P: int) -> DataFrame:
    return (
        graph.symmetrized_edges()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(P, "src")
        .persist()
    )


def degeneracy_ordering(
    graph: Graph,
    shell: DataFrame | None = None,
    num_partitions: int | None = None,
    max_rounds: int = 10_000,
) -> SuperstepResult:
    """Wave-synchronous degeneracy ordering
    (core/degeneracy-ordering.h:44-113). Returns state
    (id: long, rank: long) — the peel wave in which the vertex was
    removed (rank 0 = lowest-degree periphery)."""
    from linkgraph.algos.cores import kshell

    spark = graph.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _und_edges(graph, P)
    edges.count()
    verts = graph.deduced_vertices()

    sh = shell if shell is not None else kshell(graph).state
    dg = sh.agg(F.max("shell").alias("m")).collect()[0]["m"] or 0

    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    active = (
        verts.join(deg.hint("SHUFFLE_HASH"), "id", "left")
        .select("id", F.coalesce("d", F.lit(0)).cast("long").alias("d"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    ranked_frames: list[DataFrame] = []
    rounds = 0
    metrics: list[dict] = []
    drained = False
    while rounds < max_rounds:
        n_active = active.count()
        if n_active == 0:
            drained = True
            break
        rem = active.where(F.col("d") <= dg).select("id").localCheckpoint(eager=True)
        n_rem = rem.count()
        ranked_frames.append(rem.withColumn("rank", F.lit(rounds).cast("long")))
        remaining = active.join(rem.hint("SHUFFLE_HASH"), "id", "left_anti")
        dec = (
            edges.join(rem.withColumnRenamed("id", "dst").hint("SHUFFLE_HASH"),
                       "dst", "left_semi")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("dec"))
        )
        active = (
            remaining.join(dec.hint("SHUFFLE_HASH"), "id", "left")
            .select("id", (F.col("d") - F.coalesce("dec", F.lit(0))).alias("d"))
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
        metrics.append({"round": rounds, "active": int(n_active), "removed": int(n_rem)})
        rounds += 1
        if n_rem == 0:
            # cannot happen on a finite graph with dg = degeneracy;
            # guard against a caller-supplied stale shell frame
            break

    out = ranked_frames[0] if ranked_frames else verts.limit(0).select(
        "id", F.lit(0).cast("long").alias("rank"))
    for f in ranked_frames[1:]:
        out = out.unionByName(f)
    state = verts.join(out.hint("SHUFFLE_HASH"), "id", "left").select(
        "id", F.coalesce("rank", F.lit(-1)).cast("long").alias("rank")
    )
    edges.unpersist()
    # converged=False ⇔ some vertex carries rank -1 (max_rounds hit, or a
    # stale caller-supplied shell made a wave remove nothing)
    return SuperstepResult(state=state, rounds=rounds, converged=drained, metrics=metrics)


def onion_layers(
    graph: Graph,
    shell: DataFrame | None = None,
    num_partitions: int | None = None,
    max_rounds: int = 10_000,
) -> SuperstepResult:
    """Onion-layer ordering (core/onion-layer-ordering.h:44-110).
    Returns state (id: long, layer: long)."""
    from linkgraph.algos.cores import kshell

    spark = graph.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _und_edges(graph, P)
    edges.count()
    verts = graph.deduced_vertices()

    sh = (shell if shell is not None else kshell(graph).state).select(
        "id", F.col("shell").cast("long").alias("core"))
    # edge frame annotated with both endpoint cores, persisted once
    ec = (
        edges.join(sh.select(F.col("id").alias("src"), F.col("core").alias("cs")), "src")
        .join(sh.select(F.col("id").alias("dst"), F.col("core").alias("cd")), "dst")
        .repartition(P, "src")
        .persist()
    )
    ec.count()
    # d(v) = #neighbours with core >= core(v)
    d0 = (
        ec.where(F.col("cd") >= F.col("cs"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("d"))
    )
    active = (
        verts.join(sh, "id")
        .join(d0.hint("SHUFFLE_HASH"), "id", "left")
        .select("id", "core", F.coalesce("d", F.lit(0)).cast("long").alias("d"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    layer_frames: list[DataFrame] = []
    rounds = 0
    metrics: list[dict] = []
    drained = False
    while rounds < max_rounds:
        n_active = active.count()
        if n_active == 0:
            drained = True
            break
        rem = active.where(F.col("d") <= F.col("core")).select("id") \
                    .localCheckpoint(eager=True)
        n_rem = rem.count()
        if n_rem == 0:
            break
        layer_frames.append(rem.withColumn("layer", F.lit(rounds).cast("long")))
        remaining = active.join(rem.hint("SHUFFLE_HASH"), "id", "left_anti")
        # decrement only along same-core edges from removed vertices
        dec = (
            ec.where(F.col("cs") == F.col("cd"))
            .join(rem.withColumnRenamed("id", "dst").hint("SHUFFLE_HASH"),
                  "dst", "left_semi")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("dec"))
        )
        active = (
            remaining.join(dec.hint("SHUFFLE_HASH"), "id", "left")
            .select("id", "core",
                    (F.col("d") - F.coalesce("dec", F.lit(0))).alias("d"))
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
        metrics.append({"round": rounds, "active": int(n_active), "removed": int(n_rem)})
        rounds += 1

    out = layer_frames[0] if layer_frames else verts.limit(0).select(
        "id", F.lit(0).cast("long").alias("layer"))
    for f in layer_frames[1:]:
        out = out.unionByName(f)
    state = verts.join(out.hint("SHUFFLE_HASH"), "id", "left").select(
        "id", F.coalesce("layer", F.lit(-1)).cast("long").alias("layer")
    )
    ec.unpersist()
    edges.unpersist()
    # converged=False ⇔ some vertex carries layer -1 (max_rounds hit, or an
    # inconsistent shell input made a wave remove nothing)
    return SuperstepResult(state=state, rounds=rounds, converged=drained, metrics=metrics)
