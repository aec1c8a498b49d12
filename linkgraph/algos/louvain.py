"""Louvain community detection — synchronous, deterministic.

Transcribed semantics (NOT ported) from the reference Pregel Louvain,
analytical_engine/apps/pregel/louvain/louvain.h:
  * modularity gain of moving i into community c
    (calculateQualityDelta, louvain.h:284-314):
        ΔQ = k_i_in − k_i · σ_tot(c') / m2
    with k_i_in = w(i→c) (+ internal(i) when c is i's current
    community), k_i = node_weight + internal, σ_tot(c') = community
    total minus k_i when c is current, m2 = Σ_i k_i; ΔQ forced 0 for
    the degenerate stay-in-singleton case.
  * candidate selection (decideBestCommunity, louvain.h:229-275):
    among the neighbor communities PLUS the synthetic (current, ΔQ=0)
    entry, take max ΔQ with ties broken by MIN community id.
  * oscillation guard (louvain.h:262-264): on even rounds moves to a
    SMALLER community id are cancelled, on odd rounds moves to a
    LARGER one — the trick that makes synchronous local moves
    converge instead of two-cycling.
  * phase 2 (louvain.h:41-48): compress each community to one node —
    inter-community edge weights summed, intra-community weight
    folded into the supernode's internal weight (×2: both endpoints)
    — then re-run phase 1 on the coarse graph.

Spark execution: one superstep per local-move round — two shuffles
(community totals V-row agg; neighbor-community histogram E-row agg
with map-side combine) and one argmax via max(struct(ΔQ, -c)), never
a window over a hub key. Coarsening is two joins + one groupBy. The
per-level edge frame shrinks geometrically, AQE coalesces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.engine import Observed, SuperstepEngine, SuperstepResult
from linkgraph.graph import Graph
from linkgraph.joins import state_join


def _weighted_sym_edges(graph: Graph, P: int) -> DataFrame:
    """Undirected weighted edge frame with BOTH directions present
    (parallel edges summed); self-loops excluded (they become internal
    weight separately)."""
    w = graph.weight_col
    e = graph.edges.select(
        "src", "dst", (F.col(w) if w else F.lit(1.0)).cast("double").alias("w")
    )
    if graph.directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    return (
        e.where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .repartition(P, "dst")
    )


# community-totals frames with at most this many rows are broadcast in
# the local-move join; bigger ones (level 0 starts at |V| communities)
# go through a shuffled-hash join — broadcasting a V-row frame every
# round is a driver/executor OOM at 10⁹ vertices
BROADCAST_COMMS_MAX = 1_000_000


def louvain_local_move(
    edges: DataFrame,
    nodes: DataFrame,
    m2: float,
    max_round: int = 10,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
    n_nodes: int | None = None,
) -> SuperstepResult:
    """One phase-1 pass over a (possibly coarsened) graph.

    edges: symmetric (src, dst, w); nodes: (id, k, internal) with
    k = weighted degree + internal. Returns state (id, c, k, internal).
    ``n_nodes`` (an upper bound on the community count) picks the
    community-totals join strategy; None = assume big, never broadcast.
    """
    spark = edges.sparkSession
    eng = engine or SuperstepEngine(spark)
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    bcast_sig = n_nodes is not None and n_nodes <= BROADCAST_COMMS_MAX

    init = nodes.select("id", F.col("id").alias("c"), "k", "internal").repartition(P, "id")
    # a round with zero moves is NOT a fixpoint by itself: the parity
    # guard may cancel a move on round r that round r+1 would allow —
    # halt only after two consecutive clean rounds (both parities)
    prev_moved = {"n": -1}

    def step(state: DataFrame, round_: int):
        state = state.drop("_chg")
        sig = state.groupBy("c").agg(F.sum("k").alias("sig"))
        labels = state.select(F.col("id").alias("dst"), F.col("c").alias("nc"))
        wic = (
            edges.join(labels.hint("SHUFFLE_HASH"), "dst")
            .groupBy(F.col("src").alias("id"), "nc")
            .agg(F.sum("w").alias("wi"))
        )
        cur = state.select("id", F.col("c").alias("cur"), "k", "internal")
        sig_nc = sig.withColumnRenamed("c", "nc")
        cand = (
            wic.join(cur.hint("SHUFFLE_HASH"), "id")
            .join(F.broadcast(sig_nc) if bcast_sig else sig_nc.hint("SHUFFLE_HASH"), "nc")
            .select(
                "id",
                "nc",
                F.when(
                    (F.col("nc") == F.col("cur"))
                    & (F.col("sig") - F.col("k") == 0.0),
                    F.lit(0.0),
                )
                .otherwise(
                    F.col("wi")
                    + F.when(F.col("nc") == F.col("cur"), F.col("internal")).otherwise(0.0)
                    - F.col("k")
                    * (
                        F.col("sig")
                        - F.when(F.col("nc") == F.col("cur"), F.col("k")).otherwise(0.0)
                    )
                    / F.lit(m2)
                )
                .alias("dq"),
            )
        )
        # synthetic stay-put candidate: (current community, ΔQ = 0)
        synth = cur.select("id", F.col("cur").alias("nc"), F.lit(0.0).alias("dq"))
        best = (
            cand.unionByName(synth)
            .groupBy("id")
            .agg(F.max(F.struct(F.col("dq"), (-F.col("nc")).alias("negc"))).alias("b"))
            .select("id", (-F.col("b.negc")).alias("best"))
        )
        guarded = F.when(
            ((F.col("c") > F.col("best")) & F.lit(round_ % 2 == 0))
            | ((F.col("c") < F.col("best")) & F.lit(round_ % 2 != 0)),
            F.col("c"),
        ).otherwise(F.col("best"))
        new_state = (
            state_join(state, best)
            .select(
                "id",
                guarded.alias("newc"),
                "c",
                "k",
                "internal",
            )
            .select(
                "id",
                F.col("newc").alias("c"),
                "k",
                "internal",
                (F.col("newc") != F.col("c")).alias("_chg"),
            )
        )

        def to_metrics(agg: dict) -> dict:
            chg = int(agg["c"] or 0)
            halt = chg == 0 and prev_moved["n"] == 0
            prev_moved["n"] = chg
            return {"halt": halt, "moved": chg}

        return new_state, Observed(
            exprs=[F.sum(F.col("_chg").cast("long")).alias("c")],
            to_metrics=to_metrics,
        )

    res = eng.run(init, step, max_rounds=max_round)
    res.state = res.state.select("id", "c", "k", "internal")
    return res


def louvain_phase1(
    graph: Graph,
    max_round: int = 10,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """Single-level Louvain (phase-1 local moves only) on the graph's
    weighted undirected view. Returns state (id, community) — the
    deterministic, oracle-checkable core of the full algorithm."""
    spark = graph.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _weighted_sym_edges(graph, P).persist()
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    nodes = (
        graph.deduced_vertices()
        .join(deg, "id", "left")
        .select("id", F.coalesce("k", F.lit(0.0)).alias("k"), F.lit(0.0).alias("internal"))
    )
    m2 = nodes.agg(F.sum("k")).collect()[0][0] or 1.0
    res = louvain_local_move(edges, nodes, m2, max_round=max_round,
                             engine=engine, num_partitions=P,
                             n_nodes=nodes.count())
    res.state = res.state.select("id", F.col("c").alias("community"))
    edges.unpersist()
    return res


def louvain(
    graph: Graph,
    max_round: int = 10,
    max_levels: int = 5,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
    force_all_levels: bool = False,
) -> SuperstepResult:
    """Full multi-level Louvain. Returns state (id: long, community:
    long) mapping every ORIGINAL vertex to its final community (the
    min original vertex id serves as the stable community name at
    every level, so labels are deterministic). ``force_all_levels``
    disables the no-shrink early exit so exactly ``max_levels`` levels
    run — used by the oracle gate, whose SQL twin unrolls a fixed
    level count."""
    spark = graph.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    edges = _weighted_sym_edges(graph, P).persist()
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    nodes = (
        graph.deduced_vertices()
        .join(deg, "id", "left")
        .select("id", F.coalesce("k", F.lit(0.0)).alias("k"), F.lit(0.0).alias("internal"))
        .persist()
    )
    m2 = nodes.agg(F.sum("k")).collect()[0][0] or 1.0  # Σ degrees (= 2m at level 0)

    mapping = None  # original id -> current supernode id
    total_rounds = 0
    n_nodes = nodes.count()
    for level in range(max_levels):
        res = louvain_local_move(edges, nodes, m2, max_round=max_round,
                                 engine=engine, num_partitions=P,
                                 n_nodes=n_nodes)
        total_rounds += res.rounds
        labels = res.state.select("id", "c").persist()
        n_comms = labels.select("c").distinct().count()
        # fold this level's assignment into the original-id mapping
        if mapping is None:
            mapping = labels.select("id", F.col("c").alias("community"))
        else:
            mapping = (
                mapping.join(
                    labels.withColumnRenamed("id", "community").withColumnRenamed("c", "newc"),
                    "community",
                )
                .select("id", F.col("newc").alias("community"))
            )
        mapping = mapping.localCheckpoint(eager=True)
        if (not force_all_levels and n_comms >= n_nodes) or level == max_levels - 1:
            labels.unpersist()
            break
        # ---- coarsen (phase 2) -------------------------------------
        la = labels.select(F.col("id").alias("src"), F.col("c").alias("ca"))
        lb = labels.select(F.col("id").alias("dst"), F.col("c").alias("cb"))
        joined = edges.join(la, "src").join(lb, "dst")
        inter = (
            joined.where(F.col("ca") != F.col("cb"))
            .groupBy(F.col("ca").alias("src"), F.col("cb").alias("dst"))
            .agg(F.sum("w").alias("w"))
        )
        intra = (
            joined.where(F.col("ca") == F.col("cb"))
            .groupBy(F.col("ca").alias("id"))
            .agg(F.sum("w").alias("intra"))  # both directions => already 2×
        )
        base_int = (
            res.state.groupBy(F.col("c").alias("id")).agg(F.sum("internal").alias("bi"))
        )
        new_nodes = (
            res.state.groupBy(F.col("c").alias("id"))
            .agg(F.sum("k").alias("k"))
            .join(intra, "id", "left")
            .join(base_int, "id", "left")
            .select(
                "id",
                "k",
                (F.coalesce("intra", F.lit(0.0)) + F.coalesce("bi", F.lit(0.0))).alias(
                    "internal"
                ),
            )
        )
        new_edges = inter.repartition(P, "dst").persist()
        new_edges.count()
        edges.unpersist()
        edges = new_edges
        nodes_new = new_nodes.persist()
        n_nodes = nodes_new.count()
        nodes.unpersist()
        nodes = nodes_new
        labels.unpersist()

    edges.unpersist()
    nodes.unpersist()
    return SuperstepResult(
        state=mapping.select("id", "community"),
        rounds=total_rounds,
        converged=True,
    )


def modularity(graph: Graph, labels: DataFrame) -> float:
    """Q = Σ_c [ Σ_in(c)/m2 − (Σ_tot(c)/m2)² ] over the weighted
    undirected view; labels = (id, community)."""
    spark = graph.edges.sparkSession
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _weighted_sym_edges(graph, P)
    lab = labels.select(F.col(labels.columns[0]).alias("id"),
                        F.col(labels.columns[1]).alias("c"))
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    m2 = deg.agg(F.sum("k")).collect()[0][0] or 1.0
    tot = (
        lab.join(deg, "id", "left")
        .groupBy("c")
        .agg(F.sum(F.coalesce("k", F.lit(0.0))).alias("tot"))
    )
    intra = (
        edges.join(lab.withColumnRenamed("id", "src").withColumnRenamed("c", "ca"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("c", "cb"), "dst")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.sum("w").alias("win"))
    )
    row = (
        tot.join(intra, "c", "left")
        .agg(
            F.sum(
                F.coalesce("win", F.lit(0.0)) / F.lit(m2)
                - (F.col("tot") / F.lit(m2)) * (F.col("tot") / F.lit(m2))
            ).alias("q")
        )
        .collect()[0]
    )
    return float(row["q"] or 0.0)
