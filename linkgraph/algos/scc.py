"""Strongly connected components — multi-pivot forward/backward
colouring, min-label.

Transcribed semantics (NOT code) from the reference flash app
analytical_engine/apps/flash/connectivity/scc.h:28-84:

  outer loop over the still-unassigned vertex set A:
    1. fid fixpoint: every v in A starts with fid = id, then fid is
       min-propagated along FORWARD edges inside A (scc.h check1/
       update1: d.fid = min(d.fid, s.fid)) — at fixpoint fid(v) is
       the minimum id that can reach v within A.
    2. pivots: vertices with fid == id (scc.h filter2) seed scc = id —
       one pivot per colour class, and EVERY colour class runs
       simultaneously (multi-pivot, unlike scc-2.h's single
       max-degree pivot).
    3. backward sweep: along REVERSE edges inside A (scc.h check2/
       update2), a vertex with fid equal to its successor's scc label
       joins that scc — i.e. the vertices of colour c that can REACH
       the pivot c. Reached ∩ reaching = the pivot's SCC.
    4. A := vertices still unassigned (scc.h filter3); repeat.

  The final label is therefore the MINIMUM vertex id in each SCC
  (every member reaches the pivot, and nothing smaller reaches the
  pivot), which makes the output deterministic and oracle-checkable
  against a mutual-reachability SQL fixpoint.

Scale design: both inner fixpoints are delta-frontier superstep jobs
over an edge frame hash-partitioned by the scatter key and filtered
to the active set once per outer round (semi-joins, executed a single
time, then persisted). State frames are V-row and only ever join
shuffled-hash against that partitioning; assigned components leave
the active frame, so later outer rounds touch strictly shrinking
frames. Outer-round count is bounded by the depth of the condensation
DAG (each round resolves >=1 SCC per remaining colour class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.engine import SuperstepEngine, SuperstepResult, observed_count
from linkgraph.graph import Graph
from linkgraph.joins import state_join


def scc(
    graph: Graph,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
    max_outer: int = 100,
) -> SuperstepResult:
    """Returns state (id: long, scc: long): scc = min vertex id of the
    strongly connected component (directed; an undirected graph's SCCs
    are its connected components — use wcc for that)."""
    spark = graph.edges.sparkSession
    eng = engine or SuperstepEngine(spark)
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    fwd = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(P, "src")
        .persist()
    )
    n_edges = fwd.count()
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")) \
             .repartition(P, "src").persist()
    rev.count()

    active = graph.deduced_vertices().select("id").repartition(P, "id") \
                  .localCheckpoint(eager=True)
    assigned_frames: list[DataFrame] = []
    total_rounds = 0
    all_metrics: list[dict] = []

    for _outer in range(max_outer):
        n_active = active.count()
        if n_active == 0:
            break
        # restrict both edge directions to the active induced subgraph
        # (one pass of semi-joins per outer round, then cached)
        ef = (
            fwd.join(active.withColumnRenamed("id", "src").hint("SHUFFLE_HASH"),
                     "src", "left_semi")
            .join(active.withColumnRenamed("id", "dst").hint("SHUFFLE_HASH"),
                  "dst", "left_semi")
            .repartition(P, "src")
            .persist()
        )
        er = ef.select(F.col("dst").alias("src"), F.col("src").alias("dst")) \
               .repartition(P, "src").persist()
        ef.count(), er.count()

        # ---- 1. forward min-label fixpoint (scc.h check1/update1) --
        finit = active.select("id", F.col("id").alias("fid"),
                              F.lit(True).alias("changed"))

        def fwd_step(state: DataFrame, round_: int):
            frontier = state.where(F.col("changed")).select(
                F.col("id").alias("src"), F.col("fid").alias("m"))
            cand = (
                ef.join(frontier.hint("SHUFFLE_HASH"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("m").alias("cand"))
            )
            new_state = state_join(state, cand).select(
                "id",
                F.least("fid", F.coalesce("cand", F.col("fid"))).alias("fid"),
                (F.coalesce("cand", F.col("fid")) < F.col("fid")).alias("changed"),
            )

            return new_state, observed_count("changed", n_edges)

        fres = eng.run(finit, fwd_step, max_rounds=10_000)
        total_rounds += fres.rounds
        all_metrics.extend(fres.metrics)

        # ---- 2+3. pivots seed scc=fid==id; backward sweep ----------
        binit = fres.state.select(
            "id", "fid",
            F.when(F.col("fid") == F.col("id"), F.col("id")).alias("scc"),
            (F.col("fid") == F.col("id")).alias("changed"),
        )

        # Colour-respecting reverse edges: any v->pivot path inside an
        # SCC stays inside the SCC, so every hop of a valid backward
        # message has equal fid at both endpoints. Filtering the edge
        # frame once per outer round (two V-row joins) means every
        # message that arrives is own-colour, so min-aggregation can
        # never discard an own-colour label in favour of a foreign one
        # (scc.h's per-edge check2: d.fid == s.scc).
        fid_f = fres.state.select("id", "fid")
        er_c = (
            er.join(fid_f.select(F.col("id").alias("src"),
                                 F.col("fid").alias("_fs")).hint("SHUFFLE_HASH"),
                    "src")
            .join(fid_f.select(F.col("id").alias("dst"),
                               F.col("fid").alias("_fd")).hint("SHUFFLE_HASH"),
                  "dst")
            .where(F.col("_fs") == F.col("_fd"))
            .select("src", "dst")
            .repartition(P, "src")
            .persist()
        )
        er_c.count()

        def bwd_step(state: DataFrame, round_: int):
            frontier = state.where(F.col("changed")).select(
                F.col("id").alias("src"), F.col("scc").alias("m"))
            # reverse edges: successors (in forward orientation) push
            # their scc label to predecessors with matching colour
            cand = (
                er_c.join(frontier.hint("SHUFFLE_HASH"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("m").alias("cand"))
            )
            new_state = state_join(state, cand).select(
                "id", "fid",
                F.coalesce(
                    "scc",
                    F.when(F.col("cand") == F.col("fid"), F.col("fid")),
                ).alias("scc"),
                (F.col("scc").isNull() & (F.col("cand") == F.col("fid")))
                .alias("changed"),
            )

            return new_state, observed_count("changed", n_edges)

        bres = eng.run(binit, bwd_step, max_rounds=10_000)
        total_rounds += bres.rounds
        all_metrics.extend(bres.metrics)

        done = bres.state.where(F.col("scc").isNotNull()) \
                         .select("id", "scc").localCheckpoint(eager=True)
        assigned_frames.append(done)
        remaining = bres.state.where(F.col("scc").isNull()).select("id") \
                              .localCheckpoint(eager=True)
        ef.unpersist()
        er.unpersist()
        er_c.unpersist()
        active = remaining

    converged = active.isEmpty()
    # empty-graph safe seed; on max_outer exhaustion keep the
    # still-unassigned vertices visible (scc=NULL) instead of dropping
    # them, and report converged=False.
    out = spark.createDataFrame([], "id long, scc long")
    for f in assigned_frames:
        out = out.unionByName(f)
    if not converged:
        out = out.unionByName(
            active.select("id", F.lit(None).cast("long").alias("scc")))
    fwd.unpersist()
    rev.unpersist()
    return SuperstepResult(state=out.select("id", F.col("scc").cast("long").alias("scc")),
                           rounds=total_rounds, converged=converged,
                           metrics=all_metrics)
