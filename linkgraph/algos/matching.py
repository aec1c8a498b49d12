"""Matching-family greedy set problems: maximal independent set,
maximal matching, minimal dominating set.

Transcribed SEMANTICS (not code) from the reference flash apps
analytical_engine/apps/flash/matching/{mis.h:42-83, mm.h:43-76,
min-dominating-set.h:45-97}. All three are deterministic
rounds-to-fixpoint greedy algorithms driven by id/degree priorities,
which makes them oracle-checkable (the reference's results are
likewise deterministic — priorities break every tie by vertex id):

  * MIS (mis.h): priority r(v) = deg(v)·n + id, SMALLER wins
    (low-degree-first). Per round, every still-undecided vertex that
    is a strict local minimum of r among undecided neighbours joins
    the set; its neighbours become dominated; repeat until no
    undecided vertices remain.
  * Maximal matching (mm.h): per round every unmatched vertex points
    at its MAX unmatched neighbour id; mutually-pointing pairs match;
    repeat until no new pairs.
  * Min dominating set (min-dominating-set.h): greedy by residual
    degree. Per round each active vertex takes the max (residual
    degree, id) over its closed undominated 1-hop neighbourhood,
    TWICE (= a 2-hop argmax, the reference applies its `local` map
    two times); vertices that are their own 2-hop argmax enter the
    set and dominate themselves + neighbours; residual degrees are
    recomputed over the undominated graph.

Scale design: one static symmetrized edge frame partitioned by src;
each round is scatter-join → groupBy-agg → state join (the same
superstep shape as every other algorithm here), active frames shrink
monotonically and are localCheckpointed per round (plan truncation).
Round counts are data-dependent but small in practice (local argmin/
argmax selection decides a constant fraction of the frontier per
round); callers gate them via the returned `rounds`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.engine import SuperstepEngine, SuperstepResult
from linkgraph.graph import Graph


def _sym_edges(graph: Graph, P: int) -> DataFrame:
    return (
        graph.symmetrized_edges()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(P, "src")
        .persist()
    )


def mis(
    graph: Graph,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
    max_rounds: int = 10_000,
) -> SuperstepResult:
    """Maximal independent set (mis.h:47-82). Returns state
    (id: long, in_mis: boolean) for every vertex; greedy by
    r = deg·n + id, min-r local minima join per round."""
    spark = graph.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _sym_edges(graph, P)
    edges.count()

    verts = graph.deduced_vertices()
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    # priority r(v) = (deg, id) compared LEXICOGRAPHICALLY: a strict
    # total order for arbitrary long ids (the reference's deg·n + id
    # arithmetic assumes ids dense in [0, n) — with sparse ids two
    # adjacent vertices can tie and neither is ever a strict local
    # minimum, stalling the greedy loop).
    active = (
        verts.join(deg.hint("SHUFFLE_HASH"), "id", "left")
        .select("id", F.struct(F.coalesce("deg", F.lit(0)).cast("long").alias("d"),
                               F.col("id").alias("i")).alias("r"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    selected_frames: list[DataFrame] = []
    rounds = 0
    metrics: list[dict] = []
    while rounds < max_rounds:
        n_active = active.count()
        if n_active == 0:
            break
        rounds += 1
        # min active-neighbour priority per active vertex
        msgs = active.select(F.col("id").alias("src"), F.col("r").alias("nr"))
        nbrmin = (
            edges.join(msgs.hint("SHUFFLE_HASH"), "src")
            .join(active.select(F.col("id").alias("dst")).hint("SHUFFLE_HASH"), "dst", "left_semi")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("nr").alias("nm"))
        )
        scored = active.join(nbrmin.hint("SHUFFLE_HASH"), "id", "left")
        sel = scored.where(F.col("nm").isNull() | (F.col("r") < F.col("nm"))) \
                    .select("id").localCheckpoint(eager=True)
        n_sel = sel.count()
        selected_frames.append(sel)
        dominated = (
            edges.join(sel.withColumnRenamed("id", "src").hint("SHUFFLE_HASH"),
                       "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
        )
        active = (
            active.join(sel.hint("SHUFFLE_HASH"), "id", "left_anti")
            .join(dominated.hint("SHUFFLE_HASH"), "id", "left_anti")
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
        metrics.append({"round": rounds, "active": int(n_active), "selected": int(n_sel)})

    converged = active.isEmpty()
    in_set = selected_frames[0] if selected_frames else verts.limit(0).select("id")
    for f in selected_frames[1:]:
        in_set = in_set.unionByName(f)
    state = (
        verts.join(in_set.withColumn("_s", F.lit(True)).hint("SHUFFLE_HASH"), "id", "left")
        .select("id", F.coalesce("_s", F.lit(False)).alias("in_mis"))
    )
    edges.unpersist()
    return SuperstepResult(state=state, rounds=rounds, converged=converged,
                           metrics=metrics)


def maximal_matching(
    graph: Graph,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
    max_rounds: int = 10_000,
) -> SuperstepResult:
    """Maximal matching (mm.h:48-75). Returns state (id: long,
    match: long) — partner id, or -1 unmatched. Mutual-max-id pairs
    match each round."""
    spark = graph.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _sym_edges(graph, P)
    edges.count()

    verts = graph.deduced_vertices()
    active = verts.select("id").repartition(P, "id").localCheckpoint(eager=True)
    matched_frames: list[DataFrame] = []
    rounds = 0
    metrics: list[dict] = []
    while rounds < max_rounds:
        n_active = active.count()
        if n_active == 0:
            break
        rounds += 1
        # p(v) = max unmatched neighbour id, over unmatched-unmatched edges
        ae = (
            edges.join(active.withColumnRenamed("id", "src").hint("SHUFFLE_HASH"),
                       "src", "left_semi")
            .join(active.withColumnRenamed("id", "dst").hint("SHUFFLE_HASH"),
                  "dst", "left_semi")
        )
        p = ae.groupBy(F.col("dst").alias("id")).agg(F.max("src").alias("p"))
        # mutual pointers: edge (u,v) with p(u)=v and p(v)=u, u<v
        pu = p.select(F.col("id").alias("src"), F.col("p").alias("psrc"))
        pv = p.select(F.col("id").alias("dst"), F.col("p").alias("pdst"))
        pairs = (
            ae.where(F.col("src") < F.col("dst"))
            .join(pu.hint("SHUFFLE_HASH"), "src")
            .join(pv.hint("SHUFFLE_HASH"), "dst")
            .where((F.col("psrc") == F.col("dst")) & (F.col("pdst") == F.col("src")))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_pairs = pairs.count()
        if n_pairs == 0:
            break
        matched_frames.append(pairs)
        newly = pairs.select(F.col("src").alias("id")) \
                     .unionByName(pairs.select(F.col("dst").alias("id")))
        active = active.join(newly.hint("SHUFFLE_HASH"), "id", "left_anti") \
                       .repartition(P, "id").localCheckpoint(eager=True)
        metrics.append({"round": rounds, "active": int(n_active), "pairs": int(n_pairs)})

    if matched_frames:
        mm = matched_frames[0]
        for f in matched_frames[1:]:
            mm = mm.unionByName(f)
        both = mm.select(F.col("src").alias("id"), F.col("dst").alias("match")) \
                 .unionByName(mm.select(F.col("dst").alias("id"), F.col("src").alias("match")))
    else:
        both = verts.limit(0).select("id", F.col("id").alias("match"))
    state = (
        verts.join(both.hint("SHUFFLE_HASH"), "id", "left")
        .select("id", F.coalesce("match", F.lit(-1)).cast("long").alias("match"))
    )
    edges.unpersist()
    return SuperstepResult(state=state, rounds=rounds, converged=True, metrics=metrics)


def min_dominating_set(
    graph: Graph,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
    max_rounds: int = 10_000,
) -> SuperstepResult:
    """Greedy minimal dominating set (min-dominating-set.h:50-96).
    Returns state (id: long, in_mds: boolean). Per round the active
    (= undominated) vertices take the lexicographic max of (residual
    degree, id) over the closed undominated neighbourhood twice (the
    reference's double `local` = 2-hop argmax); self-argmax vertices
    join and dominate their neighbourhood."""
    spark = graph.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _sym_edges(graph, P)
    edges.count()

    verts = graph.deduced_vertices()
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    # active = undominated; carries residual degree cnt
    active = (
        verts.join(deg.hint("SHUFFLE_HASH"), "id", "left")
        .select("id", F.coalesce("deg", F.lit(0)).cast("long").alias("cnt"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    selected_frames: list[DataFrame] = []
    rounds = 0
    metrics: list[dict] = []

    def hop_max(state: DataFrame) -> DataFrame:
        """max of struct(cnt, mid) over the closed active 1-hop
        neighbourhood (state: id, cnt, mid)."""
        msgs = state.select(
            F.col("id").alias("src"), F.struct("cnt", "mid").alias("m")
        )
        nbr = (
            edges.join(msgs.hint("SHUFFLE_HASH"), "src")
            .join(state.select(F.col("id").alias("dst")).hint("SHUFFLE_HASH"),
                  "dst", "left_semi")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.max("m").alias("nm"))
        )
        return (
            state.join(nbr.hint("SHUFFLE_HASH"), "id", "left")
            .select(
                "id", "cnt",
                F.when(
                    F.col("nm").isNotNull()
                    & (F.col("nm") > F.struct("cnt", "mid")),
                    F.col("nm"),
                ).otherwise(F.struct("cnt", "mid")).alias("mx"),
            )
            .select("id", "cnt", F.col("mx.cnt").alias("mcnt"), F.col("mx.mid").alias("mid"))
        )

    while rounds < max_rounds:
        n_active = active.count()
        if n_active == 0:
            break
        rounds += 1
        # two hop_max applications = the reference's double `local`
        # (a 2-hop argmax of (residual degree, id))
        m1 = hop_max(active.select("id", "cnt", F.col("id").alias("mid")))
        s2 = hop_max(m1.select("id", F.col("mcnt").alias("cnt"), "mid"))
        sel = s2.where(F.col("mid") == F.col("id")).select("id").localCheckpoint(eager=True)
        n_sel = sel.count()
        selected_frames.append(sel)
        dominated = (
            edges.join(sel.withColumnRenamed("id", "src").hint("SHUFFLE_HASH"),
                       "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .unionByName(sel)
            .dropDuplicates(["id"])
        )
        remaining = active.join(dominated.hint("SHUFFLE_HASH"), "id", "left_anti") \
                          .select("id")
        # residual degree over the undominated graph
        rdeg = (
            edges.join(remaining.withColumnRenamed("id", "src").hint("SHUFFLE_HASH"),
                       "src", "left_semi")
            .join(remaining.withColumnRenamed("id", "dst").hint("SHUFFLE_HASH"),
                  "dst", "left_semi")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.count("*").alias("deg"))
        )
        active = (
            remaining.join(rdeg.hint("SHUFFLE_HASH"), "id", "left")
            .select("id", F.coalesce("deg", F.lit(0)).cast("long").alias("cnt"))
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
        metrics.append({"round": rounds, "active": int(n_active), "selected": int(n_sel)})

    in_set = selected_frames[0] if selected_frames else verts.limit(0).select("id")
    for f in selected_frames[1:]:
        in_set = in_set.unionByName(f)
    state = (
        verts.join(in_set.withColumn("_s", F.lit(True)).hint("SHUFFLE_HASH"), "id", "left")
        .select("id", F.coalesce("_s", F.lit(False)).alias("in_mds"))
    )
    edges.unpersist()
    return SuperstepResult(state=state, rounds=rounds, converged=True, metrics=metrics)


def min_vertex_cover(
    graph: Graph,
    num_partitions: int | None = None,
    max_rounds: int = 10_000,
) -> SuperstepResult:
    """Greedy 2-phase minimal vertex cover (min-cover.h:43-116).
    Returns state (id: long, in_cover: boolean).

    Phase 1 (log-threshold greedy): round i admits every still-
    uncovered vertex whose RESIDUAL degree (edges to non-cover
    vertices) is ≥ nowd, with nowd = n/2 halving each round; admitted
    vertices' edges are charged off neighbours' residual degrees.
    Terminates in ≤ log2(n)+2 rounds (nowd hits 0 and sweeps the
    rest). Phase 2 (redundancy refinement): a cover vertex whose
    neighbourhood is fully covered is redundant; each round drops the
    redundant vertices that have no higher-id redundant neighbour
    (so two adjacent redundant vertices are never dropped together),
    until none remain."""
    spark = graph.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _sym_edges(graph, P)
    edges.count()
    verts = graph.deduced_vertices()
    n = verts.count()

    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    # active = not-in-cover with residual degree > 0; d = residual deg
    active = (
        verts.join(deg.hint("SHUFFLE_HASH"), "id", "left")
        .select("id", F.coalesce("d", F.lit(0)).cast("long").alias("d"))
        .where(F.col("d") > 0)
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    cover_frames: list[DataFrame] = []
    rounds = 0
    metrics: list[dict] = []
    nowd = n // 2
    while rounds < max_rounds:
        n_active = active.count()
        if n_active == 0:
            break
        rounds += 1
        sel = active.where(F.col("d") >= nowd).select("id").localCheckpoint(eager=True)
        n_sel = sel.count()
        cover_frames.append(sel)
        # charge the admitted vertices' edges off neighbours' residual degree
        dec = (
            edges.join(sel.withColumnRenamed("id", "dst").hint("SHUFFLE_HASH"),
                       "dst", "left_semi")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("dec"))
        )
        active = (
            active.join(sel.hint("SHUFFLE_HASH"), "id", "left_anti")
            .join(dec.hint("SHUFFLE_HASH"), "id", "left")
            .select("id", (F.col("d") - F.coalesce("dec", F.lit(0))).alias("d"))
            .where(F.col("d") > 0)
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
        metrics.append({"round": rounds, "phase": 1, "active": int(n_active),
                        "selected": int(n_sel), "nowd": int(nowd)})
        nowd //= 2

    cover = cover_frames[0] if cover_frames else verts.limit(0).select("id")
    for f in cover_frames[1:]:
        cover = cover.unionByName(f)
    cover = cover.repartition(P, "id").localCheckpoint(eager=True)

    # phase 2: drop redundant cover vertices (all-covered neighbourhood),
    # highest-id-first within the redundant-induced graph
    while rounds < max_rounds:
        # B = cover vertices with no uncovered neighbour
        has_uncov = (
            edges.join(cover.withColumnRenamed("id", "dst").hint("SHUFFLE_HASH"),
                       "dst", "left_anti")
            .select(F.col("src").alias("id"))
            .dropDuplicates(["id"])
        )
        bset = cover.join(has_uncov.hint("SHUFFLE_HASH"), "id", "left_anti") \
                    .localCheckpoint(eager=True)
        if bset.isEmpty():
            break
        rounds += 1
        # drop b in B with no B-neighbour of higher id
        higher = (
            edges.join(bset.withColumnRenamed("id", "src").hint("SHUFFLE_HASH"),
                       "src", "left_semi")
            .join(bset.withColumnRenamed("id", "dst").hint("SHUFFLE_HASH"),
                  "dst", "left_semi")
            .where(F.col("src") > F.col("dst"))
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
        )
        drop = bset.join(higher.hint("SHUFFLE_HASH"), "id", "left_anti") \
                   .localCheckpoint(eager=True)
        n_drop = drop.count()
        if n_drop == 0:
            break
        cover = cover.join(drop.hint("SHUFFLE_HASH"), "id", "left_anti") \
                     .repartition(P, "id").localCheckpoint(eager=True)
        metrics.append({"round": rounds, "phase": 2, "dropped": int(n_drop)})

    state = (
        verts.join(cover.withColumn("_c", F.lit(True)).hint("SHUFFLE_HASH"), "id", "left")
        .select("id", F.coalesce("_c", F.lit(False)).alias("in_cover"))
    )
    edges.unpersist()
    return SuperstepResult(state=state, rounds=rounds, converged=True, metrics=metrics)


def min_edge_cover_size(graph: Graph, matching: SuperstepResult | None = None) -> int:
    """Minimal edge-cover SIZE (min-edge-cover.h:43-105): a maximal
    matching covers its 2|M| endpoints with |M| edges; every other
    non-isolated vertex takes one arbitrary incident edge — total
    |M| + (n_nonisolated − 2|M|) = n_nonisolated − |M|, exactly the
    reference's VSize(matched)/2 + VSize(unmatched ∧ deg>0) count."""
    mm = matching if matching is not None else maximal_matching(graph)
    sym = (
        graph.symmetrized_edges()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    noniso = sym.select(F.col("src").alias("id")).dropDuplicates(["id"]).count()
    n_matched = mm.state.where(F.col("match") >= 0).count()
    return noniso - n_matched // 2
