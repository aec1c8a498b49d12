"""Path-family algorithms: multi-source BFS, all-pairs shortest path
lengths, closeness centrality, the SSSP path family (shortest-path
tree / has_path / average path length) and Brandes betweenness
centrality.

Reference semantics (transcribed, NOT ported):
  * closeness — analytical_engine/apps/centrality/closeness/
    closeness_centrality.h:34-140: per-vertex reverse BFS/Dijkstra;
    closeness(v) = (reached-1)/Σdist, optionally ×(reached-1)/(n-1)
    (Wasserman-Faust improvement, closeness_centrality_context.h:41-57).
  * all_pairs_shortest_path_length — apps/apsp/
    all_pairs_shortest_path_length.h (BFS from every vertex).
  * sssp_path — apps/sssp/sssp_path.h:30-174: shortest-path TREE rows
    (predecessor, vertex, distance); predecessor = the relaxation
    winner (made deterministic here: min(dist, pred) struct order).
  * sssp_has_path / sssp_average_length — apps/sssp/sssp_has_path.h,
    sssp_average_length.h:35-168 (avg of all-pairs sssp lengths; the
    reference notes it is "time consuming" — a sampled-source
    estimator is provided here for scale, full = sources=None).
  * betweenness — apps/centrality/betweenness/
    betweenness_centrality.h:30-240: Brandes forward BFS (depth +
    path-count sigma) then backward dependency accumulation, over the
    first `max_round` sources; norm = (directed ? 1 : 0.5) ×
    1/(K(K-1)) when normalized (betweenness_centrality_context.h:38-67).

Execution model: ALL of these share one engine — a multi-source BFS
whose vertex state is the sparse PAIR frame (s, id, dist). Supersteps
expand the per-source frontier through the cached edge frame; the
pair frame is hash-partitioned by id so the per-round scatter join
reuses the edge partitioning. At 100 TB scale the pair frame is the
product |sources|×|reached| — callers bound |sources| (landmark /
sampled mode, the same contract as the reference's `max_round`
source cap) and the full all-pairs mode stays O(V·E) by design,
exactly like the reference's per-vertex loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.engine import SuperstepEngine, SuperstepResult, observed_count
from linkgraph.graph import Graph
from linkgraph.joins import state_join


def _prep_edges(graph: Graph, P: int, directed: bool | None, reverse: bool) -> DataFrame:
    use_directed = graph.directed if directed is None else directed
    # undirected traversal ALWAYS symmetrizes (idempotent under the
    # trailing dedup): a Graph flagged directed=False is supposed to
    # store both directions, but from_edges does not enforce that
    # invariant, and trusting it silently under-reaches on a
    # one-direction edge list (caught by the diameter_approx gate)
    e = (
        graph.symmetrized_edges() if not use_directed else graph.edges
    ).select("src", "dst")
    if reverse and use_directed:
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        e.where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(P, "src")
    )


def _sources_df(graph: Graph, sources) -> DataFrame:
    spark = graph.edges.sparkSession
    if sources is None:
        return graph.deduced_vertices().select(F.col("id").alias("s"))
    if isinstance(sources, DataFrame):
        return sources.select(F.col(sources.columns[0]).alias("s"))
    return spark.createDataFrame([(int(x),) for x in sources], "s long")


def multi_source_bfs(
    graph: Graph,
    sources=None,
    directed: bool | None = None,
    reverse: bool = False,
    engine: SuperstepEngine | None = None,
    max_iter: int = 10_000,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """Unweighted BFS from every source simultaneously.

    Returns state (s: long, id: long, dist: long) — one row per
    REACHED (source, vertex) pair (sparse: unreached pairs are
    absent; dist(s,s) = 0 rows are included). ``sources`` is a list
    of ids, a one-column DataFrame, or None for all vertices.

    Per round: the frontier pairs join the edge frame on id=src, the
    discovered (s, dst) pairs are deduped (min is implicit — BFS
    layers discover each pair exactly once) and anti-joined against
    the already-reached set. Reached pairs never change, so no
    re-relaxation happens (unlike weighted SSSP).
    """
    spark = graph.edges.sparkSession
    eng = engine or SuperstepEngine(spark)
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _prep_edges(graph, P, directed, reverse).persist()
    n_edges = edges.count()

    init = (
        _sources_df(graph, sources)
        .select("s", F.col("s").alias("id"), F.lit(0).cast("long").alias("dist"),
                F.lit(True).alias("fr"))
        .repartition(P, "id")
    )

    def step(state: DataFrame, round_: int):
        frontier = state.where(F.col("fr")).select("s", F.col("id").alias("src"))
        cand = (
            edges.join(frontier.hint("SHUFFLE_HASH"), "src")
            .select("s", F.col("dst").alias("id"))
            .dropDuplicates(["s", "id"])
        )
        new = (
            cand.join(state.select("s", "id").hint("SHUFFLE_HASH"), ["s", "id"], "left_anti")
            .select("s", "id", F.lit(round_ + 1).cast("long").alias("dist"),
                    F.lit(True).alias("fr"))
        )
        new_state = state.select("s", "id", "dist", F.lit(False).alias("fr")).unionByName(new)

        return new_state, observed_count("fr", n_edges)

    result = eng.run(init, step, max_rounds=max_iter)
    result.state = result.state.select("s", "id", "dist")
    edges.unpersist()
    return result


def multi_source_sssp(
    graph: Graph,
    sources=None,
    weight_col: str | None = None,
    directed: bool | None = None,
    engine: SuperstepEngine | None = None,
    max_iter: int = 10_000,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """Weighted SSSP from every source simultaneously (the weighted
    generalization of multi_source_bfs — the per-source Dijkstra loop
    of apps/sssp/sssp_average_length.h:35-168 re-expressed as ONE
    Bellman-Ford-style pair-frame relaxation).

    Returns state (s: long, id: long, dist: double) — one row per
    reached (source, vertex) pair. Unlike the BFS variant, reached
    pairs CAN improve (a longer-hop lighter path), so the state is a
    sparse min-relaxation frame: per round the changed pairs scatter
    through the edge frame, candidate distances combine by min per
    (s, dst), and the full-outer merge keeps the smaller of old/new.
    Same scale contract as multi_source_bfs: callers bound |sources|.
    """
    spark = graph.edges.sparkSession
    eng = engine or SuperstepEngine(spark)
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    use_directed = graph.directed if directed is None else directed

    w = weight_col or graph.weight_col
    cols = ["src", "dst"] + ([w] if w else [])
    base = graph.edges.select(*cols)
    if not use_directed:
        base = Graph.from_edges(base, directed=True).symmetrized_edges()
    edges = (
        base.select("src", "dst",
                    (F.col(w) if w else F.lit(1.0)).cast("double").alias("w"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(P, "src")
        .persist()
    )
    n_edges = edges.count()

    init = (
        _sources_df(graph, sources)
        .select("s", F.col("s").alias("id"), F.lit(0.0).alias("dist"),
                F.lit(True).alias("fr"))
        .repartition(P, "id")
    )

    def step(state: DataFrame, round_: int):
        frontier = state.where(F.col("fr")).select(
            "s", F.col("id").alias("src"), F.col("dist").alias("sd"))
        relax = (
            edges.join(frontier.hint("SHUFFLE_HASH"), "src")
            .groupBy("s", F.col("dst").alias("id"))
            .agg(F.min(F.col("sd") + F.col("w")).alias("cand"))
        )
        new_state = (
            state.select("s", "id", "dist")
            .join(relax.hint("SHUFFLE_HASH"), ["s", "id"], "full")
            .select(
                "s", "id",
                F.least(F.coalesce("dist", F.col("cand")),
                        F.coalesce("cand", F.col("dist"))).alias("dist"),
                (F.col("cand").isNotNull()
                 & (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))))
                .alias("fr"),
            )
        )

        return new_state, observed_count("fr", n_edges)

    result = eng.run(init, step, max_rounds=max_iter)
    result.state = result.state.select("s", "id", "dist")
    edges.unpersist()
    return result


def all_pairs_shortest_path_length(
    graph: Graph,
    sources=None,
    directed: bool | None = None,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """(src, dst, dist) rows for every reached pair — apps/apsp/
    all_pairs_shortest_path_length.h. ``sources=None`` = true APSP
    (O(V·E) work, like the reference's loop over all vertices);
    pass a source list for the landmark-restricted variant."""
    res = multi_source_bfs(graph, sources=sources, directed=directed,
                           engine=engine, num_partitions=num_partitions)
    res.state = res.state.select(
        F.col("s").alias("src"), F.col("id").alias("dst"), "dist"
    )
    return res


def closeness_centrality(
    graph: Graph,
    sources=None,
    directed: bool | None = None,
    wf_improved: bool = True,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """Closeness of each vertex in ``sources`` (None = all vertices).

    closeness(v) = (reached-1) / Σ_u dist(u, v) over the vertices
    that can REACH v (reverse BFS, matching closeness_centrality.h's
    reversedDijkstraLength over incoming edges); with wf_improved the
    value is scaled by (reached-1)/(n-1). Vertices reaching nothing
    get 0. Returns state (id: long, closeness: double)."""
    n = graph.num_vertices()
    res = multi_source_bfs(graph, sources=sources, directed=directed,
                           reverse=True, engine=engine,
                           num_partitions=num_partitions)
    per_source = (
        res.state.groupBy("s")
        .agg(F.count("*").alias("reached"), F.sum("dist").alias("tot"))
    )
    c = F.when(
        (F.col("tot") > 0) & (F.lit(n) > 1),
        (F.col("reached") - 1.0) / F.col("tot"),
    ).otherwise(0.0)
    if wf_improved:
        c = c * (F.col("reached") - 1.0) / F.lit(float(n - 1)) if n > 1 else F.lit(0.0)
    res.state = per_source.select(F.col("s").alias("id"), c.alias("closeness"))
    return res


def harmonic_centrality(
    graph: Graph,
    sources=None,
    directed: bool | None = None,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """Harmonic centrality of each vertex in ``sources`` (None = all):
    harmonic(v) = Σ_u 1/dist(u, v) over vertices that can reach v —
    the summand of flash/centrality/harmonic.h:72-85 (d.val += 1.0/i
    per newly-seen source at BFS depth i), made deterministic: the
    reference samples 500 rand_r sources with a time(NULL) seed;
    callers here pass an explicit source set. Unnormalized, like the
    reference. Returns state (id: long, harmonic: double)."""
    res = multi_source_bfs(graph, sources=sources, directed=directed,
                           reverse=True, engine=engine,
                           num_partitions=num_partitions)
    res.state = (
        res.state.groupBy("s")
        .agg(
            F.sum(F.when(F.col("dist") > 0, 1.0 / F.col("dist")).otherwise(0.0))
            .alias("harmonic")
        )
        .select(F.col("s").alias("id"), "harmonic")
    )  # the (s, s, 0) self-row keeps unreaching sources at 0.0
    return res


def diameter_approx(
    graph: Graph,
    k: int = 16,
    directed: bool | None = None,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """Approximate diameter + radius via two k-source BFS phases
    (flash/measurement/diameter-approx.h:45-108): phase 1 BFS from k
    sources gives each vertex an eccentricity lower bound ecc(v) =
    max over sources of dist; phase 2 re-runs BFS from the top-k
    vertices by (ecc, id) — the periphery candidates — accumulating
    into the same ecc. diameter ≈ max ecc, radius ≈ min nonzero ecc.
    The reference samples its phase-1 sources with a time(NULL) seed
    (diameter-approx.h:53-55); here they are the k min ids, making
    both phases deterministic. Returns state = ONE row
    (diameter: long, radius: long); res.rounds = total BFS rounds
    across both phases (each bounded by the true diameter)."""
    res1 = multi_source_bfs(graph, sources=_min_sources_df(graph, k),
                            directed=directed, engine=engine,
                            num_partitions=num_partitions)
    ecc1 = res1.state.groupBy("id").agg(F.max("dist").alias("ecc"))
    srcs2 = (
        ecc1.orderBy(F.col("ecc").desc(), F.col("id").asc()).limit(k)
        .select(F.col("id").alias("s"))
    )
    res2 = multi_source_bfs(graph, sources=srcs2, directed=directed,
                            engine=engine, num_partitions=num_partitions)
    ecc2 = res2.state.groupBy("id").agg(F.max("dist").alias("ecc"))
    ecc = (
        ecc1.unionByName(ecc2).groupBy("id").agg(F.max("ecc").alias("ecc"))
    )
    summary = ecc.agg(
        F.max("ecc").cast("long").alias("diameter"),
        F.min(F.when(F.col("ecc") > 0, F.col("ecc"))).cast("long").alias("radius"),
    )
    res2.state = summary
    res2.rounds = res1.rounds + res2.rounds
    res2.metrics = res1.metrics + res2.metrics
    return res2


def _min_sources_df(graph: Graph, k: int) -> DataFrame:
    return graph.deduced_vertices().orderBy("id").limit(k)


def sssp_path(
    graph: Graph,
    source: int,
    weight_col: str | None = None,
    directed: bool | None = None,
    engine: SuperstepEngine | None = None,
    max_iter: int = 10_000,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """Shortest-path TREE from ``source``: state (id, pred, dist) rows
    for every reached vertex (source row has pred = source, dist 0),
    matching sssp_path.h's [predecessor, node, sssp_length] output.

    Deterministic predecessor: among equal-distance relaxations the
    minimum (dist, pred) struct wins — the reference keeps whichever
    message arrived last, which is nondeterministic under MPI; a
    fixed tie-break makes the result oracle-checkable."""
    spark = graph.edges.sparkSession
    eng = engine or SuperstepEngine(spark)
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    use_directed = graph.directed if directed is None else directed

    w = weight_col or graph.weight_col
    cols = ["src", "dst"] + ([w] if w else [])
    base = graph.edges.select(*cols)
    if not use_directed:
        base = Graph.from_edges(base, directed=True).symmetrized_edges()
    edges = (
        base.select("src", "dst", (F.col(w) if w else F.lit(1.0)).cast("double").alias("w"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(P, "src")
        .persist()
    )
    n_edges = edges.count()

    INF = float("inf")
    init = graph.deduced_vertices().select(
        "id",
        F.when(F.col("id") == source, 0.0).otherwise(F.lit(INF)).alias("dist"),
        F.when(F.col("id") == source, F.lit(source).cast("long"))
        .otherwise(F.lit(None).cast("long")).alias("pred"),
        (F.col("id") == source).alias("changed"),
    ).repartition(P, "id")

    def step(state: DataFrame, round_: int):
        frontier = state.where(F.col("changed")).select(
            F.col("id").alias("src"), F.col("dist").alias("sd")
        )
        relax = (
            edges.join(frontier.hint("SHUFFLE_HASH"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.struct((F.col("sd") + F.col("w")).alias("d"),
                                F.col("src").alias("p"))).alias("m"))
            .select("id", F.col("m.d").alias("cand"), F.col("m.p").alias("cand_pred"))
        )
        new_state = state_join(state, relax).select(
            "id",
            F.least(F.col("dist"), F.coalesce("cand", F.col("dist"))).alias("dist"),
            F.when(
                F.coalesce("cand", F.lit(INF)) < F.col("dist"), F.col("cand_pred")
            ).otherwise(F.col("pred")).alias("pred"),
            (F.coalesce("cand", F.lit(INF)) < F.col("dist")).alias("changed"),
        )

        return new_state, observed_count("changed", n_edges)

    result = eng.run(init, step, max_rounds=max_iter)
    result.state = result.state.where(F.col("dist") != INF).select("id", "pred", "dist")
    edges.unpersist()
    return result


def sssp_has_path(graph: Graph, source: int, target: int, **kw) -> bool:
    """True iff ``target`` is reachable from ``source``
    (apps/sssp/sssp_has_path.h)."""
    res = sssp_path(graph, source, **kw)
    return res.state.where(F.col("id") == target).count() > 0


def sssp_average_length(
    graph: Graph,
    sources=None,
    weighted: bool = False,
    weight_col: str | None = None,
    directed: bool | None = None,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
) -> float:
    """Average shortest-path length over reachable ordered pairs with
    distinct endpoints (apps/sssp/sssp_average_length.h computes
    Σdist / (n(n-1)) on a connected graph; here the denominator is
    the number of reached pairs so disconnected graphs still get the
    conventional estimate). ``sources=None`` = all-pairs (expensive,
    like the reference); a source list gives the sampled estimator."""
    if weighted:
        res = multi_source_sssp(graph, sources=sources, weight_col=weight_col,
                                directed=directed, engine=engine,
                                num_partitions=num_partitions)
    else:
        res = multi_source_bfs(graph, sources=sources, directed=directed,
                               engine=engine, num_partitions=num_partitions)
    row = (
        res.state.where(F.col("dist") > 0)
        .agg(F.sum("dist").alias("tot"), F.count("*").alias("pairs"))
        .collect()[0]
    )
    return float(row["tot"]) / row["pairs"] if row["pairs"] else 0.0


def betweenness_centrality(
    graph: Graph,
    sources=None,
    directed: bool | None = None,
    normalized: bool = True,
    endpoints: bool = False,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
    backward_layered_threshold: int = 100_000_000,
) -> SuperstepResult:
    """Brandes betweenness over a source set (unweighted).

    Forward: multi-source layered BFS accumulating per-(s,v) depth and
    shortest-path count sigma (betweenness_centrality.h:73-135).
    Backward: dependency accumulation per descending depth
    (betweenness_centrality.h:140-196):
        delta(s,u) = Σ_{v: u→v, depth(v)=depth(u)+1}
                     sigma(u)/sigma(v) · (1 + delta(v))
    centrality(v) = norm · Σ_s delta(s,v), v ≠ s, where norm =
    (directed ? 1 : 0.5) × [normalized: 1/(K(K-1)) (endpoints False)
    or 1/(K(K+1)) (True)] with K = |sources| — exactly
    betweenness_centrality_context.h:56-67.

    Returns state (id: long, betweenness: double) over all vertices.
    """
    spark = graph.edges.sparkSession
    eng = engine or SuperstepEngine(spark)
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    use_directed = graph.directed if directed is None else directed
    edges = _prep_edges(graph, P, use_directed, reverse=False).persist()
    n_edges = edges.count()
    src_df = _sources_df(graph, sources)
    k = src_df.count()

    # ---- forward: depth + sigma ------------------------------------
    init = src_df.select(
        "s", F.col("s").alias("id"), F.lit(0).cast("long").alias("depth"),
        F.lit(1.0).alias("sigma"), F.lit(True).alias("fr")
    ).repartition(P, "id")

    def fwd_step(state: DataFrame, round_: int):
        frontier = state.where(F.col("fr")).select(
            "s", F.col("id").alias("src"), "sigma"
        )
        # all shortest-path counts into depth round_+1 arrive this round
        cand = (
            edges.join(frontier.hint("SHUFFLE_HASH"), "src")
            .groupBy("s", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        new = (
            cand.join(state.select("s", "id").hint("SHUFFLE_HASH"), ["s", "id"], "left_anti")
            .select("s", "id", F.lit(round_ + 1).cast("long").alias("depth"),
                    "sigma", F.lit(True).alias("fr"))
        )
        new_state = state.select("s", "id", "depth", "sigma",
                                 F.lit(False).alias("fr")).unionByName(new)

        return new_state, observed_count("fr", n_edges)

    fwd = eng.run(init, fwd_step, max_rounds=10_000)
    depth_sigma = fwd.state.select("s", "id", "depth", "sigma").persist()
    max_depth = depth_sigma.agg(F.max("depth")).collect()[0][0] or 0
    pair_rows = depth_sigma.count()

    # ---- backward: dependency accumulation, depth D-1 .. 0 ----------
    # Two strategies, picked by pair-frame size (measured A/B at 64
    # sources / depth-13 / 1.3M pairs: full-frame 34 s vs layered
    # 83 s — per-layer materialization overhead dominates small
    # frames; at S·V ≥ ~10⁸ the full-frame rewrite's O(D·S·V) I/O
    # dominates instead):
    #   * small pair frame → full-frame superstep (one plan per depth
    #     over the whole frame; engine-managed truncation);
    #   * large pair frame → per-LAYER loop: round d touches only the
    #     depth-d and depth-(d+1) slices (shortest-path DAG edges
    #     span exactly one depth), total I/O O(S·V + D·E') instead of
    #     O(D·S·V). Each layer localCheckpoints; the final union is a
    #     read of D cached frames, not a recompute.
    if pair_rows < backward_layered_threshold:
        binit = depth_sigma.select("s", "id", "depth", "sigma",
                                   F.lit(0.0).alias("delta")).repartition(P, "id")

        def bwd_step(state: DataFrame, round_: int):
            d = max_depth - 1 - round_
            succ = state.where(F.col("depth") == d + 1).select(
                "s", F.col("id").alias("dst"), F.col("sigma").alias("sv"),
                F.col("delta").alias("dv"),
            )
            contrib = (
                edges.join(succ.hint("SHUFFLE_HASH"), "dst")
                .groupBy("s", F.col("src").alias("id"))
                .agg(F.sum((1.0 + F.col("dv")) / F.col("sv")).alias("c"))
            )
            new_state = (
                state.join(contrib.hint("SHUFFLE_HASH"), ["s", "id"], "left")
                .select(
                    "s", "id", "depth", "sigma",
                    F.when(
                        (F.col("depth") == d) & F.col("c").isNotNull(),
                        F.col("sigma") * F.col("c"),
                    ).otherwise(F.col("delta")).alias("delta"),
                )
            )

            def finalize(df: DataFrame) -> dict:
                return {"halt": d <= 0, "depth": d, "edges_processed": n_edges}

            return new_state, finalize

        if max_depth > 0:
            bwd = eng.run(binit, bwd_step, max_rounds=max_depth)
            deltas = bwd.state.select("s", "id", "delta")
            bwd_rounds = bwd.rounds
        else:
            deltas = binit.select("s", "id", "delta")
            bwd_rounds = 0
    else:
        layers: list[DataFrame] = []
        deepest = (
            depth_sigma.where(F.col("depth") == max_depth)
            .select("s", "id", "sigma", F.lit(0.0).alias("delta"))
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
        layers.append(deepest)
        prev = deepest  # the depth-(d+1) slice with its deltas
        bwd_rounds = 0
        for d in range(max_depth - 1, -1, -1):
            succ = prev.select("s", F.col("id").alias("dst"),
                               F.col("sigma").alias("sv"), F.col("delta").alias("dv"))
            contrib = (
                edges.join(succ.hint("SHUFFLE_HASH"), "dst")
                .groupBy("s", F.col("src").alias("id"))
                .agg(F.sum((1.0 + F.col("dv")) / F.col("sv")).alias("c"))
            )
            layer = (
                depth_sigma.where(F.col("depth") == d)
                .join(contrib.hint("SHUFFLE_HASH"), ["s", "id"], "left")
                .select("s", "id", "sigma",
                        (F.col("sigma") * F.coalesce("c", F.lit(0.0))).alias("delta"))
                .repartition(P, "id")
                .localCheckpoint(eager=True)
            )
            layers.append(layer)
            prev = layer
            bwd_rounds += 1

        deltas = layers[0].select("s", "id", "delta")
        for f in layers[1:]:
            deltas = deltas.unionByName(f.select("s", "id", "delta"))
    rounds = fwd.rounds + bwd_rounds

    norm = 1.0 if use_directed else 0.5
    if normalized and k > 1:
        norm *= 1.0 / (k * (k + 1)) if endpoints else 1.0 / (k * (k - 1))
    per_vertex = (
        deltas.where(F.col("s") != F.col("id"))
        .groupBy("id")
        .agg((F.sum("delta") * F.lit(norm)).alias("betweenness"))
    )
    verts = graph.deduced_vertices()
    state = verts.join(per_vertex, "id", "left").select(
        "id", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )
    depth_sigma.unpersist()
    edges.unpersist()
    return SuperstepResult(state=state, rounds=rounds, converged=True,
                           metrics=fwd.metrics)


def k_center(
    graph: Graph,
    k: int = 4,
    directed: bool | None = None,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
) -> SuperstepResult:
    """Greedy k-center / Gonzalez farthest-point selection
    (flash/measurement/k-center.h:42-75): the first center is the
    max-degree vertex; each subsequent BFS folds dis(v) = min(dis,
    dist(center, v)) and the next center is the vertex maximizing dis
    — unreachable (dis = ∞) vertices win first, exactly like the
    reference's INT_MAX init. The reference's ties (its VertexMapSeq
    / TraverseLocal scans keep the first strict max in partition
    order) are made deterministic here: min id wins every tie.

    Returns state (id: long, dis: long) — hops to the nearest of the
    k centers, -1 if unreached; the chosen centers are recorded in
    res.metrics[-1]["centers"]. res.rounds = total BFS rounds.
    """
    spark = graph.edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    sym = _prep_edges(graph, P, directed, False).persist()
    verts = graph.deduced_vertices().persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    first = (
        verts.join(deg, "id", "left")
        .select("id", F.coalesce("d", F.lit(0)).alias("d"))
        .orderBy(F.col("d").desc(), F.col("id").asc())
        .limit(1)
        .collect()[0]["id"]
    )

    centers = [int(first)]
    dis = None  # (id, dis) — NULL means not yet reached by any center
    total_rounds, all_metrics = 0, []
    for i in range(k):
        res = multi_source_bfs(
            graph, sources=[centers[-1]], directed=directed,
            engine=engine, num_partitions=num_partitions,
        )
        total_rounds += res.rounds
        all_metrics.extend(res.metrics)
        d_i = res.state.select("id", F.col("dist").alias("nd"))
        if dis is None:
            dis = verts.select("id").join(d_i, "id", "left") \
                       .select("id", F.col("nd").alias("dis"))
        else:
            dis = (
                dis.join(d_i, "id", "left")
                .select("id", F.least(
                    F.coalesce("dis", F.col("nd")),
                    F.coalesce("nd", F.col("dis"))).alias("dis"))
            )
        dis = dis.localCheckpoint(eager=True)
        if i < k - 1:
            nxt = (
                dis.orderBy(F.col("dis").isNull().desc(),
                            F.col("dis").desc(), F.col("id").asc())
                .limit(1).collect()[0]["id"]
            )
            centers.append(int(nxt))

    all_metrics.append({"centers": centers})
    sym.unpersist()
    verts.unpersist()
    return SuperstepResult(
        state=dis.select("id", F.coalesce("dis", F.lit(-1)).cast("long").alias("dis")),
        rounds=total_rounds, converged=True, metrics=all_metrics,
    )
