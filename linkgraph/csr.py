"""Vectorized CSR-block kernels: the north-star execution path.

The reference stores topology as per-fragment CSR (neighbor array +
offsets, docs/analytical_engine/performance_tuning.md:42-86) and runs
thread-parallel gather-scatter over it (ParallelEngine::ForEach,
apps/pagerank/pagerank_networkx.h:65,108). The Spark re-expression:

  * the edge set is aggregated ONCE into per-source adjacency blocks
    (src, nbrs: array<long>) — exactly a CSR row: `nbrs` is the
    indices array, the row boundary is the implicit indptr. The block
    table is hash-partitioned by src and persisted, so it never moves
    again (the reference's "mirrors stay put" design).
  * each superstep joins the co-partitioned vertex state onto the
    blocks (no edge shuffle — both sides share the src partitioning)
    and runs an Arrow-batched `mapInPandas` kernel that does the
    scatter in numpy: repeat each source's message over its out-list,
    concatenate the neighbor arrays, and PRE-COMBINE per destination
    inside the partition (np/pandas groupby-sum) before the single
    (dst → contribution) shuffle. That pre-combine is the map-side
    message combining of the reference's SyncStateOnOuterVertex
    strategies (key_concepts.rst:127-143).

No per-row Python anywhere: the kernel touches whole Arrow batches and
every operation inside is a numpy/pandas vectorized call.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from linkgraph.engine import Observed, SuperstepEngine, SuperstepResult
from linkgraph.graph import Graph
from linkgraph.joins import state_join


CSR_CHUNK_SIZE = 8192


def adjacency_blocks(
    edges: DataFrame, num_partitions: int, chunk_size: int = CSR_CHUNK_SIZE
) -> DataFrame:
    """CSR blocks (src: long, nbrs: array<long>, odeg: int) hash-
    partitioned by src; ``odeg`` is the block's own length (a source
    may own several blocks). Built once per job and persisted by
    callers.

    Hub sharding: a power-law hub would otherwise become ONE
    collect_list row holding its entire out-list (a 10⁸-degree hub =
    a multi-GB row pinned to a single task). Sources with out-degree
    above ``chunk_size`` are split into ⌈deg/chunk_size⌉ blocks keyed
    by a deterministic hash of the neighbor — no windows/sorts, the
    split is decided row-by-row inside the same shuffle that builds
    the blocks. The scatter kernel is chunk-oblivious (each block row
    carries its own length and the source's message is repeated per
    block), so correctness is unaffected."""
    deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    chunks = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.col("_deg") / F.lit(chunk_size)).cast("long")
    )
    return (
        edges.join(deg, "src")
        .withColumn("_chunk", F.pmod(F.xxhash64("dst"), chunks))
        .groupBy("src", "_chunk")
        .agg(F.collect_list("dst").alias("nbrs"), F.count("*").cast("int").alias("odeg"))
        .select("src", "nbrs", "odeg")
        .repartition(num_partitions, "src")
    )


def _scatter_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched gather-scatter: (nbrs, w) rows -> pre-combined
    (dst, c) partials. Vectorized: repeat + concatenate + groupby."""
    for pdf in batches:
        if pdf.empty:
            continue
        counts = pdf["odeg"].to_numpy()
        w = np.repeat(pdf["w"].to_numpy(), counts)
        dst = np.concatenate(pdf["nbrs"].to_numpy()) if len(pdf) else np.empty(0, np.int64)
        out = pd.DataFrame({"dst": dst.astype(np.int64), "c": w})
        # map-side combine: one partial row per distinct dst in the batch
        yield out.groupby("dst", sort=False, as_index=False)["c"].sum()


HUB_SPLIT_DEGREE = 65_536


def pagerank_csr(
    graph: Graph,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
    engine: SuperstepEngine | None = None,
    num_partitions: int | None = None,
    hub_degree: int = HUB_SPLIT_DEGREE,
) -> SuperstepResult:
    """PageRank with identical semantics to linkgraph.algos.pagerank
    (pagerank_networkx.h:54-163 transcription) but with the CSR-block
    scatter kernel instead of an edge join per superstep.

    Hub split: chunking alone bounds ROW size, but every chunk of a
    hub source still hashes to the same src partition — a 4M-degree
    hub made one task own 20% of all edges (measured 3.3× per-edge
    slowdown, tools/skew_bench.py). Sources with out-degree ≥
    ``hub_degree`` therefore go to a separate block frame partitioned
    ROUND-ROBIN over all partitions; their per-superstep messages are
    a ≤|hubs|-row frame that broadcasts, so the hub blocks never
    shuffle and every partition carries an even share of hub edges —
    the top_hub_split discipline wired into the hot path."""
    spark = graph.edges.sparkSession
    eng = engine or SuperstepEngine(spark)
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    edges = graph.edges.select("src", "dst") if graph.directed else (
        graph.to_undirected(dedup=True).edges.select("src", "dst")
    )
    src_totals = edges.groupBy("src").agg(F.count("*").alias("t")).persist()
    hub_ids = src_totals.where(F.col("t") >= hub_degree).select("src")
    n_hubs = hub_ids.count()
    if n_hubs:
        tail_edges = edges.join(F.broadcast(hub_ids), "src", "left_anti")
        hub_edges = edges.join(F.broadcast(hub_ids), "src", "left_semi")
        hub_adj = adjacency_blocks(hub_edges, P).repartition(P).persist()
        n_hub_blocks = hub_adj.count()
    else:
        tail_edges = edges
        hub_adj = None
        n_hub_blocks = 0
    adj = adjacency_blocks(tail_edges, P).persist()
    n_edges = src_totals.agg(F.sum("t")).collect()[0][0] or 0

    verts = graph.deduced_vertices()
    # full out-degree per source (a chunked source owns several adj
    # rows, hubs live in their own frame — sum over both)
    src_deg = src_totals.select(F.col("src").alias("id"), F.col("t").cast("long").alias("odeg"))
    deg = (
        verts.join(src_deg, "id", "left")
        .select("id", F.coalesce("odeg", F.lit(0)).cast("long").alias("deg"))
    )
    n = deg.count()
    if n == 0:
        return SuperstepResult(
            state=verts.select("id", F.lit(0.0).alias("rank")), rounds=0, converged=True
        )

    init = deg.select("id", "deg", F.lit(1.0 / n).alias("rank")).repartition(P, "id")
    dangling_cell: dict[str, float | None] = {"mass": None}
    base = (1.0 - alpha) / n

    def step(state: DataFrame, round_: int):
        state = state.drop("prev_rank")
        if dangling_cell["mass"] is None:
            dangling_cell["mass"] = (
                state.agg(
                    F.sum(F.when(F.col("deg") == 0, F.col("rank")).otherwise(0.0)).alias("d")
                ).collect()[0]["d"]
                or 0.0
            )
        dangling = dangling_cell["mass"]
        # gather inputs: co-partitioned join (adj and msgs both hashed by src)
        msgs_in = state.where(F.col("deg") > 0).select(
            F.col("id").alias("src"), (F.col("rank") / F.col("deg")).alias("w")
        )
        partials = adj.join(msgs_in.hint("SHUFFLE_HASH"), "src").select("nbrs", "odeg", "w").mapInPandas(
            _scatter_kernel, schema="dst long, c double"
        )
        if n_hub_blocks:
            # hub sources: their messages are a tiny frame (one row per
            # hub) — broadcast it onto the round-robin-spread hub
            # blocks, so no partition owns a whole hub's edge list
            hub_msgs = msgs_in.join(F.broadcast(hub_ids), "src", "left_semi")
            hub_partials = (
                hub_adj.join(F.broadcast(hub_msgs), "src")
                .select("nbrs", "odeg", "w")
                .mapInPandas(_scatter_kernel, schema="dst long, c double")
            )
            partials = partials.unionByName(hub_partials)
        contribs = partials.groupBy(F.col("dst").alias("id")).agg(F.sum("c").alias("msg"))
        new_state = (
            state_join(state.withColumnRenamed("rank", "prev_rank"), contribs)
            .select(
                "id",
                "deg",
                (
                    F.lit(base)
                    + F.lit(alpha) * F.coalesce("msg", F.lit(0.0))
                    + F.lit(alpha * dangling / n)
                ).alias("rank"),
                "prev_rank",
            )
        )
        def to_metrics(agg: dict) -> dict:
            eps = agg["eps"] or 0.0
            dangling_cell["mass"] = agg["dangling"] or 0.0
            return {
                "halt": eps < tol * n,
                "l1_delta": eps,
                "edges_processed": n_edges,
                "mode": "csr",
            }

        # L1 + next-round dangling mass ride the truncation action
        return new_state, Observed(
            exprs=[
                F.sum(F.abs(F.col("rank") - F.col("prev_rank"))).alias("eps"),
                F.sum(F.when(F.col("deg") == 0, F.col("rank")).otherwise(0.0)).alias(
                    "dangling"
                ),
            ],
            to_metrics=to_metrics,
        )

    result = eng.run(init, step, max_rounds=max_iter)
    result.state = result.state.select("id", "rank")
    adj.unpersist()
    src_totals.unpersist()
    if hub_adj is not None:
        hub_adj.unpersist()
    return result
