"""Streaming edge ingestion — the Structured Streaming analog of the
reference's realtime-write path (Groot: continuous edge/vertex writes
with periodic queryable snapshots, interactive_engine/groot-*; SURVEY
§2.9 scoped the full Groot store out, this is the Spark-native
ingestion surface a link-graph engine needs).

Shape:
  * ``edge_stream``      — readStream over a directory of edge files
    (parquet/json/csv), schema (src, dst [, weight, ts]).
  * ``append_edge_log``  — writeStream into a partitioned parquet edge
    log with checkpointing: the durable, exactly-once ingestion sink;
    a Graph snapshot is just ``Graph.from_edges(spark.read.parquet(log))``.
  * ``streaming_degrees`` — continuously maintained per-vertex degree
    counts (stateful aggregation), the canonical incremental graph
    stat; with an event-time column, a watermark bounds state.
  * ``streaming_edge_rates`` — event-time tumbling-window arrival
    rates with watermark-finalized windows (late-data handling).
  * ``streaming_hub_alerts`` — custom stateful operator
    (applyInPandasWithState): fire-once hub detection.
  * ``run_incremental_wcc`` — incrementally maintained connected
    components: each micro-batch union-merges its edges into a
    snapshot-isolated component-label table (foreachBatch), so labels
    stay current without recomputing WCC over the full edge log.
  * ``run_incremental_pagerank`` — warm-started PageRank maintenance:
    each micro-batch re-converges over the accumulated log seeded from
    the previous rank snapshot (identical fixpoint, far fewer
    supersteps when the batch perturbs little of the graph).

All of it is plain Structured Streaming — declared sources/sinks,
checkpointed state, no custom receivers — so the same code runs
against file drops locally and Kafka/cloud streams in production by
swapping the source format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EDGE_SCHEMA = "src long, dst long, weight double, ts timestamp"


def edge_stream(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema: str = EDGE_SCHEMA,
) -> DataFrame:
    """Streaming DataFrame of edges arriving under ``path``."""
    return spark.readStream.format(format).schema(schema).load(path)


def append_edge_log(
    edges: DataFrame,
    log_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
):
    """Durable edge log: append-only parquet sink with a streaming
    checkpoint (exactly-once per epoch). Returns the query handle;
    with ``trigger_available_now`` it drains what's present and
    stops — the batch-ingest mode used by tests and backfills."""
    writer = (
        edges.writeStream.format("parquet")
        .option("path", log_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_degrees(
    edges: DataFrame,
    watermark: str | None = None,
) -> DataFrame:
    """Continuously maintained out/in-degree per vertex. With
    ``watermark`` (e.g. '10 minutes') the ts column bounds state for
    late data; without it the aggregation keeps full state (fine for
    id-keyed counts)."""
    e = edges
    if watermark is not None:
        e = e.withWatermark("ts", watermark)
    ends = e.select(F.col("src").alias("id"), F.lit(1).alias("out"), F.lit(0).alias("inn")) \
        .unionByName(
            e.select(F.col("dst").alias("id"), F.lit(0).alias("out"), F.lit(1).alias("inn"))
        )
    return ends.groupBy("id").agg(
        F.sum("out").alias("out_degree"), F.sum("inn").alias("in_degree")
    )


def run_degree_snapshot(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """One availableNow pass: drain the incoming edge directory,
    update the degree aggregation state and write a complete-mode
    snapshot to memory, then persist it as parquet — the periodic
    'queryable snapshot' cadence of the reference's realtime store."""
    deg = streaming_degrees(edge_stream(spark, in_path))
    q = (
        deg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("deg_snapshot")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.table("deg_snapshot").write.mode("overwrite").parquet(out_path)


def streaming_edge_rates(
    edges: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time TUMBLING-WINDOW edge-arrival rates with late-data
    handling: (window_start, window_end, n_edges, n_src) per window.
    The watermark bounds state — windows older than max(event time) −
    watermark are finalized and dropped from the store, so state stays
    O(active windows) regardless of stream length; rows later than the
    watermark are discarded (counted as late, the documented Structured
    Streaming contract). This is the canonical windowed-agg shape the
    ingestion monitor needs (edges/sec per window, distinct sources)."""
    return (
        edges.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_edges"),
            F.approx_count_distinct("src").alias("n_src"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_edges",
            "n_src",
        )
    )


def streaming_hub_alerts(edges: DataFrame, threshold: int = 1000) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState —
    the arbitrary-state API a declarative groupBy-agg can't express):
    maintains a running out-degree per vertex across micro-batches and
    emits exactly ONE alert row (id, degree) in the micro-batch where
    the vertex's cumulative degree first crosses ``threshold`` —
    the streaming analog of the hub-split decision the batch CSR path
    makes statically (linkgraph/csr.py hub sources).

    State per key is (cnt: long, alerted: boolean); the emitted-once
    bit survives restarts through the query checkpoint. Output mode is
    append (each alert is final). Arrow-batched: the callable sees
    pandas frames, never Python rows."""
    import pandas as pd  # noqa: F401 (vectorized state kernel)
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        import pandas as pd

        cnt, alerted = state.get if state.exists else (0, False)
        for pdf in pdf_iter:
            cnt += len(pdf)
        fire = cnt >= threshold and not alerted
        state.update((int(cnt), bool(alerted or fire)))
        if fire:
            yield pd.DataFrame({"id": [int(key[0])], "degree": [int(cnt)]})
        else:
            yield pd.DataFrame(
                {"id": pd.Series([], dtype="int64"),
                 "degree": pd.Series([], dtype="int64")}
            )

    return (
        edges.select(F.col("src").alias("id"))
        .groupBy("id")
        .applyInPandasWithState(
            fn,
            outputStructType="id long, degree long",
            stateStructType="cnt long, alerted boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- incremental connected components ---------------------------------------
#
# The reference's realtime store keeps analytical results queryable as
# edges stream in (Groot snapshots + GAE re-run); the Spark-native
# equivalent below maintains WCC labels INCREMENTALLY: per micro-batch
# work is O(|batch| + components touched by the batch), never a full
# recompute over the edge log. Labels are canonical min-member ids, so
# the table at any snapshot equals batch wcc() over all edges seen.


def _list_snap_ids(spark: SparkSession, state_path: str) -> list[int]:
    """Snapshot ids present under ``state_path``, from a single
    directory listing via the Hadoop FileSystem API (works on any
    scheme — local, HDFS, s3a). A listing is O(#snapshots) metadata
    calls; reading the parquet table to ``max(snap)`` would list every
    FILE of every snapshot first, which at web scale is millions of
    status calls per micro-batch."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(state_path)
    try:
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return []
        out = []
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("snap="):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)
    except Exception:
        return []


def _latest_snapshot(spark: SparkSession, state_path: str, cols: tuple[str, ...]):
    """(DataFrame of ``cols``, snap id) of the newest snapshot dir under
    ``state_path``, or (None, -1) if no snapshot exists yet. Snapshots
    are plain ``snap=<k>`` partition dirs — each batch writes a NEW one
    (copy-on-write), so a concurrent reader never observes a half
    overwrite; this is the same snapshot-isolation contract an Iceberg
    MERGE INTO gives, expressed on bare parquet. Only the latest dir is
    read — older snapshots never enter the scan."""
    snaps = _list_snap_ids(spark, state_path)
    if not snaps:
        return None, -1
    latest = snaps[-1]
    frame = spark.read.parquet(f"{state_path}/snap={latest}").select(*cols)
    return frame, latest


def _latest_wcc_snapshot(spark: SparkSession, state_path: str):
    return _latest_snapshot(spark, state_path, ("id", "comp"))


def _expire_snapshots(spark: SparkSession, state_path: str, keep: int) -> None:
    """Delete all but the newest ``keep`` snapshot dirs — without this
    the label table grows O(batches × V) on disk. Kept ≥2 so a reader
    that resolved 'latest' just before a new write still has its dir."""
    snaps = _list_snap_ids(spark, state_path)
    doomed = snaps[:-keep] if keep > 0 else []
    if not doomed:
        return
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(state_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    for k in doomed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_path}/snap={k}"), True)


def wcc_snapshot(spark: SparkSession, state_path: str) -> DataFrame:
    """Current (id, comp) component labels — the queryable snapshot."""
    labels, _ = _latest_wcc_snapshot(spark, state_path)
    if labels is None:
        return spark.createDataFrame([], "id long, comp long")
    return labels


def merge_edges_into_components(
    edges: DataFrame, state_path: str, retain_snapshots: int | None = None
) -> None:
    """Union-merge one (finite) edge frame into the label table.

    Plan, all keyed joins — no driver-side loops over data:
      1. touched vertices <- batch edges; current comp from the latest
         snapshot (left join), new vertices start as their own comp.
      2. contract the batch to COMPONENT-level edges (comp(src),
         comp(dst)) — at most |batch| rows, usually far fewer.
      3. run wcc() on that contracted graph only: merges are computed
         on components touched this batch, not the whole graph.
      4. relabel the full table through the (old comp -> new comp)
         mapping join and write snapshot snap=<k+1>.
    Step 4's rewrite is the copy-on-write cost of bare parquet; on an
    Iceberg/Delta table it becomes a MERGE INTO touching only affected
    partitions. Labels stay min-member canonical because every merge
    takes the min over min-labels."""
    spark = edges.sparkSession
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .dropDuplicates(["src", "dst"])
    )
    labels, snap = _latest_wcc_snapshot(spark, state_path)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if labels is None:
        labels = spark.createDataFrame([], "id long, comp long")
    cur = nodes.join(labels, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("comp")
    )
    if cur.isEmpty():
        return
    comp_edges = (
        e.join(cur.select(F.col("id").alias("src"), F.col("comp").alias("cs")), "src")
        .join(cur.select(F.col("id").alias("dst"), F.col("comp").alias("cd")), "dst")
        .select(F.col("cs").alias("src"), F.col("cd").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    if comp_edges.isEmpty():
        mapping = None
    else:
        from linkgraph.algos.wcc import wcc
        from linkgraph.graph import Graph

        res = wcc(Graph.from_edges(comp_edges, directed=False))
        mapping = res.state.where(F.col("id") != F.col("comp")).select(
            F.col("id").alias("comp"), F.col("comp").alias("new_comp")
        )
    full = labels.unionByName(cur.join(labels, "id", "left_anti"))
    if mapping is not None:
        full = full.join(F.broadcast(mapping), "comp", "left").select(
            "id", F.coalesce("new_comp", F.col("comp")).alias("comp")
        )
    full.withColumn("snap", F.lit(snap + 1)).write.mode("append").partitionBy(
        "snap"
    ).parquet(state_path)
    if retain_snapshots is not None:
        _expire_snapshots(spark, state_path, max(2, retain_snapshots))


def run_incremental_wcc(
    spark: SparkSession,
    in_path: str,
    state_path: str,
    checkpoint_path: str,
    retain_snapshots: int | None = None,
):
    """Drain the incoming edge directory (availableNow) merging every
    micro-batch into the component-label table — foreachBatch is the
    documented Structured Streaming pattern for sinks that need a
    batch-only operation (the iterative wcc join loop) per epoch; the
    streaming checkpoint makes the merge exactly-once per batch id.
    ``retain_snapshots`` bounds state storage to the newest k label
    snapshots (min 2, so in-flight readers keep their dir)."""
    q = (
        edge_stream(spark, in_path)
        .writeStream.foreachBatch(
            lambda batch_df, _bid: merge_edges_into_components(
                batch_df, state_path, retain_snapshots=retain_snapshots
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --- incremental (warm-started) PageRank -------------------------------------
#
# PageRank is a GLOBAL fixpoint — unlike WCC there is no sound
# batch-local merge. The streaming-native form is warm starting: seed
# each re-convergence from the previous snapshot's ranks, so a batch
# that perturbs a small part of the graph costs a few supersteps
# instead of a cold run (the fixpoint is unique, so the answer is
# IDENTICAL to a cold recompute at the same tol).


def pagerank_snapshot(spark: SparkSession, state_path: str) -> DataFrame:
    """Current (id, rank) — the queryable snapshot."""
    ranks, _ = _latest_snapshot(spark, state_path, ("id", "rank"))
    if ranks is None:
        return spark.createDataFrame([], "id long, rank double")
    return ranks


def refresh_pagerank_snapshot(
    full_edges: DataFrame,
    state_path: str,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    retain_snapshots: int | None = None,
) -> int:
    """Re-converge PageRank over ``full_edges`` (the WHOLE edge log,
    not just a batch), warm-started from the latest snapshot, and write
    snapshot snap=<k+1>. Returns the superstep count — the number that
    shrinks as warm starts pay off."""
    spark = full_edges.sparkSession
    from linkgraph.algos.pagerank import pagerank
    from linkgraph.graph import Graph

    prev, snap = _latest_snapshot(spark, state_path, ("id", "rank"))
    res = pagerank(
        Graph.from_edges(full_edges.select("src", "dst"), directed=True),
        alpha=alpha,
        tol=tol,
        max_iter=max_iter,
        init_ranks=prev,
    )
    res.state.withColumn("snap", F.lit(snap + 1)).write.mode("append").partitionBy(
        "snap"
    ).parquet(state_path)
    if retain_snapshots is not None:
        _expire_snapshots(spark, state_path, max(2, retain_snapshots))
    return res.rounds


def run_incremental_pagerank(
    spark: SparkSession,
    in_path: str,
    state_path: str,
    checkpoint_path: str,
    alpha: float = 0.85,
    tol: float = 1e-6,
    retain_snapshots: int | None = None,
):
    """Drain the landing directory; every micro-batch triggers one
    warm-started re-convergence over the accumulated log. The batch
    rows themselves only signal "the log grew" — the recompute reads
    the landing dir, so exactly-once per batch id still holds."""
    q = (
        edge_stream(spark, in_path)
        .writeStream.foreachBatch(
            lambda _df, _bid: refresh_pagerank_snapshot(
                spark.read.parquet(in_path),
                state_path,
                alpha=alpha,
                tol=tol,
                retain_snapshots=retain_snapshots,
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
