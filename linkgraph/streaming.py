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
