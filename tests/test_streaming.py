"""Structured Streaming ingestion path: edge log + degree snapshot."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from linkgraph.streaming import (
    append_edge_log,
    edge_stream,
    run_degree_snapshot,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        [(s, d, 1.0, dt.datetime(2026, 1, 1, 0, 0, i)) for i, (s, d) in enumerate(rows)],
        "src long, dst long, weight double, ts timestamp",
    ).write.mode("append").parquet(path)


def test_edge_log_and_degree_snapshot(spark, tmp_path):
    inp = str(tmp_path / "incoming")
    log = str(tmp_path / "edge_log")
    snap = str(tmp_path / "deg_snapshot")
    ck1 = str(tmp_path / "ck1")
    ck2 = str(tmp_path / "ck2")

    _write_batch(spark, inp, [(1, 2), (2, 3), (1, 3)])
    q = append_edge_log(edge_stream(spark, inp), log, ck1)
    q.awaitTermination()
    assert spark.read.parquet(log).count() == 3

    # second micro-batch: only the delta is appended (checkpointed)
    _write_batch(spark, inp, [(3, 1)])
    q = append_edge_log(edge_stream(spark, inp), log, ck1)
    q.awaitTermination()
    assert spark.read.parquet(log).count() == 4

    run_degree_snapshot(spark, inp, snap, ck2)
    deg = {r["id"]: (r["out_degree"], r["in_degree"]) for r in spark.read.parquet(snap).collect()}
    assert deg == {1: (2, 1), 2: (1, 1), 3: (1, 2)}


def test_streaming_degrees_is_streaming(spark, tmp_path):
    inp = str(tmp_path / "in2")
    _write_batch(spark, inp, [(5, 6)])
    from linkgraph.streaming import streaming_degrees

    sdf = streaming_degrees(edge_stream(spark, inp), watermark="1 hour")
    assert sdf.isStreaming


def test_streaming_hub_alerts_fire_once(spark, tmp_path):
    """applyInPandasWithState hub detector: alerts exactly once, the
    batch the cumulative degree crosses the threshold, with the
    emitted-once bit surviving across checkpointed drains."""
    from linkgraph.streaming import streaming_hub_alerts

    inp = str(tmp_path / "in3")
    ck = str(tmp_path / "ck3")
    out = str(tmp_path / "alerts")

    def drain():
        # parquet sink: supports checkpoint recovery (memory sink
        # does not), so the same checkpoint carries state across drains
        q = (
            streaming_hub_alerts(edge_stream(spark, inp), threshold=3)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return {(r["id"], r["degree"]) for r in spark.read.parquet(out).collect()}
        except Exception:
            return set()

    # batch 1: vertex 7 at degree 2 — below threshold, no alert
    _write_batch(spark, inp, [(7, 1), (7, 2), (8, 1)])
    assert drain() == set()

    # batch 2: vertex 7 crosses 3 -> exactly one alert at its
    # cumulative degree; vertex 8 still below
    _write_batch(spark, inp, [(7, 3), (7, 4)])
    assert drain() == {(7, 4)}

    # batch 3: more edges for 7 — already alerted, stays silent
    _write_batch(spark, inp, [(7, 5)])
    assert drain() == {(7, 4)}


def test_streaming_edge_rates_windows_and_late_rows(spark, tmp_path):
    """Tumbling event-time windows with a watermark: counts land in
    the right window; a row older than the watermark behind the
    stream's max event time is dropped from an already-finalized
    window."""
    from linkgraph.streaming import streaming_edge_rates

    inp = str(tmp_path / "in4")
    ck = str(tmp_path / "ck4")
    out = str(tmp_path / "rates")

    def write(ts_rows):
        spark.createDataFrame(
            [(s, d, 1.0, t) for (s, d, t) in ts_rows],
            "src long, dst long, weight double, ts timestamp",
        ).write.mode("append").parquet(inp)

    def drain():
        q = (
            streaming_edge_rates(
                edge_stream(spark, inp), window="1 minute", watermark="2 minutes"
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return {
                (r["window_start"].minute, r["n_edges"], r["n_src"])
                for r in spark.read.parquet(out).collect()
            }
        except Exception:
            return set()

    t = lambda m, s=0: dt.datetime(2026, 1, 1, 0, m, s)  # noqa: E731
    # minute-0 window: 3 edges, 2 distinct sources
    write([(1, 2, t(0, 1)), (1, 3, t(0, 30)), (4, 2, t(0, 59))])
    # advance the watermark far past minute 0 (max event time 0:10)
    write([(5, 6, t(10))])
    got = drain()  # minute-0 window is finalized and emitted
    assert (0, 3, 2) in got
    # a straggler for the closed minute-0 window arrives — beyond the
    # 2-minute watermark, it must NOT reopen or re-emit the window
    write([(9, 9, t(0, 45)), (5, 7, t(11))])
    got2 = drain()
    assert {(m, n, s) for (m, n, s) in got2 if m == 0} == {(0, 3, 2)}


def test_incremental_wcc_matches_batch_wcc(spark, tmp_path):
    """Three micro-batches whose last edge bridges two existing
    components: the incrementally maintained labels must equal batch
    wcc() over the union of all edges, at every snapshot."""
    from linkgraph.algos.wcc import wcc
    from linkgraph.graph import Graph
    from linkgraph.streaming import run_incremental_wcc, wcc_snapshot

    inp = str(tmp_path / "in5")
    state = str(tmp_path / "comps")
    ck = str(tmp_path / "ck5")

    def write(rows):
        spark.createDataFrame(
            [(s, d, 1.0, dt.datetime(2026, 1, 1)) for (s, d) in rows],
            "src long, dst long, weight double, ts timestamp",
        ).write.mode("append").parquet(inp)

    def labels():
        return {
            (r["id"], r["comp"])
            for r in wcc_snapshot(spark, state).collect()
        }

    # batch 1: two separate components {1,2} and {5,6}
    write([(2, 1), (5, 6)])
    run_incremental_wcc(spark, inp, state, ck)
    assert labels() == {(1, 1), (2, 1), (5, 5), (6, 5)}

    # batch 2: grow one component + a fresh singleton pair
    write([(6, 7), (9, 8)])
    run_incremental_wcc(spark, inp, state, ck)
    assert labels() == {(1, 1), (2, 1), (5, 5), (6, 5), (7, 5), (8, 8), (9, 8)}

    # batch 3: bridge {1,2} and {5,6,7} — existing labels must remap
    write([(7, 2)])
    run_incremental_wcc(spark, inp, state, ck)
    got = labels()
    # ground truth: batch wcc over the full log
    full = Graph.from_edges(
        spark.read.parquet(inp).select("src", "dst"), directed=True
    )
    want = {(r["id"], r["comp"]) for r in wcc(full).state.collect()}
    assert got == want
    assert {c for (v, c) in got if v in (1, 2, 5, 6, 7)} == {1}


def test_incremental_wcc_snapshot_retention(spark, tmp_path):
    """retain_snapshots bounds the label table to the newest k snap
    dirs while the surviving labels stay correct."""
    import os

    from linkgraph.streaming import run_incremental_wcc, wcc_snapshot

    inp = str(tmp_path / "in6")
    state = str(tmp_path / "comps6")
    ck = str(tmp_path / "ck6")

    for batch in ([(2, 1)], [(5, 6)], [(6, 2)]):
        spark.createDataFrame(
            [(s, d, 1.0, dt.datetime(2026, 1, 1)) for (s, d) in batch],
            "src long, dst long, weight double, ts timestamp",
        ).write.mode("append").parquet(inp)
        run_incremental_wcc(spark, inp, state, ck, retain_snapshots=2)

    snaps = sorted(d for d in os.listdir(state) if d.startswith("snap="))
    assert snaps == ["snap=1", "snap=2"]
    got = {(r["id"], r["comp"]) for r in wcc_snapshot(spark, state).collect()}
    assert got == {(1, 1), (2, 1), (5, 1), (6, 1)}


def test_run_stream_cli_incremental_wcc_and_snapshot(spark, tmp_path):
    """jobs/run_stream.py drives the incremental-WCC merge and the
    snapshot query end-to-end (reuses the fixture session via
    getOrCreate)."""
    import jobs.run_stream as rs

    inp = str(tmp_path / "in7")
    state = str(tmp_path / "comps7")
    ck = str(tmp_path / "ck7")
    spark.createDataFrame(
        [(2, 1, 1.0, dt.datetime(2026, 1, 1)), (5, 6, 1.0, dt.datetime(2026, 1, 1))],
        "src long, dst long, weight double, ts timestamp",
    ).write.parquet(inp)

    assert rs.main([
        "incremental_wcc", "--in", inp, "--state", state,
        "--checkpoint", ck, "--retain-snapshots", "2",
    ]) == 0

    out = str(tmp_path / "labels7")
    assert rs.main(["snapshot", "--state", state, "--output", out]) == 0
    got = {(r["id"], r["comp"]) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 1), (2, 1), (5, 5), (6, 5)}


def test_incremental_pagerank_warm_start(spark, tmp_path):
    """Warm-started refresh matches a cold batch pagerank within 1e-6
    and converges in fewer supersteps once seeded."""
    from linkgraph.algos.pagerank import pagerank
    from linkgraph.datagen import skewed_graph
    from linkgraph.graph import Graph
    from linkgraph.streaming import pagerank_snapshot, refresh_pagerank_snapshot

    state = str(tmp_path / "pr")
    base = skewed_graph(spark, n_vertices=300, avg_degree=5, seed=7)

    cold_rounds = refresh_pagerank_snapshot(base, state, tol=1e-8)

    # grow the graph by a few edges; warm-started refresh over the
    # full log should need fewer rounds than the cold run
    grown = base.unionByName(
        spark.createDataFrame([(1, 299), (299, 2), (5, 250)], "src long, dst long")
    )
    warm_rounds = refresh_pagerank_snapshot(grown, state, tol=1e-8, retain_snapshots=2)
    assert warm_rounds < cold_rounds

    got = {r["id"]: r["rank"] for r in pagerank_snapshot(spark, state).collect()}
    want = {
        r["id"]: r["rank"]
        for r in pagerank(Graph.from_edges(grown, directed=True), tol=1e-8).state.collect()
    }
    assert set(got) == set(want)
    assert all(abs(got[v] - want[v]) <= 1e-6 for v in want)


def test_run_incremental_pagerank_stream(spark, tmp_path):
    """The streaming drain maintains the rank snapshot exactly-once
    per batch over a landing directory."""
    from linkgraph.algos.pagerank import pagerank
    from linkgraph.graph import Graph
    from linkgraph.streaming import pagerank_snapshot, run_incremental_pagerank

    inp = str(tmp_path / "in8")
    state = str(tmp_path / "pr8")
    ck = str(tmp_path / "ck8")

    def write(rows):
        spark.createDataFrame(
            [(s, d, 1.0, dt.datetime(2026, 1, 1)) for (s, d) in rows],
            "src long, dst long, weight double, ts timestamp",
        ).write.mode("append").parquet(inp)

    write([(1, 2), (2, 3), (3, 1)])
    run_incremental_pagerank(spark, inp, state, ck)
    write([(3, 4), (4, 1)])
    run_incremental_pagerank(spark, inp, state, ck)

    full = Graph.from_edges(spark.read.parquet(inp).select("src", "dst"), directed=True)
    want = {r["id"]: r["rank"] for r in pagerank(full).state.collect()}
    got = {r["id"]: r["rank"] for r in pagerank_snapshot(spark, state).collect()}
    assert set(got) == set(want)
    assert all(abs(got[v] - want[v]) <= 1e-6 for v in want)
