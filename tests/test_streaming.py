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
