"""spark-submit entrypoint for the Structured Streaming surfaces —
counterpart of jobs/run_algo.py (batch algorithms) and
jobs/run_pipeline.py (training-data pipeline).

Usage:
  spark-submit --py-files dist/linkgraph.zip jobs/run_stream.py \
      incremental_wcc --in /landing/edges --state /tables/components \
      --checkpoint /ck/wcc [--retain-snapshots 4] [--follow]

  spark-submit ... jobs/run_stream.py snapshot --state /tables/components

Ops:
  incremental_wcc   drain the landing directory (availableNow) merging
                    every micro-batch into the component-label table;
                    with --follow, run continuously on a processing-time
                    trigger instead (micro-batch every --interval secs).
  incremental_pagerank  drain the landing directory; each micro-batch
                    re-converges PageRank over the accumulated log,
                    warm-started from the previous rank snapshot.
  snapshot          print the current labels/ranks (--kind wcc|pagerank;
                    write them with --output).
  degree_snapshots  continuously maintained degree table -> --output.
  edge_rates        watermark-finalized per-minute arrival rates -> console.

The streaming checkpoint makes every merge exactly-once per batch id,
so an interrupted job resumes mid-stream on restart — the same
resumability contract the batch engine's per-superstep checkpoints
give (linkgraph/engine.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="run_stream")
    ap.add_argument("op", choices=[
        "incremental_wcc", "incremental_pagerank", "snapshot",
        "degree_snapshots", "edge_rates",
    ])
    ap.add_argument("--kind", choices=["wcc", "pagerank"], default="wcc",
                    help="which snapshot table to query (snapshot op)")
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--in", dest="in_path", default=None,
                    help="landing directory of edge parquet files")
    ap.add_argument("--state", default=None,
                    help="component-label table path (incremental_wcc/snapshot)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--retain-snapshots", type=int, default=None)
    ap.add_argument("--follow", action="store_true",
                    help="run continuously instead of drain-and-exit")
    ap.add_argument("--interval", type=int, default=30,
                    help="processing-time trigger seconds (with --follow)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from linkgraph import streaming as st
    from linkgraph.session import get_spark

    kw = {}
    if args.master:
        kw["master"] = args.master
    if args.shuffle_partitions:
        kw["shuffle_partitions"] = args.shuffle_partitions
    spark = get_spark(app_name=f"stream-{args.op}", **kw)

    def need(name: str, val):
        if val is None:
            ap.error(f"--{name} is required for {args.op}")
        return val

    if args.op == "snapshot":
        reader = st.wcc_snapshot if args.kind == "wcc" else st.pagerank_snapshot
        out = reader(spark, need("state", args.state))
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
        else:
            out.orderBy("id").show(50, truncate=False)
        return 0

    in_path = need("in", args.in_path)
    ck = need("checkpoint", args.checkpoint)

    if args.op == "incremental_pagerank":
        st.run_incremental_pagerank(
            spark, in_path, need("state", args.state), ck,
            alpha=args.alpha, tol=args.tol,
            retain_snapshots=args.retain_snapshots,
        )
        return 0

    if args.op == "incremental_wcc":
        state = need("state", args.state)
        if not args.follow:
            st.run_incremental_wcc(
                spark, in_path, state, ck,
                retain_snapshots=args.retain_snapshots,
            )
            return 0
        q = (
            st.edge_stream(spark, in_path)
            .writeStream.foreachBatch(
                lambda df, _b: st.merge_edges_into_components(
                    df, state, retain_snapshots=args.retain_snapshots)
            )
            .option("checkpointLocation", ck)
            .trigger(processingTime=f"{args.interval} seconds")
            .start()
        )
        q.awaitTermination()
        return 0

    if args.op == "degree_snapshots":
        st.run_degree_snapshot(spark, in_path, need("output", args.output), ck)
        return 0

    # edge_rates
    rates = st.streaming_edge_rates(st.edge_stream(spark, in_path))
    q = (
        rates.writeStream.outputMode("append")
        .format("console")
        .option("checkpointLocation", ck)
        .trigger(**({"processingTime": f"{args.interval} seconds"}
                    if args.follow else {"availableNow": True}))
        .start()
    )
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
