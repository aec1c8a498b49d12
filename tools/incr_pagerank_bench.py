"""Evidence for warm-started incremental PageRank: after the graph
grows by a small batch, re-converging from the previous rank snapshot
must take materially fewer supersteps (and less wall time) than a cold
run at the same tol, with identical results (unique fixpoint).

Prints one JSON line; paste the row into BASELINE.md.

Usage: python tools/incr_pagerank_bench.py [--n-vertices 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vertices", type=int, default=2_000_000)
    ap.add_argument("--deg", type=int, default=4)
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from linkgraph.datagen import skewed_graph
    from linkgraph.session import get_spark
    from linkgraph.streaming import refresh_pagerank_snapshot

    spark = get_spark(
        app_name="incr-pr-bench",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    d = tempfile.mkdtemp(prefix="incrpr_")
    state = f"{d}/state"
    try:
        skewed_graph(spark, args.n_vertices, args.deg).write.parquet(f"{d}/base")
        base = spark.read.parquet(f"{d}/base")
        n_base = base.count()

        t0 = time.time()
        cold_rounds = refresh_pagerank_snapshot(base, state, tol=args.tol)
        cold_s = time.time() - t0

        batch = (
            spark.range(args.batch)
            .select(
                F.abs(F.xxhash64(F.col("id"), F.lit(3)) % args.n_vertices).alias("src"),
                F.abs(F.xxhash64(F.col("id"), F.lit(4)) % args.n_vertices).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
        )
        batch.write.parquet(f"{d}/batch")
        grown = base.unionByName(spark.read.parquet(f"{d}/batch"))

        t0 = time.time()
        warm_rounds = refresh_pagerank_snapshot(
            grown, state, tol=args.tol, retain_snapshots=2
        )
        warm_s = time.time() - t0

        print(json.dumps({
            "metric": "incremental_pagerank_warm_vs_cold",
            "n_base_edges": n_base,
            "n_batch_edges": args.batch,
            "tol": args.tol,
            "cold_rounds": cold_rounds,
            "cold_sec": round(cold_s, 2),
            "warm_rounds": warm_rounds,
            "warm_sec": round(warm_s, 2),
            "round_ratio": round(warm_rounds / max(1, cold_rounds), 3),
        }))
        return 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
