"""Evidence for the incremental-WCC claim: merging a small edge batch
into an existing component-label table must cost far less than
recomputing WCC over the full edge log, and the merge cost must track
the BATCH size, not the log size.

Protocol:
  1. build a skewed base graph (default 8M directed edges), bootstrap
     the label table with one merge of the whole base (that first merge
     IS a full WCC — the honest worst case),
  2. merge a small batch (default 10k edges over existing vertices),
     timed,
  3. recompute batch wcc() over base+batch, timed,
  4. assert the incremental labels equal the recompute exactly.

Prints one JSON line; paste the row into BASELINE.md.

Usage: python tools/incr_wcc_bench.py [--n-vertices 2000000] [--deg 4]
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
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from linkgraph.algos.wcc import wcc
    from linkgraph.datagen import skewed_graph
    from linkgraph.graph import Graph
    from linkgraph.session import get_spark
    from linkgraph.streaming import merge_edges_into_components, wcc_snapshot

    spark = get_spark(
        app_name="incr-wcc-bench",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    d = tempfile.mkdtemp(prefix="incrwcc_")
    base_path, state = f"{d}/base", f"{d}/state"
    try:
        skewed_graph(spark, args.n_vertices, args.deg).write.parquet(base_path)
        base = spark.read.parquet(base_path)
        n_base = base.count()

        # bootstrap = full WCC expressed as one giant "batch" merge
        t0 = time.time()
        merge_edges_into_components(base, state, retain_snapshots=2)
        bootstrap_s = time.time() - t0

        # small batch: fresh edges between existing vertices, disjoint
        # from the base generator's (src, dst) support
        batch = (
            spark.range(args.batch)
            .select(
                (F.xxhash64(F.col("id"), F.lit(1)) % args.n_vertices).alias("src"),
                (F.xxhash64(F.col("id"), F.lit(2)) % args.n_vertices).alias("dst"),
            )
            .select(F.abs("src").alias("src"), F.abs("dst").alias("dst"))
            .where(F.col("src") != F.col("dst"))
        )
        batch.write.parquet(f"{d}/batch")
        batch = spark.read.parquet(f"{d}/batch")
        n_batch = batch.count()

        t0 = time.time()
        merge_edges_into_components(batch, state, retain_snapshots=2)
        merge_s = time.time() - t0

        t0 = time.time()
        full = wcc(Graph.from_edges(base.unionByName(batch), directed=True))
        n_full = full.state.count()
        recompute_s = time.time() - t0

        diff = (
            wcc_snapshot(spark, state)
            .join(full.state.withColumnRenamed("comp", "want"), "id", "full")
            .where(
                F.col("comp").isNull()
                | F.col("want").isNull()
                | (F.col("comp") != F.col("want"))
            )
            .count()
        )
        print(json.dumps({
            "metric": "incremental_wcc_merge_vs_recompute",
            "n_base_edges": n_base,
            "n_batch_edges": n_batch,
            "n_vertices_labeled": n_full,
            "bootstrap_full_merge_sec": round(bootstrap_s, 2),
            "incremental_merge_sec": round(merge_s, 2),
            "full_recompute_sec": round(recompute_s, 2),
            "speedup_vs_recompute": round(recompute_s / merge_s, 2),
            "labels_match_recompute": diff == 0,
        }))
        return 0 if diff == 0 else 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
