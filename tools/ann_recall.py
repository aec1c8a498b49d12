"""Measure embedding_ann recall@k against the exact embedding_topk
baseline at a given sf dir.

Usage: python tools/ann_recall.py [SF_DIR] [N_QUERIES] [K]
Prints one JSON line {"recall_at_k": ..., "multiprobe_recall": ...,
"singleprobe_recall": ...} for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph import pipeline as pl
from linkgraph.session import get_spark


def recall(exact: dict, approx: dict) -> float:
    hits = tot = 0
    for q, truth in exact.items():
        got = approx.get(q, set())
        hits += len(truth & got)
        tot += len(truth)
    return hits / tot if tot else 0.0


def topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["q"], set()).add(r["vec_id"])
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="ann-recall")
    exact = topk_sets(pl.embedding_topk(spark, sf_dir, n_queries=nq, k=k))
    # library defaults = auto geometry (pl.ann_auto_params)
    auto = topk_sets(pl.embedding_ann(spark, sf_dir, n_queries=nq, k=k, multiprobe=True))
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    auto_bits, auto_tables = pl.ann_auto_params(n_vec)
    # pinned gate geometry (8x4), multi- and single-probe
    multi = topk_sets(pl.embedding_ann(spark, sf_dir, n_queries=nq, k=k,
                                       bits=pl.ANN_BITS, tables=pl.ANN_TABLES,
                                       multiprobe=True))
    single = topk_sets(pl.embedding_ann(spark, sf_dir, n_queries=nq, k=k,
                                        bits=pl.ANN_BITS, tables=pl.ANN_TABLES,
                                        multiprobe=False))
    # IVF scale path at auto geometry (n_centroids ~ sqrt(N))
    ivf = topk_sets(pl.embedding_ivf_topk(spark, sf_dir, n_queries=nq, k=k))
    ivf_c, ivf_p = pl.ivf_auto_params(n_vec)
    print(json.dumps({
        "sf_dir": sf_dir, "n_queries": nq, "k": k, "n_vectors": n_vec,
        "auto_bits": auto_bits, "auto_tables": auto_tables,
        "auto_recall": round(recall(exact, auto), 4),
        "gate8x4_multiprobe_recall": round(recall(exact, multi), 4),
        "gate8x4_singleprobe_recall": round(recall(exact, single), 4),
        "ivf_centroids": ivf_c, "ivf_probe": ivf_p,
        "ivf_auto_recall": round(recall(exact, ivf), 4),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
