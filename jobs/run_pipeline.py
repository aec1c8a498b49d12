"""spark-submit entrypoint for the training-data pipeline operators
(the document/embedding side of the engine — dedup, fingerprints,
quality, similarity search). Counterpart of jobs/run_algo.py.

Usage:
  spark-submit --py-files dist/linkgraph.zip jobs/run_pipeline.py \
      <op> --sf-dir /data/sfX --output /out [op options]

Ops map 1:1 onto linkgraph.pipeline functions; every one reads
``{sf_dir}/documents.parquet`` / ``embeddings.parquet`` and writes the
result as parquet to --output (or shows 20 rows without --output).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="run_pipeline")
    ap.add_argument("op", choices=[
        "doc_sha", "dedup_exact", "dedup_clusters", "token_count",
        "quality_score", "lang_id", "ngram_jaccard", "minhash",
        "lsh_pairs", "simhash", "embedding_topk", "embedding_ann",
        "embedding_ivf", "embedding_near_dup", "blob_stats",
    ])
    ap.add_argument("--sf-dir", required=True,
                    help="directory with documents.parquet / embeddings.parquet")
    ap.add_argument("--output", default=None, help="parquet output dir")
    ap.add_argument("--threshold", type=float, default=0.9,
                    help="cosine threshold (embedding_near_dup)")
    ap.add_argument("--n-queries", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from linkgraph import pipeline as pl
    from linkgraph.session import get_spark

    kw = {}
    if args.master:
        kw["master"] = args.master
    if args.shuffle_partitions:
        kw["shuffle_partitions"] = args.shuffle_partitions
    spark = get_spark(app_name=f"pipeline-{args.op}", **kw)

    sf = args.sf_dir
    if args.op == "doc_sha":
        out = pl.doc_sha(spark, sf)
    elif args.op == "dedup_exact":
        out = pl.dedup_exact(spark, sf)
    elif args.op == "dedup_clusters":
        out = pl.dedup_clusters(spark, sf)
    elif args.op == "token_count":
        out = pl.token_count(spark, sf)
    elif args.op == "quality_score":
        out = pl.quality_score(spark, sf)
    elif args.op == "lang_id":
        out = pl.lang_id(spark, sf)
    elif args.op == "ngram_jaccard":
        out = pl.ngram_jaccard_pairs(spark, sf)
    elif args.op == "minhash":
        out = pl.minhash_signatures(spark, sf)
    elif args.op == "lsh_pairs":
        out = pl.lsh_candidate_pairs(spark, sf)
    elif args.op == "simhash":
        out = pl.simhash(spark, sf)
    elif args.op == "embedding_topk":
        out = pl.embedding_topk(spark, sf, n_queries=args.n_queries, k=args.k)
    elif args.op == "embedding_ann":
        out = pl.embedding_ann(spark, sf, n_queries=args.n_queries, k=args.k)
    elif args.op == "embedding_ivf":
        out = pl.embedding_ivf_topk(spark, sf, n_queries=args.n_queries, k=args.k)
    elif args.op == "embedding_near_dup":
        out = pl.embedding_near_dup(spark, sf, threshold=args.threshold)
    elif args.op == "blob_stats":
        from linkgraph.multimodal import blob_stats

        out = blob_stats(spark, sf)
    else:  # pragma: no cover
        raise SystemExit(f"unknown op {args.op}")

    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        out.show(20, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
