"""Example custom app for `jobs/run_algo.py --algo custom --app ...`.

The engine's step_fn contract is the PIE/Pregel user surface
(python/graphscope/analytical/udf/decorators.py exposes the same two
phases as @pie/@pregel decorators in the reference; here the contract
is a plain callable — no codegen needed, Catalyst is the codegen):

  make(graph, spark, args) -> (init_state, step_fn)
    init_state : DataFrame          -- PEval input (vertex state)
    step_fn(state, round) -> (new_state, finalize)
      new_state : DataFrame         -- one superstep's declarative plan
      finalize(materialized_state) -> {"halt": bool, ...metrics}
                                     -- the Sum collective + vote-to-halt

This app marks every vertex within --k hops of --source (frontier
BFS with an explicit hop budget):

  python jobs/run_algo.py custom --app examples/reach_within.py \
      --edges <parquet> --source 1 --k 3 --output /tmp/reach
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def make(graph, spark, args):
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(P, "src")
        .persist()
    )
    k = args.k
    init = graph.deduced_vertices().select(
        "id",
        F.when(F.col("id") == args.source, 0).otherwise(-1).cast("long").alias("hops"),
        (F.col("id") == args.source).alias("fr"),
    ).repartition(P, "id")

    def step(state: DataFrame, round_: int):
        frontier = state.where(F.col("fr")).select(F.col("id").alias("src"))
        discovered = (
            edges.join(frontier.hint("SHUFFLE_HASH"), "src")
            .select(F.col("dst").alias("id")).distinct()
        )
        new_state = (
            state.join(discovered.withColumn("hit", F.lit(True)).hint("SHUFFLE_HASH"),
                       "id", "left")
            .select(
                "id",
                F.when((F.col("hops") < 0) & F.col("hit").isNotNull(),
                       F.lit(round_ + 1).cast("long"))
                .otherwise(F.col("hops")).alias("hops"),
                ((F.col("hops") < 0) & F.col("hit").isNotNull()).alias("fr"),
            )
        )

        def finalize(df: DataFrame) -> dict:
            fr = df.agg(F.sum(F.col("fr").cast("long")).alias("c")).collect()[0]["c"] or 0
            return {"halt": fr == 0 or round_ + 1 >= k, "frontier": int(fr)}

        return new_state, finalize

    return init, step
