"""Skew mitigation: salted two-stage aggregation for hub vertices.

The reference absorbs hub skew structurally (mirrors replicate hub
state per fragment; per-thread message channels;
docs/analytical_engine/key_concepts.rst:15-31) and by degree-ordered
pruning in triangles (apps/clustering/triangles.h:70-94). In Spark the
equivalent for the message-combine step is the classic salted
aggregation: a power-law dst (all ranks flowing into one hub) lands on
a single reducer; salting splits that key across `n_salts` reducers
(stage 1) and re-combines the partials (stage 2, tiny).

AQE's skewJoin handles the *join* side; this handles the *aggregation*
side, which AQE does not split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    agg_col: Column,
    alias: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation of ``agg_col`` by ``key``.

    ``agg_col`` must be an associative aggregate expression over input
    columns (e.g. F.sum("w"), F.min("cand"), F.count("*")). Stage 1
    groups by (key, salt) where salt = a deterministic spread derived
    from the full row via spark_partition_id (uniform, no rand() —
    keeps the job deterministic and retry-safe); stage 2 re-aggregates
    the ≤ n_salts partials per key.

    For sum/count the stage-2 re-aggregate is F.sum; for min/max it is
    the same function — pass ``agg_col`` built from those only.
    """
    fname = agg_col._jc.toString().split("(")[0].lower()  # sum/min/max/count
    stage2 = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    if fname not in stage2:
        raise ValueError(f"salted_agg supports sum/count/min/max, got {fname!r}")
    salted = df.withColumn("_salt", F.spark_partition_id() % n_salts)
    partial = salted.groupBy(key, "_salt").agg(agg_col.alias("_partial"))
    return partial.groupBy(key).agg(stage2[fname]("_partial").alias(alias))


def top_hub_split(
    edges: DataFrame,
    state: DataFrame,
    key: str = "dst",
    hub_degree: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """Split an edge frame into (hub_edges, tail_edges) by in-degree of
    ``key`` — callers broadcast the (tiny) hub vertex state and handle
    hub aggregation with salting while the tail takes the normal path.
    Returns (hub_edges, tail_edges)."""
    deg = edges.groupBy(key).agg(F.count("*").alias("_d"))
    hubs = deg.where(F.col("_d") >= hub_degree).select(key)
    hub_edges = edges.join(F.broadcast(hubs), key, "left_semi")
    tail_edges = edges.join(F.broadcast(hubs), key, "left_anti")
    return hub_edges, tail_edges
