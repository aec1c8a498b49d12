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


_STAGE1 = {"sum": F.sum, "count": lambda c: F.count("*"), "min": F.min, "max": F.max}
_STAGE2 = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    key: str | list[str],
    fn: str,
    col: Column | str | None,
    alias: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation ``fn(col)`` grouped by ``key``.

    ``fn`` names the associative aggregate explicitly ('sum', 'count',
    'min', 'max') — no reliance on private JVM handles, so the call
    works identically under Spark Connect. ``col`` is the aggregated
    column (ignored for 'count'). Stage 1 groups by (key, salt) where
    salt = a deterministic spread via spark_partition_id (uniform, no
    rand() — keeps the job deterministic and retry-safe); stage 2
    re-aggregates the ≤ n_salts partials per key.
    """
    if fn not in _STAGE2:
        raise ValueError(f"salted_agg supports sum/count/min/max, got {fn!r}")
    keys = [key] if isinstance(key, str) else list(key)
    salted = df.withColumn("_salt", F.spark_partition_id() % n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(_STAGE1[fn](col).alias("_partial"))
    return partial.groupBy(*keys).agg(_STAGE2[fn]("_partial").alias(alias))


def top_hub_split(
    edges: DataFrame,
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
