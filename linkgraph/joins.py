"""Join-strategy policy for the per-superstep scatter.

Every superstep joins a V-row message/state frame against the cached
E-row edge frame. Physical strategy matters enormously for iterative
jobs:

  * sort-merge join re-sorts the E-row side EVERY superstep (the sort
    is not cached) — measured 2-3× slower per round; the session sets
    spark.sql.join.preferSortMergeJoin=false as a backstop;
  * broadcast is best while V is genuinely small (the message frame
    replicates to every executor; no edge movement at all), but the
    per-round driver collect+rebroadcast becomes the bottleneck and a
    GC hazard as V grows — threshold default 500k rows;
  * beyond that, a shuffled-hash join against the edges' existing
    hash-by-key partitioning: only the V-row side moves, E stays put
    (the reference's "mirrors stay put, messages move",
    docs/analytical_engine/key_concepts.rst:15-31).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BROADCAST_THRESHOLD_ROWS = 500_000


def scatter_join(
    edges: DataFrame,
    msgs: DataFrame,
    key: str,
    n_vertices: int,
    broadcast_threshold: int = BROADCAST_THRESHOLD_ROWS,
) -> DataFrame:
    """edges ⋈ msgs on `key` with the iterative-job strategy."""
    if n_vertices <= broadcast_threshold:
        return edges.join(F.broadcast(msgs), key)
    return edges.join(msgs.hint("SHUFFLE_HASH"), key)


def state_join(state: DataFrame, other: DataFrame, key: str = "id", how: str = "left") -> DataFrame:
    """V-row ⋈ V-row combine join (state with aggregated messages);
    both sides are hash-partitioned on the key, so a shuffled-hash
    join avoids any sort."""
    return state.join(other.hint("SHUFFLE_HASH"), key, how)
