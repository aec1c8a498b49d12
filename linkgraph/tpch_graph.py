"""Derive the canonical link graph from the driver's parquet tables.

The graft's ETL derives edges from grouped co-occurrence (files sharing
a commit → co-change links; see linkgraph/etl.py cochange_edges). The
driver's testdata has no repo table, so the correctness gate applies
the SAME derivation to the shape it does have: parts co-occurring in
an order (lineitem grouped by l_orderkey) — structurally identical to
"files co-changed in a commit" (reference loads graphs from exactly
such tabular sources, python/graphscope/framework/graph.py:552-713).

The derivation is deterministic and is mirrored 1:1 by the DuckDB
oracle SQL in __spark_entry__.py, so every graph algorithm can be
cross-checked value-by-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from linkgraph.graph import Graph


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed weighted edge table (src, dst, weight) between parts
    co-occurring in an order; src < dst (one row per unordered pair),
    weight = number of shared orders.

    Scale notes: the pair explosion is a self-equi-join on the group
    key (shuffle on l_orderkey, map-side distinct), and the final
    groupBy(src,dst) gets partial aggregation. Giant groups would
    explode quadratically; linkgraph.etl.cochange_edges shows the
    group-size cap used for real data (TPC-H orders have ≤7 lines, so
    no cap is needed here).
    """
    fv = (
        read_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("id"))
        .dropDuplicates(["g", "id"])
    )
    a = fv.select("g", F.col("id").alias("src"))
    b = fv.select("g", F.col("id").alias("dst"))
    return (
        a.join(b, "g")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )


def part_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """The co-purchase link graph as a Graph (directed src<dst edge
    set; undirected algorithms symmetrize it)."""
    return Graph.from_edges(part_edges(spark, sf_dir).select("src", "dst"), directed=True)


# The SQL twin of part_edges(), used as the prefix of every oracle
# query in __spark_entry__.py. MATERIALIZED: DuckDB otherwise inlines
# CTEs at every reference site, which explodes for iterative queries.
PART_EDGES_SQL = """
fv AS MATERIALIZED (SELECT DISTINCT l_orderkey AS g, l_partkey AS id FROM lineitem),
edges AS MATERIALIZED (
    SELECT a.id AS src, b.id AS dst, CAST(count(*) AS DOUBLE) AS weight
    FROM fv a JOIN fv b ON a.g = b.g AND a.id < b.id
    GROUP BY a.id, b.id
),
verts AS MATERIALIZED (
    SELECT DISTINCT id FROM (
        SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges
    )
),
sym AS MATERIALIZED (
    SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges
)
"""
