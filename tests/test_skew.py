"""Salted aggregation — equivalence with plain groupBy on a planted
power-law hub (the datagen skew knob)."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.skew import salted_agg, top_hub_split


def test_salted_sum_equals_plain(spark, small_graph):
    plain = {
        r["dst"]: r["n"]
        for r in small_graph.groupBy("dst").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        r["dst"]: r["n"]
        for r in salted_agg(small_graph, "dst", "count", None, "n", n_salts=8).collect()
    }
    assert salted == plain


def test_salted_min(spark, small_graph):
    plain = {
        r["dst"]: r["m"]
        for r in small_graph.groupBy("dst").agg(F.min("src").alias("m")).collect()
    }
    salted = {
        r["dst"]: r["m"]
        for r in salted_agg(small_graph, "dst", "min", "src", "m", n_salts=8).collect()
    }
    assert salted == plain


def test_salted_sum_col(spark, small_graph):
    e = small_graph.withColumn("w", (F.col("src") % 5 + 1).cast("double"))
    plain = {
        r["dst"]: r["s"]
        for r in e.groupBy("dst").agg(F.sum("w").alias("s")).collect()
    }
    salted = {
        r["dst"]: r["s"]
        for r in salted_agg(e, "dst", "sum", F.col("w"), "s", n_salts=8).collect()
    }
    assert salted == plain


def test_top_hub_split_partitions_edges(spark, small_graph):
    hub, tail = top_hub_split(small_graph, key="dst", hub_degree=30)
    n_hub, n_tail = hub.count(), tail.count()
    assert n_hub + n_tail == small_graph.count()
    assert n_hub > 0  # skewed_graph plants low-id hubs
    # every hub dst really has degree >= 30
    degs = dict(hub.groupBy("dst").count().collect())
    assert all(v >= 30 for v in degs.values())
