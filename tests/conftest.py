"""Shared Spark fixtures for the linkgraph test suite.

One session per test run (session-scoped) at local[8] with
shuffle.partitions=8 — small data, fast plans; the scaling evidence
(local[8] vs local[32]) lives in bench/, not here
(mirrors the reference's test_scalability.py intent, SURVEY.md §5.3).
"""

from __future__ import annotations

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.session import get_spark  # noqa: E402
from linkgraph.datagen import skewed_graph  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="linkgraph-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_graph(spark):
    """Deterministic skewed digraph, ~500 vertices / ~2.5k edges —
    the p2p-31 analog (FIXTURES.md §3)."""
    e = skewed_graph(spark, n_vertices=500, avg_degree=6, seed=42).cache()
    e.count()
    return e


@pytest.fixture(scope="session")
def small_edges_np(small_graph):
    pdf = small_graph.toPandas()
    return (
        pdf["src"].to_numpy(dtype=np.int64),
        pdf["dst"].to_numpy(dtype=np.int64),
    )
