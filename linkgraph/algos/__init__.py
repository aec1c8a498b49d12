"""Built-in algorithms (the GAE builtin-app registry re-expressed;
reference registry: coordinator/gscoordinator/builtin/app/.gs_conf.yaml)."""

from linkgraph.algos.pagerank import pagerank
from linkgraph.algos.wcc import wcc
from linkgraph.algos.cdlp import cdlp
from linkgraph.algos.triangles import (
    triangles,
    triangle_count,
    lcc,
    transitivity,
    avg_clustering,
)
from linkgraph.algos.traversal import bfs, sssp
from linkgraph.algos.hits import hits
from linkgraph.algos.cores import kcore, kshell
from linkgraph.algos.patterns import match_count, match_pattern

__all__ = [
    "match_count",
    "match_pattern",
    "pagerank",
    "wcc",
    "cdlp",
    "triangles",
    "triangle_count",
    "lcc",
    "transitivity",
    "avg_clustering",
    "bfs",
    "sssp",
    "hits",
    "kcore",
    "kshell",
]
