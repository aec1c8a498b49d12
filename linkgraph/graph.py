"""Property-graph data model on DataFrames.

The reference models a labeled property graph as Arrow property tables
plus CSR topology per fragment (docs/analytical_engine/
performance_tuning.md:16-95); graph-level client ops are OpDefs
dispatched in analytical_engine/core/grape_instance.cc:1300-1516.
Here the graph IS a pair of DataFrames:

    vertices(id: long, ...props)
    edges(src: long, dst: long, ...props)

and every graph-level op (PROJECT_TO_SIMPLE, TO_UNDIRECTED,
INDUCE_SUBGRAPH, ADD_COLUMN, REPORT_GRAPH, ...) is a declarative
DataFrame transformation that Catalyst can push down / prune / reorder.
Partitioning is explicit: `partition_edges` reproduces the reference's
hash vs segmented (range) vertex partitioning choice
(analytical_engine/core/loader/arrow_fragment_loader.h:351-389).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, functions as F


@dataclass
class Graph:
    """A (possibly directed) property graph over two DataFrames."""

    edges: DataFrame
    vertices: DataFrame | None = None
    directed: bool = True
    weight_col: str | None = None
    _num_vertices: int | None = field(default=None, repr=False)
    _num_edges: int | None = field(default=None, repr=False)

    # -- construction -------------------------------------------------

    @classmethod
    def from_edges(
        cls,
        edges: DataFrame,
        vertices: DataFrame | None = None,
        directed: bool = True,
        weight_col: str | None = None,
    ) -> "Graph":
        """Build a graph from an edge table; vertex set deduced from
        endpoints when not given (reference deduces vertex labels from
        edge endpoints the same way, graph.py:565-577).

        NOTE: directed=False asserts the edge table already stores
        BOTH directions (the `to_undirected()` invariant) — it is not
        enforced here. For a one-row-per-undirected-pair table, keep
        directed=True and let algorithms symmetrize on traversal
        (they all do); traversal helpers also symmetrize defensively.
        """
        g = cls(edges=edges, vertices=vertices, directed=directed, weight_col=weight_col)
        return g

    def deduced_vertices(self) -> DataFrame:
        """Distinct endpoint ids — used when no vertex table exists."""
        if self.vertices is not None:
            return self.vertices.select("id")
        e = self.edges
        return (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .distinct()
        )

    # -- projections / views (PROJECT_TO_SIMPLE, TO_UNDIRECTED, ...) ---

    def project_to_simple(self, weight_col: str | None = None) -> "Graph":
        """Narrow to (src, dst [, weight]) — the reference's
        project_to_simple (python/graphscope/framework/app.py:45-78);
        here it is a plain column-pruned select, so the parquet scan
        only reads the needed columns."""
        w = weight_col or self.weight_col
        cols = ["src", "dst"] + ([w] if w else [])
        return replace(
            self,
            edges=self.edges.select(*cols),
            vertices=self.vertices.select("id") if self.vertices is not None else None,
            weight_col=w,
        )

    def to_undirected(self, dedup: bool = True) -> "Graph":
        """TO_UNDIRECTED (proto/types.proto:100): symmetrize the edge
        table. With dedup=True parallel edges collapse."""
        e = self.symmetrized_edges()
        if dedup:
            e = e.dropDuplicates(["src", "dst"])
        return replace(self, edges=e, directed=False)

    def symmetrized_edges(self) -> DataFrame:
        """edges ∪ reverse(edges) with self-loops kept once per
        direction; properties carried along."""
        e = self.edges
        rev = e.select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            *[c for c in e.columns if c not in ("src", "dst")],
        )
        return e.unionByName(rev)

    def adjacency_edges(self) -> DataFrame:
        """Edges as traversed by undirected algorithms: for a directed
        graph, both directions; for an (already symmetric) undirected
        graph, the stored edges."""
        return self.symmetrized_edges() if self.directed else self.edges

    def induce_subgraph(self, vertex_ids: DataFrame) -> "Graph":
        """INDUCE_SUBGRAPH (types.proto:104): keep edges whose both
        endpoints are in `vertex_ids` (a one-column `id` frame). Uses
        two semijoins — broadcast when the id set is small."""
        ids = vertex_ids.select("id")
        e = (
            self.edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        v = self.vertices.join(ids, "id", "left_semi") if self.vertices is not None else None
        return replace(self, edges=e, vertices=v, _num_vertices=None, _num_edges=None)

    def filter_edges(self, condition) -> "Graph":
        """CLEAR_EDGES/VIEW_GRAPH-style edge filter."""
        return replace(self, edges=self.edges.where(condition), _num_edges=None)

    # -- degrees & stats (REPORT_GRAPH) --------------------------------

    def degrees(self, direction: str = "out") -> DataFrame:
        """Per-vertex degree: 'in', 'out' or 'both'. Vertices with no
        incident edge get degree 0 (left join against the vertex set).
        Returns (id, degree)."""
        if direction == "out":
            d = self.edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
        elif direction == "in":
            d = self.edges.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("degree"))
        elif direction == "both":
            ends = self.edges.select(F.col("src").alias("id")).unionAll(
                self.edges.select(F.col("dst").alias("id"))
            )
            d = ends.groupBy("id").agg(F.count("*").alias("degree"))
        else:
            raise ValueError(f"direction must be in/out/both, got {direction!r}")
        base = self.deduced_vertices()
        return base.join(d, "id", "left").select(
            "id", F.coalesce("degree", F.lit(0)).cast("long").alias("degree")
        )

    def num_vertices(self) -> int:
        if self._num_vertices is None:
            self._num_vertices = self.deduced_vertices().count()
        return self._num_vertices

    def num_edges(self) -> int:
        if self._num_edges is None:
            self._num_edges = self.edges.count()
        return self._num_edges

    # -- context egress (ADD_COLUMN) -----------------------------------

    def add_column(self, result: DataFrame, name: str) -> "Graph":
        """ADD_COLUMN (types.proto:121): join an algorithm result
        (id, value) back onto the vertex table as a new property."""
        res = result.select("id", F.col(result.columns[1]).alias(name))
        v = self.deduced_vertices() if self.vertices is None else self.vertices
        return replace(self, vertices=v.join(res, "id", "left"))

    # -- serialize / deserialize (save_to / load_from,
    #    python/graphscope/framework/graph.py:1193-1346) --------------

    def save(self, path: str, format: str = "parquet") -> None:
        """Serialize the graph to ``path``: edges/ + vertices/ tables
        plus a meta.json carrying directedness and the weight column —
        the reference's save_to(path) graph archive, with parquet (or
        csv/orc) standing in for its GraphAr/serialization formats."""
        import json as _json

        self.edges.write.mode("overwrite").format(format).save(f"{path}/edges")
        has_vertices = self.vertices is not None
        if has_vertices:
            self.vertices.write.mode("overwrite").format(format).save(
                f"{path}/vertices"
            )
        meta = {
            "directed": self.directed,
            "weight_col": self.weight_col,
            "has_vertices": has_vertices,
            "format": format,
        }
        # write meta through a Spark writer so edges/vertices/meta all
        # resolve against the same filesystem (s3://, hdfs://, file://) —
        # a driver-local open() would silently land the meta on local
        # disk for remote paths and break the archive round-trip
        spark = self.edges.sparkSession
        spark.createDataFrame([(_json.dumps(meta),)], "meta string").coalesce(
            1
        ).write.mode("overwrite").text(f"{path}/meta")

    @classmethod
    def load(cls, spark, path: str) -> "Graph":
        """Deserialize a graph written by :meth:`save` — the
        load_from round-trip (graph.py:1285-1346)."""
        import json as _json

        try:
            meta = _json.loads(spark.read.text(f"{path}/meta").first()[0])
        except Exception:
            # archives written by the pre-r3 save() carried a
            # driver-local meta.json instead of the {path}/meta text
            # directory — fall back so old archives still load
            import os as _os

            with open(_os.path.join(path, "meta.json")) as fh:
                meta = _json.load(fh)
        fmt = meta.get("format", "parquet")
        edges = spark.read.format(fmt).load(f"{path}/edges")
        vertices = (
            spark.read.format(fmt).load(f"{path}/vertices")
            if meta.get("has_vertices")
            else None
        )
        return cls(
            edges=edges,
            vertices=vertices,
            directed=bool(meta["directed"]),
            weight_col=meta.get("weight_col"),
        )

    # -- partitioning (hash vs range, arrow_fragment_loader.h:351-389) --

    def partition_edges(self, num_partitions: int, by: str = "src", strategy: str = "hash") -> "Graph":
        """Explicitly place edges: hash (HASH_PARTITION) or range
        (segmented) on an endpoint. Iterative jobs co-partition the
        vertex-state frame on the same key so the per-superstep join
        does not re-shuffle the edge side."""
        if strategy == "hash":
            e = self.edges.repartition(num_partitions, F.col(by))
        elif strategy == "range":
            e = self.edges.repartitionByRange(num_partitions, F.col(by))
        else:
            raise ValueError(f"strategy must be hash/range, got {strategy!r}")
        return replace(self, edges=e)
