"""GraphFrames-style DataFrame graph API.

BASELINE.json frames the rebuild as "GraphX for analytics"; the idiomatic
Spark-DataFrame equivalent of the GraphX/GraphFrames surface is a vertices
DataFrame (``id``, properties) + an edges DataFrame (``src``, ``dst``,
properties) with relational implementations of the classic operators:
degrees (aggregations), triplets (joins), BFS (frontier joins),
connected components (min-label propagation), PageRank (iterative joins).

Nothing here is a traversal engine: every operator is a join/agg plan that
Catalyst optimizes and that scales by partitioning on vertex id — each
iteration of the iterative algorithms is one shuffle keyed by id, the
aggregate-messages shape GraphX runs (Pregel), expressed in DataFrames.

Reference parity: the reference's graph is served by hand-coded Neo4j
traversals (opentree/GraphExplorer.java); this module is the
beyond-reference generic-graph surface over the same edge tables
(``GraphFrame.from_store`` adapts a GraphStore).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GraphFrame:
    """Property graph over two DataFrames: ``vertices`` with an ``id``
    column, ``edges`` with ``src``/``dst`` columns (extra columns ride
    along, as in GraphFrames)."""

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        assert "id" in vertices.columns, "vertices need an 'id' column"
        assert {"src", "dst"} <= set(edges.columns), "edges need src/dst"
        self.vertices = vertices
        self.edges = edges

    # ------------------------------------------------------------------
    @classmethod
    def from_store(cls, store) -> "GraphFrame":
        """Adapt a GraphStore (child->parent edge table) to the generic
        surface: src = child, dst = parent."""
        v = store.nodes.withColumnRenamed("node_id", "id")
        e = store.edges.select(
            F.col("child_id").alias("src"), F.col("parent_id").alias("dst")
        )
        return cls(v, e)

    # ------------------------------------------------------------------
    # degrees — one aggregation each (map-side partial agg keeps the
    # shuffle at |distinct ids|)
    # ------------------------------------------------------------------
    @property
    def outDegrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("outDegree")
        )

    @property
    def inDegrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").alias("inDegree")
        )

    @property
    def degrees(self) -> DataFrame:
        both = self.edges.select(F.col("src").alias("id")).unionAll(
            self.edges.select(F.col("dst").alias("id"))
        )
        return both.groupBy("id").agg(F.count("*").alias("degree"))

    # ------------------------------------------------------------------
    @property
    def triplets(self) -> DataFrame:
        """(src vertex, edge, dst vertex) — two joins on id; vertex sides
        broadcast when small, shuffle-on-id otherwise (AQE decides)."""
        src_v = self.vertices.select(F.struct(*self.vertices.columns).alias("srcV"))
        src_v = src_v.withColumn("_sid", F.col("srcV.id"))
        dst_v = self.vertices.select(F.struct(*self.vertices.columns).alias("dstV"))
        dst_v = dst_v.withColumn("_did", F.col("dstV.id"))
        e = self.edges.select(F.struct(*self.edges.columns).alias("edge"))
        return (
            e.join(src_v, F.col("edge.src") == F.col("_sid"))
            .join(dst_v, F.col("edge.dst") == F.col("_did"))
            .select(F.col("srcV").alias("src"), "edge", F.col("dstV").alias("dst"))
        )

    # ------------------------------------------------------------------
    def bfs(self, from_expr, to_expr, max_path_length: int = 10) -> DataFrame:
        """Shortest-path search: (start, end, length) for the first level at
        which any vertex matching ``to_expr`` is reached from any vertex
        matching ``from_expr``. Driver-controlled frontier loop — each level
        is ONE equi-join keyed on vertex id (the Pregel superstep shape);
        the frontier is broadcast while small, shuffled when huge.
        """
        start = self.vertices.where(from_expr).select(
            F.col("id").alias("start"), F.col("id").alias("node")
        )
        goal = self.vertices.where(to_expr).select(F.col("id").alias("node"))
        hit = start.join(goal, "node").select(
            "start", F.col("node").alias("end"), F.lit(0).alias("length")
        )
        if not hit.isEmpty():
            return hit
        frontier = start
        for depth in range(1, max_path_length + 1):
            frontier = (
                frontier.join(
                    self.edges.select(
                        F.col("src").alias("node"), F.col("dst").alias("_next")
                    ),
                    "node",
                )
                .select("start", F.col("_next").alias("node"))
                .distinct()
                .localCheckpoint(eager=True)
            )
            if frontier.isEmpty():
                break
            hit = frontier.join(goal, "node").select(
                "start", F.col("node").alias("end"), F.lit(depth).alias("length")
            )
            if not hit.isEmpty():
                return hit
        return hit.limit(0)

    # ------------------------------------------------------------------
    def connectedComponents(self, max_iter: int = 20) -> DataFrame:
        """(id, component): min-vertex-id label propagation over the
        undirected edge set — one shuffle per round, O(component diameter)
        rounds (reuses the dedup-clustering operator)."""
        from treemachine_spark.functions.dedup import connected_components

        pairs = self.edges.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
        cc = connected_components(pairs).withColumnRenamed("node_id", "id")
        # isolated vertices are their own component
        isolated = self.vertices.select("id").join(
            cc.select("id"), "id", "left_anti"
        ).withColumn("component", F.col("id"))
        return cc.unionByName(isolated)

    # ------------------------------------------------------------------
    def pageRank(self, reset_prob: float = 0.15, max_iter: int = 10) -> DataFrame:
        """(id, pagerank): classic damped PageRank, dangling mass
        redistributed uniformly. Each iteration = one join (rank x edges)
        + one aggregation keyed by dst — the aggregate-messages shape; the
        loop is driver-controlled with localCheckpoint to keep lineage flat
        (setCheckpointDir + checkpoint() on a real cluster).
        """
        verts = self.vertices.select("id")
        n = verts.count()
        out_deg = self.outDegrees
        ranks = verts.withColumn("pagerank", F.lit(1.0 / n))
        for _ in range(max_iter):
            contrib = (
                ranks.join(out_deg, "id")
                .join(self.edges.withColumnRenamed("src", "id"), "id")
                .select(
                    F.col("dst").alias("id"),
                    (F.col("pagerank") / F.col("outDegree")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("received"))
            )
            # dangling vertices (no out-edges) spread their rank uniformly
            dangling = (
                ranks.join(out_deg, "id", "left_anti")
                .agg(F.coalesce(F.sum("pagerank"), F.lit(0.0)).alias("d"))
                .collect()[0]["d"]
            )
            ranks = (
                verts.join(contrib, "id", "left")
                .select(
                    "id",
                    (
                        F.lit(reset_prob / n)
                        + F.lit(1 - reset_prob)
                        * (F.coalesce(F.col("received"), F.lit(0.0)) + F.lit(dangling / n))
                    ).alias("pagerank"),
                )
                .localCheckpoint(eager=True)
            )
        return ranks

    # ------------------------------------------------------------------
    def triangleCount(self) -> DataFrame:
        """(id, count): triangles through each vertex, GraphFrames
        semantics (undirected, deduplicated edges, no self-loops).

        Relational recipe — the node-iterator join, not a traversal:
        canonicalize edges to a<b once, then one self-join pairs the two
        lower edges of every wedge (a<b<c) and a semi-join against the
        edge set closes it. Both joins key on vertex ids, so the plan
        shuffles twice regardless of graph size; skewed hubs are exactly
        the AQE-skew / salting case operators/scale.py handles. Each
        triangle is found once and credited to its three corners.
        """
        e = (
            self.edges.select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        wedge = (
            e.alias("e1")
            .join(e.alias("e2"), F.col("e1.a") == F.col("e2.a"))
            .where(F.col("e1.b") < F.col("e2.b"))
            .select(
                F.col("e1.a").alias("x"),
                F.col("e1.b").alias("y"),
                F.col("e2.b").alias("z"),
            )
        )
        tri = wedge.join(
            e.select(F.col("a").alias("y"), F.col("b").alias("z")),
            ["y", "z"],
            "inner",
        )
        per_vertex = (
            tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
            .groupBy("id")
            .agg(F.count("*").alias("count"))
        )
        return (
            self.vertices.select("id")
            .join(per_vertex, "id", "left")
            .select("id", F.coalesce(F.col("count"), F.lit(0)).alias("count"))
        )
