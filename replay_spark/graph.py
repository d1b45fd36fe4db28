"""Graph tier: first-class connected components on edge DataFrames.

Connected components is the workhorse behind every clustering step in
a dedup pipeline (near-dup groups, URL mirrors, entity resolution),
but it is useful far beyond dedup — so the engine that
:class:`replay_spark.preprocessing.dedup.NearDupClusters` proved
hash-correct (driver union-find below ``driver_threshold`` edges,
distributed min-label propagation with per-round convergence counts
above it — O(graph diameter) keyed-join rounds, never a collect of
an unbounded edge set) is exposed here under its own name, with the
graph-standard ``src``/``dst`` column vocabulary.

PageRank lives in :class:`replay_spark.web.LinkGraphRank` (the crawl
tier grew it first); re-exported here for discoverability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from replay_spark.preprocessing.dedup import NearDupClusters
from replay_spark.web import LinkGraphRank  # noqa: F401  (re-export)

__all__ = ["ConnectedComponents", "LinkGraphRank", "TriangleCounter"]


class ConnectedComponents:
    """(node, component) labeling of an undirected edge list;
    ``component`` is the smallest node id in the group.

    Parameters mirror the proven engine: ``driver_threshold`` edges
    below which a driver union-find answers in one pass (pair sets
    are tiny after upstream pruning), ``max_iterations`` bounding the
    distributed min-label propagation above it.
    """

    def __init__(
        self,
        max_iterations: int = 20,
        driver_threshold: int = 5_000_000,
        jump_after_rounds: int = 3,
    ):
        self._engine = NearDupClusters(
            max_iterations=max_iterations,
            driver_threshold=driver_threshold,
            jump_after_rounds=jump_after_rounds,
        )

    def components(
        self, edges: DataFrame, src: str = "src", dst: str = "dst"
    ) -> DataFrame:
        """Label every node appearing in ``edges``. Isolated nodes
        (absent from the edge list) are their own components by
        definition — union them in as self-loops if they must appear
        in the output."""
        return self._engine.components(edges, id_a=src, id_b=dst)


class TriangleCounter:
    """Per-node and global triangle counts on an undirected edge
    list — the clustering-coefficient / spam-farm / community
    signal, computed the scale-correct way.

    The naive three-way self-join enumerates every triangle six
    times and explodes on high-degree hubs. The standard fix
    (Suri & Vassilvitskii's MR algorithm, also what GraphX does):
    orient every edge from the lower-(degree, id) endpoint to the
    higher one. The oriented graph is acyclic, each triangle has
    exactly ONE wedge at its smallest vertex, and a vertex's
    oriented out-degree is bounded by O(sqrt(edges)) — so the wedge
    join (oriented ⋈ oriented on the wedge pivot, then a semi-join
    against the edge set) touches each triangle once and hub keys
    never blow up. Three shuffles total: degree agg, wedge join,
    closure join. The canonical edge set and the triangle list are
    referenced from several plan branches, so both are persisted
    once inside the computation (the q_llm_e2e lesson: an
    unpersisted shared subtree re-executes per reference — measured
    70 redundant scans here before the persist).
    """

    def __init__(
        self,
        src_column: str = "src",
        dst_column: str = "dst",
    ):
        self.src_column = src_column
        self.dst_column = dst_column

    def _canonical(self, edges: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        s, d = self.src_column, self.dst_column
        return (
            edges.select(
                F.least(s, d).alias("a"), F.greatest(s, d).alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def triangles(self, edges: DataFrame) -> DataFrame:
        """One row per triangle: (x, y, z) with x < y < z."""
        und = self._canonical(edges).persist()
        return self._triangles_from(und)

    def _triangles_from(self, und: DataFrame) -> DataFrame:
        """Triangle enumeration over an already-persisted canonical
        edge set (``und`` is referenced four times below)."""
        from pyspark.sql import functions as F

        deg = (
            und.select(F.col("a").alias("node"))
            .unionAll(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        # orient each edge toward the higher (degree, id) endpoint
        e = (
            und.join(deg.withColumnRenamed("node", "a"), "a")
            .withColumnRenamed("deg", "deg_a")
            .join(
                deg.withColumnRenamed("node", "b").withColumnRenamed(
                    "deg", "deg_b"
                ),
                "b",
            )
        )
        oriented = e.select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | (
                    (F.col("deg_a") == F.col("deg_b"))
                    & (F.col("a") < F.col("b"))
                ),
                F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
            )
            .otherwise(
                F.struct(F.col("b").alias("lo"), F.col("a").alias("hi"))
            )
            .alias("o")
        ).select("o.lo", "o.hi")
        # wedges at the pivot (low endpoint of both oriented edges)
        w1 = oriented.select(
            F.col("lo").alias("pivot"), F.col("hi").alias("u")
        )
        w2 = oriented.select(
            F.col("lo").alias("pivot"), F.col("hi").alias("v")
        )
        wedges = w1.join(w2, "pivot").filter(F.col("u") < F.col("v"))
        closed = wedges.join(
            und,
            (F.col("u") == F.col("a")) & (F.col("v") == F.col("b")),
            "left_semi",
        )
        return closed.select(
            F.least("pivot", "u").alias("x"),
            F.when(
                (F.col("pivot") > F.col("u")) & (F.col("pivot") < F.col("v")),
                F.col("pivot"),
            )
            .when(
                (F.col("u") > F.col("pivot")) & (F.col("u") < F.col("v")),
                F.col("u"),
            )
            .otherwise(F.col("v"))
            .alias("y"),
            F.greatest("pivot", "v").alias("z"),
        )

    def transform(self, edges: DataFrame) -> DataFrame:
        """(node, n_triangles) for every node that appears in an
        edge; nodes in no triangle report 0."""
        from pyspark.sql import functions as F

        und = self._canonical(edges).persist()
        tri = self._triangles_from(und).persist()
        per_node = (
            tri.select(F.col("x").alias("node"))
            .unionAll(tri.select(F.col("y").alias("node")))
            .unionAll(tri.select(F.col("z").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("n_triangles"))
        )
        nodes = (
            und.select(F.col("a").alias("node"))
            .unionAll(und.select(F.col("b").alias("node")))
            .distinct()
        )
        return (
            nodes.join(per_node, "node", "left")
            .select(
                "node",
                F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            )
        )
