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

__all__ = ["ConnectedComponents", "LinkGraphRank"]


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
    ):
        self._engine = NearDupClusters(
            max_iterations=max_iterations,
            driver_threshold=driver_threshold,
        )

    def components(
        self, edges: DataFrame, src: str = "src", dst: str = "dst"
    ) -> DataFrame:
        """Label every node appearing in ``edges``. Isolated nodes
        (absent from the edge list) are their own components by
        definition — union them in as self-loops if they must appear
        in the output."""
        return self._engine.components(edges, id_a=src, id_b=dst)
