"""HNSW ANN — pure-numpy graph, driver-built, executor-searched.

Closes the reference's hnswlib/nmslib tier with no native library:
the reference builds its ANN index ON THE DRIVER from collected item
vectors (``/root/reference/replay/models/extensions/ann/
index_builders/driver_hnswlib_index_builder.py:17`` collects factors
and feeds ``hnswlib.Index.add_items``), so a driver-bounded build is
exact parity — the same ``max_elements`` bound, the same seeded
level draws, the same M / ef_construction / ef_search knobs.

* ``fit`` collects the (bounded) corpus to the driver and builds the
  multi-layer navigable-small-world graph of Malkov & Yashunin 2016:
  geometric level draws (``mL = 1/ln(M)``), greedy descent through
  upper layers, ``ef_construction``-beam search per insert layer,
  top-M neighbour selection with bidirectional links pruned to
  ``M`` (``2M`` at layer 0). Distances are cosine via dot products
  over L2-normalized vectors.
* ``search`` ships the finished graph to executors via closure
  broadcast and walks it per query batch inside ``mapInPandas`` —
  queries never collect, and a 1000-executor cluster searches its
  partitions independently. Output shape matches every other ANN
  class: ``(query_id, neighbor_id, cosine, rank)`` with the
  stable-rounded cosine and id tie-break.

Construction is insertion-order- and seed-deterministic but
graph-walk-based ⇒ rows-only contract gate (``q_hnsw_ann``); recall
is pinned by the planted-neighbor test against BruteForceANN.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from replay_spark.utils.spark_utils import stable_round

__all__ = ["HNSWANN"]


class HNSWANN:
    def __init__(
        self,
        M: int = 16,
        ef_construction: int = 100,
        ef_search: int = 64,
        max_elements: int = 1_000_000,
        seed: int = 42,
        id_column: str = "vec_id",
        vector_column: str = "embedding",
    ):
        if M < 2:
            raise ValueError("M must be >= 2")
        if ef_construction < 1 or ef_search < 1:
            raise ValueError("ef values must be >= 1")
        self.M = M
        self.ef_construction = ef_construction
        self.ef_search = ef_search
        self.max_elements = max_elements
        self.seed = seed
        self.id_column = id_column
        self.vector_column = vector_column
        self._ids: Optional[np.ndarray] = None
        self._vecs: Optional[np.ndarray] = None
        self._links: Optional[list] = None  # per node: list per level
        self._entry: int = -1
        self._max_level: int = -1

    # -- graph construction (driver, numpy) -------------------------------

    @staticmethod
    def _normalize(x: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return x / n

    def _search_layer(self, q: np.ndarray, entry: int, ef: int, level: int):
        """Beam search on one layer: returns [(dist, node)] ascending,
        at most ef entries. dist = 1 - cosine (vectors normalized)."""
        import heapq

        vecs, links = self._vecs, self._links
        d0 = 1.0 - float(vecs[entry] @ q)
        visited = {entry}
        cand = [(d0, entry)]  # min-heap by dist
        best = [(-d0, entry)]  # max-heap (neg) of current top-ef
        while cand:
            d, node = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            for nb in links[node][level]:
                if nb in visited:
                    continue
                visited.add(nb)
                dn = 1.0 - float(vecs[nb] @ q)
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    heapq.heappush(best, (-dn, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted((-nd, node) for nd, node in best)

    def _insert(self, i: int, level: int) -> None:
        vecs, links = self._vecs, self._links
        q = vecs[i]
        if self._entry < 0:
            self._entry = i
            self._max_level = level
            return
        ep = self._entry
        # greedy descent through layers above the node's level
        for lv in range(self._max_level, level, -1):
            ep = self._search_layer(q, ep, 1, lv)[0][1]
        for lv in range(min(level, self._max_level), -1, -1):
            found = self._search_layer(q, ep, self.ef_construction, lv)
            cap = self.M if lv > 0 else 2 * self.M
            neigh = [n for _, n in found[: self.M]]
            links[i][lv] = list(neigh)
            for n in neigh:
                lst = links[n][lv]
                lst.append(i)
                if len(lst) > cap:
                    # prune to the cap closest (deterministic: dist
                    # then node index)
                    dists = sorted(
                        (1.0 - float(vecs[m] @ vecs[n]), m) for m in lst
                    )
                    links[n][lv] = [m for _, m in dists[:cap]]
            ep = found[0][1]
        if level > self._max_level:
            self._max_level = level
            self._entry = i

    def fit(self, corpus: DataFrame) -> "HNSWANN":
        n = corpus.count()
        if n > self.max_elements:
            raise ValueError(
                f"corpus has {n} vectors > max_elements="
                f"{self.max_elements}: HNSW is a driver-built index "
                "(reference parity — hnswlib builds on the driver "
                "too); raise the bound deliberately or use the "
                "IVF/PQ tiers for corpora beyond driver memory"
            )
        rows = (
            corpus.select(self.id_column, self.vector_column)
            .orderBy(self.id_column)
            .collect()
        )
        self._ids = np.array([r[0] for r in rows], dtype=np.int64)
        self._vecs = self._normalize(
            np.array([r[1] for r in rows], dtype=np.float64)
        )
        m_l = 1.0 / math.log(self.M)
        rng = np.random.default_rng(self.seed)
        levels = np.floor(
            -np.log(rng.uniform(1e-12, 1.0, size=len(rows))) * m_l
        ).astype(int)
        self._links = [
            [[] for _ in range(levels[i] + 1)] for i in range(len(rows))
        ]
        self._entry = -1
        self._max_level = -1
        for i in range(len(rows)):
            self._insert(i, int(levels[i]))
        return self

    # -- distributed search ------------------------------------------------

    def _knn(self, q: np.ndarray, k: int):
        ep = self._entry
        for lv in range(self._max_level, 0, -1):
            ep = self._search_layer(q, ep, 1, lv)[0][1]
        found = self._search_layer(q, ep, max(self.ef_search, k), 0)
        return found[:k]

    def search(self, queries: DataFrame, k: int = 10) -> DataFrame:
        """(query_id, neighbor_id, cosine, rank) — the graph walk runs
        executor-side over Arrow batches; the index rides the closure
        broadcast."""
        import pandas as pd

        if self._vecs is None:
            raise ValueError("HNSWANN must be fit before search")
        idc, vc = self.id_column, self.vector_column
        index = self
        normalize = self._normalize
        # over-fetch one so a query that finds itself still returns k
        kk = k + 1

        def walk(batches):
            for pdf in batches:
                x = normalize(
                    np.array(list(pdf[vc]), dtype=np.float64).reshape(
                        len(pdf), -1
                    )
                )
                qids, nids, coss = [], [], []
                for qid, q in zip(pdf[idc], x):
                    for dist, node in index._knn(q, kk):
                        if int(index._ids[node]) == int(qid):
                            continue
                        qids.append(int(qid))
                        nids.append(int(index._ids[node]))
                        coss.append(1.0 - dist)
                yield pd.DataFrame(
                    {
                        "query_id": pd.Series(qids, dtype="int64"),
                        "neighbor_id": pd.Series(nids, dtype="int64"),
                        "cosine_raw": pd.Series(coss, dtype="float64"),
                    }
                )

        out = queries.select(idc, vc).mapInPandas(
            walk,
            schema="query_id long, neighbor_id long, cosine_raw double",
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        return (
            out.withColumn("cosine", stable_round("cosine_raw", 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )
