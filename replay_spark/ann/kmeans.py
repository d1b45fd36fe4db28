"""Distributed Lloyd k-means over an embedding column.

The clustering tier of the LLM-data pipeline: semantic bucketing for
SemDeDup-style dedup, corpus mixing by topic, and per-cluster
sampling all start from a k-means assignment. The reference engine
delegates clustering to single-node libraries; here every step is a
DataFrame plan:

* **assignment** — the k x d centroid matrix is broadcast as a
  literal array-of-arrays column and the argmin squared-L2 is taken
  with SQL higher-order functions (``zip_with`` + ``aggregate`` +
  ``array_min`` over ``(dist, idx)`` structs) — JVM-side, zero UDFs,
  no shuffle.
* **update** — one ``posexplode`` of the assigned vectors into
  (cluster, dim, value) and a map-side-combined ``groupBy(cluster,
  dim)`` mean; the shuffle carries at most ``k * d * partitions``
  partial rows, never raw vectors. The k x d result (a few KiB)
  is collected to the driver to build the next broadcast literal —
  the only driver touch, bounded by construction.

At 100 TB each Lloyd iteration is therefore one corpus scan + one
tiny aggregate shuffle; vectors are never re-partitioned. Iterations
are Spark jobs — ``max_iter`` stays small (k-means converges in a
handful of passes; production pipelines run 5-20).

Init is deterministic and ``rand()``-free — reproducible across
cluster sizes and restarts:

* ``init="farthest"`` (default) — farthest-point traversal (the
  deterministic core of k-means++): seed 1 is the vector with the
  smallest ``md5(seed || id)`` digest; each next seed is the corpus
  vector maximizing its min squared distance to the chosen set
  (ties by id). One scan + one tiny ``max_by`` reduce per seed — k
  scans total, the deterministic stand-in for k-means|| at small k.
* ``init="hash"`` — the k smallest-digest vectors (one scan; cheaper
  but local-optimum-prone on well-separated clusters).

Empty clusters keep their previous centroid.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, centroid: Column) -> Column:
    """Squared L2 between two array<double> columns — sequential
    left-to-right sum, the same association a ``list_reduce`` oracle
    replays bit-identically."""
    return F.aggregate(
        F.zip_with(vec, centroid, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


class KMeansClusterer:
    """Lloyd k-means: ``fit`` learns centroids, ``transform`` assigns.

    Parameters
    ----------
    k: number of clusters.
    max_iter: Lloyd iterations (each = one corpus scan).
    seed: init-hash seed.
    id_column / vector_column: input schema.
    """

    def __init__(
        self,
        k: int = 8,
        max_iter: int = 10,
        seed: int = 42,
        id_column: str = "vec_id",
        vector_column: str = "embedding",
        init: str = "farthest",
        update_quantization: Optional[float] = None,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        if init not in ("farthest", "hash"):
            raise ValueError("init must be 'farthest' or 'hash'")
        if update_quantization is not None and update_quantization <= 0:
            raise ValueError("update_quantization must be > 0")
        self.k = k
        self.max_iter = max_iter
        self.seed = seed
        self.id_column = id_column
        self.vector_column = vector_column
        self.init = init
        # update_quantization: when set (e.g. 1e6), Lloyd centroid
        # updates sum floor(x * q + 0.5) as exact BIGINTs instead of
        # floating-point doubles. FP addition is not associative, so
        # a plain double sum depends on partition count and reduce
        # order — two runs of the SAME job on different cluster
        # layouts can learn different last-ULP centroids. Quantized
        # sums are order-free: fit() becomes bit-reproducible across
        # partitionings, restarts, and engines, at a bounded
        # quantization error of 0.5/q per component per step. This is
        # the reproducible-training knob (and what makes a one-step
        # Lloyd update hash-gateable against a SQL oracle).
        self.update_quantization = update_quantization
        self.centroids: Optional[List[List[float]]] = None

    def save(self, path: str) -> None:
        """Fitted centroids are the whole model — they live in the
        meta.json sidecar (the ann.store contract), so a saved
        clusterer assigns identically in any later session."""
        from replay_spark.ann.store import write_meta

        if self.centroids is None:
            raise ValueError("KMeansClusterer must be fit before save")
        write_meta(
            path,
            type(self).__name__,
            {
                "k": self.k,
                "max_iter": self.max_iter,
                "seed": self.seed,
                "id_column": self.id_column,
                "vector_column": self.vector_column,
                "init": self.init,
                "update_quantization": self.update_quantization,
            },
            state={"centroids": self.centroids},
        )

    @classmethod
    def load(cls, path: str, spark=None) -> "KMeansClusterer":
        from replay_spark.ann.store import read_meta

        meta = read_meta(path)
        self = cls(**meta["params"])
        self.centroids = [
            [float(x) for x in c] for c in meta["state"]["centroids"]
        ]
        return self

    # -- internals ----------------------------------------------------

    def _vec(self) -> Column:
        return F.transform(
            F.col(self.vector_column), lambda x: x.cast("double")
        )

    def _centroid_literal(self) -> Column:
        return F.array(
            *[
                F.array(*[F.lit(float(x)) for x in c])
                for c in self.centroids
            ]
        )

    def _assign_expr(self) -> Column:
        """argmin_c ||v - c||^2 with cluster-id tie-break, as one
        ``array_min`` over (dist, idx) structs — struct ordering
        compares dist first, idx second."""
        cents = self._centroid_literal()
        scored = F.transform(
            cents,
            lambda c, i: F.struct(
                _sq_dist(F.col("_v"), c).alias("dist"),
                i.alias("cluster"),
            ),
        )
        return F.array_min(scored)

    # -- API ----------------------------------------------------------

    def fit(
        self,
        df: DataFrame,
        centroids: Optional[Sequence[Sequence[float]]] = None,
    ) -> "KMeansClusterer":
        """Learn centroids. With ``centroids`` given, Lloyd starts
        from them instead of the hash init (and ``max_iter=0`` makes
        them final — the fixed-quantizer gate path)."""
        if centroids is not None:
            self.centroids = [[float(x) for x in c] for c in centroids]
        else:
            digest = F.md5(
                F.concat_ws(
                    ":",
                    F.lit(str(self.seed)),
                    F.col(self.id_column).cast("string"),
                )
            )
            hashed = df.select(
                F.col(self.id_column).alias("_id"),
                self._vec().alias("_v"),
                digest.alias("_h"),
            )
            if self.init == "hash":
                seeds = hashed.orderBy("_h").limit(self.k).collect()
                if len(seeds) < self.k:
                    raise ValueError(
                        f"k={self.k} exceeds corpus size {len(seeds)}"
                    )
                self.centroids = [list(r["_v"]) for r in seeds]
            else:
                first = hashed.orderBy("_h").limit(1).collect()
                if not first:
                    raise ValueError("empty input")
                self.centroids = [list(first[0]["_v"])]
                hashed = hashed.persist()
                try:
                    while len(self.centroids) < self.k:
                        far = hashed.select(
                            F.max_by(
                                F.struct("_v", "_id"),
                                F.struct(
                                    self._assign_expr()
                                    .getField("dist")
                                    .alias("d"),
                                    (-F.col("_id").cast("long")).alias(
                                        "tie"
                                    ),
                                ),
                            ).alias("m")
                        ).collect()[0]["m"]
                        self.centroids.append(list(far["_v"]))
                finally:
                    hashed.unpersist()
                if len({tuple(c) for c in self.centroids}) < self.k:
                    raise ValueError(
                        f"k={self.k} exceeds the number of distinct "
                        "vectors"
                    )
        dim = len(self.centroids[0])
        # one narrow persist covers every Lloyd iteration — without it
        # an expensive upstream lineage (joins, filters) would re-run
        # per iteration; the cached projection is vectors-only
        vecs = df.select(self._vec().alias("_v"))
        if self.max_iter > 1:
            vecs = vecs.persist()
        q = self.update_quantization
        if q is not None:
            # overflow guard: the per-(cluster, dim) partial sums are
            # plain BIGINTs; non-ANSI sum(long) wraps SILENTLY, so a
            # sum that can exceed 2^62 must fail loudly (same
            # contract as the PCA path) — bound by
            # n * (max|x| * q + 0.5)
            bound = vecs.select(
                F.count(F.lit(1)).alias("_n"),
                F.max(
                    F.aggregate(
                        "_v",
                        F.lit(0.0),
                        lambda acc, x: F.greatest(acc, F.abs(x)),
                    )
                ).alias("_m"),
            ).collect()[0]
            worst = int(bound["_n"]) * (
                float(bound["_m"] or 0.0) * float(q) + 0.5
            )
            if worst > float(2**62):
                raise OverflowError(
                    "quantized Lloyd update could overflow BIGINT: "
                    f"n*max|x|*q ≈ {worst:.3g} > 2^62; lower "
                    "update_quantization (or pass None for plain "
                    "double sums)"
                )
        for _ in range(self.max_iter):
            assigned = vecs.select(
                self._assign_expr().getField("cluster").alias("_c"),
                F.col("_v"),
            )
            exploded = assigned.select(
                "_c", F.posexplode("_v").alias("_d", "_x")
            )
            if q is not None:
                # exact integer partial sums: order-free, so the
                # learned centroids do not depend on partitioning
                exploded = exploded.withColumn(
                    "_x",
                    F.floor(F.col("_x") * F.lit(float(q)) + F.lit(0.5)),
                )
            sums = (
                exploded.groupBy("_c", "_d")
                .agg(F.sum("_x").alias("_s"), F.count("_x").alias("_n"))
                .collect()
            )
            new = [list(c) for c in self.centroids]
            counts = [0] * self.k
            for r in sums:
                if q is not None:
                    # double-cast BEFORE dividing (float(s)/float(n)),
                    # matching SQL's CAST(s AS DOUBLE)/CAST(n AS
                    # DOUBLE) — Python's int/int is correctly-rounded
                    # rational division, which differs past 2^53
                    mean = float(r["_s"]) / float(r["_n"]) / q
                else:
                    mean = r["_s"] / r["_n"]
                new[r["_c"]][r["_d"]] = mean
                counts[r["_c"]] = r["_n"]
            for c in range(self.k):
                if counts[c] == 0:  # empty cluster: keep previous
                    new[c] = list(self.centroids[c])
            if all(len(c) == dim for c in new):
                self.centroids = new
        if self.max_iter > 1:
            vecs.unpersist()
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        """Assign each vector: adds ``cluster`` (int) and ``sq_dist``
        (double, squared L2 to its centroid)."""
        if self.centroids is None:
            raise ValueError("fit() first (or pass centroids to fit)")
        best = self._assign_expr()
        return (
            df.withColumn("_v", self._vec())
            .withColumn("_best", best)
            .withColumn("cluster", F.col("_best.cluster"))
            .withColumn("sq_dist", F.col("_best.dist"))
            .drop("_v", "_best")
        )

    def inertia(self, df: DataFrame) -> float:
        """Sum of squared distances to assigned centroids (one agg)."""
        out = self.transform(df).agg(F.sum("sq_dist").alias("s")).collect()
        return float(out[0]["s"] or 0.0)
