"""PCA over an embedding column — the dimensionality-reduction tier
(pre-ANN compression, SemDeDup preprocessing, whitening).

``fit`` is ONE distributed pass: every Arrow batch reduces to a
(count, sum-vector, Gram-matrix) partial inside ``mapInPandas``
(numpy matmul, executor-side), the driver merges the tiny
one-row-per-batch partials and eigendecomposes the d x d covariance
(d is the embedding width — bounded and small; eigh on 64 x 64 is
microseconds). Raw vectors never move: the shuffle-free plan ships
only d^2 + d + 1 doubles per batch. Component signs are fixed
deterministically (the largest-|loading| coordinate is made
positive) so refits and LAPACK builds agree.

``transform`` broadcasts the k x d component matrix as a literal and
takes each component's dot product with ``aggregate(zip_with(...))``
— JVM expressions inside whole-stage codegen, zero Python in the hot
path (k is small; at k > ~32 a pandas-UDF matmul would win, noted in
the docstring, not needed for the embedding widths here).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PCAProjector"]


def _dot(vec: Column, comp: Sequence[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in comp])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


class PCAProjector:
    """Exact-covariance PCA: ``fit`` learns mean + components,
    ``transform`` appends ``pca`` (array<double>, length k).

    ``components`` (k x d) and ``mean`` (d) can also be supplied
    directly to ``fit`` — the fixed-projection gate path and the
    "load a model trained elsewhere" path.
    """

    def __init__(
        self,
        k: int = 8,
        vector_column: str = "embedding",
        output_column: str = "pca",
        center: bool = True,
        quantization: Optional[float] = None,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        if quantization is not None and quantization <= 0:
            raise ValueError("quantization must be > 0")
        self.k = k
        self.vector_column = vector_column
        self.output_column = output_column
        self.center = center
        # quantization: when set (e.g. 1e6), the one-pass partials
        # accumulate floor(x * q + 0.5) as exact BIGINTs instead of
        # float64 — FP addition is not associative, so plain double
        # partials make the learned covariance (hence components)
        # depend on row-to-batch placement; quantized sums are
        # order-free, so fit() is bit-reproducible across
        # partitionings and engines at a bounded error of 0.5/q per
        # component. The reproducible-training knob (and what makes
        # the covariance hash-gateable against a SQL oracle).
        self.quantization = quantization
        self.mean: Optional[List[float]] = None
        self.components: Optional[List[List[float]]] = None
        self.explained_variance: Optional[List[float]] = None
        self.covariance: Optional[List[List[float]]] = None

    def fit(
        self,
        df: DataFrame,
        components: Optional[Sequence[Sequence[float]]] = None,
        mean: Optional[Sequence[float]] = None,
    ) -> "PCAProjector":
        if components is not None:
            self.components = [
                [float(x) for x in c] for c in components
            ]
            d = len(self.components[0])
            self.mean = (
                [float(x) for x in mean] if mean is not None else [0.0] * d
            )
            return self
        vc = self.vector_column
        q = self.quantization

        def partials(batches: Iterator[pd.DataFrame]):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vc]]
                )
                if q is not None:
                    # exact integer accumulation (see __init__ note).
                    # int64 matmul wraps silently on overflow, so
                    # guard the worst-case bound explicitly — the
                    # partial schema is int64 either way, so a
                    # violation must fail loudly, not wrap
                    xq = np.floor(x * q + 0.5).astype(np.int64)
                    peak = int(np.abs(xq).max(initial=0))
                    if peak * peak * len(xq) >= (1 << 62):
                        raise OverflowError(
                            "quantized Gram partial would overflow "
                            "int64 — lower quantization or shrink "
                            "spark.sql.execution.arrow.maxRecordsPerBatch"
                        )
                    yield pd.DataFrame(
                        {
                            "n": [len(xq)],
                            "s": [xq.sum(axis=0).tolist()],
                            "g": [(xq.T @ xq).ravel().tolist()],
                        }
                    )
                    continue
                yield pd.DataFrame(
                    {
                        "n": [len(x)],
                        "s": [x.sum(axis=0).tolist()],
                        "g": [(x.T @ x).ravel().tolist()],
                    }
                )

        out_type = "long" if q is not None else "double"
        rows = (
            df.select(vc)
            .mapInPandas(
                partials,
                schema=f"n long, s array<{out_type}>, g array<{out_type}>",
            )
            .collect()
        )
        if not rows:
            raise ValueError("empty input")
        d = len(rows[0]["s"])
        n = sum(r["n"] for r in rows)
        if q is not None:
            # merge exact integer partials, THEN go to float exactly
            # the way a SQL replay does: CAST(sum AS DOUBLE) / n / q
            s_i = [0] * d
            g_i = [[0] * d for _ in range(d)]
            for r in rows:
                for i, v in enumerate(r["s"]):
                    s_i[i] += int(v)
                flat = r["g"]
                for i in range(d):
                    base = i * d
                    row_g = g_i[i]
                    for j in range(d):
                        row_g[j] += int(flat[base + j])
            nf = float(n)
            mu = np.array([float(v) / nf / q for v in s_i])
            cov = np.array(
                [
                    [float(g_i[i][j]) / nf / q / q for j in range(d)]
                    for i in range(d)
                ]
            )
            if self.center:
                cov = cov - np.outer(mu, mu)
            self.covariance = cov.tolist()
            vals, vecs = np.linalg.eigh(cov)
            order = np.argsort(vals)[::-1][: self.k]
            comps = vecs[:, order].T
            for i in range(comps.shape[0]):
                j = int(np.argmax(np.abs(comps[i])))
                if comps[i, j] < 0:
                    comps[i] = -comps[i]
            self.mean = mu.tolist() if self.center else [0.0] * d
            self.components = comps.tolist()
            self.explained_variance = vals[order].tolist()
            return self
        s = np.zeros(d)
        g = np.zeros((d, d))
        for r in rows:
            s += np.asarray(r["s"])
            g += np.asarray(r["g"]).reshape(d, d)
        mu = s / n
        cov = g / n - np.outer(mu, mu) if self.center else g / n
        self.covariance = cov.tolist()
        vals, vecs = np.linalg.eigh(cov)  # ascending
        order = np.argsort(vals)[::-1][: self.k]
        comps = vecs[:, order].T  # k x d
        # deterministic sign: the max-|loading| coordinate is positive
        for i in range(comps.shape[0]):
            j = int(np.argmax(np.abs(comps[i])))
            if comps[i, j] < 0:
                comps[i] = -comps[i]
        self.mean = mu.tolist() if self.center else [0.0] * d
        self.components = comps.tolist()
        self.explained_variance = vals[order].tolist()
        return self

    def save(self, path: str) -> None:
        """Mean/components/variances/covariance are the whole model
        — persisted in the meta.json sidecar (ann.store contract)."""
        from replay_spark.ann.store import write_meta

        if self.components is None:
            raise ValueError("PCAProjector must be fit before save")
        write_meta(
            path,
            type(self).__name__,
            {
                "k": self.k,
                "vector_column": self.vector_column,
                "output_column": self.output_column,
                "center": self.center,
                "quantization": self.quantization,
            },
            state={
                "mean": self.mean,
                "components": self.components,
                "explained_variance": self.explained_variance,
                "covariance": self.covariance,
            },
        )

    @classmethod
    def load(cls, path: str, spark=None) -> "PCAProjector":
        from replay_spark.ann.store import read_meta

        meta = read_meta(path)
        self = cls(**meta["params"])
        st = meta["state"]
        self.mean = st["mean"]
        self.components = st["components"]
        self.explained_variance = st["explained_variance"]
        self.covariance = st["covariance"]
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self.components is None:
            raise ValueError("fit() first (or pass components to fit)")
        vec = F.transform(
            F.col(self.vector_column), lambda x: x.cast("double")
        )
        if self.center and any(x != 0.0 for x in self.mean):
            mean_lit = F.array(*[F.lit(float(x)) for x in self.mean])
            vec = F.zip_with(vec, mean_lit, lambda a, b: a - b)
        projs = [_dot(vec, c) for c in self.components]
        return df.withColumn(self.output_column, F.array(*projs))
