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
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.vector_column = vector_column
        self.output_column = output_column
        self.center = center
        self.mean: Optional[List[float]] = None
        self.components: Optional[List[List[float]]] = None
        self.explained_variance: Optional[List[float]] = None

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

        def partials(batches: Iterator[pd.DataFrame]):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vc]]
                )
                yield pd.DataFrame(
                    {
                        "n": [len(x)],
                        "s": [x.sum(axis=0).tolist()],
                        "g": [(x.T @ x).ravel().tolist()],
                    }
                )

        rows = (
            df.select(vc)
            .mapInPandas(
                partials, schema="n long, s array<double>, g array<double>"
            )
            .collect()
        )
        if not rows:
            raise ValueError("empty input")
        d = len(rows[0]["s"])
        n = sum(r["n"] for r in rows)
        s = np.zeros(d)
        g = np.zeros((d, d))
        for r in rows:
            s += np.asarray(r["s"])
            g += np.asarray(r["g"]).reshape(d, d)
        mu = s / n
        cov = g / n - np.outer(mu, mu) if self.center else g / n
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
