"""Scalar int8 quantization of embedding columns (the faiss-SQ8
slot): a 4x storage/bandwidth cut for ANN shortlists, corpus
exports, and cache-resident similarity search — the cheap
complement to the PQ codebook tiers in :mod:`replay_spark.ann.search`.

Everything is expression-level arithmetic (zero UDFs):

* ``mode="vector"`` (default) — per-row symmetric scale
  ``max(|v|) / 127``; no fit pass at all, the encode is a pure
  projection fused into the scan.
* ``mode="global"`` — ONE corpus aggregate learns a single symmetric
  scale (max |v| anywhere / 127); codes become directly comparable
  across rows (asymmetric-distance shortlists without per-row
  rescaling).

Rounding is ``floor(x + 0.5)`` — exact on doubles and identical in
every engine, deliberately avoiding ``round()``'s cross-engine
half-tie behavior (the class of divergence documented on the r6
``q_log_stat_features`` gate). Codes are emitted as ``array<int>``
in [-127, 127]; a parquet writer stores them as bytes via a cast at
write time.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["EmbeddingQuantizer"]


def _absmax(vec: Column) -> Column:
    return F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )


class EmbeddingQuantizer:
    """SQ8 encode/decode for an ``array<float/double>`` column."""

    def __init__(
        self,
        vector_column: str = "embedding",
        codes_column: str = "codes",
        scale_column: str = "scale",
        mode: str = "vector",
    ):
        if mode not in ("vector", "global"):
            raise ValueError("mode must be 'vector' or 'global'")
        self.vector_column = vector_column
        self.codes_column = codes_column
        self.scale_column = scale_column
        self.mode = mode
        self.global_scale: Optional[float] = None

    def save(self, path: str) -> None:
        """The model is the params plus (in global mode) one scalar
        scale — all sidecar-resident (ann.store contract)."""
        from replay_spark.ann.store import write_meta

        if self.mode == "global" and self.global_scale is None:
            raise ValueError(
                "EmbeddingQuantizer(mode='global') must be fit "
                "before save"
            )
        write_meta(
            path,
            type(self).__name__,
            {
                "vector_column": self.vector_column,
                "codes_column": self.codes_column,
                "scale_column": self.scale_column,
                "mode": self.mode,
            },
            state={"global_scale": self.global_scale},
        )

    @classmethod
    def load(cls, path: str, spark=None) -> "EmbeddingQuantizer":
        from replay_spark.ann.store import read_meta

        meta = read_meta(path)
        self = cls(**meta["params"])
        self.global_scale = meta["state"]["global_scale"]
        return self

    def _vec(self) -> Column:
        return F.transform(
            F.col(self.vector_column), lambda x: x.cast("double")
        )

    def fit(self, df: DataFrame) -> "EmbeddingQuantizer":
        """Learn the global scale (one aggregate); no-op for
        ``mode="vector"``."""
        if self.mode == "global":
            row = df.select(
                F.max(_absmax(self._vec())).alias("m")
            ).collect()[0]
            self.global_scale = float(row["m"] or 0.0) / 127.0
        return self

    def encode(self, df: DataFrame) -> DataFrame:
        """Append ``codes`` (array<int>, [-127, 127]) and ``scale``."""
        vec = self._vec()
        if self.mode == "global":
            if self.global_scale is None:
                raise ValueError("fit() first for mode='global'")
            scale = F.lit(float(self.global_scale))
        else:
            scale = _absmax(vec) / F.lit(127.0)
        codes = F.when(
            scale == 0.0,
            F.transform(vec, lambda x: F.lit(0)),
        ).otherwise(
            F.transform(
                vec,
                lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"),
            )
        )
        return df.withColumn(self.codes_column, codes).withColumn(
            self.scale_column, scale
        )

    def decode(
        self, df: DataFrame, output_column: str = "decoded"
    ) -> DataFrame:
        """Reconstruct approximate doubles: ``code * scale``."""
        scale = F.col(self.scale_column)
        return df.withColumn(
            output_column,
            F.transform(
                F.col(self.codes_column),
                lambda c: c.cast("double") * scale,
            ),
        )
