"""Robust feature scaling — winsorization + median/IQR scaling, the
outlier-tolerant standardization every tabular training pipeline
applies before gradient methods (scikit-learn's ``RobustScaler``
semantics, re-expressed as keyed DataFrame algebra).

Quantiles are EXACT per group (the ``grouped_exact_quantiles``
rank-join device — one keyed window + a rank join, no per-group
sort-collect), so the fitted state is deterministic and
cross-engine-reproducible; with an integral value column the scaled
output can be emitted as exact integer parts-per-million
(``floor((v − median)·1e6 / iqr)``), which is what the
``q_robust_scale`` gate hashes — no engine-rounded doubles anywhere.

Scale shape: fit = the quantile pass (one keyed window over the
value projection + a tiny rank join); transform = ONE broadcast-
friendly join of the O(groups)×4 stats table back onto the rows,
then pure projections (clip via least/greatest, scaling arithmetic).
Nothing is wider than one shuffle on the group key, and a hot group
costs a linear in-partition rank, never a driver collect. No
reference counterpart (training-data feature extension).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["RobustScaler"]


class RobustScaler:
    def __init__(
        self,
        value_column: str = "v",
        group_columns: Sequence[str] = (),
        lower: float = 0.01,
        upper: float = 0.99,
        emit_ppm: bool = False,
    ):
        if not 0.0 <= lower < upper <= 1.0:
            raise ValueError("need 0 <= lower < upper <= 1")
        self.value_column = value_column
        self.group_columns = (
            [group_columns]
            if isinstance(group_columns, str)
            else list(group_columns)
        )
        self.lower = float(lower)
        self.upper = float(upper)
        self.emit_ppm = emit_ppm
        self._stats: Optional[DataFrame] = None

    def fit(self, df: DataFrame) -> "RobustScaler":
        """Per-group exact (lower, q25, median, q75, upper) —
        O(groups) rows."""
        from replay_spark.utils.spark_utils import (
            grouped_exact_quantiles,
        )

        groups = self.group_columns or ["_g"]
        src = df if self.group_columns else df.withColumn(
            "_g", F.lit(0)
        )
        q = grouped_exact_quantiles(
            src,
            groups,
            self.value_column,
            [self.lower, 0.25, 0.5, 0.75, self.upper],
        )
        stats = q.groupBy(*groups).agg(
            F.min(F.when(F.col("prob") == self.lower, F.col("value"))).alias("lo"),
            F.min(F.when(F.col("prob") == 0.25, F.col("value"))).alias("q25"),
            F.min(F.when(F.col("prob") == 0.5, F.col("value"))).alias("med"),
            F.min(F.when(F.col("prob") == 0.75, F.col("value"))).alias("q75"),
            F.min(F.when(F.col("prob") == self.upper, F.col("value"))).alias("hi"),
        )
        self._stats = stats
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        """Adds ``<v>__clipped`` (winsorized to [lo, hi]) and
        ``<v>__scaled`` ((clipped − median)/IQR; 0 when IQR = 0) —
        plus ``<v>__scaled_ppm`` (exact BIGINT
        floor((clipped − median)·1e6 / iqr)) when ``emit_ppm``."""
        if self._stats is None:
            raise ValueError("fit() first")
        vc = self.value_column
        groups = self.group_columns
        out = df if groups else df.withColumn("_g", F.lit(0))
        out = out.join(
            F.broadcast(self._stats), on=groups or ["_g"], how="left"
        )
        clipped = F.greatest(
            F.col("lo"), F.least(F.col("hi"), F.col(vc))
        )
        iqr = F.col("q75") - F.col("q25")
        out = out.withColumn(f"{vc}__clipped", clipped)
        scaled = F.when(iqr == 0, F.lit(0.0)).otherwise(
            (F.col(f"{vc}__clipped") - F.col("med")).cast("double")
            / iqr.cast("double")
        )
        out = out.withColumn(f"{vc}__scaled", scaled)
        if self.emit_ppm:
            ppm = F.when(iqr == 0, F.lit(0).cast("long")).otherwise(
                F.floor(
                    (F.col(f"{vc}__clipped") - F.col("med"))
                    * F.lit(1_000_000)
                    / iqr
                ).cast("long")
            )
            out = out.withColumn(f"{vc}__scaled_ppm", ppm)
        drop = ["lo", "q25", "med", "q75", "hi"]
        if not groups:
            drop.append("_g")
        return out.drop(*drop)
