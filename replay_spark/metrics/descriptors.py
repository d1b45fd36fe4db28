"""Aggregation descriptors over the per-user metric distribution.

Parity: reference ``replay/metrics/descriptors.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["Mean", "Median", "ConfidenceInterval", "PerUser"]


def _norm_ppf(p: float) -> float:
    """Standard normal quantile (Acklam approximation, scipy-free)."""
    from replay_spark.models.bandits import _norm_isf

    return -_norm_isf(p)


class CalculationDescriptor:
    def spark(self, distribution: DataFrame):  # pragma: no cover
        raise NotImplementedError

    @property
    def __name__(self) -> str:
        return type(self).__name__


class Mean(CalculationDescriptor):
    def spark(self, distribution: DataFrame):
        column = distribution.columns[0]
        return distribution.select(F.avg(column)).first()[0]


class Median(CalculationDescriptor):
    def spark(self, distribution: DataFrame):
        column = distribution.columns[0]
        return distribution.select(
            F.expr(f"percentile_approx({column}, 0.5)")
        ).first()[0]


class PerUser(CalculationDescriptor):
    """Return the per-user metric distribution itself.

    By default the metric result is the per-user DataFrame
    (columns: query column + ``value``) — safe at any user count.
    ``as_dict=True`` reproduces the reference's ``{user: value}``
    dict (reference ``descriptors.py:50``), which collects the whole
    distribution to the driver: opt-in only, OOM at ~10⁸ users.
    """

    def __init__(self, as_dict: bool = False):
        self.as_dict = as_dict

    def spark(self, distribution: DataFrame):
        return distribution


class ConfidenceInterval(CalculationDescriptor):
    """Half-width of the normal confidence interval: z * std / sqrt(n)."""

    def __init__(self, alpha: float):
        self.alpha = alpha

    def spark(self, distribution: DataFrame):
        column = distribution.columns[0]
        quantile = _norm_ppf((1 + self.alpha) / 2)
        row = (
            distribution.agg(
                F.stddev(column).alias("std"), F.count(column).alias("cnt")
            )
            .select(
                F.when(
                    F.isnan(F.col("std")) | F.col("std").isNull(), F.lit(0.0)
                )
                .otherwise(F.col("std"))
                .alias("std"),
                "cnt",
            )
            .first()
        )
        return quantile * row["std"] / math.sqrt(row["cnt"])
