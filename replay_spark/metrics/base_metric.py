"""Base offline metric.

Rebuild of reference ``replay/metrics/base_metric.py`` with one key
architectural change (flagged in SURVEY §2.6): the per-user metric
kernels run as Spark SQL higher-order-function expressions over the
per-user item arrays instead of ``rdd.flatMap`` Python kernels —
whole computation stays JVM-side (no Python boundary crossing per
user), which matters when recs have 10^8+ users.

Enrichment (parity with ``base_metric.py:195-275``):

* recs → per-user item list ordered by (rating desc, item desc) via
  ``sort_array(collect_list(struct(rating, item)), False)``;
* ground truth → ``collect_set``;
* right join on query (users with truth but no recs score 0).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from replay_spark.metrics.descriptors import CalculationDescriptor, Mean

__all__ = ["Metric"]


class Metric:
    """Base class for offline top-k metrics."""

    def __init__(
        self,
        topk: Union[int, list[int]],
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        mode: Optional[CalculationDescriptor] = None,
    ):
        self.topk = [topk] if isinstance(topk, int) else sorted(topk)
        self.query_column = query_column
        self.item_column = item_column
        self.rating_column = rating_column
        self._mode = mode or Mean()

    @property
    def __name__(self) -> str:
        return type(self).__name__

    def __call__(
        self, recommendations: DataFrame, ground_truth: DataFrame
    ) -> dict:
        enriched = self._get_enriched_recommendations(recommendations, ground_truth)
        fused = self._compute_mean_fused(enriched)
        if fused is not None:
            return fused
        self._check_duplicates(recommendations)
        return self._compute(enriched)

    def _compute_mean_fused(self, enriched: DataFrame):
        """Mean-mode fast path: every k's per-user kernel AND the
        duplicate check ride ONE aggregation job over the enriched
        frame (the dup check is a max() column — a (query, item)
        duplicate in the recs is a repeated entry in that query's
        pred list; duplicates of queries absent from the ground truth
        cannot affect any metric value). Identical avg() doubles to
        the per-k ``_compute`` path. Returns None for non-Mean modes
        (they keep the generic path)."""
        from replay_spark.metrics.descriptors import Mean

        if type(self._mode) is not Mean:
            return None
        cols = [
            self._per_user_value(k).alias(f"_v{i}")
            for i, k in enumerate(self.topk)
        ]
        dup_flag = F.max(
            F.when(
                F.size("pred_item_id")
                > F.size(F.array_distinct("pred_item_id")),
                1,
            ).otherwise(0)
        ).alias("_dup")
        row = enriched.select(*cols, "pred_item_id").agg(
            *[F.avg(f"_v{i}").alias(f"_a{i}") for i in range(len(cols))],
            dup_flag,
        ).first()
        if row["_dup"]:
            self._warn_duplicates()
        return self._aggregate_results(
            {k: row[f"_a{i}"] for i, k in enumerate(self.topk)}
        )

    def _check_duplicates(self, recommendations: DataFrame) -> None:
        dup = (
            recommendations.groupBy(self.query_column, self.item_column)
            .count()
            .filter(F.col("count") >= 2)
            .count()
        )
        if dup > 0:
            self._warn_duplicates()

    def _warn_duplicates(self) -> None:
        import warnings

        warnings.warn(
            "There are duplicated (query, item) pairs in recommendations"
        )

    def _get_items_list_per_user(
        self, recommendations: DataFrame, extra_column: Optional[str] = None
    ) -> DataFrame:
        struct_cols = [
            c
            for c in [self.rating_column, self.item_column, extra_column]
            if c is not None
        ]
        recs = recommendations.groupBy(self.query_column).agg(
            F.sort_array(
                F.collect_list(F.struct(*struct_cols)), False
            ).alias("pred")
        )
        selection = [
            self.query_column,
            F.col(f"pred.{self.item_column}").alias("pred_item_id"),
        ]
        if extra_column:
            selection.append(F.col(f"pred.{extra_column}").alias(extra_column))
        return recs.select(*selection)

    def _grouped_ground_truth(self, ground_truth: DataFrame) -> DataFrame:
        return ground_truth.groupBy(self.query_column).agg(
            F.collect_set(self.item_column).alias("ground_truth")
        )

    def _get_enriched_recommendations(
        self,
        recommendations: DataFrame,
        ground_truth: DataFrame,
        gt_grouped: Optional[DataFrame] = None,
    ) -> DataFrame:
        """``gt_grouped``: a pre-grouped (and typically cached) ground
        truth — Experiment passes it so evaluating N models shuffles
        the test set once, not once per model."""
        gt = (
            gt_grouped
            if gt_grouped is not None
            else self._grouped_ground_truth(ground_truth)
        )
        pred = self._get_items_list_per_user(recommendations)
        return pred.join(gt, on=self.query_column, how="right")

    # -- kernel ------------------------------------------------------------
    def _per_user_value(self, k: int) -> Column:
        """Expression computing this metric's per-user value at k from
        columns ``pred_item_id`` (array) and ``ground_truth`` (array)."""
        raise NotImplementedError

    def _compute(self, enriched: DataFrame) -> dict:
        results = {}
        for k in self.topk:
            per_user = enriched.select(
                self._per_user_value(k).alias("value"), self.query_column
            )
            results[k] = self._mode.spark(per_user)
        return self._aggregate_results(results)

    def _aggregate_results(self, results: dict) -> dict:
        mode_name = type(self._mode).__name__
        out = {}
        for k, value in results.items():
            if mode_name == "Mean":
                key = f"{self.__name__}@{k}"
            else:
                key = f"{self.__name__}-{mode_name}@{k}"
            if mode_name == "PerUser":
                if getattr(self._mode, "as_dict", False):
                    # reference-parity dict — explicit opt-in, this
                    # collects one row per user to the driver
                    value = {
                        r[self.query_column]: r["value"]
                        for r in value.collect()
                    }
                else:
                    value = value.select(self.query_column, "value")
            out[key] = value
        return out

    # -- shared expression helpers ----------------------------------------
    @staticmethod
    def _sliced(k: int) -> str:
        return f"slice(pred_item_id, 1, {k})"

    @staticmethod
    def _hits(k: int) -> str:
        """int array: 1 where the i-th predicted item is in ground truth."""
        return (
            f"transform(slice(pred_item_id, 1, {k}), "
            f"x -> int(array_contains(ground_truth, x)))"
        )

    def _guard(self, expr: Column, empty_value: float = 0.0) -> Column:
        """0 (or ``empty_value``) when the user has no recs or no truth."""
        return F.when(
            F.col("pred_item_id").isNull()
            | (F.size("pred_item_id") == 0)
            | F.col("ground_truth").isNull()
            | (F.size("ground_truth") == 0),
            F.lit(empty_value),
        ).otherwise(expr)
