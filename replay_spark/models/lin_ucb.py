"""LinUCB — contextual bandit with per-arm ridge regression.

Disjoint LinUCB (Li et al. 2010): arm a keeps A_a = D_aᵀD_a + I and
b_a = D_aᵀc_a; score(x) = θ_aᵀx + α √(xᵀA_a⁻¹x).

Design (reference ``models/lin_ucb.py:97-451``): arm statistics are
accumulated DISTRIBUTEDLY — one groupBy(item) over the joined
(interactions × user-features) table aggregates the outer-product
sums as array columns — then only the per-arm (d×d) matrices are
collected for inversion (arms ≪ interactions; documented small-arm
assumption). Scoring is a broadcast join + JVM dot products.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from replay_spark.data.dataset import Dataset
from replay_spark.models.base import BaseRecommender
from replay_spark.utils.spark_utils import vector_dot_expr

__all__ = ["LinUCB"]


class LinUCB(BaseRecommender):
    can_predict_cold_queries = False
    can_predict_cold_items = False

    def __init__(self, alpha: float = 1.0, regularization: float = 1.0):
        self.alpha = alpha
        self.regularization = regularization
        self._theta: Optional[dict] = None  # item -> θ vector
        self._a_inv: Optional[dict] = None  # item -> A⁻¹

    @property
    def _init_args(self):
        return {"alpha": self.alpha, "regularization": self.regularization}

    def _feature_cols(self, dataset: Dataset) -> list:
        return [
            c for c in dataset.query_features.columns if c != self.query_column
        ]

    def _fit(self, dataset: Dataset) -> None:
        if dataset.query_features is None:
            raise ValueError("LinUCB requires query features")
        feat_cols = self._feature_cols(dataset)
        d = len(feat_cols)
        joined = dataset.interactions.join(
            dataset.query_features, on=self.query_column
        ).select(
            self.item_column,
            F.array(*[F.col(c).cast("double") for c in feat_cols]).alias("x"),
            F.col(self.rating_column).cast("double").alias("r"),
        )
        # outer-product sums as flattened d*d arrays, plus b = Σ r·x —
        # a single distributed aggregate per arm
        outer = F.flatten(
            F.transform(
                "x",
                lambda xi: F.transform("x", lambda xj: xi * xj),
            )
        )
        rx = F.transform("x", lambda xi: xi * F.col("r"))
        stats = (
            joined.withColumn("xxT", outer)
            .withColumn("rx", rx)
            .groupBy(self.item_column)
            .agg(
                F.aggregate(
                    F.collect_list("xxT"),
                    F.array_repeat(F.lit(0.0), d * d),
                    lambda acc, arr: F.zip_with(acc, arr, lambda a, b: a + b),
                ).alias("A_sum"),
                F.aggregate(
                    F.collect_list("rx"),
                    F.array_repeat(F.lit(0.0), d),
                    lambda acc, arr: F.zip_with(acc, arr, lambda a, b: a + b),
                ).alias("b_sum"),
            )
        )
        rows = stats.collect()  # arms only — small by assumption
        self._theta, self._a_inv = {}, {}
        self._dim = d
        self._feat_cols = feat_cols
        for row in rows:
            A = np.array(row["A_sum"]).reshape(d, d) + self.regularization * np.eye(d)
            b = np.array(row["b_sum"])
            A_inv = np.linalg.inv(A)
            self._a_inv[row[self.item_column]] = A_inv
            self._theta[row[self.item_column]] = A_inv @ b

    def _score_frame(self, queries: DataFrame, dataset: Dataset) -> DataFrame:
        spark = queries.sparkSession
        d = self._dim
        arm_rows = []
        for item, theta in self._theta.items():
            arm_rows.append(
                (
                    item,
                    [float(v) for v in theta],
                    [float(v) for v in self._a_inv[item].reshape(-1)],
                )
            )
        arms = spark.createDataFrame(
            arm_rows,
            f"{self.item_column} long, theta array<double>, a_inv array<double>",
        )
        feats = dataset.query_features.join(queries, on=self.query_column).select(
            self.query_column,
            F.array(*[F.col(c).cast("double") for c in self._feat_cols]).alias("x"),
        )
        scored = feats.crossJoin(F.broadcast(arms))
        # xᵀA⁻¹x with the flattened matrix: Σ_i x_i · Σ_j A[i,j]·x_j
        ax = F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: F.aggregate(
                F.sequence(F.lit(0), F.lit(d - 1)),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at("a_inv", (i * d + j + 1).cast("int"))
                * F.element_at("x", (j + 1).cast("int")),
            ),
        )
        return scored.withColumn("_ax", ax).select(
            self.query_column,
            self.item_column,
            (
                vector_dot_expr(F.col("theta"), F.col("x"))
                + F.lit(self.alpha)
                * F.sqrt(vector_dot_expr(F.col("x"), F.col("_ax")))
            ).alias(self.rating_column),
        )

    def _predict(
        self,
        dataset: Dataset,
        k: int,
        queries: DataFrame,
        items: DataFrame,
        filter_seen_items: bool = True,
    ) -> DataFrame:
        return self._score_frame(queries, dataset).join(
            items, on=self.item_column, how="left_semi"
        )

    def _predict_pairs(self, pairs: DataFrame, dataset=None) -> DataFrame:
        scored = self._score_frame(
            pairs.select(self.query_column).distinct(), dataset
        )
        return scored.join(pairs, on=[self.query_column, self.item_column])
