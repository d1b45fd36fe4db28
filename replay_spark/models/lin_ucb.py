"""LinUCB — contextual bandit with per-arm ridge regression.

Disjoint LinUCB (Li et al. 2010, Alg. 1): arm a keeps
A_a = α·I + Σ x xᵀ and b_a = Σ r·x over its interactions;
score(x) = θ_aᵀx + ε·√(xᵀA_a⁻¹x), θ_a = A_a⁻¹b_a.

Hybrid LinUCB (Li et al. 2010, Alg. 2): shared coefficients β over
z_{u,a} = x_u ⊗ y_a (Kronecker of user and item features) plus the
per-arm θ_a; score = zᵀβ + xᵀθ_a + ε·√(s) with the four-term
variance s.

Design (reference ``models/lin_ucb.py:90-451``; same public
signature ``LinUCB(eps, alpha, is_hybrid)``): arm statistics are
accumulated DISTRIBUTEDLY — one groupBy(item) over the joined
(interactions × user-features) table aggregates S_a = Σ x xᵀ and
b_a = Σ r·x as array columns — then only the per-arm (d×d) matrices
are collected for the driver-side algebra (arms ≪ interactions;
documented small-arm assumption). The hybrid quantities need NO
extra Spark pass: with z = x ⊗ y_a, every shared-model term factors
through the SAME aggregates (B_a = S_a ⊗ y_aᵀ, ZᵀZ = S_a ⊗ y y ᵀ,
Zᵀr = b_a ⊗ y_a), and scoring collapses per arm to one effective
vector v_a and one d×d matrix M_a so that
score = xᵀv_a + ε·√(xᵀM_a x) — the exact shape of the disjoint
scorer, evaluated as a broadcast join + JVM dot products (the
reference instead builds a dense user×item matrix on the driver).
Arms never observed in interactions keep their ridge prior
(θ = 0, A⁻¹ = I/α), as the reference's zero-initialized arm list
does.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from replay_spark.data.dataset import Dataset
from replay_spark.models.base import BaseRecommender
from replay_spark.utils.spark_utils import local_df, vector_dot_expr

__all__ = ["LinUCB"]


class LinUCB(BaseRecommender):
    """Contextual bandit with per-arm ridge regression — disjoint or
    hybrid (Li et al. 2010); see the module docstring for the
    distributed design. Reference signature
    ``LinUCB(eps, alpha, is_hybrid)`` (``lin_ucb.py:90-104``)."""

    can_predict_cold_queries = False
    can_predict_cold_items = False

    _search_space = {
        "eps": {"type": "uniform", "args": [-10.0, 10.0]},
        "alpha": {"type": "uniform", "args": [0.001, 10.0]},
    }

    def __init__(
        self,
        eps: float = 2.0,
        alpha: float = 1.0,
        is_hybrid: bool = False,
    ):
        """:param eps: exploration coefficient (reference name);
        :param alpha: ridge parameter A = α·I + ...;
        :param is_hybrid: shared-features (Kronecker) hybrid model."""
        self.eps = eps
        self.alpha = alpha
        self.is_hybrid = is_hybrid
        self._arm_vec: Optional[dict] = None  # item -> effective vector
        self._arm_mat: Optional[dict] = None  # item -> variance matrix

    @property
    def _init_args(self):
        return {
            "eps": self.eps,
            "alpha": self.alpha,
            "is_hybrid": self.is_hybrid,
        }

    def _feature_cols(self, df: DataFrame, id_column: str) -> list:
        return [c for c in df.columns if c != id_column]

    def _arm_aggregates(self, dataset: Dataset, feat_cols: list) -> list:
        """Distributed per-arm S_a = Σ x xᵀ (flattened) and
        b_a = Σ r·x; one shuffle on the arm id."""
        d = len(feat_cols)
        joined = dataset.interactions.join(
            dataset.query_features, on=self.query_column
        ).select(
            self.item_column,
            F.array(*[F.col(c).cast("double") for c in feat_cols]).alias("x"),
            F.col(self.rating_column).cast("double").alias("r"),
        )
        outer = F.flatten(
            F.transform("x", lambda xi: F.transform("x", lambda xj: xi * xj))
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
                ).alias("S_sum"),
                F.aggregate(
                    F.collect_list("rx"),
                    F.array_repeat(F.lit(0.0), d),
                    lambda acc, arr: F.zip_with(acc, arr, lambda a, b: a + b),
                ).alias("b_sum"),
            )
        )
        return stats.collect()  # arms only — small by assumption

    def _fit(self, dataset: Dataset) -> None:
        if dataset.query_features is None:
            raise ValueError("LinUCB requires query features")
        if self.is_hybrid and dataset.item_features is None:
            raise ValueError("hybrid LinUCB requires item features")
        feat_cols = self._feature_cols(dataset.query_features, self.query_column)
        d = len(feat_cols)
        self._dim = d
        self._feat_cols = feat_cols
        rows = self._arm_aggregates(dataset, feat_cols)
        observed = {
            row[self.item_column]: (
                np.array(row["S_sum"]).reshape(d, d),
                np.array(row["b_sum"]),
            )
            for row in rows
        }
        # the arm universe is every fit item (the reference
        # zero-initializes an arm per item-features row)
        arm_ids = [r[0] for r in self.fit_items.collect()]
        zero = (np.zeros((d, d)), np.zeros(d))

        if not self.is_hybrid:
            self._arm_vec, self._arm_mat = {}, {}
            for item in arm_ids:
                S, b = observed.get(item, zero)
                A_inv = np.linalg.inv(self.alpha * np.eye(d) + S)
                self._arm_vec[item] = A_inv @ b
                self._arm_mat[item] = A_inv
            return

        # hybrid: item feature vectors
        item_feat_cols = self._feature_cols(
            dataset.item_features, self.item_column
        )
        di = len(item_feat_cols)
        k = d * di
        y = {
            r[self.item_column]: np.array(
                [float(r[c]) for c in item_feat_cols]
            )
            for r in dataset.item_features.collect()
        }
        # shared model accumulation (Li et al. Alg. 2 batch form):
        # A0 = I + Σ_a [ZᵀZ − BᵀA⁻¹B], b0 = Σ_a [Zᵀr − BᵀA⁻¹b]
        A0 = np.eye(k)
        b0 = np.zeros(k)
        per_arm = {}
        for item in arm_ids:
            S, b = observed.get(item, zero)
            ya = y.get(item)
            if ya is None:
                ya = np.zeros(di)
            A_inv = np.linalg.inv(self.alpha * np.eye(d) + S)
            B = np.kron(S, ya.reshape(1, -1))  # d × k  (= S ⊗ yᵀ)
            ZtZ = np.kron(S, np.outer(ya, ya))  # k × k
            Ztr = np.kron(b, ya)  # k
            A0 += ZtZ - B.T @ A_inv @ B
            b0 += Ztr - B.T @ (A_inv @ b)
            per_arm[item] = (A_inv, B, b, ya)
        beta = np.linalg.solve(A0, b0)
        A0_inv = np.linalg.inv(A0)
        beta_mat = beta.reshape(d, di)
        self._arm_vec, self._arm_mat = {}, {}
        for item, (A_inv, B, b, ya) in per_arm.items():
            theta = A_inv @ (b - B @ beta)
            # z-dependent terms fold into x-space via z = x ⊗ y:
            # zᵀβ = xᵀ(β_mat y);  zᵀA0⁻¹z = xᵀC x with
            # C[a,c] = Σ_{p,q} A0inv[a·di+p, c·di+q]·y_p·y_q;
            # zᵀM x (M = A0⁻¹BᵀA⁻¹) = xᵀD x with
            # D[a,c] = Σ_p y_p·M[a·di+p, c]
            v = theta + beta_mat @ ya
            A0i = A0_inv.reshape(d, di, d, di)
            C = np.einsum("p,apcq,q->ac", ya, A0i, ya)
            M = A0_inv @ B.T @ A_inv  # k × d
            D = np.einsum("p,apc->ac", ya, M.reshape(d, di, d))
            E = A_inv @ B @ A0_inv @ B.T @ A_inv
            s_mat = A_inv + C - 2 * D + E
            # numerical symmetrization (einsum/products drift ~1e-16)
            self._arm_vec[item] = v
            self._arm_mat[item] = (s_mat + s_mat.T) / 2

    def _score_frame(self, queries: DataFrame, dataset: Dataset) -> DataFrame:
        spark = queries.sparkSession
        d = self._dim
        arm_rows = [
            (
                item,
                [float(x) for x in self._arm_vec[item]],
                [float(x) for x in self._arm_mat[item].reshape(-1)],
            )
            for item in self._arm_vec
        ]
        # driver-local arm-state frame via pandas: O(rows) partitions
        # instead of defaultParallelism Python slices
        arms = local_df(
            spark,
            arm_rows,
            f"{self.item_column} long, theta array<double>, a_inv array<double>",
        )
        feats = dataset.query_features.join(queries, on=self.query_column).select(
            self.query_column,
            F.array(*[F.col(c).cast("double") for c in self._feat_cols]).alias("x"),
        )
        scored = feats.crossJoin(F.broadcast(arms))
        # xᵀMx with the flattened matrix: Σ_i x_i · Σ_j M[i,j]·x_j
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
                + F.lit(self.eps)
                * F.sqrt(
                    F.greatest(
                        vector_dot_expr(F.col("x"), F.col("_ax")), F.lit(0.0)
                    )
                )
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
