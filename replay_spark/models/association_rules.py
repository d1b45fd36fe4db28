"""Association-rules item-to-item recommender.

Session co-occurrence → confidence / lift / confidence_gain, pruned
to ``num_neighbours`` per antecedent by lift. Parity: reference
``models/association_rules.py:17-360``.

Scale note: the pair generation is a session self-join with
``antecedent < consequent`` — the same quadratic shape as ItemKNN;
``min_item_count`` pre-filtering plus session-length capping (via
preprocessing filters) bound it, and AQE splits skewed sessions.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from replay_spark.data.dataset import Dataset
from replay_spark.models.knn import NeighbourRec

__all__ = ["AssociationRulesItemRec"]


class AssociationRulesItemRec(NeighbourRec):
    """Item-to-item recommendations from association rules."""

    _search_space = {
        "min_item_count": {"type": "int", "args": [3, 10]},
        "min_pair_count": {"type": "int", "args": [3, 10]},
        "num_neighbours": {"type": "int", "args": [300, 2000]},
        "use_rating": {"type": "categorical", "args": [True, False]},
        "similarity_metric": {
            "type": "categorical",
            "args": ["confidence", "lift"],
        },
    }

    item_to_item_metrics = ["confidence", "lift", "confidence_gain"]
    can_change_metric = True

    def __init__(
        self,
        session_column: Optional[str] = None,
        min_item_count: int = 5,
        min_pair_count: int = 5,
        num_neighbours: Optional[int] = 1000,
        use_rating: bool = False,
        similarity_metric: str = "confidence",
        max_session_length: Optional[int] = None,
    ):
        # max_session_length caps each session to its N highest-rated
        # items BEFORE the pair self-join (the ItemKNN
        # max_history_per_user pattern): a 10^5-item session otherwise
        # contributes 10^10 pairs. None = exact reference behavior.
        if similarity_metric not in self.item_to_item_metrics:
            raise ValueError(
                f"similarity_metric must be one of {self.item_to_item_metrics}"
            )
        self.session_column = session_column
        self.min_item_count = min_item_count
        self.min_pair_count = min_pair_count
        self.num_neighbours = num_neighbours
        self.use_rating = use_rating
        self.similarity_metric = similarity_metric
        self.max_session_length = max_session_length

    @property
    def _similarity_metric_column(self) -> str:
        # re-read at every predict so the metric can be switched after
        # fit, as the reference doctest does (the fit-time "similarity"
        # alias stays for nearest-items and direct table readers)
        if self.similarity_metric not in self.item_to_item_metrics:
            raise ValueError(
                f"similarity_metric must be one of {self.item_to_item_metrics}"
            )
        return self.similarity_metric

    @property
    def _init_args(self):
        return {
            "session_column": self.session_column,
            "min_item_count": self.min_item_count,
            "min_pair_count": self.min_pair_count,
            "num_neighbours": self.num_neighbours,
            "use_rating": self.use_rating,
            "similarity_metric": self.similarity_metric,
            "max_session_length": self.max_session_length,
        }

    def _fit(self, dataset: Dataset) -> None:
        session_column = self.session_column or self.query_column
        interactions = (
            dataset.interactions.withColumn(
                self.rating_column,
                F.col(self.rating_column) if self.use_rating else F.lit(1),
            )
            .select(session_column, self.item_column, self.rating_column)
            .distinct()
        )
        if self.max_session_length is not None:
            cap_window = Window.partitionBy(session_column).orderBy(
                F.col(self.rating_column).desc(), F.col(self.item_column).asc()
            )
            interactions = (
                interactions.withColumn(
                    "_sess_rank", F.row_number().over(cap_window)
                )
                .filter(F.col("_sess_rank") <= self.max_session_length)
                .drop("_sess_rank")
            )
        num_sessions = interactions.select(session_column).distinct().count()

        frequent_items = (
            interactions.groupBy(self.item_column)
            .agg(
                F.count(self.item_column).alias("_item_count"),
                F.sum(self.rating_column).alias("_item_rating"),
            )
            .filter(F.col("_item_count") >= self.min_item_count)
            .drop("_item_count")
        ).cache()

        frequent_interactions = interactions.join(
            frequent_items.select(self.item_column), on=self.item_column
        )

        pairs = (
            frequent_interactions.withColumnRenamed(self.item_column, "antecedent")
            .withColumnRenamed(self.rating_column, "_ant_rel")
            .join(
                frequent_interactions.withColumnRenamed(
                    session_column, "_sess_cons"
                )
                .withColumnRenamed(self.item_column, "consequent")
                .withColumnRenamed(self.rating_column, "_cons_rel"),
                on=[
                    F.col(session_column) == F.col("_sess_cons"),
                    F.col("antecedent") < F.col("consequent"),
                ],
            )
            .withColumn(
                self.rating_column, F.least(F.col("_cons_rel"), F.col("_ant_rel"))
            )
            .drop("_sess_cons", "_cons_rel", "_ant_rel")
        )

        pairs_count = (
            pairs.groupBy("antecedent", "consequent")
            .agg(
                F.count("consequent").alias("_pair_count"),
                F.sum(self.rating_column).alias("pair_rating"),
            )
            .filter(F.col("_pair_count") >= self.min_pair_count)
            .drop("_pair_count")
        )
        pairs_metrics = pairs_count.unionByName(
            pairs_count.select(
                F.col("consequent").alias("antecedent"),
                F.col("antecedent").alias("consequent"),
                F.col("pair_rating"),
            )
        )
        pairs_metrics = pairs_metrics.join(
            frequent_items.select(
                F.col(self.item_column).alias("antecedent"),
                F.col("_item_rating").alias("antecedent_rating"),
            ),
            on="antecedent",
        ).join(
            frequent_items.select(
                F.col(self.item_column).alias("consequent"),
                F.col("_item_rating").alias("consequent_rating"),
            ),
            on="consequent",
        )
        pairs_metrics = pairs_metrics.withColumn(
            "confidence", F.col("pair_rating") / F.col("antecedent_rating")
        ).withColumn(
            "lift",
            F.lit(num_sessions) * F.col("confidence") / F.col("consequent_rating"),
        )
        if self.num_neighbours is not None:
            pairs_metrics = (
                pairs_metrics.withColumn(
                    "_order",
                    F.row_number().over(
                        Window.partitionBy("antecedent").orderBy(
                            F.col("lift").desc(), F.col("consequent").desc()
                        )
                    ),
                )
                .filter(F.col("_order") <= self.num_neighbours)
                .drop("_order")
            )
        self.similarity = pairs_metrics.withColumn(
            "confidence_gain",
            F.when(
                F.col("consequent_rating") - F.col("pair_rating") == 0,
                F.lit(float("inf")),
            ).otherwise(
                F.col("confidence")
                * (F.lit(num_sessions) - F.col("antecedent_rating"))
                / (F.col("consequent_rating") - F.col("pair_rating"))
            ),
        ).select(
            F.col("antecedent").alias("item_idx_one"),
            F.col("consequent").alias("item_idx_two"),
            F.col(self.similarity_metric).alias("similarity"),
            "confidence",
            "lift",
            "confidence_gain",
        )
        self.similarity.cache().count()
        frequent_items.unpersist()

    # NeighbourRec's similarity_metric is a plain attribute here; keep the
    # setter contract (can_change_metric=True) simple.
    @property
    def similarity_metric(self):
        return self._similarity_metric

    @similarity_metric.setter
    def similarity_metric(self, value):
        self._similarity_metric = value
