"""Item-vector nearest-neighbour mixin.

Parity: reference ``base_rec.py:740-792`` — self-join of the item
vector table with a distance expression; metrics: cosine similarity,
inverse euclidean similarity, dot product. Vector math is
higher-order SQL (JVM), not the reference's Python UDFs
(``spark_utils.py:624-651``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from replay_spark.utils.spark_utils import (
    cosine_similarity_expr,
    vector_dot_expr,
    vector_euclidean_similarity_expr,
)

__all__ = ["ItemVectorModel"]

_METRICS = ("cosine_similarity", "euclidean_distance_sim", "dot_product")


class ItemVectorModel:
    """Mixin for models exposing ``_get_item_vectors() ->
    DataFrame[item_id, item_vector]`` (Word2VecRec, ALSWrap)."""

    item_column: str = "item_id"

    def get_nearest_items(
        self,
        items: DataFrame,
        k: int,
        metric: str = "cosine_similarity",
        candidates: DataFrame = None,
    ) -> DataFrame:
        """Top-k neighbours for each item in ``items``."""
        if metric not in _METRICS:
            raise ValueError(f"metric must be one of {_METRICS}")
        vectors = self._get_item_vectors()
        left = vectors.select(
            F.col(self.item_column).alias("item_idx_one"),
            F.col("item_vector").alias("vec_one"),
        ).join(
            items.select(F.col(self.item_column).alias("item_idx_one")),
            on="item_idx_one",
            how="left_semi",
        )
        right = vectors.select(
            F.col(self.item_column).alias("item_idx_two"),
            F.col("item_vector").alias("vec_two"),
        )
        if candidates is not None:
            right = right.join(
                candidates.select(F.col(self.item_column).alias("item_idx_two")),
                on="item_idx_two",
                how="left_semi",
            )
        if metric == "cosine_similarity":
            sim = cosine_similarity_expr(F.col("vec_one"), F.col("vec_two"))
        elif metric == "euclidean_distance_sim":
            sim = vector_euclidean_similarity_expr(F.col("vec_one"), F.col("vec_two"))
        else:
            sim = vector_dot_expr(F.col("vec_one"), F.col("vec_two"))
        pairs = (
            left.crossJoin(F.broadcast(right))
            .filter(F.col("item_idx_one") != F.col("item_idx_two"))
            .select("item_idx_one", "item_idx_two", sim.alias(metric))
        )
        window = Window.partitionBy("item_idx_one").orderBy(
            F.col(metric).desc(), F.col("item_idx_two").desc()
        )
        return (
            pairs.withColumn("_rank", F.row_number().over(window))
            .filter(F.col("_rank") <= k)
            .drop("_rank")
        )
