"""Neighbourhood models: NeighbourRec base + ItemKNN.

ItemKNN is the heaviest operator in the suite: a self-join of the
interaction log on the user key produces O(sum_u h_u^2) item pairs.
Scale mitigations built in (SURVEY §4):

* ``max_history_per_user`` caps each user's history before the
  self-join (a user with 10^5 events would otherwise contribute
  10^10 pairs) — the cap keeps the most recent/highest-rated rows;
* AQE skew-join splitting handles residual hot keys;
* the similarity table is pruned to ``num_neighbours`` per item with
  a deterministic window before caching.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from replay_spark.data.dataset import Dataset
from replay_spark.models.base import BaseRecommender

__all__ = ["NeighbourRec", "ItemKNN"]


class NeighbourRec(BaseRecommender):
    """Base for models that score via an item-item similarity table:
    score(u, j) = sum_{i in hist(u)} sim(i, j).

    Parity: reference ``models/base_neighbour_rec.py:23-115``.
    """

    can_predict_cold_queries = True
    similarity: Optional[DataFrame] = None

    @property
    def _dataframes(self):
        return {"similarity": self.similarity}

    @property
    def _similarity_metric_column(self) -> str:
        """Column of the similarity table summed at predict time.
        AssociationRulesItemRec overrides this with its CURRENT
        ``similarity_metric`` so the metric can be switched after fit
        (reference doctest ``association_rules.py:70-92``)."""
        return "similarity"

    def _predict_pairs_inner(
        self, dataset: Dataset, filter_df: DataFrame, condition, queries: DataFrame
    ) -> DataFrame:
        if dataset is None:
            raise ValueError(
                "interactions are not provided, but they are required for prediction"
            )
        return (
            dataset.interactions.join(queries, how="inner", on=self.query_column)
            .join(
                self.similarity,
                how="inner",
                on=F.col(self.item_column) == F.col("item_idx_one"),
            )
            .join(filter_df, how="inner", on=condition)
            .groupBy(self.query_column, "item_idx_two")
            .agg(
                F.sum(self._similarity_metric_column).alias(self.rating_column)
            )
            .withColumnRenamed("item_idx_two", self.item_column)
        )

    def _predict(
        self,
        dataset: Optional[Dataset],
        k: int,
        queries: DataFrame,
        items: DataFrame,
        filter_seen_items: bool = True,
    ) -> DataFrame:
        return self._predict_pairs_inner(
            dataset=dataset,
            filter_df=items.withColumnRenamed(self.item_column, "item_idx_filter"),
            condition=F.col("item_idx_two") == F.col("item_idx_filter"),
            queries=queries,
        )

    def _predict_pairs(self, pairs: DataFrame, dataset=None) -> DataFrame:
        return self._predict_pairs_inner(
            dataset=dataset,
            filter_df=pairs.withColumnRenamed(
                self.query_column, "query_idx_filter"
            ).withColumnRenamed(self.item_column, "item_idx_filter"),
            condition=(F.col(self.query_column) == F.col("query_idx_filter"))
            & (F.col("item_idx_two") == F.col("item_idx_filter")),
            queries=pairs.select(self.query_column).distinct(),
        ).drop("query_idx_filter", "item_idx_filter")

    def get_nearest_items(
        self, items: DataFrame, k: int, metric: str = "similarity"
    ) -> DataFrame:
        """Top-k neighbours from the similarity table."""
        sim = self.similarity.join(
            items.withColumnRenamed(self.item_column, "item_idx_one"),
            on="item_idx_one",
            how="inner",
        )
        window = Window.partitionBy("item_idx_one").orderBy(
            F.col("similarity").desc(), F.col("item_idx_two").desc()
        )
        return (
            sim.withColumn("rank", F.row_number().over(window))
            .filter(F.col("rank") <= k)
            .drop("rank")
        )


class ItemKNN(NeighbourRec):
    """Item-based KNN with shrunk cosine similarity and optional
    tf-idf / bm25 reweighting.

    Parity: reference ``models/knn.py:15-230``; tie-breaks
    (similarity desc, item_idx_two desc) preserved exactly.
    """

    _search_space = {
        "num_neighbours": {"type": "int", "args": [1, 100]},
        "shrink": {"type": "int", "args": [0, 100]},
        "weighting": {"type": "categorical", "args": [None, "tf_idf", "bm25"]},
    }

    def __init__(
        self,
        num_neighbours: int = 10,
        use_rating: bool = False,
        shrink: float = 0.0,
        weighting: Optional[str] = None,
        max_history_per_user: Optional[int] = None,
        bm25_k1: float = 1.2,
        bm25_b: float = 0.75,
        salt_buckets: Optional[int] = None,
    ):
        # max_history_per_user=None matches the reference (no silent
        # truncation); set it at web scale — a user with 10^5 events
        # creates 10^10 pairs in the similarity self-join otherwise.
        # salt_buckets=S spreads each power-user's pair generation
        # across S tasks instead (exact results, right-side rows
        # replicated S times in the shuffle) — use when truncation is
        # unacceptable but user skew stalls the self-join stage.
        if weighting not in (None, "tf_idf", "bm25"):
            raise ValueError("weighting must be one of [None, 'tf_idf', 'bm25']")
        if salt_buckets is not None and salt_buckets < 2:
            raise ValueError("salt_buckets must be >= 2 (or None to disable)")
        self.num_neighbours = num_neighbours
        self.use_rating = use_rating
        self.shrink = shrink
        self.weighting = weighting
        self.max_history_per_user = max_history_per_user
        self.bm25_k1 = bm25_k1
        self.bm25_b = bm25_b
        self.salt_buckets = salt_buckets

    @property
    def _init_args(self):
        return {
            "num_neighbours": self.num_neighbours,
            "use_rating": self.use_rating,
            "shrink": self.shrink,
            "weighting": self.weighting,
            "max_history_per_user": self.max_history_per_user,
            "bm25_k1": self.bm25_k1,
            "bm25_b": self.bm25_b,
            "salt_buckets": self.salt_buckets,
        }

    def _reweight(self, interactions: DataFrame) -> DataFrame:
        if self.weighting == "bm25":
            item_stats = interactions.groupBy(self.item_column).agg(
                F.count(self.query_column).alias("_n_queries_per_item")
            )
            avgdl = item_stats.agg(F.mean("_n_queries_per_item")).first()[0]
            interactions = (
                interactions.join(item_stats, on=self.item_column, how="inner")
                .withColumn(
                    self.rating_column,
                    F.col(self.rating_column)
                    * (self.bm25_k1 + 1)
                    / (
                        F.col(self.rating_column)
                        + self.bm25_k1
                        * (
                            1
                            - self.bm25_b
                            + self.bm25_b * (F.col("_n_queries_per_item") / avgdl)
                        )
                    ),
                )
                .drop("_n_queries_per_item")
            )
        df_counts = interactions.groupBy(self.query_column).agg(
            F.count(self.item_column).alias("_df")
        )
        n_items = interactions.select(self.item_column).distinct().count()
        if self.weighting == "tf_idf":
            idf = df_counts.withColumn(
                "_idf", F.log1p(F.lit(n_items) / F.col("_df"))
            ).drop("_df")
        else:  # bm25
            idf = df_counts.withColumn(
                "_idf",
                F.log1p((F.lit(n_items) - F.col("_df") + 0.5) / (F.col("_df") + 0.5)),
            ).drop("_df")
        return interactions.join(idf, on=self.query_column, how="inner").withColumn(
            self.rating_column, F.col(self.rating_column) * F.col("_idf")
        ).drop("_idf")

    def _cap_history(self, df: DataFrame) -> DataFrame:
        if self.max_history_per_user is None:
            return df
        window = Window.partitionBy(self.query_column).orderBy(
            F.col(self.rating_column).desc(), F.col(self.item_column).asc()
        )
        return (
            df.withColumn("_hist_rank", F.row_number().over(window))
            .filter(F.col("_hist_rank") <= self.max_history_per_user)
            .drop("_hist_rank")
        )

    def _fit(self, dataset: Dataset) -> None:
        df = dataset.interactions.select(
            self.query_column, self.item_column, self.rating_column
        )
        if not self.use_rating:
            df = df.withColumn(self.rating_column, F.lit(1.0))
        if self.weighting:
            df = self._reweight(df)
        df = self._cap_history(df)

        left = df.withColumnRenamed(self.item_column, "item_idx_one").withColumnRenamed(
            self.rating_column, "_rel_one"
        )
        right = df.withColumnRenamed(self.item_column, "item_idx_two").withColumnRenamed(
            self.rating_column, "_rel_two"
        )
        if self.salt_buckets:
            # skew-salted exact self-join: the left row's bucket is a
            # hash of its item, the right side is replicated to every
            # bucket, and the join key becomes (user, bucket) — each
            # power-user's |I_u|^2 pair generation spreads over
            # salt_buckets tasks while every (a, b) pair still meets
            # exactly once (b is replicated to a's one bucket)
            s = self.salt_buckets
            left = left.withColumn(
                "_salt", F.pmod(F.xxhash64("item_idx_one"), F.lit(s))
            )
            right = right.withColumn(
                "_salt",
                F.explode(F.array(*[F.lit(i).cast("long") for i in range(s)])),
            )
            join_keys = [self.query_column, "_salt"]
        else:
            join_keys = [self.query_column]
        dot_products = (
            left.join(right, how="inner", on=join_keys)
            .filter(F.col("item_idx_one") != F.col("item_idx_two"))
            .groupBy("item_idx_one", "item_idx_two")
            .agg(F.sum(F.col("_rel_one") * F.col("_rel_two")).alias("dot_product"))
        )
        item_norms = (
            df.groupBy(self.item_column)
            .agg(F.sum(F.col(self.rating_column) ** 2).alias("_sq"))
            .select(self.item_column, F.sqrt("_sq").alias("norm"))
        )
        dot_products = dot_products.join(
            item_norms.select(
                F.col(self.item_column).alias("item_idx_one"),
                F.col("norm").alias("norm1"),
            ),
            on="item_idx_one",
        ).join(
            item_norms.select(
                F.col(self.item_column).alias("item_idx_two"),
                F.col("norm").alias("norm2"),
            ),
            on="item_idx_two",
        )
        similarity = dot_products.withColumn(
            "similarity",
            F.col("dot_product") / (F.col("norm1") * F.col("norm2") + self.shrink),
        ).select("item_idx_one", "item_idx_two", "similarity")
        window = Window.partitionBy("item_idx_one").orderBy(
            F.col("similarity").desc(), F.col("item_idx_two").desc()
        )
        self.similarity = (
            similarity.withColumn("_order", F.row_number().over(window))
            .filter(F.col("_order") <= self.num_neighbours)
            .drop("_order")
        )
        self.similarity.cache().count()
