"""MLlib-backed models: ALSWrap, ClusterRec.

Both delegate the numeric heavy lifting to Spark MLlib (JVM-side,
block-partitioned) and keep our base-class predict conventions.
"""

from __future__ import annotations

from os.path import join
from typing import Optional

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.recommendation import ALS, ALSModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from replay_spark.data.dataset import Dataset
from replay_spark.models.base import BaseRecommender
from replay_spark.models.item_vector import ItemVectorModel

__all__ = ["ALSWrap", "ClusterRec"]


class ALSWrap(BaseRecommender, ItemVectorModel):
    """Wrapper over ``pyspark.ml.recommendation.ALS`` (implicit by
    default). Parity: reference ``models/als.py:16-166``.
    """

    _search_space = {
        "rank": {"type": "loguniform_int", "args": [8, 256]},
    }

    can_predict_cold_queries = False
    can_predict_cold_items = False

    def __init__(
        self,
        rank: int = 10,
        implicit_prefs: bool = True,
        seed: Optional[int] = None,
        num_item_blocks: Optional[int] = None,
        num_query_blocks: Optional[int] = None,
    ):
        self.rank = rank
        self.implicit_prefs = implicit_prefs
        self._seed = seed
        self._num_item_blocks = num_item_blocks
        self._num_query_blocks = num_query_blocks

    @property
    def _init_args(self):
        return {
            "rank": self.rank,
            "implicit_prefs": self.implicit_prefs,
            "seed": self._seed,
            "num_item_blocks": self._num_item_blocks,
            "num_query_blocks": self._num_query_blocks,
        }

    def _fit(self, dataset: Dataset) -> None:
        if self._num_item_blocks is None or self._num_query_blocks is None:
            # block count drives ALS's per-iteration shuffle: each of
            # ~10 iterations exchanges factor messages between every
            # user/item block pair, so blocks >> data just multiplies
            # scheduling + message overhead (measured 2x fit time at
            # ml1m scale when blocks followed the input's partition
            # count). Size blocks by RATINGS (~1M per block, floor
            # 10 = MLlib's own default), capped at the cluster's
            # parallelism so a 100 TB corpus still fans out fully.
            nnz = dataset.interaction_count
            par = dataset.interactions.sparkSession.sparkContext.defaultParallelism
            blocks = max(1, min(max(10, nnz // 1_000_000), par))
            if self._num_item_blocks is None:
                self._num_item_blocks = blocks
            if self._num_query_blocks is None:
                self._num_query_blocks = blocks
        self.model = ALS(
            rank=self.rank,
            numItemBlocks=self._num_item_blocks,
            numUserBlocks=self._num_query_blocks,
            userCol=self.query_column,
            itemCol=self.item_column,
            ratingCol=self.rating_column,
            implicitPrefs=self.implicit_prefs,
            seed=self._seed,
            coldStartStrategy="drop",
        ).fit(dataset.interactions)
        self.model.itemFactors.cache()
        self.model.userFactors.cache()
        self.model.itemFactors.count()

    def _predict(
        self,
        dataset: Optional[Dataset],
        k: int,
        queries: DataFrame,
        items: DataFrame,
        filter_seen_items: bool = True,
    ) -> DataFrame:
        # Fast path: all fit items are candidates → use MLlib's blocked
        # recommendForUserSubset (reference als.py:99-131)
        if (items.count() == self.fit_items.count()) and (
            items.join(self.fit_items, on=self.item_column, how="inner").count()
            == self.fit_items.count()
        ):
            max_seen = 0
            if filter_seen_items and dataset is not None:
                row = (
                    dataset.interactions.join(queries, on=self.query_column)
                    .groupBy(self.query_column)
                    .agg(F.count(self.query_column).alias("num_seen"))
                    .agg(F.max("num_seen"))
                    .first()
                )
                max_seen = row[0] if row and row[0] is not None else 0
            recs = self.model.recommendForUserSubset(queries, k + max_seen)
            return (
                recs.withColumn("recommendations", F.explode("recommendations"))
                .withColumn(
                    self.item_column, F.col(f"recommendations.{self.item_column}")
                )
                .withColumn(
                    self.rating_column,
                    F.col("recommendations.rating").cast(DoubleType()),
                )
                .select(self.query_column, self.item_column, self.rating_column)
            )
        return self._predict_pairs(pairs=queries.crossJoin(items), dataset=dataset)

    def _predict_pairs(self, pairs: DataFrame, dataset=None) -> DataFrame:
        return (
            self.model.transform(pairs)
            .withColumn(self.rating_column, F.col("prediction").cast(DoubleType()))
            .drop("prediction")
        )

    def get_features(self, ids: DataFrame) -> tuple[DataFrame, int]:
        """Return ALS embeddings for query or item ids."""
        entity = ids.columns[0]
        factors = (
            self.model.userFactors
            if entity == self.query_column
            else self.model.itemFactors
        )
        return (
            ids.join(
                factors.withColumnRenamed("id", entity).withColumnRenamed(
                    "features", f"{entity}_factors"
                ),
                on=entity,
                how="left",
            ),
            self.rank,
        )

    def _get_item_vectors(self):
        return self.model.itemFactors.select(
            F.col("id").alias(self.item_column),
            F.col("features").alias("item_vector"),
        )

    def save(self, path: str) -> None:
        super().save(path)
        self.model.write().overwrite().save(join(path, "als_model"))

    def _load_from(self, path: str, spark) -> None:
        super()._load_from(path, spark)
        self.model = ALSModel.load(join(path, "als_model"))


class ClusterRec(BaseRecommender):
    """KMeans clusters on query features; recommend the cluster's
    item frequencies normalized by the cluster max.

    Parity: reference ``models/cluster.py:14-140``.
    """

    _search_space = {
        "num_clusters": {"type": "int", "args": [2, 20]},
    }

    can_predict_cold_queries = True

    def __init__(self, num_clusters: int = 10):
        self.num_clusters = num_clusters

    @property
    def _init_args(self):
        return {"num_clusters": self.num_clusters}

    @property
    def _dataframes(self):
        return {"item_rel_in_cluster": self.item_rel_in_cluster}

    def _transform_features(self, query_features: DataFrame) -> DataFrame:
        feature_columns = [
            c for c in query_features.columns if c != self.query_column
        ]
        vec = VectorAssembler(inputCols=feature_columns, outputCol="features")
        return vec.transform(query_features).select(self.query_column, "features")

    def _fit(self, dataset: Dataset) -> None:
        kmeans = KMeans().setK(self.num_clusters).setFeaturesCol("features")
        features = self._transform_features(dataset.query_features)
        self.model = kmeans.fit(features)
        clusters = (
            self.model.transform(features)
            .select(self.query_column, "prediction")
            .withColumnRenamed("prediction", "cluster")
        )
        interactions = dataset.interactions.join(
            clusters, on=self.query_column, how="left"
        )
        rel = interactions.groupBy("cluster", self.item_column).agg(
            F.count(self.item_column).alias("_item_count")
        )
        max_per_cluster = rel.groupBy("cluster").agg(
            F.max("_item_count").alias("_max_in_cluster")
        )
        self.item_rel_in_cluster = (
            rel.join(max_per_cluster, on="cluster")
            .withColumn(
                self.rating_column, F.col("_item_count") / F.col("_max_in_cluster")
            )
            .drop("_item_count", "_max_in_cluster")
        )
        self.item_rel_in_cluster.cache().count()

    def _make_query_clusters(self, queries: DataFrame, query_features: DataFrame):
        features = self._transform_features(
            query_features.join(queries, on=self.query_column)
        )
        return (
            self.model.transform(features)
            .select(self.query_column, "prediction")
            .withColumnRenamed("prediction", "cluster")
        )

    def _predict(
        self,
        dataset: Dataset,
        k: int,
        queries: DataFrame,
        items: DataFrame,
        filter_seen_items: bool = True,
    ) -> DataFrame:
        query_clusters = self._make_query_clusters(queries, dataset.query_features)
        filtered_items = self.item_rel_in_cluster.join(items, on=self.item_column)
        return query_clusters.join(filtered_items, on="cluster").drop("cluster")

    def _predict_pairs(self, pairs: DataFrame, dataset=None) -> DataFrame:
        if dataset is None or dataset.query_features is None:
            raise ValueError("ClusterRec.predict_pairs requires query features")
        query_clusters = self._make_query_clusters(
            pairs.select(self.query_column).distinct(), dataset.query_features
        )
        return (
            pairs.join(query_clusters, on=self.query_column, how="inner")
            .join(
                self.item_rel_in_cluster,
                on=["cluster", self.item_column],
                how="left",
            )
            .fillna(0, subset=[self.rating_column])
            .drop("cluster")
        )

    def save(self, path: str) -> None:
        super().save(path)
        self.model.write().overwrite().save(join(path, "kmeans_model"))

    def _load_from(self, path: str, spark) -> None:
        super()._load_from(path, spark)
        self.model = KMeansModel.load(join(path, "kmeans_model"))
