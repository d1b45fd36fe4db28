"""Word2VecRec — items-as-words embedding recommender.

Fit: per-query item sequences (``collect_list(struct(ts, item))`` +
``array_sort``) feed ``pyspark.ml.feature.Word2Vec``; query vector =
idf-weighted mean of its items' vectors; score(u, i) =
dot(query_vec, item_vec) + rank.

Departure from the reference (``models/word2vec.py:22-240``): vectors
are plain ``array<float>`` columns and all vector math is SQL
higher-order functions (``zip_with``/``aggregate``/``posexplode``),
replacing the Scala ``multiplyUDF`` + ``Summarizer.mean`` path —
no custom JVM code, still fully JVM-executed.
"""

from __future__ import annotations

from typing import Optional

from pyspark.ml.feature import Word2Vec
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as st

from replay_spark.data.dataset import Dataset
from replay_spark.models.base import BaseRecommender
from replay_spark.models.item_vector import ItemVectorModel
from replay_spark.utils.spark_utils import vector_dot_expr

__all__ = ["Word2VecRec"]


class Word2VecRec(BaseRecommender, ItemVectorModel):
    """Recommend items closest to the query's history embedding."""

    _search_space = {
        "rank": {"type": "int", "args": [50, 300]},
        "window_size": {"type": "int", "args": [1, 100]},
        "use_idf": {"type": "categorical", "args": [True, False]},
    }

    can_predict_cold_queries = True

    def __init__(
        self,
        rank: int = 100,
        min_count: int = 5,
        step_size: float = 0.025,
        max_iter: int = 1,
        window_size: int = 1,
        use_idf: bool = False,
        seed: Optional[int] = None,
        num_partitions: Optional[int] = None,
    ):
        self.rank = rank
        self.min_count = min_count
        self.step_size = step_size
        self.max_iter = max_iter
        self.window_size = window_size
        self.use_idf = use_idf
        self._seed = seed
        self._num_partitions = num_partitions

    @property
    def _init_args(self):
        return {
            "rank": self.rank,
            "min_count": self.min_count,
            "step_size": self.step_size,
            "max_iter": self.max_iter,
            "window_size": self.window_size,
            "use_idf": self.use_idf,
            "seed": self._seed,
            "num_partitions": self._num_partitions,
        }

    @property
    def _dataframes(self):
        return {"idf": self.idf, "vectors": self.vectors}

    def _fit(self, dataset: Dataset) -> None:
        self.idf = (
            dataset.interactions.groupBy(self.item_column)
            .agg(F.countDistinct(self.query_column).alias("_count"))
            .withColumn(
                "idf",
                F.log(F.lit(self.queries_count) / F.col("_count"))
                if self.use_idf
                else F.lit(1.0),
            )
            .select(self.item_column, "idf")
        )
        self.idf.cache().count()

        sequences = (
            dataset.interactions.groupBy(self.query_column)
            .agg(
                F.collect_list(
                    F.struct(self.timestamp_column, self.item_column)
                ).alias("_ts_item")
            )
            .withColumn("_ts_item", F.array_sort("_ts_item"))
            .withColumn(
                "items",
                F.col(f"_ts_item.{self.item_column}").cast(
                    st.ArrayType(st.StringType())
                ),
            )
            .drop("_ts_item")
        )
        if self._num_partitions is None:
            self._num_partitions = sequences.rdd.getNumPartitions()
        w2v = Word2Vec(
            vectorSize=self.rank,
            minCount=self.min_count,
            numPartitions=self._num_partitions,
            stepSize=self.step_size,
            maxIter=self.max_iter,
            inputCol="items",
            outputCol="_w2v",
            windowSize=self.window_size,
            seed=self._seed,
        )
        self.vectors = (
            w2v.fit(sequences)
            .getVectors()
            .select(
                F.col("word").cast("long").alias("item"),
                vector_to_array("vector").alias("vector"),
            )
        )
        self.vectors.cache().count()

    def _get_query_vectors(
        self, queries: DataFrame, interactions: DataFrame
    ) -> DataFrame:
        """query_vector = mean over history of idf * item_vector.

        Element-wise mean via posexplode + groupBy(query, pos) —
        pure JVM aggregation.
        """
        hist = (
            interactions.join(queries, on=self.query_column, how="inner")
            .join(self.idf, on=self.item_column, how="inner")
            .join(
                F.broadcast(self.vectors),
                on=F.col(self.item_column) == F.col("item"),
                how="inner",
            )
            .drop("item")
        )
        weighted = hist.select(
            self.query_column,
            F.posexplode(
                F.transform("vector", lambda x: x * F.col("idf"))
            ).alias("_pos", "_val"),
        )
        return (
            weighted.groupBy(self.query_column, "_pos")
            .agg(F.avg("_val").alias("_mean"))
            .groupBy(self.query_column)
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_mean"))
                )["_mean"].alias("query_vector")
            )
        )

    def _predict_pairs_inner(self, pairs: DataFrame, dataset: Dataset) -> DataFrame:
        if dataset is None:
            raise ValueError(
                f"{type(self).__name__} predict requires interactions"
            )
        query_vectors = self._get_query_vectors(
            pairs.select(self.query_column).distinct(), dataset.interactions
        )
        with_vec = pairs.join(query_vectors, on=self.query_column, how="inner").join(
            F.broadcast(self.vectors),
            on=F.col(self.item_column) == F.col("item"),
            how="inner",
        ).drop("item")
        return with_vec.select(
            self.query_column,
            self.item_column,
            (
                vector_dot_expr(F.col("vector"), F.col("query_vector"))
                + F.lit(self.rank)
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
        return self._predict_pairs_inner(queries.crossJoin(items), dataset)

    def _predict_pairs(self, pairs: DataFrame, dataset=None) -> DataFrame:
        return self._predict_pairs_inner(pairs, dataset)

    def _get_item_vectors(self):
        return self.vectors.withColumnRenamed("vector", "item_vector").withColumnRenamed(
            "item", self.item_column
        )
