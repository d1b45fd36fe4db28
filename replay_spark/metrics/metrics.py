"""Offline metric implementations.

Each kernel is a pure Spark SQL expression over the per-user arrays
(``pred_item_id``, ``ground_truth``), numerically identical to the
reference Python kernels (files cited per class). ``aggregate`` /
``zip_with`` / ``sequence`` keep everything inside whole-stage
codegen.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from replay_spark.metrics.base_metric import Metric
from replay_spark.metrics.descriptors import CalculationDescriptor, Mean

__all__ = [
    "HitRate",
    "Precision",
    "Recall",
    "MAP",
    "MRR",
    "NDCG",
    "RocAuc",
    "Novelty",
    "Surprisal",
    "Coverage",
    "Unexpectedness",
    "CategoricalDiversity",
]


class HitRate(Metric):
    """1 if any top-k item is in ground truth (``hitrate.py:63``)."""

    def _per_user_value(self, k: int) -> Column:
        return self._guard(
            F.expr(f"double(array_max({self._hits(k)}))")
        )


class Precision(Metric):
    """|hits@k| / k (``precision.py:62``)."""

    def _per_user_value(self, k: int) -> Column:
        return self._guard(
            F.expr(
                f"aggregate({self._hits(k)}, 0, (a, x) -> a + x) / double({k})"
            )
        )


class Recall(Metric):
    """|hits@k| / |ground truth| (``recall.py:66``)."""

    def _per_user_value(self, k: int) -> Column:
        return self._guard(
            F.expr(
                f"aggregate({self._hits(k)}, 0, (a, x) -> a + x)"
                f" / double(size(ground_truth))"
            )
        )


class MRR(Metric):
    """1 / rank of the first hit within top-k (``mrr.py:56``)."""

    def _per_user_value(self, k: int) -> Column:
        first_hit_pos = (
            f"get(filter(zip_with({self._hits(k)}, "
            f"sequence(1, size({self._hits(k)})), "
            f"(h, i) -> if(h = 1, i, null)), x -> x is not null), 0)"
        )
        return self._guard(
            F.expr(f"coalesce(1.0 / {first_hit_pos}, 0.0)")
        )


class MAP(Metric):
    """Mean average precision (``map.py:64``):
    sum over hit positions i of (cum_hits_i / i), / min(k, |gt|)."""

    def _per_user_value(self, k: int) -> Column:
        hits = self._hits(k)
        ap = (
            f"aggregate(zip_with({hits}, sequence(1, size({hits})), "
            f"(h, i) -> named_struct('h', h, 'i', i)), "
            f"named_struct('tp', 0, 's', 0.0d), "
            f"(acc, x) -> named_struct("
            f"'tp', acc.tp + x.h, "
            f"'s', acc.s + if(x.h = 1, double(acc.tp + x.h) / x.i, 0.0d)), "
            f"acc -> acc.s)"
        )
        return self._guard(
            F.expr(f"{ap} / least({k}, size(ground_truth))")
        )


class NDCG(Metric):
    """DCG/IDCG with log2 discounts (``ndcg.py:82``)."""

    def _per_user_value(self, k: int) -> Column:
        hits = self._hits(k)
        dcg = (
            f"aggregate(zip_with({hits}, sequence(1, size({hits})), "
            f"(h, i) -> h / log(2, i + 1)), 0.0d, (a, x) -> a + x)"
        )
        idcg = (
            f"aggregate(sequence(1, least({k}, size(ground_truth))), 0.0d, "
            f"(a, i) -> a + 1.0 / log(2, i + 1))"
        )
        return self._guard(F.expr(f"{dcg} / {idcg}"))


class RocAuc(Metric):
    """Fraction of correctly ordered (pos, neg) pairs in top-k
    (``rocauc.py:75``)."""

    def _per_user_value(self, k: int) -> Column:
        hits = self._hits(k)
        acc = (
            f"aggregate({hits}, named_struct('fp_cur', 0, 'fp_cum', 0), "
            f"(a, h) -> named_struct("
            f"'fp_cur', a.fp_cur + (1 - h), "
            f"'fp_cum', a.fp_cum + if(h = 1, a.fp_cur, 0)))"
        )
        n = f"size({hits})"
        return self._guard(
            F.expr(
                f"case when {acc}.fp_cur = {n} then 0.0d "
                f"when {acc}.fp_cum = 0 then 1.0d "
                f"else 1.0d - double({acc}.fp_cum) / "
                f"({acc}.fp_cur * ({n} - {acc}.fp_cur)) end"
            )
        )


class Novelty(Metric):
    """Fraction of top-k not seen in train (``novelty.py:82-142``).

    Call signature: ``Novelty(k)(recommendations, train)``.
    """

    def _get_enriched_recommendations(
        self, recommendations: DataFrame, train: DataFrame
    ) -> DataFrame:
        seen = train.groupBy(self.query_column).agg(
            F.collect_set(self.item_column).alias("ground_truth")
        )
        pred = self._get_items_list_per_user(recommendations)
        return pred.join(seen, on=self.query_column, how="left")

    def _per_user_value(self, k: int) -> Column:
        sliced = self._sliced(k)
        overlap = (
            f"size(array_intersect({sliced}, ground_truth)) / "
            f"double(size({sliced}))"
        )
        return F.when(
            F.col("ground_truth").isNull()
            | (F.size("ground_truth") == 0)
            | F.col("pred_item_id").isNull()
            | (F.size("pred_item_id") == 0),
            F.lit(1.0),
        ).otherwise(F.expr(f"1.0 - {overlap}"))


class Surprisal(Metric):
    """Mean self-information of top-k items
    (``surprisal.py:84-189``): weight(i) = log2(N/users_i)/log2(N)
    from train; unseen items weigh 1.
    """

    def _get_enriched_recommendations(
        self, recommendations: DataFrame, train: DataFrame
    ) -> DataFrame:
        n_users = train.select(self.query_column).distinct().count()
        weights = train.groupBy(self.item_column).agg(
            (
                F.log2(
                    F.lit(n_users) / F.countDistinct(self.query_column)
                )
                / F.log2(F.lit(float(n_users)))
            ).alias("weight")
        )
        recs = recommendations.join(
            weights, on=self.item_column, how="left"
        ).fillna(1.0, subset=["weight"])
        return self._get_items_list_per_user(recs, extra_column="weight")

    def _per_user_value(self, k: int) -> Column:
        return F.when(
            F.col("pred_item_id").isNull() | (F.size("pred_item_id") == 0),
            F.lit(0.0),
        ).otherwise(
            F.expr(
                f"aggregate(slice(weight, 1, {k}), 0.0d, (a, x) -> a + x)"
                f" / double({k})"
            )
        )


class Coverage(Metric):
    """Distinct items recommended in top-k ÷ distinct train items
    (``coverage.py:17-139``). Pure DataFrame op, Mean-only.
    """

    def __init__(
        self,
        topk: Union[int, list[int]],
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        allow_caching: bool = True,
        approximate_rsd: Optional[float] = None,
    ):
        # approximate_rsd: opt into HyperLogLog++ distinct counts —
        # exact distinct over 10^9+ items shuffles every key, while
        # the sketch merges map-side; coverage is a ratio of two
        # cardinalities, so an rsd of 0.01 moves it by ~1% worst case
        super().__init__(topk, query_column, item_column, rating_column, Mean())
        self.allow_caching = allow_caching
        self.approximate_rsd = approximate_rsd

    def __call__(self, recommendations: DataFrame, train: DataFrame) -> dict:
        item_ranks = recommendations.withColumn(
            "_rank",
            F.row_number().over(
                Window.partitionBy(self.query_column).orderBy(
                    F.col(self.rating_column).desc(),
                    F.col(self.item_column).desc(),
                )
            ),
        )
        if self.allow_caching:
            item_ranks = item_ranks.cache()
        if self.approximate_rsd is not None:
            def n_distinct(df):
                return df.agg(
                    F.approx_count_distinct(
                        self.item_column, rsd=self.approximate_rsd
                    )
                ).first()[0]
        else:
            def n_distinct(df):
                return df.select(self.item_column).distinct().count()

        n_train_items = n_distinct(train)
        results = {}
        for k in self.topk:
            n_rec_items = n_distinct(item_ranks.filter(F.col("_rank") <= k))
            results[f"{self.__name__}@{k}"] = n_rec_items / n_train_items
        if self.allow_caching:
            item_ranks.unpersist()
        return results


class Unexpectedness(Metric):
    """1 − overlap(top-k, baseline top-k)/k (``unexpectedness.py:153``).

    Call: ``Unexpectedness(k)(recommendations, base_recommendations)``.
    """

    def _get_enriched_recommendations(
        self, recommendations: DataFrame, base_recommendations: DataFrame
    ) -> DataFrame:
        pred = self._get_items_list_per_user(recommendations)
        base = self._get_items_list_per_user(
            base_recommendations
        ).withColumnRenamed("pred_item_id", "base_pred")
        return pred.join(base, on=self.query_column, how="left")

    def _per_user_value(self, k: int) -> Column:
        return F.when(
            F.col("base_pred").isNull()
            | (F.size("base_pred") == 0)
            | F.col("pred_item_id").isNull()
            | (F.size("pred_item_id") == 0),
            F.lit(0.0),
        ).otherwise(
            F.expr(
                f"1.0 - size(array_intersect(slice(pred_item_id, 1, {k}), "
                f"slice(base_pred, 1, {k}))) / double({k})"
            )
        )


class CategoricalDiversity(Metric):
    """Distinct categories in top-k / k (``categorical_diversity.py``).

    Recommendations carry a category column:
    ``[query_id, category_id, rating]``.
    """

    def __init__(
        self,
        topk: Union[int, list[int]],
        query_column: str = "query_id",
        category_column: str = "category_id",
        rating_column: str = "rating",
        mode: Optional[CalculationDescriptor] = None,
    ):
        super().__init__(topk, query_column, category_column, rating_column, mode)

    def __call__(self, recommendations: DataFrame) -> dict:
        enriched = self._get_items_list_per_user(recommendations)
        results = {}
        for k in self.topk:
            per_user = enriched.select(
                F.expr(
                    f"size(array_distinct(slice(pred_item_id, 1, {k})))"
                    f" / double({k})"
                ).alias("value"),
                self.query_column,
            )
            results[k] = self._mode.spark(per_user)
        return self._aggregate_results(results)
