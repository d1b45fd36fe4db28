"""History-based feature processors.

Parity: reference ``replay/preprocessing/history_based_fp.py``:
per-user and per-item aggregates over the interaction log (log
counts, activity-day counts, timestamp spans, rating moments and
approximate quantiles, HAL-01254172 abnormality), conditional
popularity, and a pipeline combining them. One ``groupBy`` per
entity — single shuffle each.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from replay_spark.utils.spark_utils import is_timestamp_like

__all__ = [
    "LogStatFeaturesProcessor",
    "ConditionalPopularityProcessor",
    "HistoryBasedFeaturesProcessor",
]


class LogStatFeaturesProcessor:
    """Per-user/per-item statistics of the interaction log."""

    def __init__(
        self,
        query_column: str = "query_id",
        item_column: str = "item_id",
        timestamp_column: str = "timestamp",
        rating_column: str = "rating",
    ):
        self.query_column = query_column
        self.item_column = item_column
        self.timestamp_column = timestamp_column
        self.rating_column = rating_column
        self.user_log_features: Optional[DataFrame] = None
        self.item_log_features: Optional[DataFrame] = None
        self.calc_timestamp_based = False
        self.calc_relevance_based = False

    def _aggregates(self, prefix: str) -> list:
        aggs = [
            F.log(F.count(F.col(self.rating_column))).alias(
                f"{prefix}_log_num_interact"
            )
        ]
        if self.calc_timestamp_based:
            aggs.extend(
                [
                    F.log(
                        F.countDistinct(
                            F.date_trunc("dd", F.col(self.timestamp_column))
                        )
                    ).alias(f"{prefix}_log_interact_days_count"),
                    F.min(self.timestamp_column).alias(
                        f"{prefix}_min_interact_date"
                    ),
                    F.max(self.timestamp_column).alias(
                        f"{prefix}_max_interact_date"
                    ),
                ]
            )
        if self.calc_relevance_based:
            std = F.stddev(F.col(self.rating_column))
            aggs.extend(
                [
                    F.when(std.isNull() | F.isnan(std), 0)
                    .otherwise(std)
                    .alias(f"{prefix}_std"),
                    F.mean(self.rating_column).alias(f"{prefix}_mean"),
                ]
            )
            aggs.extend(
                F.expr(
                    f"percentile_approx({self.rating_column}, {p})"
                ).alias(f"{prefix}_quantile_{str(p)[2:]}")
                for p in (0.05, 0.5, 0.95)
            )
        return aggs

    def _add_ts_based(self, features: DataFrame, max_date, prefix: str) -> DataFrame:
        return features.withColumn(
            f"{prefix}_history_length_days",
            F.datediff(
                F.col(f"{prefix}_max_interact_date"),
                F.col(f"{prefix}_min_interact_date"),
            ),
        ).withColumn(
            f"{prefix}_last_interaction_gap_days",
            F.datediff(F.lit(max_date), F.col(f"{prefix}_max_interact_date")),
        )

    def _abnormality(self, log: DataFrame, item_features: DataFrame) -> DataFrame:
        """Mean |rating − item mean| per user, plus the controversy-
        weighted AbnormalityCR (HAL-01254172)."""
        enriched = log.join(
            item_features.select(self.item_column, "i_mean", "i_std"),
            on=self.item_column,
            how="left",
        ).withColumn(
            "abnormality", F.abs(F.col(self.rating_column) - F.col("i_mean"))
        )
        aggs = [F.mean("abnormality").alias("abnormality")]
        bounds = item_features.agg(
            F.max("i_std").alias("mx"), F.min("i_std").alias("mn")
        ).first()
        if bounds["mx"] is not None and bounds["mx"] - bounds["mn"] != 0:
            enriched = enriched.withColumn(
                "_controversy",
                1
                - (F.col("i_std") - F.lit(bounds["mn"]))
                / F.lit(bounds["mx"] - bounds["mn"]),
            ).withColumn(
                "abnormalityCR",
                (F.col("abnormality") * F.col("_controversy")) ** 2,
            )
            aggs.append(F.mean("abnormalityCR").alias("abnormalityCR"))
        return enriched.groupBy(self.query_column).agg(*aggs)

    def fit(self, log: DataFrame) -> "LogStatFeaturesProcessor":
        self.calc_timestamp_based = self.timestamp_column in log.columns and (
            is_timestamp_like(dict(log.dtypes).get(self.timestamp_column, ""))
        )
        self.calc_relevance_based = self.rating_column in log.columns

        self.user_log_features = log.groupBy(self.query_column).agg(
            *self._aggregates("u")
        )
        self.item_log_features = log.groupBy(self.item_column).agg(
            *self._aggregates("i")
        )
        if self.calc_timestamp_based:
            max_date = log.agg(F.max(self.timestamp_column)).first()[0]
            self.user_log_features = self._add_ts_based(
                self.user_log_features, max_date, "u"
            )
            self.item_log_features = self._add_ts_based(
                self.item_log_features, max_date, "i"
            )
        if self.calc_relevance_based:
            abnormality = self._abnormality(log, self.item_log_features)
            self.user_log_features = self.user_log_features.join(
                abnormality, on=self.query_column, how="left"
            )
        # cross stats: mean partner log-activity
        self.user_log_features = self.user_log_features.join(
            log.join(
                self.item_log_features.select(
                    self.item_column, "i_log_num_interact"
                ),
                on=self.item_column,
            )
            .groupBy(self.query_column)
            .agg(
                F.mean("i_log_num_interact").alias("u_mean_i_log_num_interact")
            ),
            on=self.query_column,
            how="left",
        )
        self.item_log_features = self.item_log_features.join(
            log.join(
                self.user_log_features.select(
                    self.query_column, "u_log_num_interact"
                ),
                on=self.query_column,
            )
            .groupBy(self.item_column)
            .agg(
                F.mean("u_log_num_interact").alias("i_mean_u_log_num_interact")
            ),
            on=self.item_column,
            how="left",
        )
        self.user_log_features.cache().count()
        self.item_log_features.cache().count()
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        """Join the computed per-user and per-item features onto df."""
        out = df
        if self.user_log_features is not None and self.query_column in df.columns:
            out = out.join(self.user_log_features, on=self.query_column, how="left")
        if self.item_log_features is not None and self.item_column in df.columns:
            out = out.join(self.item_log_features, on=self.item_column, how="left")
        return out


class ConditionalPopularityProcessor:
    """Entity popularity conditioned on a categorical feature
    (reference ``history_based_fp.py:284-377``)."""

    def __init__(
        self,
        cat_features_list: list,
        query_column: str = "query_id",
        item_column: str = "item_id",
    ):
        self.cat_features_list = cat_features_list
        self.query_column = query_column
        self.item_column = item_column
        self.conditional_pop_dict: Optional[dict] = None
        self.entity_column: Optional[str] = None

    def fit(self, log: DataFrame, features: DataFrame) -> "ConditionalPopularityProcessor":
        """``features`` belongs to ONE side (keyed by query or item);
        the popularity of the OTHER side (the entity) is computed
        conditional on each categorical feature — e.g. item
        popularity among users of the same age group (reference
        ``history_based_fp.py:321-345``)."""
        missing = set(self.cat_features_list) - set(features.columns)
        if missing:
            raise ValueError(
                f"cat_features_list columns {sorted(missing)} absent in features"
            )
        if self.item_column in features.columns:
            join_column, self.entity_column = self.item_column, self.query_column
        else:
            join_column, self.entity_column = self.query_column, self.item_column
        self.conditional_pop_dict = {}
        enriched = log.join(features, on=join_column, how="left")
        total = enriched.groupBy(self.entity_column).agg(
            F.count(join_column).alias("_total")
        )
        for cat_col in self.cat_features_list:
            col_name = f"{self.entity_column[:1]}_pop_by_{cat_col}"
            intersection = enriched.groupBy(self.entity_column, cat_col).agg(
                F.count(join_column).alias("_cnt")
            )
            self.conditional_pop_dict[cat_col] = (
                intersection.join(F.broadcast(total), on=self.entity_column)
                .withColumn(col_name, F.col("_cnt") / F.col("_total"))
                .drop("_cnt", "_total")
            )
            self.conditional_pop_dict[cat_col].cache().count()
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        out = df
        for cat_col, pop in self.conditional_pop_dict.items():
            col_name = f"{self.entity_column[:1]}_pop_by_{cat_col}"
            out = out.join(pop, on=[self.entity_column, cat_col], how="left")
            # reference keeps an explicit was-missing flag before the fill
            out = out.withColumn(
                f"na_{col_name}", F.col(col_name).isNull()
            ).fillna(0, subset=[col_name])
        return out


class HistoryBasedFeaturesProcessor:
    """Pipeline: log-stat features + conditional popularities
    (reference ``history_based_fp.py:381-459``)."""

    def __init__(
        self,
        use_log_features: bool = True,
        use_conditional_popularity: bool = True,
        query_cat_features_list: Optional[list] = None,
        item_cat_features_list: Optional[list] = None,
        query_column: str = "query_id",
        item_column: str = "item_id",
    ):
        self.use_log_features = use_log_features
        self.use_conditional_popularity = use_conditional_popularity
        self.log_processor = (
            LogStatFeaturesProcessor(query_column=query_column, item_column=item_column)
            if use_log_features
            else None
        )
        self.query_cond = (
            ConditionalPopularityProcessor(
                query_cat_features_list, query_column, item_column
            )
            if use_conditional_popularity and query_cat_features_list
            else None
        )
        self.item_cond = (
            ConditionalPopularityProcessor(
                item_cat_features_list, query_column, item_column
            )
            if use_conditional_popularity and item_cat_features_list
            else None
        )
        self.fitted = False

    def fit(
        self,
        log: DataFrame,
        query_features: Optional[DataFrame] = None,
        item_features: Optional[DataFrame] = None,
    ) -> "HistoryBasedFeaturesProcessor":
        if self.log_processor is not None:
            self.log_processor.fit(log)
        if self.query_cond is not None and query_features is not None:
            self.query_cond.fit(log, query_features)
        if self.item_cond is not None and item_features is not None:
            self.item_cond.fit(log, item_features)
        self.fitted = True
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.fitted:
            raise RuntimeError("HistoryBasedFeaturesProcessor is not fitted")
        out = df
        if self.log_processor is not None:
            out = self.log_processor.transform(out)
        if self.query_cond is not None and self.query_cond.conditional_pop_dict:
            out = self.query_cond.transform(out)
        if self.item_cond is not None and self.item_cond.conditional_pop_dict:
            out = self.item_cond.transform(out)
        return out
