"""First-order Markov next-item recommender.

The classic sequential baseline (Rendle et al. 2010 describe it as
the "MC" half of FPMC; it is also the standard sanity bar for
session-based recommenders): fit estimates the item-to-item
transition matrix from each user's time-ordered interaction
sequence, and predict scores item ``i`` for user ``u`` as
``P(next = i | last_item(u))``.

Spark-first shape:

* **fit** — ONE keyed window (``lead`` over each user's
  ``(timestamp, item)``-ordered sequence — the deterministic
  ordering; same-instant items order by id) emits consecutive pairs,
  one aggregation counts them, and the per-prev totals come from a
  second tiny aggregation over the count table (O(item²) upper
  bound, O(observed transitions) in practice). Ratings are exact
  ``cnt / total`` divisions of BIGINTs — cross-engine identical.
* **predict** — each query's LAST item (``max_by`` over the same
  ordering) joins the transition table once; the base machinery
  does seen-filtering and deterministic top-k. When a predict-time
  dataset is given its interactions define "last item" (the session
  the user is in NOW); otherwise the fit log's last items are used.

Beyond-reference model (the reference's sequential tier is the
torch NN subsystem, a documented non-goal; this is the classical
counts-based baseline of that family, fully SQL-replayable — gate
``q_markov_rec``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from replay_spark.data.dataset import Dataset
from replay_spark.models.base import BaseRecommender

__all__ = ["MarkovRec"]


class MarkovRec(BaseRecommender):
    @property
    def _dataframes(self):
        return {
            "transitions": getattr(self, "transitions", None),
            "fit_last_items": getattr(self, "fit_last_items", None),
        }

    @property
    def _init_args(self):
        return {}

    def _sequence_window(self):
        return Window.partitionBy(self.query_column).orderBy(
            F.col(self.timestamp_column).asc(),
            F.col(self.item_column).asc(),
        )

    def _last_items(self, interactions: DataFrame) -> DataFrame:
        """One row per query: its latest item (ties on the instant
        break by item id — the same total order fit used)."""
        return interactions.groupBy(self.query_column).agg(
            F.max_by(
                self.item_column,
                F.struct(
                    F.col(self.timestamp_column), F.col(self.item_column)
                ),
            ).alias("_prev")
        )

    def _fit(self, dataset: Dataset) -> None:
        inter = dataset.interactions
        seq = inter.select(
            self.query_column, self.item_column, self.timestamp_column
        ).withColumn(
            "_next", F.lead(self.item_column).over(self._sequence_window())
        )
        counts = (
            seq.filter(F.col("_next").isNotNull())
            .groupBy(
                F.col(self.item_column).alias("_prev"),
                F.col("_next"),
            )
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        totals = counts.groupBy("_prev").agg(
            F.sum("_cnt").alias("_total")
        )
        self.transitions = (
            counts.join(totals, on="_prev")
            .select(
                "_prev",
                F.col("_next").alias(self.item_column),
                (
                    F.col("_cnt").cast("double")
                    / F.col("_total").cast("double")
                ).alias(self.rating_column),
            )
            .cache()
        )
        self.fit_last_items = self._last_items(inter).cache()
        self.transitions.count()
        self.fit_last_items.count()

    def _predict(
        self,
        dataset: Optional[Dataset],
        k: int,
        queries: DataFrame,
        items: DataFrame,
        filter_seen_items: bool = True,
    ) -> DataFrame:
        last = (
            self._last_items(dataset.interactions)
            if dataset is not None
            else self.fit_last_items
        )
        return (
            queries.join(last, on=self.query_column, how="inner")
            .join(self.transitions, on="_prev", how="inner")
            .join(items, on=self.item_column, how="inner")
            .select(self.query_column, self.item_column, self.rating_column)
        )
