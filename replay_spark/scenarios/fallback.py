"""Fallback ensemble: a main model completed by a filler model.

Parity: reference ``replay/scenarios/fallback.py:13-150`` + the
merge operator ``spark_utils.py:480-514`` (fallback ratings shifted
strictly below the main model's, full-outer join + coalesce, final
deterministic top-k).
"""

from __future__ import annotations

from typing import Iterable, Optional, Union

from pyspark.sql import DataFrame

from replay_spark.data.dataset import Dataset
from replay_spark.models.base import BaseRecommender
from replay_spark.models.pop_rec import PopRec
from replay_spark.utils.spark_utils import fallback as fallback_merge

__all__ = ["Fallback"]


class Fallback:
    def __init__(
        self,
        main_model: BaseRecommender,
        fallback_model: Optional[BaseRecommender] = None,
    ):
        self.main_model = main_model
        self.fallback_model = fallback_model or PopRec()

    def fit(self, dataset: Dataset) -> "Fallback":
        self.main_model.fit(dataset)
        self.fallback_model.fit(dataset)
        return self

    def predict(
        self,
        dataset: Dataset,
        k: int,
        queries: Union[DataFrame, Iterable, None] = None,
        items: Union[DataFrame, Iterable, None] = None,
        filter_seen_items: bool = True,
    ) -> DataFrame:
        main_recs = self.main_model.predict(
            dataset, k, queries, items, filter_seen_items
        )
        fill_recs = self.fallback_model.predict(
            dataset, k, queries, items, filter_seen_items
        )
        qc = self.main_model.query_column
        ic = self.main_model.item_column
        rc = self.main_model.rating_column
        return fallback_merge(main_recs, fill_recs, k, qc, ic, rc)

    def fit_predict(self, dataset: Dataset, k: int, **kwargs) -> DataFrame:
        return self.fit(dataset).predict(dataset, k, **kwargs)

    def optimize(
        self,
        train_dataset: Dataset,
        test_dataset: Dataset,
        param_borders: Optional[dict] = None,
        criterion=None,
        k: int = 10,
        budget: int = 10,
        new_study: bool = True,
    ) -> tuple:
        """Search hyperparameters for both members (reference
        ``scenarios/fallback.py:125-177``): optimize the main model,
        apply its best params, then the fallback model if it has a
        search space. ``param_borders`` = {"main": ..., "fallback":
        ...} (each None → the model's own ``_search_space``).
        Returns (main_params, fallback_params)."""
        if param_borders is None:
            param_borders = {"main": None, "fallback": None}
        params = self.main_model.optimize(
            train_dataset,
            test_dataset,
            param_borders.get("main"),
            criterion,
            k,
            budget,
            new_study,
        )
        fb_space = (
            param_borders.get("fallback") or self.fallback_model._search_space
        )
        fb_params = None
        if fb_space is not None:
            fb_params = self.fallback_model.optimize(
                train_dataset,
                test_dataset,
                param_borders.get("fallback"),
                criterion,
                k,
                budget,
                new_study,
            )
        return params, fb_params
