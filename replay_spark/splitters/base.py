"""Base train/test splitter.

Rebuild of the reference ``replay/splitters/base_splitter.py:25-210``:
splitters compute a boolean ``is_test`` column and filter twice;
post-split cold-entity dropping is a semi join against the train
universe; session atomicity is repaired with ``first``/``last`` over
an unbounded (user, session) window.
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SplitterReturnType = tuple[DataFrame, DataFrame]

__all__ = ["Splitter", "SplitterReturnType"]


class Splitter(ABC):
    """Base class for all train/test splitters."""

    _init_arg_names = [
        "drop_cold_users",
        "drop_cold_items",
        "query_column",
        "item_column",
        "timestamp_column",
        "session_id_column",
        "session_id_processing_strategy",
    ]

    def __init__(
        self,
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: Optional[str] = "timestamp",
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
    ):
        self.drop_cold_users = drop_cold_users
        self.drop_cold_items = drop_cold_items
        self.query_column = query_column
        self.item_column = item_column
        self.timestamp_column = timestamp_column
        self.session_id_column = session_id_column
        self.session_id_processing_strategy = session_id_processing_strategy

    @property
    def _init_args(self):
        """Full constructor state for save/load round-trips.

        Derived from the concrete class's ``__init__`` signature (every
        splitter stores each parameter under the same attribute name),
        so subclass-specific args — ``time_threshold``, ``N``,
        ``test_size``, strategies — persist too, not just the base
        columns. Reference splitters record the same full set
        (``base_splitter.py:72-86``)."""
        import inspect

        names = [
            p
            for p in inspect.signature(type(self).__init__).parameters
            if p != "self"
        ]
        return {name: getattr(self, name) for name in names}

    def save(self, path: str) -> None:
        base_path = Path(path).with_suffix(".replay").resolve()
        base_path.mkdir(parents=True, exist_ok=True)
        payload = {"init_args": self._init_args, "_class_name": str(self)}
        # datetime thresholds serialize as their str form, which every
        # splitter accepts back (TimeSplitter parses str cuts)
        (base_path / "init_args.json").write_text(
            json.dumps(payload, default=str)
        )

    @classmethod
    def load(cls, path: str) -> "Splitter":
        base_path = Path(path).with_suffix(".replay").resolve()
        payload = json.loads((base_path / "init_args.json").read_text())
        return cls(**payload["init_args"])

    def __str__(self):
        return type(self).__name__

    def split(self, interactions: DataFrame) -> SplitterReturnType:
        """Split into (train, test); optionally drop cold entities from test."""
        train, test = self._core_split(interactions)
        test = self._drop_cold_items_and_users(train, test)
        return train, test

    @abstractmethod
    def _core_split(self, interactions: DataFrame) -> SplitterReturnType:
        ...

    def _drop_cold_items_and_users(self, train: DataFrame, test: DataFrame) -> DataFrame:
        if self.drop_cold_items:
            warm = train.select(self.item_column).distinct()
            test = test.join(warm, on=self.item_column, how="left_semi")
        if self.drop_cold_users:
            warm = train.select(self.query_column).distinct()
            test = test.join(warm, on=self.query_column, how="left_semi")
        return test

    def _recalculate_with_session_id_column(self, data: DataFrame) -> DataFrame:
        """Make sessions atomic: a split session goes entirely to
        train (strategy 'train' → first) or test ('test' → last)."""
        agg = F.first if self.session_id_processing_strategy == "train" else F.last
        window = (
            Window.partitionBy(self.query_column, self.session_id_column)
            .orderBy(self.timestamp_column)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        return data.withColumn("is_test", agg("is_test").over(window))
