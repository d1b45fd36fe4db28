"""Discretizers: quantile bins and LightGBM-style greedy bins.

Parity: reference ``replay/preprocessing/discretizer.py``. The
greedy bound-finding runs on the (distinct_value, count) histogram —
small by construction — pulled to the driver exactly as the
reference does (``discretizer.py:192-206``); the transform is a pure
``Bucketizer`` pass.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence
import warnings

import numpy as np

from pyspark.ml.feature import Bucketizer, QuantileDiscretizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["QuantileDiscretizingRule", "GreedyDiscretizingRule", "Discretizer"]

_HANDLE_INVALID = ("error", "skip", "keep")


class _BaseDiscretizingRule:
    _bins: Optional[list] = None
    _is_fitted: bool = False

    def __init__(self, column: str, n_bins: int, handle_invalid: str = "keep"):
        if handle_invalid not in _HANDLE_INVALID:
            raise ValueError(
                f"handle_invalid should be one of {_HANDLE_INVALID}, got {handle_invalid}"
            )
        self._col = column
        self._n_bins = n_bins
        self._handle_invalid = handle_invalid

    def set_handle_invalid(self, handle_invalid: str) -> None:
        """Post-construction strategy switch (reference
        ``discretizer.py:56``)."""
        if handle_invalid not in _HANDLE_INVALID:
            raise ValueError(
                f"handle_invalid should be one of {_HANDLE_INVALID}, "
                f"got {handle_invalid}"
            )
        self._handle_invalid = handle_invalid

    @property
    def column(self) -> str:
        return self._col

    @property
    def n_bins(self) -> int:
        return self._n_bins

    @property
    def bins(self) -> Optional[list]:
        return self._bins

    def transform(self, df: DataFrame) -> DataFrame:
        if not self._is_fitted:
            raise RuntimeError(f"{type(self).__name__} is not fitted")
        target = self._col + "_discretized"
        bucketizer = Bucketizer(
            splits=self._bins,
            inputCol=self._col,
            outputCol=target,
            handleInvalid=self._handle_invalid,
        )
        return (
            bucketizer.transform(df).drop(self._col).withColumnRenamed(target, self._col)
        )

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)


class QuantileDiscretizingRule(_BaseDiscretizingRule):
    """Quantile binning via ``pyspark.ml.feature.QuantileDiscretizer``
    (reference ``discretizer.py:376-427``)."""

    def fit(self, df: DataFrame) -> "QuantileDiscretizingRule":
        if self._is_fitted:
            return self
        discretizer = QuantileDiscretizer(
            numBuckets=self._n_bins,
            inputCol=self._col,
            outputCol=self._col + "_discretized",
            handleInvalid=self._handle_invalid,
        )
        model = discretizer.fit(df)
        self._bins = list(model.getSplits())
        self._is_fitted = True
        return self


class GreedyDiscretizingRule(_BaseDiscretizingRule):
    """Greedy count-balancing binning (LightGBM ``bin.cpp`` strategy;
    reference ``discretizer.py:63-270``)."""

    def __init__(
        self,
        column: str,
        n_bins: int,
        min_data_in_bin: int = 1,
        handle_invalid: str = "keep",
    ):
        super().__init__(column, n_bins, handle_invalid)
        self._min_data_in_bin = min_data_in_bin

    def _greedy_bin_find(
        self, distinct_values, counts, num_distinct, max_bin, total_cnt, min_data_in_bin
    ) -> list:
        bounds = []
        assert max_bin > 0
        if total_cnt < max_bin * min_data_in_bin:
            warnings.warn(
                f"Expected at least {max_bin * min_data_in_bin} samples, got "
                f"{total_cnt}; fewer bins will be produced"
            )
        if num_distinct <= max_bin:
            cur = 0
            for i in range(num_distinct - 1):
                cur += counts[i]
                if cur >= min_data_in_bin:
                    bounds.append((distinct_values[i] + distinct_values[i + 1]) / 2.0)
                    cur = 0
            bounds.append(float("inf"))
            return bounds
        if min_data_in_bin > 0:
            max_bin = max(min(max_bin, total_cnt // min_data_in_bin), 1)
        mean_bin_size = total_cnt / max_bin
        rest_bin_cnt = max_bin
        rest_sample_cnt = total_cnt
        is_big = counts >= mean_bin_size
        rest_bin_cnt -= int(np.sum(is_big))
        rest_sample_cnt -= int(np.sum(counts[is_big]))
        mean_bin_size = rest_sample_cnt / rest_bin_cnt
        uppers = [float("inf")] * max_bin
        lowers = [float("inf")] * max_bin
        bin_cnt = 0
        lowers[bin_cnt] = distinct_values[0]
        cur = 0
        for i in range(num_distinct - 1):
            if not is_big[i]:
                rest_sample_cnt -= counts[i]
            cur += counts[i]
            if (
                is_big[i]
                or cur >= mean_bin_size
                or (is_big[i + 1] and cur >= max(1.0, mean_bin_size * 0.5))
            ):
                uppers[bin_cnt] = distinct_values[i]
                bin_cnt += 1
                lowers[bin_cnt] = distinct_values[i + 1]
                if bin_cnt >= max_bin - 1:
                    break
                cur = 0
                if not is_big[i]:
                    rest_bin_cnt -= 1
                    mean_bin_size = rest_sample_cnt / rest_bin_cnt
        bounds = [(uppers[i] + lowers[i + 1]) / 2.0 for i in range(bin_cnt - 1)]
        bounds.append(float("inf"))
        return bounds

    # the greedy pass is inherently sequential over the sorted distinct
    # values, so fit() pulls the (value, count) table to the driver —
    # reference parity (discretizer.py:63-270). For a continuous column
    # #distinct ≈ #rows and that pull is a driver OOM at corpus scale;
    # the guard makes it one clear error instead. Raise the cap when
    # you know the cardinality, or use QuantileDiscretizingRule (fully
    # distributed sketch) for high-cardinality columns.
    MAX_DRIVER_DISTINCT = 5_000_000

    def fit(self, df: DataFrame) -> "GreedyDiscretizingRule":
        if self._is_fitted:
            return self
        n_distinct = df.agg(
            F.approx_count_distinct(self._col, rsd=0.02).alias("n")
        ).first()["n"]
        if n_distinct > self.MAX_DRIVER_DISTINCT:
            raise ValueError(
                f"GreedyDiscretizingRule.fit: column {self._col!r} has "
                f"~{n_distinct:,} distinct values; the greedy algorithm "
                "collects the full (value, count) table to the driver. "
                "Use QuantileDiscretizingRule for high-cardinality "
                "columns, or raise MAX_DRIVER_DISTINCT deliberately."
            )
        value_counts = (
            df.groupBy(self._col).count().orderBy(self._col).toPandas()
        )
        bins = [-float("inf")]
        bins += self._greedy_bin_find(
            value_counts[self._col].values,
            value_counts["count"].values,
            value_counts.shape[0],
            self._n_bins + 1,
            int(value_counts["count"].sum()),
            self._min_data_in_bin,
        )
        self._bins = bins
        self._is_fitted = True
        return self


class Discretizer:
    """Multi-rule pipeline with save/load (reference ``discretizer.py:603-710``)."""

    def __init__(self, rules: Sequence[_BaseDiscretizingRule]):
        self.rules = list(rules)

    def fit(self, df: DataFrame) -> "Discretizer":
        for rule in self.rules:
            rule.fit(df)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        for rule in self.rules:
            df = rule.transform(df)
        return df

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)

    def set_handle_invalid(self, strategies: dict) -> None:
        """Per-column strategy switch (reference Discretizer API)."""
        rules = {r.column: r for r in self.rules}
        for column, strategy in strategies.items():
            if column not in rules:
                raise ValueError(f"No rule for column {column}")
            rules[column].set_handle_invalid(strategy)

    def save(self, path: str) -> None:
        base = Path(path)
        base.mkdir(parents=True, exist_ok=True)
        meta = [
            {
                "type": type(r).__name__,
                "column": r.column,
                "n_bins": r.n_bins,
                "bins": [str(b) for b in r.bins],
                "handle_invalid": r._handle_invalid,
            }
            for r in self.rules
        ]
        (base / "rules.json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, path: str) -> "Discretizer":
        meta = json.loads((Path(path) / "rules.json").read_text())
        rules = []
        for entry in meta:
            rule_cls = (
                GreedyDiscretizingRule
                if entry["type"] == "GreedyDiscretizingRule"
                else QuantileDiscretizingRule
            )
            rule = rule_cls(
                entry["column"], entry["n_bins"], handle_invalid=entry["handle_invalid"]
            )
            rule._bins = [float(b) for b in entry["bins"]]
            rule._is_fitted = True
            rules.append(rule)
        return cls(rules)
