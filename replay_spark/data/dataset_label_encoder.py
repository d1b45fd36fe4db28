"""Whole-Dataset categorical encoding driven by the feature schema.

Fits one :class:`~replay_spark.preprocessing.label_encoder.LabelEncodingRule`
(or ``SequenceEncodingRule`` for ``CATEGORICAL_LIST`` columns) per
categorical feature of a :class:`~replay_spark.data.Dataset`, choosing
the fit table by role: id columns fit on their feature table when one
exists (its id universe is a superset of the interactions' by the
Dataset consistency contract), everything else fits on its source
table. Parity: reference ``data/dataset_utils/dataset_label_encoder.py:20``.

Every mapping stays a Spark DataFrame joined at transform time — the
whole-dataset encode is a chain of broadcast-or-shuffle joins, no
driver-side dictionaries at any cardinality.
"""

from __future__ import annotations

import warnings
from typing import Iterable, Optional, Sequence, Union

from replay_spark.data.dataset import Dataset
from replay_spark.data.schema import (
    FeatureHint,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_spark.preprocessing.label_encoder import (
    LabelEncoder,
    LabelEncodingRule,
    SequenceEncodingRule,
)

__all__ = ["DatasetLabelEncoder", "LabelEncoderTransformWarning"]


class LabelEncoderTransformWarning(Warning):
    """A categorical column could not be transformed as fitted."""


class DatasetLabelEncoder:
    """Encode every categorical feature of a Dataset to dense ids."""

    def __init__(
        self,
        handle_unknown_rule: str = "error",
        default_value_rule: Optional[Union[int, str]] = None,
    ) -> None:
        self._handle_unknown_rule = handle_unknown_rule
        self._default_value_rule = default_value_rule
        self._encoding_rules: dict[str, LabelEncodingRule] = {}
        self._features_columns: dict = {}

    def fit(self, dataset: Dataset) -> "DatasetLabelEncoder":
        """Fit one encoding rule per categorical feature."""
        self._fill_features_columns(dataset.feature_schema)
        for column, info in dataset.feature_schema.categorical_features.items():
            rule_cls = (
                SequenceEncodingRule
                if info.feature_type == FeatureType.CATEGORICAL_LIST
                else LabelEncodingRule
            )
            rule = rule_cls(
                column,
                handle_unknown=self._handle_unknown_rule,
                default_value=self._default_value_rule,
            )
            if info.feature_hint == FeatureHint.QUERY_ID:
                rule.fit(
                    dataset.interactions
                    if dataset.query_features is None
                    else dataset.query_features
                )
            elif info.feature_hint == FeatureHint.ITEM_ID:
                rule.fit(
                    dataset.interactions
                    if dataset.item_features is None
                    else dataset.item_features
                )
            elif info.feature_source == FeatureSource.INTERACTIONS:
                rule.fit(dataset.interactions)
            elif info.feature_source == FeatureSource.QUERY_FEATURES:
                rule.fit(dataset.query_features)
            elif info.feature_source == FeatureSource.ITEM_FEATURES:
                rule.fit(dataset.item_features)
            else:  # pragma: no cover - sources are filled by Dataset
                raise AssertionError(f"Unknown feature source for {column}")
            self._encoding_rules[column] = rule
        return self

    def transform(self, dataset: Dataset) -> Dataset:
        """Return a new Dataset with all fitted columns encoded."""
        self._check_if_initialized()
        interactions = dataset.interactions
        query_features = dataset.query_features
        item_features = dataset.item_features

        for column, info in dataset.feature_schema.categorical_features.items():
            rule = self._encoding_rules.get(column)
            if rule is None:
                warnings.warn(
                    f"Cannot transform feature '{column}' as it was not "
                    "present at the fit stage",
                    LabelEncoderTransformWarning,
                )
                continue
            if info.feature_hint == FeatureHint.QUERY_ID:
                interactions = rule.transform(interactions)
                if query_features is not None:
                    query_features = rule.transform(query_features)
            elif info.feature_hint == FeatureHint.ITEM_ID:
                interactions = rule.transform(interactions)
                if item_features is not None:
                    item_features = rule.transform(item_features)
            elif info.feature_source == FeatureSource.INTERACTIONS:
                interactions = rule.transform(interactions)
            elif info.feature_source == FeatureSource.QUERY_FEATURES:
                query_features = rule.transform(query_features)
            else:
                item_features = rule.transform(item_features)

        return Dataset(
            feature_schema=dataset.feature_schema,
            interactions=interactions,
            query_features=query_features,
            item_features=item_features,
            check_consistency=False,
            categorical_encoded=True,
        )

    def fit_transform(self, dataset: Dataset) -> Dataset:
        return self.fit(dataset).transform(dataset)

    def get_encoder(
        self, columns: Union[str, Iterable[str]]
    ) -> Optional[LabelEncoder]:
        """Bundle the fitted rules for ``columns`` into a LabelEncoder."""
        self._check_if_initialized()
        wanted = {columns} if isinstance(columns, str) else set(columns)
        rules = [
            rule
            for column, rule in self._encoding_rules.items()
            if column in wanted
        ]
        if not rules:
            return None
        return LabelEncoder(rules)

    @property
    def query_id_encoder(self) -> LabelEncoder:
        return self._require_encoder(self._features_columns[FeatureHint.QUERY_ID])

    @property
    def item_id_encoder(self) -> LabelEncoder:
        return self._require_encoder(self._features_columns[FeatureHint.ITEM_ID])

    @property
    def query_and_item_id_encoder(self) -> LabelEncoder:
        return self._require_encoder(
            self._features_columns[FeatureHint.QUERY_ID]
            + self._features_columns[FeatureHint.ITEM_ID]
        )

    def _require_encoder(self, columns: Sequence[str]) -> LabelEncoder:
        encoder = self.get_encoder(columns)
        if encoder is None:
            raise RuntimeError(f"No fitted encoder for columns {list(columns)}")
        return encoder

    def _fill_features_columns(self, schema: FeatureSchema) -> None:
        self._features_columns = {
            FeatureHint.QUERY_ID: [schema.query_id_column],
            FeatureHint.ITEM_ID: [schema.item_id_column],
            FeatureSource.INTERACTIONS: schema.interaction_features.columns,
            FeatureSource.QUERY_FEATURES: schema.query_features.columns,
            FeatureSource.ITEM_FEATURES: schema.item_features.columns,
        }

    def _check_if_initialized(self) -> None:
        if not self._encoding_rules:
            raise RuntimeError("DatasetLabelEncoder is not fitted")
