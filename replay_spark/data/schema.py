"""Declared, role-tagged feature schema.

Fresh implementation of the reference's schema lattice
(``replay/data/schema.py``): feature type / source / hint enums, a
per-column ``FeatureInfo`` with lazily computed cardinality, and an
ordered ``FeatureSchema`` mapping with relational-style
filter/drop/subset helpers.
"""

from __future__ import annotations

from collections.abc import Mapping
from enum import Enum
from typing import Callable, Iterator, Optional, Sequence, Union

__all__ = [
    "FeatureType",
    "FeatureSource",
    "FeatureHint",
    "FeatureInfo",
    "FeatureSchema",
]


class FeatureType(Enum):
    """Physical/logical column kind (reference ``schema.py:5-11``)."""

    CATEGORICAL = "categorical"
    NUMERICAL = "numerical"
    CATEGORICAL_LIST = "categorical_list"
    NUMERICAL_LIST = "numerical_list"


class FeatureSource(Enum):
    """Which member table a column lives in (reference ``schema.py:14-19``)."""

    ITEM_FEATURES = "item_features"
    QUERY_FEATURES = "query_features"
    INTERACTIONS = "interactions"


class FeatureHint(Enum):
    """Semantic role (reference ``schema.py:22-28``)."""

    ITEM_ID = "item_id"
    QUERY_ID = "query_id"
    RATING = "rating"
    TIMESTAMP = "timestamp"


class FeatureInfo:
    """Column metadata + lazily-computed cardinality (reference ``schema.py:31-116``)."""

    def __init__(
        self,
        column: str,
        feature_type: FeatureType,
        feature_hint: Optional[FeatureHint] = None,
        feature_source: Optional[FeatureSource] = None,
        cardinality: Optional[int] = None,
    ) -> None:
        self._column = column
        if not isinstance(feature_type, FeatureType):
            raise ValueError(f"Unknown feature type {feature_type}")
        self._feature_type = feature_type
        self._feature_hint = feature_hint
        self._feature_source = feature_source
        self._cardinality = cardinality
        self._cardinality_callback: Optional[Callable[[str], int]] = None

    @property
    def column(self) -> str:
        return self._column

    @property
    def feature_type(self) -> FeatureType:
        return self._feature_type

    @property
    def feature_hint(self) -> Optional[FeatureHint]:
        return self._feature_hint

    @property
    def feature_source(self) -> Optional[FeatureSource]:
        return self._feature_source

    @property
    def cardinality(self) -> Optional[int]:
        if self._feature_type not in (
            FeatureType.CATEGORICAL,
            FeatureType.CATEGORICAL_LIST,
        ):
            raise RuntimeError(
                f"Can not get cardinality because feature {self._column} "
                f"is not categorical"
            )
        if self._cardinality is None and self._cardinality_callback is not None:
            self._cardinality = self._cardinality_callback(self._column)
        return self._cardinality

    def _set_source(self, source: FeatureSource) -> None:
        self._feature_source = source

    def _set_cardinality_callback(self, callback: Callable[[str], int]) -> None:
        self._cardinality_callback = callback

    def reset_cardinality(self) -> None:
        self._cardinality = None

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"FeatureInfo(column={self._column!r}, type={self._feature_type}, "
            f"hint={self._feature_hint}, source={self._feature_source})"
        )


class FeatureSchema(Mapping):
    """Ordered mapping ``column -> FeatureInfo`` with filter/drop helpers.

    Reference: ``schema.py:119-465``. At most one QUERY_ID and one
    ITEM_ID feature are allowed.
    """

    def __init__(
        self, features_list: Union[Sequence[FeatureInfo], FeatureInfo]
    ) -> None:
        if isinstance(features_list, FeatureInfo):
            features_list = [features_list]
        self._features: dict[str, FeatureInfo] = {}
        for feature in features_list:
            if feature.column in self._features:
                raise ValueError(f"Duplicate feature column {feature.column}")
            self._features[feature.column] = feature
        for hint in (FeatureHint.QUERY_ID, FeatureHint.ITEM_ID):
            hinted = [f for f in self._features.values() if f.feature_hint == hint]
            if len(hinted) > 1:
                raise ValueError(f"More than one feature with hint {hint}")

    # Mapping protocol -----------------------------------------------------
    def __getitem__(self, key: str) -> FeatureInfo:
        return self._features[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._features)

    def __len__(self) -> int:
        return len(self._features)

    def __add__(self, other: "FeatureSchema") -> "FeatureSchema":
        return FeatureSchema(list(self._features.values()) + list(other._features.values()))

    # Helpers --------------------------------------------------------------
    @property
    def all_features(self) -> list[FeatureInfo]:
        return list(self._features.values())

    @property
    def columns(self) -> list[str]:
        return list(self._features.keys())

    def copy(self) -> "FeatureSchema":
        return FeatureSchema(
            [
                FeatureInfo(
                    f.column,
                    f.feature_type,
                    f.feature_hint,
                    f.feature_source,
                )
                for f in self.all_features
            ]
        )

    def subset(self, features_to_keep: Sequence[str]) -> "FeatureSchema":
        keep = set(features_to_keep)
        return FeatureSchema([f for f in self.all_features if f.column in keep])

    def filter(
        self,
        column: Optional[str] = None,
        feature_hint: Optional[FeatureHint] = None,
        feature_source: Optional[FeatureSource] = None,
        feature_type: Optional[FeatureType] = None,
    ) -> "FeatureSchema":
        feats = self.all_features
        if column is not None:
            feats = [f for f in feats if f.column == column]
        if feature_hint is not None:
            feats = [f for f in feats if f.feature_hint == feature_hint]
        if feature_source is not None:
            feats = [f for f in feats if f.feature_source == feature_source]
        if feature_type is not None:
            feats = [f for f in feats if f.feature_type == feature_type]
        return FeatureSchema(feats)

    def drop(
        self,
        column: Optional[str] = None,
        feature_hint: Optional[FeatureHint] = None,
        feature_source: Optional[FeatureSource] = None,
        feature_type: Optional[FeatureType] = None,
    ) -> "FeatureSchema":
        feats = self.all_features
        if column is not None:
            feats = [f for f in feats if f.column != column]
        if feature_hint is not None:
            feats = [f for f in feats if f.feature_hint != feature_hint]
        if feature_source is not None:
            feats = [f for f in feats if f.feature_source != feature_source]
        if feature_type is not None:
            feats = [f for f in feats if f.feature_type != feature_type]
        return FeatureSchema(feats)

    # Accessors (reference schema.py:226-334) ------------------------------
    def _first_column(self, hint: FeatureHint) -> Optional[str]:
        for f in self.all_features:
            if f.feature_hint == hint:
                return f.column
        return None

    @property
    def query_id_column(self) -> str:
        return self._first_column(FeatureHint.QUERY_ID)

    @property
    def item_id_column(self) -> str:
        return self._first_column(FeatureHint.ITEM_ID)

    @property
    def interactions_rating_column(self) -> Optional[str]:
        return self._first_column(FeatureHint.RATING)

    @property
    def interactions_timestamp_column(self) -> Optional[str]:
        return self._first_column(FeatureHint.TIMESTAMP)

    @property
    def query_and_item_id_columns(self) -> list[str]:
        return [c for c in (self.query_id_column, self.item_id_column) if c is not None]

    @property
    def categorical_features(self) -> "FeatureSchema":
        # Hinted id columns are included, matching the reference
        # (``schema.py:226-232`` filters by type only) — the
        # DatasetLabelEncoder relies on iterating QUERY_ID/ITEM_ID here.
        return FeatureSchema(
            [
                f
                for f in self.all_features
                if f.feature_type in (FeatureType.CATEGORICAL, FeatureType.CATEGORICAL_LIST)
            ]
        )

    @property
    def numerical_features(self) -> "FeatureSchema":
        return FeatureSchema(
            [
                f
                for f in self.all_features
                if f.feature_type in (FeatureType.NUMERICAL, FeatureType.NUMERICAL_LIST)
            ]
        )

    @property
    def item_features(self) -> "FeatureSchema":
        return FeatureSchema(
            [f for f in self.all_features if f.feature_source == FeatureSource.ITEM_FEATURES]
        )

    @property
    def query_features(self) -> "FeatureSchema":
        return FeatureSchema(
            [f for f in self.all_features if f.feature_source == FeatureSource.QUERY_FEATURES]
        )

    @property
    def interaction_features(self) -> "FeatureSchema":
        return FeatureSchema(
            [
                f
                for f in self.all_features
                if f.feature_source == FeatureSource.INTERACTIONS
                and f.feature_hint not in (FeatureHint.QUERY_ID, FeatureHint.ITEM_ID)
            ]
        )
