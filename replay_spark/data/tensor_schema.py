"""Tensor feature schema for sequential (NN) data preparation.

Torch-free rebuild of the reference's tensor schema lattice
(``data/nn/schema.py:13,56,242``): it describes how Dataset columns
become per-query sequence tensors — which features are sequential,
their padding value, cardinality and embedding size — and drives the
schema-aware :class:`~replay_spark.data.nn.TensorSequenceTokenizer`.
The torch tensors themselves are out of a Spark engine's scope; the
schema is plain metadata and ships with the materialized parquet.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Iterable, Iterator, Optional, Sequence, Union

from replay_spark.data.schema import FeatureHint, FeatureSource, FeatureType

__all__ = ["TensorFeatureSource", "TensorFeatureInfo", "TensorSchema"]


class TensorFeatureSource:
    """Where a tensor feature's values come from: (table, column)."""

    def __init__(
        self,
        source: FeatureSource,
        column: str,
        index: Optional[int] = None,
    ) -> None:
        self._source = source
        self._column = column
        self._index = index

    @property
    def source(self) -> FeatureSource:
        return self._source

    @property
    def column(self) -> str:
        return self._column

    @property
    def index(self) -> Optional[int]:
        return self._index

    def __repr__(self) -> str:  # pragma: no cover
        return f"TensorFeatureSource({self._source}, {self._column!r})"


class TensorFeatureInfo:
    """One tensor feature: type, sequence flag, sources, dims.

    Parity: reference ``data/nn/schema.py:56`` (same validation rules:
    cardinality only for categorical features, tensor_dim only for
    numerical ones).
    """

    DEFAULT_EMBEDDING_DIM = 64

    def __init__(
        self,
        name: str,
        feature_type: FeatureType,
        is_seq: bool = False,
        feature_hint: Optional[FeatureHint] = None,
        feature_sources: Optional[list[TensorFeatureSource]] = None,
        cardinality: Optional[int] = None,
        padding_value: int = 0,
        embedding_dim: Optional[int] = None,
        tensor_dim: Optional[int] = None,
    ) -> None:
        self._name = name
        self._feature_hint = feature_hint
        self._feature_sources = feature_sources
        self._is_seq = is_seq
        self._padding_value = padding_value

        if not isinstance(feature_type, FeatureType):
            raise ValueError("Unknown feature type")
        self._feature_type = feature_type

        if feature_type in (FeatureType.NUMERICAL, FeatureType.NUMERICAL_LIST):
            if cardinality is not None:
                raise ValueError(
                    "Cardinality is needed only with categorical feature type."
                )
        self._cardinality = cardinality

        if (
            feature_type in (FeatureType.CATEGORICAL, FeatureType.CATEGORICAL_LIST)
            and tensor_dim
        ):
            raise ValueError(
                "Tensor dimensions is needed only with numerical feature type."
            )
        self._embedding_dim = embedding_dim or self.DEFAULT_EMBEDDING_DIM
        self._tensor_dim = (
            tensor_dim
            if feature_type in (FeatureType.NUMERICAL, FeatureType.NUMERICAL_LIST)
            else None
        )

    @property
    def name(self) -> str:
        return self._name

    @property
    def feature_type(self) -> FeatureType:
        return self._feature_type

    @property
    def feature_hint(self) -> Optional[FeatureHint]:
        return self._feature_hint

    @property
    def feature_sources(self) -> Optional[list[TensorFeatureSource]]:
        return self._feature_sources

    @property
    def feature_source(self) -> Optional[TensorFeatureSource]:
        sources = self._feature_sources
        if not sources:
            return None
        if len(sources) > 1:
            raise ValueError(
                "Only one element feature sources can be converted to "
                "single feature source."
            )
        return sources[0]

    @property
    def is_seq(self) -> bool:
        return self._is_seq

    @property
    def is_cat(self) -> bool:
        return self._feature_type in (
            FeatureType.CATEGORICAL,
            FeatureType.CATEGORICAL_LIST,
        )

    @property
    def is_num(self) -> bool:
        return self._feature_type in (
            FeatureType.NUMERICAL,
            FeatureType.NUMERICAL_LIST,
        )

    @property
    def is_list(self) -> bool:
        return self._feature_type in (
            FeatureType.CATEGORICAL_LIST,
            FeatureType.NUMERICAL_LIST,
        )

    @property
    def padding_value(self) -> int:
        return self._padding_value

    @property
    def cardinality(self) -> Optional[int]:
        if not self.is_cat:
            raise RuntimeError(
                f"Can not get cardinality because feature type of "
                f"{self._name} column is not categorical."
            )
        return self._cardinality

    def _set_cardinality(self, cardinality: int) -> None:
        self._cardinality = cardinality

    @property
    def tensor_dim(self) -> Optional[int]:
        if not self.is_num:
            raise RuntimeError(
                f"Can not get tensor dimensions because feature type of "
                f"{self._name} feature is not numerical."
            )
        return self._tensor_dim

    @property
    def embedding_dim(self) -> Optional[int]:
        return self._embedding_dim

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"TensorFeatureInfo({self._name!r}, {self._feature_type}, "
            f"is_seq={self._is_seq}, hint={self._feature_hint})"
        )


class TensorSchema(Mapping):
    """Ordered mapping ``feature name -> TensorFeatureInfo``.

    Parity: reference ``data/nn/schema.py:242``.
    """

    def __init__(
        self,
        features_list: Union[Sequence[TensorFeatureInfo], TensorFeatureInfo],
    ) -> None:
        if isinstance(features_list, TensorFeatureInfo):
            features_list = [features_list]
        self._features: dict[str, TensorFeatureInfo] = {}
        for feature in features_list:
            if feature.name in self._features:
                raise ValueError(f"Duplicate tensor feature {feature.name}")
            self._features[feature.name] = feature

    # Mapping protocol -----------------------------------------------------
    def __getitem__(self, name: str) -> TensorFeatureInfo:
        return self._features[name]

    def __iter__(self) -> Iterator[str]:
        return iter(self._features)

    def __len__(self) -> int:
        return len(self._features)

    def __add__(self, other: "TensorSchema") -> "TensorSchema":
        return TensorSchema(self.all_features + other.all_features)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, TensorSchema):
            return NotImplemented
        return self._features.keys() == other._features.keys()

    def __ne__(self, other: object) -> bool:
        eq = self.__eq__(other)
        return eq if eq is NotImplemented else not eq

    __hash__ = None

    # Helpers ----------------------------------------------------------------
    def item(self) -> TensorFeatureInfo:
        """The single feature of a one-feature schema."""
        if len(self._features) != 1:
            raise ValueError(
                "Only one element tensor schema can be converted to "
                "single feature"
            )
        return next(iter(self._features.values()))

    def subset(self, features_to_keep: Iterable[str]) -> "TensorSchema":
        keep = set(features_to_keep)
        return TensorSchema([f for f in self.all_features if f.name in keep])

    @property
    def all_features(self) -> list[TensorFeatureInfo]:
        return list(self._features.values())

    @property
    def names(self) -> list[str]:
        return list(self._features)

    def _filtered(self, predicate) -> "TensorSchema":
        return TensorSchema([f for f in self.all_features if predicate(f)])

    @property
    def categorical_features(self) -> "TensorSchema":
        return self._filtered(lambda f: f.is_cat)

    @property
    def numerical_features(self) -> "TensorSchema":
        return self._filtered(lambda f: f.is_num)

    @property
    def query_id_features(self) -> "TensorSchema":
        return self._filtered(lambda f: f.feature_hint == FeatureHint.QUERY_ID)

    @property
    def item_id_features(self) -> "TensorSchema":
        return self._filtered(lambda f: f.feature_hint == FeatureHint.ITEM_ID)

    @property
    def timestamp_features(self) -> "TensorSchema":
        return self._filtered(lambda f: f.feature_hint == FeatureHint.TIMESTAMP)

    @property
    def rating_features(self) -> "TensorSchema":
        return self._filtered(lambda f: f.feature_hint == FeatureHint.RATING)

    @property
    def sequential_features(self) -> "TensorSchema":
        return self._filtered(lambda f: f.is_seq)

    def _single_name(self, schema: "TensorSchema") -> Optional[str]:
        if not schema:
            return None
        return schema.item().name

    @property
    def query_id_feature_name(self) -> Optional[str]:
        return self._single_name(self.query_id_features)

    @property
    def item_id_feature_name(self) -> Optional[str]:
        return self._single_name(self.item_id_features)

    @property
    def timestamp_feature_name(self) -> Optional[str]:
        return self._single_name(self.timestamp_features)

    @property
    def rating_feature_name(self) -> Optional[str]:
        return self._single_name(self.rating_features)

    # Persistence ------------------------------------------------------------
    def to_dict(self) -> list[dict]:
        """JSON-serializable form for parquet-sidecar persistence."""
        out = []
        for f in self.all_features:
            out.append(
                {
                    "name": f.name,
                    "feature_type": f.feature_type.value,
                    "is_seq": f.is_seq,
                    "feature_hint": f.feature_hint.value if f.feature_hint else None,
                    "feature_sources": [
                        {"source": s.source.value, "column": s.column, "index": s.index}
                        for s in (f.feature_sources or [])
                    ]
                    or None,
                    "cardinality": f._cardinality,
                    "padding_value": f.padding_value,
                    "embedding_dim": f._embedding_dim,
                    "tensor_dim": f._tensor_dim,
                }
            )
        return out

    @classmethod
    def from_dict(cls, data: list[dict]) -> "TensorSchema":
        feats = []
        for d in data:
            feats.append(
                TensorFeatureInfo(
                    d["name"],
                    FeatureType(d["feature_type"]),
                    is_seq=d["is_seq"],
                    feature_hint=FeatureHint(d["feature_hint"])
                    if d["feature_hint"]
                    else None,
                    feature_sources=[
                        TensorFeatureSource(
                            FeatureSource(s["source"]), s["column"], s["index"]
                        )
                        for s in d["feature_sources"]
                    ]
                    if d["feature_sources"]
                    else None,
                    cardinality=d["cardinality"],
                    padding_value=d["padding_value"],
                    embedding_dim=d["embedding_dim"],
                    tensor_dim=d["tensor_dim"],
                )
            )
        return cls(feats)
