"""Dataset — the universal data container: 3 tables + schema.

Fresh Spark-only implementation of the reference's ``Dataset``
(``replay/data/dataset.py:33-764``): an interactions fact table plus
optional per-query and per-item feature dimension tables, described
by a declared ``FeatureSchema``. Unlike the reference there is no
pandas/polars triplication — everything is a Spark DataFrame and all
derived properties are lazy Spark plans.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from replay_spark.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)

__all__ = ["Dataset"]


class Dataset:
    """Interactions + optional query/item feature tables + schema.

    Parity: reference ``dataset.py:33``. Consistency checks use
    left-anti joins (``dataset.py:572-582``); encoded-id checks use
    min/max aggregations (``dataset.py:601-659``).
    """

    def __init__(
        self,
        feature_schema: FeatureSchema,
        interactions: DataFrame,
        query_features: Optional[DataFrame] = None,
        item_features: Optional[DataFrame] = None,
        check_consistency: bool = True,
        categorical_encoded: bool = False,
    ) -> None:
        self._feature_schema = feature_schema
        self._interactions = interactions
        self._query_features = query_features
        self._item_features = item_features
        self._categorical_encoded = categorical_encoded
        self._interaction_count: Optional[int] = None
        self._fill_feature_sources()
        self._set_cardinality_callbacks()
        if check_consistency:
            if query_features is not None:
                self._check_ids_consistency(query_features, self.query_id_column)
            if item_features is not None:
                self._check_ids_consistency(item_features, self.item_id_column)
            if categorical_encoded:
                self._check_encoded()

    # -- accessors ---------------------------------------------------------
    @property
    def interactions(self) -> DataFrame:
        return self._interactions

    @property
    def interaction_count(self) -> int:
        """Memoized row count of the interactions frame — consumers
        that size work by nnz (ALS block sizing, bandit totals)
        share one job instead of each recounting."""
        if self._interaction_count is None:
            self._interaction_count = self._interactions.count()
        return self._interaction_count

    @property
    def query_features(self) -> Optional[DataFrame]:
        return self._query_features

    @property
    def item_features(self) -> Optional[DataFrame]:
        return self._item_features

    @property
    def feature_schema(self) -> FeatureSchema:
        return self._feature_schema

    @property
    def query_id_column(self) -> str:
        return self._feature_schema.query_id_column

    @property
    def item_id_column(self) -> str:
        return self._feature_schema.item_id_column

    @property
    def rating_column(self) -> Optional[str]:
        return self._feature_schema.interactions_rating_column

    @property
    def timestamp_column(self) -> Optional[str]:
        return self._feature_schema.interactions_timestamp_column

    @property
    def is_categorical_encoded(self) -> bool:
        return self._categorical_encoded

    @property
    def query_ids(self) -> DataFrame:
        """Distinct query ids across interactions and query features."""
        ids = self._interactions.select(self.query_id_column)
        if self._query_features is not None:
            ids = ids.union(self._query_features.select(self.query_id_column))
        return ids.distinct()

    @property
    def item_ids(self) -> DataFrame:
        ids = self._interactions.select(self.item_id_column)
        if self._item_features is not None:
            ids = ids.union(self._item_features.select(self.item_id_column))
        return ids.distinct()

    @property
    def query_count(self) -> int:
        return self.query_ids.count()

    @property
    def item_count(self) -> int:
        return self.item_ids.count()

    # -- cache management (reference dataset.py:347-395) -------------------
    def cache(self) -> None:
        for df in self._tables():
            df.cache()

    def persist(self, storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER) -> None:
        for df in self._tables():
            df.persist(storage_level)

    def unpersist(self, blocking: bool = False) -> None:
        for df in self._tables():
            df.unpersist(blocking)

    def _tables(self) -> list[DataFrame]:
        return [t for t in (self._interactions, self._query_features, self._item_features) if t is not None]

    # -- projections (reference dataset.py:397-439) ------------------------
    def subset(self, features_to_keep) -> "Dataset":
        """Project all member tables onto a feature subset (ids always kept)."""
        keep = set(features_to_keep) | set(self._feature_schema.query_and_item_id_columns)
        schema = self._feature_schema.subset(keep)

        def _project(df: Optional[DataFrame], id_col: str) -> Optional[DataFrame]:
            if df is None:
                return None
            cols = [c for c in df.columns if c in keep]
            if id_col not in cols:
                cols = [id_col] + cols
            return df.select(*cols)

        interactions = self._interactions.select(
            *[c for c in self._interactions.columns if c in keep]
        )
        return Dataset(
            feature_schema=schema,
            interactions=interactions,
            query_features=_project(self._query_features, self.query_id_column),
            item_features=_project(self._item_features, self.item_id_column),
            check_consistency=False,
            categorical_encoded=self._categorical_encoded,
        )

    # -- persistence (reference dataset.py:209-345) ------------------------
    def save(self, path: str) -> None:
        """Parquet per table + JSON sidecar with the declared schema."""
        base = Path(path)
        base.mkdir(parents=True, exist_ok=True)
        init_args = {
            "feature_schema": [
                {
                    "column": f.column,
                    "feature_type": f.feature_type.name,
                    "feature_hint": f.feature_hint.name if f.feature_hint else None,
                    "feature_source": f.feature_source.name if f.feature_source else None,
                }
                for f in self._feature_schema.all_features
            ],
            "categorical_encoded": self._categorical_encoded,
            "has_query_features": self._query_features is not None,
            "has_item_features": self._item_features is not None,
        }
        (base / "init_args.json").write_text(json.dumps(init_args, indent=2))
        self._interactions.write.mode("overwrite").parquet(str(base / "interactions.parquet"))
        if self._query_features is not None:
            self._query_features.write.mode("overwrite").parquet(str(base / "query_features.parquet"))
        if self._item_features is not None:
            self._item_features.write.mode("overwrite").parquet(str(base / "item_features.parquet"))

    @classmethod
    def load(cls, path: str, spark: Optional[SparkSession] = None) -> "Dataset":
        spark = spark or SparkSession.getActiveSession()
        base = Path(path)
        init_args = json.loads((base / "init_args.json").read_text())
        features = [
            FeatureInfo(
                column=f["column"],
                feature_type=FeatureType[f["feature_type"]],
                feature_hint=FeatureHint[f["feature_hint"]] if f["feature_hint"] else None,
                feature_source=FeatureSource[f["feature_source"]] if f["feature_source"] else None,
            )
            for f in init_args["feature_schema"]
        ]
        interactions = spark.read.parquet(str(base / "interactions.parquet"))
        query_features = (
            spark.read.parquet(str(base / "query_features.parquet"))
            if init_args["has_query_features"]
            else None
        )
        item_features = (
            spark.read.parquet(str(base / "item_features.parquet"))
            if init_args["has_item_features"]
            else None
        )
        return cls(
            feature_schema=FeatureSchema(features),
            interactions=interactions,
            query_features=query_features,
            item_features=item_features,
            check_consistency=False,
            categorical_encoded=init_args["categorical_encoded"],
        )

    # -- internals ---------------------------------------------------------
    def _fill_feature_sources(self) -> None:
        """Tag each feature with the table it lives in; auto-add unlabeled
        columns as NUMERICAL (reference ``dataset.py:483-553``)."""
        declared = set(self._feature_schema.columns)
        id_cols = set(self._feature_schema.query_and_item_id_columns)
        for f in self._feature_schema.all_features:
            if f.feature_hint in (FeatureHint.QUERY_ID, FeatureHint.ITEM_ID):
                f._set_source(FeatureSource.INTERACTIONS)
            elif f.feature_source is None:
                if f.column in self._interactions.columns:
                    f._set_source(FeatureSource.INTERACTIONS)
                elif (
                    self._query_features is not None
                    and f.column in self._query_features.columns
                ):
                    f._set_source(FeatureSource.QUERY_FEATURES)
                elif (
                    self._item_features is not None
                    and f.column in self._item_features.columns
                ):
                    f._set_source(FeatureSource.ITEM_FEATURES)
        extras = []
        for source, df in (
            (FeatureSource.INTERACTIONS, self._interactions),
            (FeatureSource.QUERY_FEATURES, self._query_features),
            (FeatureSource.ITEM_FEATURES, self._item_features),
        ):
            if df is None:
                continue
            for col in df.columns:
                if col not in declared and col not in id_cols:
                    extras.append(
                        FeatureInfo(col, FeatureType.NUMERICAL, None, source)
                    )
                    declared.add(col)
        if extras:
            self._feature_schema = self._feature_schema + FeatureSchema(extras)

    def _set_cardinality_callbacks(self) -> None:
        source_to_df = {
            FeatureSource.INTERACTIONS: self._interactions,
            FeatureSource.QUERY_FEATURES: self._query_features,
            FeatureSource.ITEM_FEATURES: self._item_features,
        }
        for f in self._feature_schema.all_features:
            df = source_to_df.get(f.feature_source) if f.feature_source else None
            if f.feature_hint == FeatureHint.QUERY_ID:
                f._set_cardinality_callback(lambda col: self.query_count)
                continue
            if f.feature_hint == FeatureHint.ITEM_ID:
                f._set_cardinality_callback(lambda col: self.item_count)
                continue
            if df is not None:
                f._set_cardinality_callback(self._make_nunique(df, f))

    @staticmethod
    def _make_nunique(df: DataFrame, feature: FeatureInfo):
        def _nunique(col: str) -> int:
            frame = df
            if feature.feature_type in (
                FeatureType.CATEGORICAL_LIST,
                FeatureType.NUMERICAL_LIST,
            ):
                frame = frame.select(F.explode(col).alias(col))
            return frame.select(col).distinct().count()

        return _nunique

    def _check_ids_consistency(self, feature_df: DataFrame, id_col: str) -> None:
        """Every id in interactions must exist in the feature table."""
        missing = (
            self._interactions.select(id_col)
            .distinct()
            .join(feature_df.select(id_col).distinct(), on=id_col, how="left_anti")
            .count()
        )
        if missing > 0:
            raise ValueError(
                f"There are {missing} ids in interactions that are absent in "
                f"the {id_col} feature table"
            )

    def _check_encoded(self) -> None:
        """Encoded ids must be contiguous ints in [0, cardinality)."""
        for col, count in (
            (self.query_id_column, self.query_count),
            (self.item_id_column, self.item_count),
        ):
            row = self._interactions.agg(
                F.min(col).alias("min"), F.max(col).alias("max")
            ).first()
            if row["min"] is None:
                continue
            if row["min"] < 0 or row["max"] >= count:
                raise ValueError(f"IDs in {col} are not encoded to [0, {count})")
