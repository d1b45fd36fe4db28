"""Spark-side sequence materialization for neural sequential models.

The reference's NN subsystem (SASRec/BERT4Rec — PyTorch Lightning)
is out of a Spark engine's scope (SURVEY §1.3, §2.5); what Spark
contributes is the data prep: encode categorical columns, group
interactions into per-user item sequences ordered by time, and
write ``ArrayType`` parquet a torch dataloader streams. That whole
path is here.

Parity: ``data/nn/sequence_tokenizer.py:29`` +
``data/nn/parquet/parquet_module.py:19`` (the Spark half).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from replay_spark.data.schema import FeatureHint, FeatureSource
from replay_spark.data.tensor_schema import TensorSchema
from replay_spark.utils.spark_utils import is_timestamp_like

__all__ = [
    "SequenceTokenizer",
    "TensorSequenceTokenizer",
    "SparkSequentialDataset",
]


class SequenceTokenizer:
    """interactions → per-user ordered sequences (+ optional encoding).

    Output schema: ``query_id, item_sequence array<long>,
    timestamp_sequence array<long>[, rating_sequence array<double>]``.
    One shuffle (groupBy user); ``collect_list(struct(ts, ...))`` +
    ``array_sort`` gives time order without a window.
    """

    def __new__(cls, *args, **kwargs):
        # reference-signature compatibility: SequenceTokenizer(tensor_schema,
        # ...) (sequence_tokenizer.py:29) routes to the schema-driven
        # tokenizer; the plain-column signature stays on this class.
        first = args[0] if args else kwargs.get("tensor_schema")
        if isinstance(first, TensorSchema):
            return TensorSequenceTokenizer(*args, **kwargs)
        return super().__new__(cls)

    def __init__(
        self,
        query_column: str = "query_id",
        item_column: str = "item_id",
        timestamp_column: str = "timestamp",
        rating_column: Optional[str] = None,
        encode_items: bool = True,
        max_sequence_length: Optional[int] = None,
    ):
        self.query_column = query_column
        self.item_column = item_column
        self.timestamp_column = timestamp_column
        self.rating_column = rating_column
        self.encode_items = encode_items
        self.max_sequence_length = max_sequence_length
        self.item_encoder = None

    def fit(self, interactions: DataFrame) -> "SequenceTokenizer":
        if self.encode_items:
            from replay_spark.preprocessing import LabelEncodingRule

            self.item_encoder = LabelEncodingRule(self.item_column).fit(
                interactions
            )
        return self

    def transform(self, interactions: DataFrame) -> DataFrame:
        df = interactions
        if self.item_encoder is not None:
            df = self.item_encoder.transform(df)
        struct_cols = [self.timestamp_column, self.item_column]
        if self.rating_column:
            struct_cols.append(self.rating_column)
        grouped = df.groupBy(self.query_column).agg(
            F.array_sort(
                F.collect_list(F.struct(*struct_cols))
            ).alias("_seq")
        )
        out = grouped.select(
            self.query_column,
            F.col(f"_seq.{self.item_column}").alias("item_sequence"),
            F.transform(
                F.col(f"_seq.{self.timestamp_column}"),
                lambda t: F.unix_micros(t.cast("timestamp"))
                if is_timestamp_like(dict(df.dtypes)[self.timestamp_column])
                else t.cast("long"),
            ).alias("timestamp_sequence"),
            *(
                [F.col(f"_seq.{self.rating_column}").alias("rating_sequence")]
                if self.rating_column
                else []
            ),
        )
        if self.max_sequence_length is not None:
            n = self.max_sequence_length
            # keep the LAST n interactions (most recent history)
            out = out.select(
                self.query_column,
                F.slice(
                    "item_sequence",
                    F.greatest(
                        F.lit(1), F.size("item_sequence") - F.lit(n - 1)
                    ),
                    n,
                ).alias("item_sequence"),
                F.slice(
                    "timestamp_sequence",
                    F.greatest(
                        F.lit(1), F.size("timestamp_sequence") - F.lit(n - 1)
                    ),
                    n,
                ).alias("timestamp_sequence"),
                *(
                    [
                        F.slice(
                            "rating_sequence",
                            F.greatest(
                                F.lit(1),
                                F.size("rating_sequence") - F.lit(n - 1),
                            ),
                            n,
                        ).alias("rating_sequence")
                    ]
                    if self.rating_column
                    else []
                ),
            )
        return out

    def fit_transform(self, interactions: DataFrame) -> DataFrame:
        return self.fit(interactions).transform(interactions)

    def save_sequences(self, interactions: DataFrame, path: str) -> None:
        """Materialize sequences as parquet for the torch dataloader."""
        self.transform(interactions).write.mode("overwrite").parquet(path)


class SparkSequentialDataset:
    """Per-query sequences + their tensor schema, Spark-resident.

    The reference's ``SequentialDataset`` (``sequential_dataset.py:18``)
    holds the grouped sequences in driver memory (pandas/polars); this
    one keeps them a DataFrame — set operations (``filter_by_query_id``,
    ``keep_common_query_ids``) are joins, and parquet save/load ships
    the tensor schema as a JSON sidecar. Index-based getters, which the
    reference's torch dataloaders use, collect the (already grouped,
    one-row-per-query) frame to the driver on first use — gate with
    ``allow_collect_to_master`` exactly like the reference tokenizer.
    """

    def __init__(
        self,
        tensor_schema: TensorSchema,
        query_id_column: str,
        item_id_column: str,
        sequences: DataFrame,
        allow_collect_to_master: bool = False,
    ) -> None:
        for name in tensor_schema.names:
            if name not in sequences.columns:
                raise ValueError(f"Tensor feature {name} missing from sequences")
        self._tensor_schema = tensor_schema
        self._query_id_column = query_id_column
        self._item_id_column = item_id_column
        self._sequences = sequences
        self._allow_collect_to_master = allow_collect_to_master
        self._local = None

    # Spark-native surface ---------------------------------------------------
    @property
    def schema(self) -> TensorSchema:
        return self._tensor_schema

    @property
    def sequences(self) -> DataFrame:
        """The grouped sequences frame (one row per query)."""
        return self._sequences

    def __len__(self) -> int:
        return self._sequences.count()

    def get_all_query_ids(self):
        import numpy as np

        return np.array(
            [
                r[0]
                for r in self._sequences.select(self._query_id_column)
                .orderBy(self._query_id_column)
                .collect()
            ]
        )

    def get_max_sequence_length(self) -> int:
        return self._sequences.agg(
            F.max(F.size(self._item_id_column))
        ).first()[0]

    def get_sequence_by_query_id(self, query_id, feature_name: str):
        import numpy as np

        rows = (
            self._sequences.filter(F.col(self._query_id_column) == query_id)
            .select(feature_name)
            .collect()
        )
        if not rows:
            raise KeyError(query_id)
        return np.asarray(rows[0][0])

    def filter_by_query_id(self, query_ids_to_keep) -> "SparkSequentialDataset":
        from replay_spark.utils.spark_utils import local_df

        spark = self._sequences.sparkSession
        # driver-local id frame via pandas: O(rows) partitions instead
        # of defaultParallelism Python slices
        keep = local_df(
            spark,
            [(int(q),) for q in query_ids_to_keep],
            f"{self._query_id_column} long",
        )
        return SparkSequentialDataset(
            self._tensor_schema,
            self._query_id_column,
            self._item_id_column,
            self._sequences.join(
                F.broadcast(keep), on=self._query_id_column, how="left_semi"
            ),
            self._allow_collect_to_master,
        )

    @staticmethod
    def keep_common_query_ids(
        lhs: "SparkSequentialDataset", rhs: "SparkSequentialDataset"
    ) -> tuple["SparkSequentialDataset", "SparkSequentialDataset"]:
        common = lhs.sequences.select(lhs._query_id_column).join(
            rhs.sequences.select(rhs._query_id_column).withColumnRenamed(
                rhs._query_id_column, lhs._query_id_column
            ),
            on=lhs._query_id_column,
        )
        lhs_out = SparkSequentialDataset(
            lhs._tensor_schema,
            lhs._query_id_column,
            lhs._item_id_column,
            lhs.sequences.join(common, on=lhs._query_id_column, how="left_semi"),
            lhs._allow_collect_to_master,
        )
        rhs_out = SparkSequentialDataset(
            rhs._tensor_schema,
            rhs._query_id_column,
            rhs._item_id_column,
            rhs.sequences.join(
                common.withColumnRenamed(lhs._query_id_column, rhs._query_id_column),
                on=rhs._query_id_column,
                how="left_semi",
            ),
            rhs._allow_collect_to_master,
        )
        return lhs_out, rhs_out

    # Driver-side (torch dataloader) surface ----------------------------------
    def _pandas(self):
        if self._local is None:
            if not self._allow_collect_to_master:
                raise RuntimeError(
                    "Index-based access collects the sequences to the "
                    "driver; construct with allow_collect_to_master=True "
                    "to permit it"
                )
            self._local = (
                self._sequences.orderBy(self._query_id_column)
                .toPandas()
                .reset_index(drop=True)
            )
        return self._local

    def get_query_id(self, index: int):
        return self._pandas()[self._query_id_column].iloc[index]

    def get_sequence_length(self, index: int) -> int:
        return len(self._pandas()[self._item_id_column].iloc[index])

    def get_sequence(self, index, feature_name: str):
        import numpy as np

        return np.asarray(self._pandas()[feature_name].iloc[index])

    # Persistence --------------------------------------------------------------
    def save(self, path: str) -> None:
        base = Path(path)
        base.mkdir(parents=True, exist_ok=True)
        self._sequences.write.mode("overwrite").parquet(
            str(base / "sequences.parquet")
        )
        (base / "init_args.json").write_text(
            json.dumps(
                {
                    "tensor_schema": self._tensor_schema.to_dict(),
                    "query_id_column": self._query_id_column,
                    "item_id_column": self._item_id_column,
                    "allow_collect_to_master": self._allow_collect_to_master,
                }
            )
        )

    @classmethod
    def load(
        cls, path: str, spark: Optional[SparkSession] = None
    ) -> "SparkSequentialDataset":
        spark = spark or SparkSession.getActiveSession()
        base = Path(path)
        args = json.loads((base / "init_args.json").read_text())
        return cls(
            TensorSchema.from_dict(args["tensor_schema"]),
            args["query_id_column"],
            args["item_id_column"],
            spark.read.parquet(str(base / "sequences.parquet")),
            args["allow_collect_to_master"],
        )


class TensorSequenceTokenizer:
    """Schema-driven Dataset → SparkSequentialDataset tokenizer.

    The reference ``SequenceTokenizer`` (``sequence_tokenizer.py:29``)
    encodes every categorical feature, groups interactions into
    per-query time-ordered sequences, and emits one array column per
    tensor feature. Its implementation collects the grouped frame to
    the driver (``ensure_pandas``); this one builds every sequence
    column from a single ``collect_list(struct(...))`` + ``array_sort``
    — one shuffle, fully distributed:

    - INTERACTIONS-sourced features ride the sorted struct array;
    - ITEM_FEATURES-sourced features are joined onto interactions
      BEFORE grouping (a broadcast-able dim join), then ride the same
      struct — per-element lookup without any per-row python;
    - QUERY_FEATURES-sourced features are joined after grouping:
      ``array_repeat`` over the item-sequence length if ``is_seq``,
      else a 1-element array (reference semantics).
    """

    def __init__(
        self,
        tensor_schema: TensorSchema,
        handle_unknown_rule: str = "error",
        default_value_rule: Optional[Union[int, str]] = None,
        allow_collect_to_master: bool = False,
    ) -> None:
        from replay_spark.data.dataset_label_encoder import DatasetLabelEncoder

        self._tensor_schema = tensor_schema
        self._allow_collect_to_master = allow_collect_to_master
        self._encoder = DatasetLabelEncoder(
            handle_unknown_rule=handle_unknown_rule,
            default_value_rule=default_value_rule,
        )
        self._check_tensor_schema(tensor_schema)

    @property
    def tensor_schema(self) -> TensorSchema:
        return self._tensor_schema

    @property
    def query_id_encoder(self):
        return self._encoder.query_id_encoder

    @property
    def item_id_encoder(self):
        return self._encoder.item_id_encoder

    @property
    def query_and_item_id_encoder(self):
        return self._encoder.query_and_item_id_encoder

    @staticmethod
    def _check_tensor_schema(schema: TensorSchema) -> None:
        if schema.item_id_feature_name is None:
            raise ValueError("Tensor schema must have an item id feature")
        for feature in schema.all_features:
            if not feature.feature_sources:
                raise ValueError(f"All tensor features must have sources: {feature.name}")
            sources = {s.source for s in feature.feature_sources}
            if not feature.is_seq and sources - {FeatureSource.QUERY_FEATURES}:
                raise ValueError(
                    "Non-sequential features can only be sourced from "
                    f"query features: {feature.name}"
                )

    def fit(self, dataset) -> "TensorSequenceTokenizer":
        self._encoder.fit(dataset)
        self._assign_cardinality(dataset)
        return self

    def _assign_cardinality(self, dataset) -> None:
        for feature in self._tensor_schema.categorical_features.all_features:
            if feature.cardinality is not None:
                continue
            source = feature.feature_source
            rule = self._encoder._encoding_rules.get(source.column)
            if rule is not None and rule.mapping_df is not None:
                feature._set_cardinality(rule.mapping_df.count())

    def transform(
        self, dataset, tensor_features_to_keep: Optional[Sequence[str]] = None
    ) -> SparkSequentialDataset:
        schema = self._tensor_schema
        if tensor_features_to_keep is not None:
            schema = schema.subset(tensor_features_to_keep)
        encoded = self._encoder.transform(dataset)
        fs = dataset.feature_schema
        query_col, item_col = fs.query_id_column, fs.item_id_column
        ts_col = fs.interactions_timestamp_column

        inter = encoded.interactions
        item_sourced = sorted(
            {
                s.column
                for f in schema.all_features
                for s in (f.feature_sources or [])
                if s.source == FeatureSource.ITEM_FEATURES
            }
        )
        if item_sourced:
            inter = inter.join(
                encoded.item_features.select(item_col, *item_sourced),
                on=item_col,
                how="left",
            )

        # one sorted struct array carries every per-interaction column;
        # ts leads the struct so array_sort gives time order (ties
        # broken deterministically by the remaining fields)
        ride_along = sorted(
            {
                s.column
                for f in schema.all_features
                for s in (f.feature_sources or [])
                if s.source in (FeatureSource.INTERACTIONS, FeatureSource.ITEM_FEATURES)
                and s.column != item_col
            }
            - {ts_col}
        )
        struct_cols = ([ts_col] if ts_col else []) + [item_col] + ride_along
        grouped = inter.groupBy(query_col).agg(
            F.array_sort(F.collect_list(F.struct(*struct_cols))).alias("_seq")
        )

        query_sourced = sorted(
            {
                s.column
                for f in schema.all_features
                for s in (f.feature_sources or [])
                if s.source == FeatureSource.QUERY_FEATURES
            }
        )
        if query_sourced:
            grouped = grouped.join(
                encoded.query_features.select(query_col, *query_sourced),
                on=query_col,
                how="left",
            )

        item_seq = F.col(f"_seq.{item_col}")
        columns = [F.col(query_col)]
        for feature in schema.all_features:
            if feature.feature_hint == FeatureHint.QUERY_ID:
                if feature.name != query_col:
                    columns[0] = F.col(query_col).alias(feature.name)
                continue
            source = feature.feature_source
            if source.source == FeatureSource.QUERY_FEATURES:
                if feature.is_seq:
                    col = F.array_repeat(F.col(source.column), F.size(item_seq))
                else:
                    col = F.array(F.col(source.column))
            else:
                col = F.col(f"_seq.{source.column}")
            columns.append(col.alias(feature.name))

        sequences = grouped.select(*columns)
        return SparkSequentialDataset(
            tensor_schema=schema,
            query_id_column=schema.query_id_feature_name or query_col,
            item_id_column=schema.item_id_feature_name,
            sequences=sequences,
            allow_collect_to_master=self._allow_collect_to_master,
        )

    def fit_transform(self, dataset) -> SparkSequentialDataset:
        return self.fit(dataset).transform(dataset)
