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

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SequenceTokenizer"]


class SequenceTokenizer:
    """interactions → per-user ordered sequences (+ optional encoding).

    Output schema: ``query_id, item_sequence array<long>,
    timestamp_sequence array<long>[, rating_sequence array<double>]``.
    One shuffle (groupBy user); ``collect_list(struct(ts, ...))`` +
    ``array_sort`` gives time order without a window.
    """

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
                lambda t: F.unix_micros(t)
                if dict(df.dtypes)[self.timestamp_column] == "timestamp"
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
