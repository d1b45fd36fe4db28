"""Label encoding: dense 0..n-1 codes for categorical columns.

Rebuild of reference ``replay/preprocessing/label_encoder.py`` with
the key scale fix flagged in SURVEY §4: the fitted mapping stays a
DataFrame joined at transform time — the reference pulls it to the
driver with ``rdd.collectAsMap`` (``label_encoder.py:185``), which
dies at 10^9 distinct ids; a broadcast-or-shuffle join does not.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["LabelEncodingRule", "SequenceEncodingRule", "LabelEncoder"]

_HANDLE_UNKNOWN = ("error", "use_default_value", "drop")


class LabelEncodingRule:
    """Encode one column to dense codes 0..n-1.

    Fit: ``distinct`` + ``row_number().over(Window.orderBy(col)) - 1``
    (reference ``label_encoder.py:172-185``). ``partial_fit`` appends
    codes for unseen values after the current max.
    """

    def __init__(
        self,
        column: str,
        mapping: Optional[dict] = None,
        handle_unknown: str = "error",
        default_value: Optional[int] = None,
    ):
        if handle_unknown not in _HANDLE_UNKNOWN:
            raise ValueError(f"handle_unknown must be one of {_HANDLE_UNKNOWN}")
        self.column = column
        self.handle_unknown = handle_unknown
        self.default_value = default_value
        self._mapping_df: Optional[DataFrame] = None
        if mapping is not None:
            spark = SparkSession.getActiveSession()
            self._mapping_df = spark.createDataFrame(
                [(k, v) for k, v in mapping.items()],
                schema=f"{column} string, {self.encoded_column} long",
            )
        self._is_fitted = mapping is not None

    @property
    def encoded_column(self) -> str:
        return f"{self.column}_encoded"

    @property
    def mapping_df(self) -> Optional[DataFrame]:
        return self._mapping_df

    def get_mapping(self) -> dict:
        """Pull the mapping to the driver (small-cardinality use only)."""
        return {
            row[self.column]: row[self.encoded_column]
            for row in self._mapping_df.collect()
        }

    def fit(self, df: DataFrame) -> "LabelEncodingRule":
        self._mapping_df = (
            df.select(self.column)
            .distinct()
            .withColumn(
                self.encoded_column,
                F.row_number().over(Window.orderBy(self.column)).cast("long") - 1,
            )
        )
        self._mapping_df.cache().count()
        self._is_fitted = True
        return self

    def partial_fit(self, df: DataFrame) -> "LabelEncodingRule":
        if not self._is_fitted:
            return self.fit(df)
        max_code = self._mapping_df.agg(F.max(self.encoded_column)).first()[0]
        new_values = (
            df.select(self.column)
            .distinct()
            .join(self._mapping_df.select(self.column), on=self.column, how="left_anti")
            .withColumn(
                self.encoded_column,
                F.row_number().over(Window.orderBy(self.column)).cast("long")
                + F.lit(max_code),
            )
        )
        self._mapping_df = self._mapping_df.unionByName(new_values)
        self._mapping_df.cache().count()
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not self._is_fitted:
            raise RuntimeError("LabelEncodingRule is not fitted")
        joined = df.join(self._mapping_df, on=self.column, how="left")
        unknown = joined.filter(F.col(self.encoded_column).isNull())
        if self.handle_unknown == "error":
            if unknown.limit(1).count() > 0:
                raise ValueError(
                    f"Found unknown values in column {self.column} during transform"
                )
        elif self.handle_unknown == "drop":
            joined = joined.filter(F.col(self.encoded_column).isNotNull())
        else:  # use_default_value
            default = -1 if self.default_value is None else self.default_value
            joined = joined.fillna({self.encoded_column: default})
        return joined.drop(self.column).withColumnRenamed(
            self.encoded_column, self.column
        )

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        if not self._is_fitted:
            raise RuntimeError("LabelEncodingRule is not fitted")
        mapping = self._mapping_df.withColumnRenamed(self.column, "_decoded")
        return (
            df.withColumnRenamed(self.column, self.encoded_column)
            .join(mapping, on=self.encoded_column, how="left")
            .drop(self.encoded_column)
            .withColumnRenamed("_decoded", self.column)
        )

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)


class SequenceEncodingRule(LabelEncodingRule):
    """Label encoding for array columns: explode → encode → re-collect.

    Uses a deterministic per-row id so the arrays re-assemble in the
    original element order. Parity: reference ``label_encoder.py:568``.
    """

    def fit(self, df: DataFrame) -> "SequenceEncodingRule":
        flat = df.select(F.explode(self.column).alias(self.column))
        return super().fit(flat)

    def partial_fit(self, df: DataFrame) -> "SequenceEncodingRule":
        flat = df.select(F.explode(self.column).alias(self.column))
        return super().partial_fit(flat)

    def transform(self, df: DataFrame) -> DataFrame:
        if not self._is_fitted:
            raise RuntimeError("SequenceEncodingRule is not fitted")
        other_cols = [c for c in df.columns if c != self.column]
        with_id = df.withColumn("_row_id", F.monotonically_increasing_id())
        exploded = with_id.select(
            "_row_id", F.posexplode(self.column).alias("_pos", self.column)
        )
        encoded = exploded.join(self._mapping_df, on=self.column, how="left")
        if self.handle_unknown == "error":
            if encoded.filter(F.col(self.encoded_column).isNull()).limit(1).count() > 0:
                raise ValueError(
                    f"Found unknown values in column {self.column} during transform"
                )
        elif self.handle_unknown == "drop":
            encoded = encoded.filter(F.col(self.encoded_column).isNotNull())
        else:
            default = -1 if self.default_value is None else self.default_value
            encoded = encoded.fillna({self.encoded_column: default})
        reassembled = encoded.groupBy("_row_id").agg(
            F.array_sort(
                F.collect_list(F.struct("_pos", self.encoded_column))
            )[self.encoded_column].alias(self.column)
        )
        return (
            with_id.drop(self.column)
            .join(reassembled, on="_row_id", how="left")
            .select(*other_cols, self.column)
        )


class LabelEncoder:
    """Apply several encoding rules; save/load mappings.

    Parity: reference ``label_encoder.py:794``.
    """

    def __init__(self, rules: Sequence[LabelEncodingRule]):
        self.rules = list(rules)

    def fit(self, df: DataFrame) -> "LabelEncoder":
        for rule in self.rules:
            rule.fit(df)
        return self

    def partial_fit(self, df: DataFrame) -> "LabelEncoder":
        for rule in self.rules:
            rule.partial_fit(df)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        for rule in self.rules:
            df = rule.transform(df)
        return df

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        for rule in self.rules:
            df = rule.inverse_transform(df)
        return df

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)

    def save(self, path: str) -> None:
        base = Path(path)
        base.mkdir(parents=True, exist_ok=True)
        meta = []
        for i, rule in enumerate(self.rules):
            rule._mapping_df.write.mode("overwrite").parquet(
                str(base / f"mapping_{i}.parquet")
            )
            meta.append(
                {
                    "column": rule.column,
                    "handle_unknown": rule.handle_unknown,
                    "default_value": rule.default_value,
                    "type": type(rule).__name__,
                }
            )
        (base / "rules.json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, path: str, spark: Optional[SparkSession] = None) -> "LabelEncoder":
        spark = spark or SparkSession.getActiveSession()
        base = Path(path)
        meta = json.loads((base / "rules.json").read_text())
        rules = []
        for i, entry in enumerate(meta):
            rule_cls = (
                SequenceEncodingRule
                if entry["type"] == "SequenceEncodingRule"
                else LabelEncodingRule
            )
            rule = rule_cls(
                entry["column"],
                handle_unknown=entry["handle_unknown"],
                default_value=entry["default_value"],
            )
            rule._mapping_df = spark.read.parquet(str(base / f"mapping_{i}.parquet"))
            rule._is_fitted = True
            rules.append(rule)
        return cls(rules)
