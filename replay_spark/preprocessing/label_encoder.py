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
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["LabelEncodingRule", "SequenceEncodingRule", "LabelEncoder"]

_HANDLE_UNKNOWN = ("error", "use_default_value", "drop")


def _dense_ordered_codes(
    distinct_df: DataFrame, column: str, encoded_column: str, offset: int = 0
) -> DataFrame:
    """Dense codes ``offset..offset+n-1`` in ascending ``column`` order
    WITHOUT a single-task global sort. Returns a MATERIALIZED
    (cached) mapping DataFrame.

    Two-phase numbering (the ``zipWithIndex`` pattern):
    range-partition by the value (contiguous, ordered ranges), number
    rows within each partition, then add per-partition offsets. The
    offsets come from an O(#partitions) driver-side cumsum of the
    per-partition counts — bounded by ``spark.sql.shuffle.partitions``,
    not by the data — broadcast back as a tiny join table, so the plan
    has no single-partition exchange at any cardinality.
    """
    spark = distinct_df.sparkSession
    numbered = (
        distinct_df.repartitionByRange(F.col(column))
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local",
            F.row_number()
            .over(Window.partitionBy("_pid").orderBy(column))
            .cast("long")
            - 1,
        )
        .persist()
    )
    counts = sorted(
        (r["_pid"], r["count"])
        for r in numbered.groupBy("_pid").count().collect()
    )
    rows, acc = [], int(offset)
    for pid, cnt in counts:
        rows.append((pid, acc))
        acc += cnt
    from replay_spark.utils.spark_utils import local_df

    offsets = local_df(spark, rows, "_pid int, _offset long")
    out = numbered.join(F.broadcast(offsets), on="_pid").select(
        column,
        (F.col("_local") + F.col("_offset")).alias(encoded_column),
    )
    out = out.cache()
    out.count()
    numbered.unpersist()
    return out


class LabelEncodingRule:
    """Encode one column to dense codes 0..n-1.

    Same mapping as the reference's ``distinct`` +
    ``row_number().over(Window.orderBy(col)) - 1``
    (``label_encoder.py:172-185``) but numbered with the two-phase
    range-partition scheme — no single-task global sort.
    ``partial_fit`` appends codes for unseen values after the
    current max.
    """

    def __init__(
        self,
        column: str,
        mapping: Optional[dict] = None,
        handle_unknown: str = "error",
        default_value: Optional[Union[int, str]] = None,
    ):
        if handle_unknown not in _HANDLE_UNKNOWN:
            raise ValueError(f"handle_unknown must be one of {_HANDLE_UNKNOWN}")
        self._validate_default(default_value)
        self.column = column
        self.handle_unknown = handle_unknown
        self.default_value = default_value
        self._mapping_df: Optional[DataFrame] = None
        if mapping is not None:
            from replay_spark.utils.spark_utils import local_df

            spark = SparkSession.getActiveSession()
            # driver-local mapping frame via pandas: O(rows) partitions
            # instead of defaultParallelism Python slices per action
            self._mapping_df = local_df(
                spark,
                [(k, v) for k, v in mapping.items()],
                f"{column} string, {self.encoded_column} long",
            )
        self._is_fitted = mapping is not None

    @staticmethod
    def _validate_default(value) -> None:
        """Reference semantics (label_encoder.py:86-120): an int code,
        None (unknowns stay null), or the sentinel "last" (= mapping
        size, the next unassigned code)."""
        if value is not None and not isinstance(value, int) and value != "last":
            raise ValueError(
                f'default_value must be int, None or "last", got {value!r}'
            )

    def _default_code(self) -> Optional[int]:
        """Resolve default_value to a concrete code (None = keep null)."""
        if self.default_value is None:
            return None
        if self.default_value == "last":
            return self._mapping_df.count()
        return int(self.default_value)

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
        self._mapping_df = _dense_ordered_codes(
            df.select(self.column).distinct(), self.column, self.encoded_column
        )
        self._is_fitted = True
        return self

    def partial_fit(self, df: DataFrame) -> "LabelEncodingRule":
        if not self._is_fitted:
            return self.fit(df)
        old = self._mapping_df
        max_code = old.agg(F.max(self.encoded_column)).first()[0]
        new_values = _dense_ordered_codes(
            df.select(self.column)
            .distinct()
            .join(old.select(self.column), on=self.column, how="left_anti"),
            self.column,
            self.encoded_column,
            offset=max_code + 1,
        )
        merged = old.unionByName(new_values).cache()
        merged.count()
        old.unpersist()
        new_values.unpersist()
        self._mapping_df = merged
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
            default = self._default_code()
            if default is not None:
                joined = joined.fillna({self.encoded_column: default})
            # default None: unknowns stay null (reference parity)
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

    def set_handle_unknown(self, strategy: str) -> None:
        if strategy not in _HANDLE_UNKNOWN:
            raise ValueError(f"handle_unknown must be one of {_HANDLE_UNKNOWN}")
        self.handle_unknown = strategy

    def set_default_value(self, value) -> None:
        self._validate_default(value)
        self.default_value = value

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)


class SequenceEncodingRule(LabelEncodingRule):
    """Label encoding for array columns: explode → encode → re-collect.

    Single-branch plan: ``posexplode_outer`` keeps empty/null-array
    rows alive (they re-assemble as a typed empty array, matching the
    reference's explicit empty-array preservation), and the other
    columns travel through the explode so the per-row id is evaluated
    exactly once — no self-join that could mis-associate rows of a
    nondeterministic input. Under ``handle_unknown='drop'`` unknown
    ELEMENTS are dropped from the re-collected array; the row itself
    survives (with a shorter, possibly empty, array).
    Parity: reference ``label_encoder.py:568``.
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
        code = self.encoded_column
        exploded = df.withColumn(
            "_row_id", F.monotonically_increasing_id()
        ).select(
            *other_cols,
            "_row_id",
            F.posexplode_outer(self.column).alias("_pos", self.column),
        )
        encoded = exploded.join(self._mapping_df, on=self.column, how="left")
        known = F.col("_pos").isNotNull() & F.col(code).isNotNull()
        unknown = F.col("_pos").isNotNull() & F.col(code).isNull()
        if self.handle_unknown == "error":
            if encoded.filter(unknown).limit(1).count() > 0:
                raise ValueError(
                    f"Found unknown values in column {self.column} during transform"
                )
        elif self.handle_unknown == "drop":
            encoded = encoded.filter(F.col("_pos").isNull() | ~unknown)
        else:
            default = self._default_code()
            if default is not None:
                encoded = encoded.withColumn(
                    code,
                    F.when(unknown, F.lit(default)).otherwise(F.col(code)),
                )
            # default None leaves unknown elements null in the array
            known = F.col("_pos").isNotNull()
        reassembled = encoded.groupBy("_row_id").agg(
            *[F.first(c).alias(c) for c in other_cols],
            F.array_sort(
                F.collect_list(F.when(known, F.struct("_pos", code)))
            )[code].alias(self.column),
        )
        return reassembled.select(
            *other_cols,
            F.coalesce(
                self.column, F.array().cast("array<long>")
            ).alias(self.column),
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

    def _rules_by_column(self) -> dict:
        return {rule.column: rule for rule in self.rules}

    def set_handle_unknowns(self, strategies: dict) -> None:
        """Per-column post-fit strategy switch (reference
        ``label_encoder.py:set_handle_unknowns``)."""
        rules = self._rules_by_column()
        for column, strategy in strategies.items():
            if column not in rules:
                raise ValueError(f"No rule for column {column}")
            rules[column].set_handle_unknown(strategy)

    def set_default_values(self, defaults: dict) -> None:
        """Per-column post-fit default codes: int, None (keep null) or
        "last" (= mapping size)."""
        rules = self._rules_by_column()
        for column, value in defaults.items():
            if column not in rules:
                raise ValueError(f"No rule for column {column}")
            rules[column].set_default_value(value)

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
