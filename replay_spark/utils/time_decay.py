"""Time-decay weighting: recency-weighted ratings and item recency.

Parity: reference ``replay/utils/time.py:10-254`` (``get_item_recency``,
``smoothe_time``). Weight functions (an item with ``age == decay`` days
gets weight 0.5, clamped below at ``limit``):

* ``power``:  ``(age + 1) ^ (ln 0.5 / ln decay)``
* ``exp``:    ``(0.5 ^ (1/decay)) ^ age``
* ``linear``: ``1 - age * 0.5 / decay``

Everything is a scan-level expression plus one global ``max`` — no
shuffle beyond the (optional) per-item aggregate, so the shape is flat
at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from replay_spark.utils.spark_utils import is_timestamp_like

__all__ = ["smoothe_time", "get_item_recency"]

_KINDS = ("power", "exp", "linear")
_DAY_SECS = 86400


def _to_unix_seconds(col, dtype: str):
    if is_timestamp_like(dtype):
        return F.unix_timestamp(col.cast("timestamp"))
    if dtype == "string":
        return F.unix_timestamp(F.to_timestamp(col))
    return col.cast("double")


def smoothe_time(
    log: DataFrame,
    decay: float = 30,
    limit: float = 0.1,
    kind: str = "exp",
    time_column: str = "timestamp",
    rating_column: str = "rating",
) -> DataFrame:
    """Multiply ``rating_column`` by a time-decay weight of the row's
    age (in days, relative to the newest row in ``log``)."""
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {_KINDS}, got {kind!r}")
    dtype = dict(log.dtypes)[time_column]
    log = log.withColumn(
        "_ts_secs", _to_unix_seconds(F.col(time_column), dtype)
    )
    last_date = log.agg(F.max("_ts_secs")).first()[0]
    age = (F.lit(last_date) - F.col("_ts_secs")) / F.lit(_DAY_SECS)
    if kind == "power":
        weight = F.pow(age + 1, F.lit(math.log(0.5) / math.log(decay)))
    elif kind == "exp":
        weight = F.pow(F.lit(math.exp(math.log(0.5) / decay)), age)
    else:  # linear
        weight = F.lit(1.0) - F.lit(0.5 / decay) * age
    weight = F.greatest(weight, F.lit(float(limit)))
    return log.withColumn(
        rating_column, F.col(rating_column) * weight
    ).drop("_ts_secs")


def get_item_recency(
    log: DataFrame,
    decay: float = 30,
    limit: float = 0.1,
    kind: str = "exp",
    item_column: str = "item_id",
    time_column: str = "timestamp",
    rating_column: str = "rating",
) -> DataFrame:
    """Per-item recency weight: the mean interaction time of each item
    (as unix seconds) pushed through the time-decay weight. Ratings in
    ``log`` are ignored — only item age matters (reference contract)."""
    dtype = dict(log.dtypes)[time_column]
    items = (
        log.select(
            item_column,
            _to_unix_seconds(F.col(time_column), dtype).alias(time_column),
        )
        .groupBy(item_column)
        .agg(F.mean(time_column).alias(time_column))
        .withColumn(rating_column, F.lit(1.0))
    )
    return smoothe_time(
        items,
        decay=decay,
        limit=limit,
        kind=kind,
        time_column=time_column,
        rating_column=rating_column,
    )
