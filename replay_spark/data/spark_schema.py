"""Canonical Spark StructType for interaction logs.

Parity: reference ``replay/data/spark_schema.py:7-34``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["get_schema"]


def get_schema(
    query_column: str = "query_id",
    item_column: str = "item_id",
    timestamp_column: str = "timestamp",
    rating_column: str = "rating",
    has_timestamp: bool = True,
    has_rating: bool = True,
) -> StructType:
    """Interaction-log schema: ids int, timestamp, double rating."""
    fields = [
        StructField(query_column, IntegerType()),
        StructField(item_column, IntegerType()),
    ]
    if has_timestamp:
        fields.append(StructField(timestamp_column, TimestampType()))
    if has_rating:
        fields.append(StructField(rating_column, DoubleType()))
    return StructType(fields)
