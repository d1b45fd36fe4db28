"""DataframeBucketizer — persist a bucketed table for repeated
co-located joins.

Parity: reference ``utils/dataframe_bucketizer.py:12-100``. Writing
``bucketBy(n, key).sortBy(key)`` once lets every later equi-join on
the key skip its shuffle — the standard pre-shuffle trade for
dimension tables reused across many queries (e.g. the interactions
log joined by every model fit in a tuning loop).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = ["DataframeBucketizer"]


class DataframeBucketizer:
    def __init__(
        self,
        bucketing_key: str,
        partition_num: Optional[int] = None,
        spark_warehouse_dir: Optional[str] = None,
        table_name: Optional[str] = None,
    ):
        self.bucketing_key = bucketing_key
        self.partition_num = partition_num
        self.spark_warehouse_dir = spark_warehouse_dir
        self.table_name = table_name

    def set_table_name(self, table_name: str) -> None:
        self.table_name = table_name

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.table_name:
            raise ValueError("Parameter 'table_name' is not set!")
        spark = SparkSession.getActiveSession()
        partition_num = self.partition_num or spark.sparkContext.defaultParallelism
        (
            df.repartition(partition_num, self.bucketing_key)
            .write.mode("overwrite")
            .bucketBy(partition_num, self.bucketing_key)
            .sortBy(self.bucketing_key)
            .saveAsTable(self.table_name, format="parquet")
        )
        return spark.table(self.table_name)
