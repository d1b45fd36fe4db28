"""Item popularity-bias diagnostic.

Parity: reference ``replay/utils/distributions.py:11-33``
(``item_distribution``), except the result stays a (small: one row
per item appearing in log or recs) Spark DataFrame instead of being
pulled to pandas — call ``.toPandas()`` for plotting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from replay_spark.utils.spark_utils import get_top_k_recs

__all__ = ["item_distribution"]


def item_distribution(
    log: DataFrame,
    recommendations: DataFrame,
    k: int,
    query_column: str = "query_id",
    item_column: str = "item_id",
    rating_column: str = "rating",
) -> DataFrame:
    """Distinct-user counts per item in the log vs in the top-k recs
    (full outer join, zero-filled) — the standard popularity-bias
    table, ordered by (user_count, item)."""
    log_counts = log.groupBy(item_column).agg(
        F.countDistinct(query_column).alias("user_count")
    )
    rec_counts = (
        get_top_k_recs(
            recommendations,
            k,
            query_column=query_column,
            rating_column=rating_column,
            item_column=item_column,
        )
        .groupBy(item_column)
        .agg(F.countDistinct(query_column).alias("rec_count"))
    )
    return (
        log_counts.join(rec_counts, on=item_column, how="outer")
        .fillna(0)
        .orderBy("user_count", item_column)
    )
