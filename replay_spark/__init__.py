"""replay_spark — a PySpark-native recommender/analytics engine.

A from-scratch, Spark-only rebuild of the capabilities of
sb-ai-lab/RePlay (reference snapshot at /root/reference/): dataset
model, preprocessing, splitters, recommendation models, metrics —
plus large-scale training-data-pipeline operators (dedup, text
analysis, similarity search).

Everything is expressed as lazy Spark DataFrame plans so Catalyst
performs pushdown/pruning/join-planning; Python/pandas UDFs are used
only where built-in operators cannot express the semantics.
"""

__version__ = "0.1.0"

from replay_spark.session import get_spark_session  # noqa: F401
