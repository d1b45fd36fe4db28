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

import sys as _sys


def _register_pickle_by_value() -> None:
    """Serialize replay_spark functions by VALUE into Spark closures.

    Executor Python workers do not necessarily have this package on
    their import path (e.g. when the driver added it via
    ``sys.path.insert``). Registering the package with cloudpickle
    makes any function referenced from a UDF closure travel inside
    the pickle instead of by module reference.
    """
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(_sys.modules[__name__])
    except Exception:  # pragma: no cover - older cloudpickle
        pass


_register_pickle_by_value()

from replay_spark.session import get_spark_session  # noqa: F401,E402
