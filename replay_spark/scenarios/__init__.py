from replay_spark.scenarios.fallback import Fallback  # noqa: F401
