from replay_spark.ann.search import BruteForceANN, IVFANN, LSHANN  # noqa: F401
