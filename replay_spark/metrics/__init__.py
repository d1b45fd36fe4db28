from replay_spark.metrics.descriptors import (  # noqa: F401
    ConfidenceInterval,
    Mean,
    Median,
    PerUser,
)
from replay_spark.metrics.metrics import (  # noqa: F401
    MAP,
    MRR,
    NDCG,
    CategoricalDiversity,
    Coverage,
    HitRate,
    Novelty,
    Precision,
    Recall,
    RocAuc,
    Surprisal,
    Unexpectedness,
)
from replay_spark.metrics.experiment import Experiment, OfflineMetrics  # noqa: F401
from replay_spark.metrics.sampled import SampledRankingEvaluator  # noqa: F401
