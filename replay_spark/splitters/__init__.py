from replay_spark.splitters.base import Splitter  # noqa: F401
from replay_spark.splitters.splitters import (  # noqa: F401
    ColdUserRandomSplitter,
    KFolds,
    LastNSplitter,
    NewUsersSplitter,
    RandomNextNSplitter,
    RandomSplitter,
    RatioSplitter,
    TimeSplitter,
    TwoStageSplitter,
)
