from replay_spark.streaming.cdf import LakeChangeStream  # noqa: F401
from replay_spark.streaming.lakefeed import (  # noqa: F401
    LakeFeedDataSource,
    register_lakefeed,
)
from replay_spark.streaming.ops import (  # noqa: F401
    StreamingIntervalJoiner,
    StreamingSessionizer,
    StreamingSourceCapFilter,
    StreamingStatefulSessionizer,
    StreamingCountMinSketch,
    StreamingDriftMonitor,
    StreamingHdrQuantiles,
    StreamingHyperLogLog,
    StreamingUCB,
    StreamingWindowedAggregator,
    streaming_exact_dedup,
)
