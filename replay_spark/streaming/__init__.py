from replay_spark.streaming.ops import (  # noqa: F401
    StreamingSessionizer,
    StreamingStatefulSessionizer,
    StreamingUCB,
    streaming_exact_dedup,
)
