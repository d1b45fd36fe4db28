from replay_spark.streaming.ops import (  # noqa: F401
    StreamingSessionizer,
    StreamingUCB,
    streaming_exact_dedup,
)
