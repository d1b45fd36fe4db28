from replay_spark.utils.spark_utils import (  # noqa: F401
    cosine_similarity_expr,
    fallback,
    filter_cold,
    get_log_info,
    get_stats,
    get_top_k,
    get_top_k_recs,
    get_unique_entities,
    horizontal_explode,
    join_or_return,
    process_timestamp_column,
    kth_smallest,
    stable_round,
    vector_dot_expr,
    vector_euclidean_similarity_expr,
)
from replay_spark.utils.distributions import item_distribution  # noqa: F401
from replay_spark.utils.time_decay import (  # noqa: F401
    get_item_recency,
    smoothe_time,
)
from replay_spark.utils.common import (  # noqa: F401
    load_from_replay,
    save_to_replay,
)
