from replay_spark.preprocessing.discretizer import (  # noqa: F401
    Discretizer,
    GreedyDiscretizingRule,
    QuantileDiscretizingRule,
)
from replay_spark.preprocessing.embedder import DocumentEmbedder  # noqa: F401
from replay_spark.preprocessing.history_based_fp import (  # noqa: F401
    ConditionalPopularityProcessor,
    HistoryBasedFeaturesProcessor,
    LogStatFeaturesProcessor,
)
from replay_spark.preprocessing.label_encoder import (  # noqa: F401
    LabelEncoder,
    LabelEncodingRule,
    SequenceEncodingRule,
)
from replay_spark.preprocessing.sessionizer import Sessionizer  # noqa: F401
from replay_spark.preprocessing.utils import merge_subsets  # noqa: F401
from replay_spark.preprocessing.filters import (  # noqa: F401
    ConsecutiveDuplicatesFilter,
    EntityDaysFilter,
    GlobalDaysFilter,
    InteractionEntriesFilter,
    LowRatingFilter,
    MinCountFilter,
    NumInteractionsFilter,
    QuantileItemsFilter,
    TimePeriodFilter,
    filter_cold,
)
from replay_spark.preprocessing.bpe import (  # noqa: F401
    BPETokenizer,
    ByteLevelBPETokenizer,
    WordPieceTokenizer,
)
