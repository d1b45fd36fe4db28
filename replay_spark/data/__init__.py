from replay_spark.data.schema import (  # noqa: F401
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_spark.data.dataset import Dataset  # noqa: F401
from replay_spark.data.dataset_label_encoder import (  # noqa: F401
    DatasetLabelEncoder,
    LabelEncoderTransformWarning,
)
from replay_spark.data.spark_schema import get_schema  # noqa: F401
from replay_spark.data.tensor_schema import (  # noqa: F401
    TensorFeatureInfo,
    TensorFeatureSource,
    TensorSchema,
)
