from replay_spark.ann.search import BruteForceANN, IVFANN, LSHANN  # noqa: F401
from replay_spark.ann.search import PQANN  # noqa: F401
from replay_spark.ann.search import IVFPQANN  # noqa: F401
from replay_spark.ann.hnsw import HNSWANN  # noqa: F401
from replay_spark.ann.kmeans import KMeansClusterer  # noqa: F401
from replay_spark.ann.pca import PCAProjector  # noqa: F401
from replay_spark.ann.quantize import EmbeddingQuantizer  # noqa: F401
from replay_spark.ann.store import load_index, save_index  # noqa: F401
from replay_spark.ann.lake_index import LakeVectorIndex  # noqa: F401
