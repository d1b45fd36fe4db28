from replay_spark.models.base import BaseRecommender, NonPersonalizedRecommender  # noqa: F401
from replay_spark.models.pop_rec import PopRec, QueryPopRec  # noqa: F401
from replay_spark.models.bandits import KLUCB, UCB, ThompsonSampling, Wilson  # noqa: F401
from replay_spark.models.random_rec import RandomRec  # noqa: F401
from replay_spark.models.knn import ItemKNN, NeighbourRec  # noqa: F401
from replay_spark.models.association_rules import AssociationRulesItemRec  # noqa: F401
from replay_spark.models.als import ALSWrap, ClusterRec  # noqa: F401
from replay_spark.models.word2vec import Word2VecRec  # noqa: F401
from replay_spark.models.slim import SLIM  # noqa: F401
from replay_spark.models.cat_pop_rec import CatPopRec  # noqa: F401
from replay_spark.models.markov_rec import MarkovRec  # noqa: F401
from replay_spark.models.lin_ucb import LinUCB  # noqa: F401
