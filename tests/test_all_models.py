"""Breadth gate: every model through fit → predict → predict_pairs →
save/load with identical predictions.

Mirrors the reference's ``tests/models/test_all_models.py`` strategy
(SURVEY §5): one loop, every model, full lifecycle.
"""

import pytest

from pyspark.sql import functions as F

from replay_spark.data import (
    Dataset,
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureType,
)
from replay_spark.models import (
    ALSWrap,
    AssociationRulesItemRec,
    ItemKNN,
    KLUCB,
    PopRec,
    QueryPopRec,
    RandomRec,
    SLIM,
    ThompsonSampling,
    UCB,
    Wilson,
    Word2VecRec,
)

SCHEMA = FeatureSchema(
    [
        FeatureInfo("query_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
        FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
        FeatureInfo("timestamp", FeatureType.NUMERICAL, FeatureHint.TIMESTAMP),
        FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
    ]
)

ROWS = [
    (0, 0, 0, 1.0), (0, 1, 1, 0.5), (0, 2, 2, 1.0),
    (1, 0, 0, 1.0), (1, 1, 1, 1.0), (1, 3, 2, 0.5),
    (2, 1, 0, 0.5), (2, 2, 1, 1.0), (2, 3, 2, 1.0),
    (3, 0, 0, 1.0), (3, 3, 1, 1.0),
]


@pytest.fixture(scope="module")
def breadth_dataset(spark):
    df = spark.createDataFrame(
        ROWS, "query_id long, item_id long, timestamp long, rating double"
    )
    return Dataset(SCHEMA, df)


@pytest.fixture(scope="module")
def binary_dataset(spark):
    df = spark.createDataFrame(
        [(q, i, t, float(r >= 1.0)) for q, i, t, r in ROWS],
        "query_id long, item_id long, timestamp long, rating double",
    )
    return Dataset(SCHEMA, df)


# (model, binary_ratings, filter_seen) — QueryPopRec scores only the
# user's own history, so the seen-filter would empty it by design
ALL_MODELS = [
    (PopRec(), False),
    (QueryPopRec(), False),
    (RandomRec(seed=5), False),
    (ItemKNN(num_neighbours=3), False),
    (AssociationRulesItemRec(min_item_count=1, min_pair_count=1), False),
    (SLIM(beta=0.01, lambda_=0.01, seed=3), False),
    (ALSWrap(rank=2, seed=1), False),
    (Word2VecRec(rank=4, min_count=0, seed=1), False),
    (Wilson(), True),
    (UCB(), True),
    (KLUCB(), True),
    (ThompsonSampling(seed=7), True),
]


@pytest.mark.parametrize(
    "model,binary", ALL_MODELS, ids=[type(m).__name__ for m, _ in ALL_MODELS]
)
def test_model_lifecycle(model, binary, breadth_dataset, binary_dataset, tmp_path, spark):
    ds = binary_dataset if binary else breadth_dataset
    filter_seen = not isinstance(model, QueryPopRec)
    recs = model.fit_predict(ds, k=2, filter_seen_items=filter_seen)
    assert recs.columns == ["query_id", "item_id", "rating"]
    n = recs.count()
    assert n > 0
    per_user = recs.groupBy("query_id").count().agg(F.max("count")).first()[0]
    assert per_user <= 2
    # predict_pairs scores exactly the provided pairs
    pairs = recs.select("query_id", "item_id")
    scored = model.predict_pairs(pairs, ds)
    assert scored.count() <= n
    assert set(scored.columns) >= {"query_id", "item_id", "rating"}
    # save / load round-trip reproduces predictions (sampling models
    # are seeded, so even they reproduce)
    path = str(tmp_path / type(model).__name__)
    model.save(path)
    loaded = type(model).load(path, spark)
    recs2 = loaded.predict(ds, k=2, filter_seen_items=filter_seen)
    got1 = sorted((r.query_id, r.item_id) for r in recs.collect())
    got2 = sorted((r.query_id, r.item_id) for r in recs2.collect())
    assert got1 == got2
