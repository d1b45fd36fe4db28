"""Time-decay, item-distribution and merge_subsets utilities.

Golden values come from the reference doctests
(``replay/utils/time.py``, worked examples at lines 51-231).
"""

import pytest

from replay_spark.preprocessing import merge_subsets
from replay_spark.utils import (
    get_item_recency,
    item_distribution,
    smoothe_time,
)

DATES = ["2099-03-19", "2099-03-20", "2099-03-22", "2099-03-25", "2099-03-27"]


@pytest.fixture
def decay_log(spark):
    rows = [
        (1, DATES[0], 1.0),
        (1, DATES[1], 1.0),
        (2, DATES[2], 1.0),
        (3, DATES[4], 1.0),
        (3, DATES[3], 1.0),
    ]
    return spark.createDataFrame(
        rows, "item_id int, timestamp string, rating double"
    )


GOLDEN_SMOOTHE = {
    "power": [0.639, 0.6546, 0.6941, 0.7994, 1.0],
    "exp": [0.8312, 0.8507, 0.8909, 0.9548, 1.0],
    "linear": [0.8667, 0.8833, 0.9167, 0.9667, 1.0],
}

GOLDEN_RECENCY = {
    "power": {1: 0.6632, 2: 0.7204, 3: 1.0},
    "exp": {1: 0.8606, 2: 0.9117, 3: 1.0},
    "linear": {1: 0.8917, 2: 0.9333, 3: 1.0},
}


@pytest.mark.parametrize("kind", ["power", "exp", "linear"])
def test_smoothe_time_golden(decay_log, kind):
    out = smoothe_time(decay_log, kind=kind)
    got = [
        round(r.rating, 4)
        for r in out.orderBy("timestamp").collect()
    ]
    assert got == GOLDEN_SMOOTHE[kind]


@pytest.mark.parametrize("kind", ["power", "exp", "linear"])
def test_get_item_recency_golden(decay_log, kind):
    out = get_item_recency(decay_log, kind=kind)
    got = {r.item_id: round(r.rating, 4) for r in out.collect()}
    assert got == GOLDEN_RECENCY[kind]


def test_smoothe_time_scales_rating(spark):
    rows = [(1, DATES[0], 10.0), (2, DATES[1], 3.0), (3, DATES[2], 0.1)]
    df = spark.createDataFrame(rows, "item_id int, timestamp string, rating double")
    got = {
        r.item_id: round(r.rating, 4) for r in smoothe_time(df).collect()
    }
    assert got == {1: 9.3303, 2: 2.8645, 3: 0.1}


def test_smoothe_time_limit_clamp(spark):
    rows = [(1, "2000-01-01", 1.0), (2, "2099-01-01", 1.0)]
    df = spark.createDataFrame(rows, "item_id int, timestamp string, rating double")
    got = {r.item_id: r.rating for r in smoothe_time(df, kind="exp").collect()}
    assert got[1] == pytest.approx(0.1)  # clamped at limit
    assert got[2] == pytest.approx(1.0)


def test_item_distribution(spark):
    log = spark.createDataFrame(
        [(0, 1, 1.0), (1, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)],
        "query_id int, item_id int, rating double",
    )
    recs = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.8), (1, 2, 0.9), (2, 9, 0.5)],
        "query_id int, item_id int, rating double",
    )
    out = {
        r.item_id: (r.user_count, r.rec_count)
        for r in item_distribution(log, recs, k=1).collect()
    }
    # k=1 keeps (0,1), (1,2), (2,9); item 9 unseen in log, item 3 unrecommended
    assert out == {1: (2, 1), 2: (1, 1), 3: (1, 0), 9: (0, 1)}


def test_merge_subsets(spark):
    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([(2, "y")], "id int, v string")
    merged = merge_subsets([a, b])
    assert merged.count() == 2
    # duplicate detection on subset
    c = spark.createDataFrame([(1, "z")], "id int, v string")
    with pytest.raises(ValueError, match="duplicate"):
        merge_subsets([a, c], subset_for_duplicates=["id"])
    dropped = merge_subsets(
        [a, c], subset_for_duplicates=["id"], on_duplicate="drop"
    )
    assert dropped.count() == 1
    ignored = merge_subsets([a, a], on_duplicate="ignore")
    assert ignored.count() == 2
    # column mismatch
    d = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="columns"):
        merge_subsets([a, d])
