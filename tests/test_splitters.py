import datetime as dt

import pytest

from replay_spark.splitters import (
    ColdUserRandomSplitter,
    KFolds,
    LastNSplitter,
    NewUsersSplitter,
    RandomNextNSplitter,
    RandomSplitter,
    RatioSplitter,
    TimeSplitter,
    TwoStageSplitter,
)


@pytest.fixture(scope="module")
def log(spark):
    # 3 users x 5 interactions, daily timestamps (reference last_n_splitter doctest)
    rows = []
    for u in range(3):
        for i in range(5):
            rows.append((u, i, dt.datetime(2020, 1, 1 + i), 1.0))
    return spark.createDataFrame(
        rows, "query_id int, item_id int, timestamp timestamp, rating double"
    )


def test_ratio_splitter(log):
    train, test = RatioSplitter(test_size=0.4).split(log)
    # 5 rows per user, test = last 2 (frac > 0.6)
    assert train.count() == 9
    assert test.count() == 6
    assert test.filter("item_id < 3").count() == 0


def test_ratio_splitter_by_size(log):
    train, test = RatioSplitter(test_size=0.4, split_by_fractions=False).split(log)
    assert train.count() == 9
    assert test.count() == 6


def test_time_splitter_absolute_and_fraction(log):
    train, test = TimeSplitter(dt.datetime(2020, 1, 4)).split(log)
    assert train.count() == 9 and test.count() == 6
    train, test = TimeSplitter(0.4).split(log)
    # 15 rows; cut index int(15*0.6)+1=10th row by ts → last 2 days to test
    assert test.count() == 6 and train.count() == 9


def test_last_n_splitter(log):
    train, test = LastNSplitter(N=2).split(log)
    assert train.count() == 9
    assert test.count() == 6
    assert test.filter("item_id < 3").count() == 0


def test_last_n_timedelta(log):
    # last 2 days = 86400*1 + 1 seconds window
    train, test = LastNSplitter(N=86401, strategy="timedelta").split(log)
    assert test.count() == 6


def test_random_splitter(log):
    train, test = RandomSplitter(test_size=0.4, seed=42).split(log)
    assert train.count() + test.count() == 15


def test_cold_user_random_splitter(log):
    train, test = ColdUserRandomSplitter(test_size=0.34, seed=42).split(log)
    train_users = {r.query_id for r in train.select("query_id").distinct().collect()}
    test_users = {r.query_id for r in test.select("query_id").distinct().collect()}
    assert train_users.isdisjoint(test_users)
    assert train_users | test_users == {0, 1, 2}


def test_new_users_splitter(spark):
    rows = [
        (0, 0, dt.datetime(2020, 1, 1), 1.0),
        (0, 1, dt.datetime(2020, 1, 5), 1.0),
        (1, 0, dt.datetime(2020, 1, 2), 1.0),
        (2, 0, dt.datetime(2020, 1, 6), 1.0),  # new user
        (2, 1, dt.datetime(2020, 1, 7), 1.0),
    ]
    log = spark.createDataFrame(
        rows, "query_id int, item_id int, timestamp timestamp, rating double"
    )
    train, test = NewUsersSplitter(test_size=0.34).split(log)
    # cumulative-user cut: ceil(3*0.34)=2 newest users (by first interaction)
    test_users = {r.query_id for r in test.select("query_id").distinct().collect()}
    assert test_users == {1, 2}
    # train is strictly before the cut date (u1's start, Jan 2)
    assert train.count() == 1


def test_random_next_n_splitter(log):
    train, test = RandomNextNSplitter(N=1, seed=7).split(log)
    # each user has exactly one test row (cut + 1 row, rest after cut dropped)
    per_user = test.groupBy("query_id").count().collect()
    assert all(r["count"] == 1 for r in per_user)
    assert len(per_user) == 3


def test_two_stage_splitter(log):
    train, test = TwoStageSplitter(
        first_divide_size=1, second_divide_size=2, seed=42
    ).split(log)
    test_users = {r.query_id for r in test.select("query_id").distinct().collect()}
    assert len(test_users) == 1
    assert test.count() == 2
    assert train.count() == 13


def test_kfolds(log):
    folds = list(KFolds(n_folds=5, seed=42).split(log))
    assert len(folds) == 5
    total_test = sum(t.count() for _, t in folds)
    assert total_test == 15  # every row lands in exactly one fold's test


def test_ratio_splitter_precision_golden(spark):
    """Golden for the reference's 3-decimal rounding
    (ratio_splitter.py:158,239): one 1499-row user, test_size=0.333.

    threshold = round(1-0.333, 3) = 0.667; a row is test when
    round(row_num/1499, 3) > 0.667, i.e. row_num >= 1001 -> 499 test
    rows. WITHOUT the rounding the boundary would be
    row_num/1499 > 0.667 -> row_num >= 1000 -> 500 test rows, so this
    pins the _precision=3 parity exactly.
    """
    rows = [(1, i, dt.datetime(2024, 1, 1, 0, 0, i % 60, i), 1.0) for i in range(1499)]
    df = spark.createDataFrame(
        rows, "query_id int, item_id int, timestamp timestamp, rating double"
    )
    train, test = RatioSplitter(test_size=0.333).split(df)
    assert test.count() == 499
    assert train.count() == 1000
