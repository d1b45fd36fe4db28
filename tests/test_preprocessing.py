import pytest

from replay_spark.preprocessing import (
    Discretizer,
    GreedyDiscretizingRule,
    LabelEncoder,
    LabelEncodingRule,
    LogStatFeaturesProcessor,
    QuantileDiscretizingRule,
    SequenceEncodingRule,
    Sessionizer,
)


def test_label_encoder_roundtrip(spark):
    df = spark.createDataFrame(
        [("a",), ("c",), ("b",), ("a",)], "item_id string"
    )
    rule = LabelEncodingRule("item_id")
    out = rule.fit_transform(df)
    vals = [r.item_id for r in out.collect()]
    assert sorted(set(vals)) == [0, 1, 2]
    mapping = rule.get_mapping()
    assert mapping == {"a": 0, "b": 1, "c": 2}
    back = rule.inverse_transform(out)
    assert sorted(r.item_id for r in back.collect()) == ["a", "a", "b", "c"]


def test_label_encoder_partial_fit(spark):
    df1 = spark.createDataFrame([("a",), ("b",)], "item_id string")
    df2 = spark.createDataFrame([("c",), ("a",)], "item_id string")
    rule = LabelEncodingRule("item_id").fit(df1)
    rule.partial_fit(df2)
    assert rule.get_mapping() == {"a": 0, "b": 1, "c": 2}


def test_label_encoder_unknown_policies(spark):
    train = spark.createDataFrame([("a",), ("b",)], "item_id string")
    test = spark.createDataFrame([("a",), ("z",)], "item_id string")
    with pytest.raises(ValueError):
        LabelEncodingRule("item_id").fit(train).transform(test)
    dropped = (
        LabelEncodingRule("item_id", handle_unknown="drop").fit(train).transform(test)
    )
    assert dropped.count() == 1
    filled = (
        LabelEncodingRule("item_id", handle_unknown="use_default_value", default_value=-1)
        .fit(train)
        .transform(test)
    )
    assert sorted(r.item_id for r in filled.collect()) == [-1, 0]


def test_sequence_encoder(spark):
    df = spark.createDataFrame([(["a", "b"],), (["b", "c"],)], "items array<string>")
    rule = SequenceEncodingRule("items")
    out = rule.fit_transform(df)
    rows = sorted(r.items for r in out.collect())
    assert rows == [[0, 1], [1, 2]]


def test_label_encoder_save_load(tmp_path, spark):
    df = spark.createDataFrame([("x",), ("y",)], "item_id string")
    enc = LabelEncoder([LabelEncodingRule("item_id")]).fit(df)
    enc.save(str(tmp_path / "enc"))
    loaded = LabelEncoder.load(str(tmp_path / "enc"), spark)
    out = loaded.transform(df)
    assert sorted(r.item_id for r in out.collect()) == [0, 1]


def test_sessionizer_golden(spark):
    """Reference doctest (sessionizer.py:19-48): session_gap=5 over the
    10-row fixture yields session ids [2,2,2,5,5,5,9,8,9,9]."""
    rows = [
        (1, 1, 1), (1, 2, 2), (1, 3, 3),
        (2, 1, 1), (2, 2, 2), (2, 3, 3),
        (3, 1, 1), (3, 2, 10), (3, 3, 3),
        (3, 4, 2),
    ]
    df = spark.createDataFrame(rows, "user_id int, item_id int, timestamp long")
    out = Sessionizer(session_gap=5, session_id_mode="reference").transform(df)
    got = {
        (r.user_id, r.item_id): r.session_id
        for r in out.collect()
    }
    expected = {
        (1, 1): 2, (1, 2): 2, (1, 3): 2,
        (2, 1): 5, (2, 2): 5, (2, 3): 5,
        (3, 1): 9, (3, 2): 8, (3, 3): 9, (3, 4): 9,
    }
    assert got == expected


def test_sessionizer_composite_default(spark):
    """Default mode: '{user}_{ordinal}' ids, no global window; same
    grouping as the reference arithmetic."""
    rows = [
        (1, 1, 1), (1, 2, 2), (1, 3, 3),
        (3, 1, 1), (3, 2, 10), (3, 3, 3),
        (3, 4, 2),
    ]
    df = spark.createDataFrame(rows, "user_id int, item_id int, timestamp long")
    out = Sessionizer(session_gap=5, tiebreak_columns=["item_id"]).transform(df)
    got = {(r.user_id, r.item_id): r.session_id for r in out.collect()}
    assert got == {
        (1, 1): "1_1", (1, 2): "1_1", (1, 3): "1_1",
        (3, 1): "3_1", (3, 4): "3_1", (3, 3): "3_1", (3, 2): "3_2",
    }


def test_sessionizer_tiebreak_total_order(spark):
    """Duplicate (user, ts) rows: item tiebreak keeps the tied rows in
    the boundary row's session, deterministically."""
    rows = [(1, 5, 0), (1, 2, 100), (1, 1, 100), (1, 9, 100)]
    df = spark.createDataFrame(rows, "user_id int, item_id int, timestamp long")
    out = Sessionizer(session_gap=50, tiebreak_columns=["item_id"]).transform(df)
    got = {(r.user_id, r.item_id): r.session_id for r in out.collect()}
    assert got == {
        (1, 5): "1_1", (1, 1): "1_2", (1, 2): "1_2", (1, 9): "1_2",
    }


def test_sessionizer_filters(spark):
    rows = [
        (1, 1, 1), (1, 2, 2),
        (2, 1, 1), (2, 2, 100), (2, 3, 101),
    ]
    df = spark.createDataFrame(rows, "user_id int, item_id int, timestamp long")
    out = Sessionizer(session_gap=5, min_inter_per_session=2).transform(df)
    # user 2's singleton first session dropped
    assert out.count() == 4


def test_quantile_discretizer(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    rule = QuantileDiscretizingRule("v", n_bins=4)
    out = rule.fit_transform(df)
    counts = {r.v: r["count"] for r in out.groupBy("v").count().collect()}
    assert set(counts.keys()) == {0.0, 1.0, 2.0, 3.0}
    assert all(20 <= c <= 30 for c in counts.values())


def test_greedy_discretizer(spark):
    df = spark.createDataFrame([(float(i % 10),) for i in range(100)], "v double")
    rule = GreedyDiscretizingRule("v", n_bins=5)
    out = rule.fit_transform(df)
    assert out.select("v").distinct().count() <= 6


def test_discretizer_save_load(tmp_path, spark):
    df = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    disc = Discretizer([QuantileDiscretizingRule("v", 3)]).fit(df)
    disc.save(str(tmp_path / "disc"))
    loaded = Discretizer.load(str(tmp_path / "disc"))
    out1 = sorted(r.v for r in disc.transform(df).collect())
    out2 = sorted(r.v for r in loaded.transform(df).collect())
    assert out1 == out2


def test_log_stat_features(spark, interactions):
    proc = LogStatFeaturesProcessor().fit(interactions)
    users = proc.user_log_features
    assert users.count() == 3
    cols = users.columns
    assert "u_log_num_interact" in cols
    assert "u_history_length_days" in cols
    assert "abnormality" in cols
    out = proc.transform(interactions)
    assert "u_log_num_interact" in out.columns and "i_log_num_interact" in out.columns


def test_conditional_popularity_golden(spark):
    """Item features -> USER popularity conditioned on the feature
    (reference history_based_fp.py:321-345 orientation)."""
    from replay_spark.preprocessing import ConditionalPopularityProcessor

    log = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 10), (2, 20)], "query_id int, item_id int"
    )
    feats = spark.createDataFrame(
        [(10, "a"), (20, "b")], "item_id int, genre string"
    )
    proc = ConditionalPopularityProcessor(["genre"]).fit(log, feats)
    assert proc.entity_column == "query_id"
    pop = {
        (r.query_id, r.genre): round(r.q_pop_by_genre, 6)
        for r in proc.conditional_pop_dict["genre"].collect()
    }
    assert pop == {(1, "a"): round(2 / 3, 6), (1, "b"): round(1 / 3, 6), (2, "b"): 1.0}
    out = proc.transform(
        spark.createDataFrame([(1, "a"), (2, "a")], "query_id int, genre string")
    )
    rows = {r.query_id: (round(r.q_pop_by_genre, 6), r.na_q_pop_by_genre) for r in out.collect()}
    assert rows == {1: (round(2 / 3, 6), False), 2: (0.0, True)}


def test_conditional_popularity_user_features(spark):
    """User features -> ITEM popularity conditioned on the feature."""
    from replay_spark.preprocessing import ConditionalPopularityProcessor

    log = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], "query_id int, item_id int"
    )
    feats = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x")], "query_id int, seg string"
    )
    proc = ConditionalPopularityProcessor(["seg"]).fit(log, feats)
    assert proc.entity_column == "item_id"
    pop = {
        (r.item_id, r.seg): round(r.i_pop_by_seg, 6)
        for r in proc.conditional_pop_dict["seg"].collect()
    }
    assert pop == {(10, "x"): 0.5, (10, "y"): 0.5, (20, "x"): 1.0}


def test_greedy_discretizer_cardinality_guard(spark):
    from replay_spark.preprocessing import GreedyDiscretizingRule

    df = spark.range(100).selectExpr("cast(id as double) as value")
    rule = GreedyDiscretizingRule("value", n_bins=4)
    rule.MAX_DRIVER_DISTINCT = 10  # force the guard
    with pytest.raises(ValueError, match="distinct values"):
        rule.fit(df)


def test_sessionizer_reference_two_phase_parity(spark):
    """Reference-id mode: the two-phase distributed prefix sum
    (max_single_task_users=0 forces it) assigns exactly the ids the
    single-task window does."""
    from replay_spark.preprocessing.sessionizer import Sessionizer

    rows = [
        (u, float(t))
        for u in range(7)
        for t in range(0, 400000, 100000)
    ]
    df = spark.createDataFrame(rows, "user_id long, timestamp double")
    a = Sessionizer(session_gap=150000, session_id_mode="reference").transform(df)
    b = Sessionizer(
        session_gap=150000,
        session_id_mode="reference",
        max_single_task_users=0,
    ).transform(df)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_label_encoder_post_fit_unknown_handling(spark):
    """Reference parity (test_label_encoder_with_handled_null_values_
    spark): post-fit set_handle_unknowns / set_default_values, with
    default None -> unknowns stay null and "last" -> mapping size."""
    from replay_spark.preprocessing import LabelEncoder, LabelEncodingRule

    train = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "item1 string, item2 string"
    )
    test = spark.createDataFrame(
        [("a", "x"), ("new1", "new2")], "item1 string, item2 string"
    )
    enc = LabelEncoder([LabelEncodingRule("item1"), LabelEncodingRule("item2")])
    enc.fit(train)
    enc.set_handle_unknowns(
        {"item1": "use_default_value", "item2": "use_default_value"}
    )
    enc.set_default_values({"item1": None, "item2": "last"})
    out = {
        (r["item1"], r["item2"])
        for r in enc.transform(test).collect()
    }
    known = {r for r in out if r[0] is not None}
    unknown = {r for r in out if r[0] is None}
    assert len(known) == 1 and len(unknown) == 1
    assert next(iter(unknown))[1] == 2  # "last" = mapping size

    with pytest.raises(ValueError):
        enc.set_default_values({"missing_col": 0})
    with pytest.raises(ValueError):
        enc.set_default_values({"item1": "not-last"})
    with pytest.raises(ValueError):
        enc.set_handle_unknowns({"item1": "bogus"})


def test_sequence_encoder_default_none_keeps_null_elements(spark):
    from replay_spark.preprocessing import SequenceEncodingRule

    train = spark.createDataFrame([(["a", "b"],)], "items array<string>")
    test = spark.createDataFrame([(["a", "zzz"],)], "items array<string>")
    rule = SequenceEncodingRule(
        "items", handle_unknown="use_default_value", default_value=None
    )
    rule.fit(train)
    row = rule.transform(test).collect()[0]
    assert row["items"][0] is not None and row["items"][1] is None


def test_discretizer_set_handle_invalid(spark):
    from replay_spark.preprocessing import (
        Discretizer,
        QuantileDiscretizingRule,
    )

    rule = QuantileDiscretizingRule("rating", 4)
    rule.set_handle_invalid("skip")
    assert rule._handle_invalid == "skip"
    with pytest.raises(ValueError):
        rule.set_handle_invalid("bogus")

    disc = Discretizer([QuantileDiscretizingRule("rating", 4)])
    disc.set_handle_invalid({"rating": "error"})
    assert disc.rules[0]._handle_invalid == "error"
    with pytest.raises(ValueError):
        disc.set_handle_invalid({"other": "skip"})


def test_abnormality_golden(spark):
    """HAL-01254172 abnormality + AbnormalityCR against hand-computed
    values (two items: means 2.0 and 4.0, stds sqrt(2) and 0 after
    min-max -> controversy 0 and 1)."""
    import math

    from replay_spark.preprocessing import LogStatFeaturesProcessor

    inter = spark.createDataFrame(
        [
            (0, 10, 1.0, 1.0),
            (1, 10, 1.0, 3.0),
            (0, 20, 1.0, 4.0),
            (1, 20, 1.0, 4.0),
        ],
        "query_id long, item_id long, timestamp double, rating double",
    )
    proc = LogStatFeaturesProcessor()
    proc.fit(inter)
    got = {
        r["query_id"]: (r["abnormality"], r["abnormalityCR"])
        for r in proc.user_log_features.select(
            "query_id", "abnormality", "abnormalityCR"
        ).collect()
    }
    # item 10: mean 2, std sqrt(2); item 20: mean 4, std 0
    # controversy = 1 - (std - 0)/(sqrt(2) - 0): item10 -> 0, item20 -> 1
    # user 0: |1-2|=1 (c=0), |4-4|=0 (c=1) -> ab=(1+0)/2=0.5, CR=((1*0)^2+(0*1)^2)/2=0
    # user 1: |3-2|=1 (c=0), |4-4|=0 (c=1) -> same
    assert got[0][0] == pytest.approx(0.5)
    assert got[0][1] == pytest.approx(0.0)
    assert got[1][0] == pytest.approx(0.5)
    assert got[1][1] == pytest.approx(0.0)


def test_target_encoder_loo_and_global(spark):
    """Leave-one-out excludes exactly the row's own label; global
    mode smooths toward the prior; singletons fall back to it."""
    from replay_spark.preprocessing.target_encoder import TargetEncoder

    df = spark.createDataFrame(
        [
            (0, "a", 10.0), (1, "a", 20.0), (2, "a", 30.0),
            (3, "b", 100.0), (4, "b", 200.0),
            (5, "c", 7.0),                    # singleton
        ],
        "id long, cat string, y double",
    )
    loo = TargetEncoder(["cat"], "y", mode="loo").transform(df)
    got = {r.id: r.cat__te for r in loo.collect()}
    assert got[0] == 25.0 and got[1] == 20.0 and got[2] == 15.0
    assert got[3] == 200.0 and got[4] == 100.0
    prior = (10 + 20 + 30 + 100 + 200 + 7) / 6
    assert abs(got[5] - prior) < 1e-12          # singleton -> prior
    glob = TargetEncoder(
        ["cat"], "y", mode="global", smoothing=2.0
    ).transform(df)
    g = {r.id: r.cat__te for r in glob.collect()}
    assert abs(g[0] - (60 + 2 * prior) / 5) < 1e-12
    assert g[0] == g[1] == g[2]


def test_target_encoder_kfold_out_of_fold(spark):
    """kfold: every row's encoding equals the exact mean of its
    category restricted to the OTHER folds (recomputed in Python
    from the same md5 fold)."""
    import hashlib

    from replay_spark.preprocessing.target_encoder import TargetEncoder

    rows = [(i, "ab"[i % 2], float((i * 7) % 23)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    enc = TargetEncoder(
        ["cat"], "y", mode="kfold", folds=4, id_column="id",
        emit_fractions=True,
    ).transform(df)
    got = {r.id: (r.cat__te, r.cat__te_num, r.cat__te_den) for r in enc.collect()}

    def fold(i):
        h = int(hashlib.md5(f"te:{i}".encode()).hexdigest()[:15], 16)
        return h % 4

    by_cat = {}
    for i, c, y in rows:
        by_cat.setdefault(c, []).append((i, y))
    for i, c, y in rows:
        other = [yy for j, yy in by_cat[c] if fold(j) != fold(i)]
        te, num, den = got[i]
        assert den == len(other)
        assert abs(te - sum(other) / len(other)) < 1e-9, i


def test_target_encoder_guards(spark):
    from replay_spark.preprocessing.target_encoder import TargetEncoder

    with pytest.raises(ValueError, match="mode"):
        TargetEncoder(["c"], mode="oof")
    with pytest.raises(ValueError, match="id_column"):
        TargetEncoder(["c"], mode="kfold")
    with pytest.raises(ValueError, match="smoothing"):
        TargetEncoder(["c"], mode="loo", smoothing=1.0)


def test_robust_scaler(spark):
    """Winsorization clips to exact group quantiles; scaled value is
    (clipped - median)/IQR; zero-IQR groups scale to 0."""
    from replay_spark.preprocessing.scaler import RobustScaler

    rows = [("a", i) for i in range(1, 101)] + [
        ("a", 100000),               # outlier to clip
        ("b", 5), ("b", 5), ("b", 5),  # zero IQR
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    rs = RobustScaler(
        value_column="v", group_columns=["g"],
        lower=0.01, upper=0.99, emit_ppm=True,
    ).fit(df)
    out = {
        (r.g, r.v): (r.v__clipped, r.v__scaled, r.v__scaled_ppm)
        for r in rs.transform(df).collect()
    }
    # group a: n=101 -> P99 rank = ceil(101*99/100) = 100 -> value 100
    assert out[("a", 100000)][0] == 100       # outlier clipped
    assert out[("a", 1)][0] == 2              # P1 rank 2 -> clip up
    med, q25, q75 = 51, 26, 76                # ranks 51/26/76
    assert out[("a", 51)][1] == 0.0
    assert abs(out[("a", 76)][1] - 0.5) < 1e-12
    assert out[("a", 76)][2] == 500000
    # zero-IQR group scales to 0
    assert out[("b", 5)][1] == 0.0 and out[("b", 5)][2] == 0
    # ungrouped mode
    rs2 = RobustScaler(value_column="v").fit(df)
    assert "v__scaled" in rs2.transform(df).columns
