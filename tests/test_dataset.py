import pytest
from pyspark.sql import functions as F

from replay_spark.data import (
    Dataset,
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureType,
    get_schema,
)


@pytest.fixture()
def schema():
    return FeatureSchema(
        [
            FeatureInfo("query_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("timestamp", FeatureType.NUMERICAL, FeatureHint.TIMESTAMP),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
        ]
    )


def test_schema_accessors(schema):
    assert schema.query_id_column == "query_id"
    assert schema.item_id_column == "item_id"
    assert schema.interactions_rating_column == "rating"
    assert schema.interactions_timestamp_column == "timestamp"
    assert len(schema.drop(feature_hint=FeatureHint.RATING)) == 3
    assert schema.filter(feature_hint=FeatureHint.QUERY_ID).columns == ["query_id"]


def test_schema_rejects_two_query_ids():
    with pytest.raises(ValueError):
        FeatureSchema(
            [
                FeatureInfo("a", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
                FeatureInfo("b", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            ]
        )


def test_dataset_counts(spark, interactions, schema):
    ds = Dataset(schema, interactions)
    assert ds.query_count == 3
    assert ds.item_count == 4
    assert ds.query_ids.count() == 3


def test_dataset_consistency_check(spark, interactions, schema):
    qf = spark.createDataFrame([(0, 1.0), (1, 2.0)], "query_id int, age double")
    with pytest.raises(ValueError):
        Dataset(schema, interactions, query_features=qf)


def test_dataset_save_load(tmp_path, spark, interactions, schema):
    ds = Dataset(schema, interactions, categorical_encoded=True)
    ds.save(str(tmp_path / "ds"))
    loaded = Dataset.load(str(tmp_path / "ds"), spark)
    assert loaded.interactions.count() == 7
    assert loaded.feature_schema.query_id_column == "query_id"
    assert loaded.is_categorical_encoded


def test_get_schema():
    st = get_schema()
    assert [f.name for f in st.fields] == ["query_id", "item_id", "timestamp", "rating"]


def test_dataset_label_encoder_roundtrip(spark):
    """DatasetLabelEncoder: ids fit on feature tables, interaction
    categoricals on interactions, sequence columns element-wise
    (reference dataset_label_encoder.py:20)."""
    import warnings

    from replay_spark.data import (
        Dataset,
        DatasetLabelEncoder,
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureSource,
        FeatureType,
        LabelEncoderTransformWarning,
    )

    inter = spark.createDataFrame(
        [("u2", "ix", "mobile", ["a", "b"]), ("u1", "iy", "web", [])],
        "query_id string, item_id string, channel string, tags array<string>",
    )
    qf = spark.createDataFrame(
        [("u1", "ru"), ("u2", "en"), ("u3", "en")],
        "query_id string, lang string",
    )
    itf = spark.createDataFrame(
        [("ix", "book"), ("iy", "film"), ("iz", "book")],
        "item_id string, genre string",
    )
    schema = FeatureSchema(
        [
            FeatureInfo("query_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo(
                "channel",
                FeatureType.CATEGORICAL,
                feature_source=FeatureSource.INTERACTIONS,
            ),
            FeatureInfo(
                "tags",
                FeatureType.CATEGORICAL_LIST,
                feature_source=FeatureSource.INTERACTIONS,
            ),
            FeatureInfo(
                "lang",
                FeatureType.CATEGORICAL,
                feature_source=FeatureSource.QUERY_FEATURES,
            ),
            FeatureInfo(
                "genre",
                FeatureType.CATEGORICAL,
                feature_source=FeatureSource.ITEM_FEATURES,
            ),
        ]
    )
    ds = Dataset(schema, inter, query_features=qf, item_features=itf)
    enc = DatasetLabelEncoder()
    out = enc.fit_transform(ds)

    assert out._categorical_encoded
    # ids fit on the FEATURE tables: u3/iz get codes even though they
    # never appear in interactions
    assert enc.query_id_encoder.rules[0].get_mapping() == {"u1": 0, "u2": 1, "u3": 2}
    assert enc.item_id_encoder.rules[0].get_mapping() == {"ix": 0, "iy": 1, "iz": 2}
    rows = {
        r["query_id"]: r
        for r in out.interactions.orderBy("query_id").collect()
    }
    assert set(rows) == {0, 1}
    assert rows[1]["item_id"] == 0 and rows[1]["channel"] == 0
    assert rows[1]["tags"] == [0, 1] and rows[0]["tags"] == []
    assert {r["lang"] for r in out.query_features.collect()} <= {0, 1}
    # decode round-trip through the bundled encoder
    decoded = enc.query_and_item_id_encoder.inverse_transform(out.interactions)
    assert {(r["query_id"], r["item_id"]) for r in decoded.collect()} == {
        ("u2", "ix"),
        ("u1", "iy"),
    }
    assert enc.get_encoder("nope") is None
    # a column added after fit warns and passes through untouched
    ds2 = Dataset(
        schema
        + FeatureSchema(
            [
                FeatureInfo(
                    "extra",
                    FeatureType.CATEGORICAL,
                    feature_source=FeatureSource.INTERACTIONS,
                )
            ]
        ),
        inter.withColumn("extra", F.lit("x")),
        query_features=qf,
        item_features=itf,
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out2 = enc.transform(ds2)
    assert any(issubclass(w.category, LabelEncoderTransformWarning) for w in caught)
    assert [r["extra"] for r in out2.interactions.collect()] == ["x", "x"]
