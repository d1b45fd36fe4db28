import pytest

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
