"""Pins the README Quickstart verbatim (same API calls, same testdata
column names) so the documented flow can't rot."""


def test_readme_quickstart_flow(spark):
    from embeddinghub_spark.catalog import Catalog
    from embeddinghub_spark.serving.online import OnlineStore

    cat = Catalog(spark)
    cat.register_file(
        "events", "v1", "/root/testdata/sf0.001/events.parquet",
        timestamp_column="ts",
    )
    cat.sql_transformation(
        "clicks", "v1",
        "SELECT user_id, value, ts FROM {{events.v1}} WHERE event_type = 'click'",
    )
    cat.register_entity("user")
    cat.register_feature(
        "click_value", "v1", source=("clicks", "v1"),
        entity_column="user_id", value_column="value",
        timestamp_column="ts", entity="user",
    )
    cat.register_label(
        "spend", "v1", source=("events", "v1"),
        entity_column="user_id", value_column="value",
        timestamp_column="ts", entity="user",
    )
    cat.register_training_set(
        "spend_model", "v1", label=("spend", "v1"),
        features=[("click_value", "v1")],
    )
    train = cat.training_set_dataframe("spend_model", "v1")
    assert train.columns == ["entity", "feature__click_value__v1", "label", "label_ts"]
    assert train.count() > 0

    store = OnlineStore(cat)
    store.materialize_feature("click_value", "v1")
    some_user = train.select("entity").first()[0]
    vec = store.features([("click_value", "v1")], {"user": some_user})
    assert len(vec) == 1 and vec[0] is not None
