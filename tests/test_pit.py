"""PIT/ASOF join tests: the 4-way timestamp grid (mirrors the
reference's correctness_test.go:105-110 matrix) plus lag features,
composite entities, and union-vs-theta strategy agreement."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from embeddinghub_spark.catalog import Catalog, EntityMapping, FeatureLag
from embeddinghub_spark.operators.pit import asof_join_theta, asof_join_union


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def feature_df(spark):
    # out-of-order ts, ties, an entity absent from labels, a row after all labels
    return spark.createDataFrame(
        [
            ("a", 10.0, _ts("2024-01-01T00:00:00")),
            ("a", 20.0, _ts("2024-01-03T00:00:00")),
            ("a", 15.0, _ts("2024-01-02T00:00:00")),
            ("a", 99.0, _ts("2024-09-01T00:00:00")),  # after all labels
            ("b", 5.0, _ts("2024-01-02T00:00:00")),
            ("b", 6.0, _ts("2024-01-02T00:00:00")),  # ts tie → max value wins
            ("zz", 1.0, _ts("2024-01-01T00:00:00")),  # not in labels
        ],
        ["entity", "value", "ts"],
    )


@pytest.fixture()
def label_df(spark):
    return spark.createDataFrame(
        [
            ("a", True, _ts("2024-01-02T12:00:00")),  # sees 15.0
            ("a", False, _ts("2024-01-03T00:00:00")),  # inclusive → 20.0
            ("b", True, _ts("2024-01-02T00:00:00")),  # tie → 6.0
            ("c", False, _ts("2024-01-05T00:00:00")),  # no feature → NULL
        ],
        ["entity", "value", "ts"],
    )


EXPECTED = {
    ("a", True): 15.0,
    ("a", False): 20.0,
    ("b", True): 6.0,
    ("c", False): None,
}


@pytest.mark.parametrize("fn", [asof_join_union, asof_join_theta])
def test_asof_semantics(fn, feature_df, label_df):
    out = fn(label_df, feature_df, {"fv": "value"})
    got = {(r["entity"], r["value"]): r["fv"] for r in out.collect()}
    assert got == EXPECTED


def test_strategies_agree(feature_df, label_df):
    a = asof_join_union(label_df, feature_df, {"fv": "value"})
    b = asof_join_theta(label_df, feature_df, {"fv": "value"})
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_asof_lag(feature_df, label_df):
    out = asof_join_union(
        label_df, feature_df, {"fv": "value"}, lag=timedelta(days=1)
    )
    got = {(r["entity"], r["value"]): r["fv"] for r in out.collect()}
    # label a@01-02T12: cutoff 01-01T12 → value 10.0 (f.ts+1d <= l.ts)
    assert got[("a", True)] == 10.0
    # label a@01-03: cutoff 01-02 inclusive → 15.0
    assert got[("a", False)] == 15.0
    # label b@01-02: cutoff 01-01 → None
    assert got[("b", True)] is None


def _mk_catalog(spark, feature_df, label_df):
    cat = Catalog(spark)
    feature_df.createOrReplaceTempView("_feat_src")
    label_df.createOrReplaceTempView("_lbl_src")
    cat.df_transformation("feat", "v1", lambda: spark.table("_feat_src"), [])
    cat.df_transformation("lbl", "v1", lambda: spark.table("_lbl_src"), [])
    return cat


def test_training_set_grid_ts_ts(spark, feature_df, label_df):
    cat = _mk_catalog(spark, feature_df, label_df)
    cat.register_feature("f1", "v1", ("feat", "v1"), "entity", "value", "ts")
    cat.register_label("l1", "v1", ("lbl", "v1"), "entity", "value", "ts")
    cat.register_training_set("ts1", "v1", ("l1", "v1"), [("f1", "v1")])
    out = cat.training_set_dataframe("ts1", "v1")
    assert set(out.columns) == {"entity", "feature__f1__v1", "label", "label_ts"}
    got = {(r["entity"], r["label"]): r["feature__f1__v1"] for r in out.collect()}
    assert got == EXPECTED


def test_training_set_grid_featurets_label_nots(spark, feature_df, label_df):
    cat = _mk_catalog(spark, feature_df, label_df.drop("ts"))
    cat.register_feature("f1", "v1", ("feat", "v1"), "entity", "value", "ts")
    cat.register_label("l1", "v1", ("lbl", "v1"), "entity", "value")
    cat.register_training_set("ts1", "v1", ("l1", "v1"), [("f1", "v1")])
    got = {
        (r["entity"], r["label"]): r["feature__f1__v1"]
        for r in cat.training_set_dataframe("ts1", "v1").collect()
    }
    # C8: feature collapses to latest overall (a→99.0, b→6.0)
    assert got == {
        ("a", True): 99.0,
        ("a", False): 99.0,
        ("b", True): 6.0,
        ("c", False): None,
    }


def test_training_set_grid_feature_nots(spark, feature_df, label_df):
    cat = _mk_catalog(spark, feature_df.drop("ts"), label_df)
    cat.register_feature("f1", "v1", ("feat", "v1"), "entity", "value")
    cat.register_label("l1", "v1", ("lbl", "v1"), "entity", "value", "ts")
    cat.register_training_set("ts1", "v1", ("l1", "v1"), [("f1", "v1")])
    got = {
        (r["entity"], r["label"]): r["feature__f1__v1"]
        for r in cat.training_set_dataframe("ts1", "v1").collect()
    }
    # C9: plain left join after keep-one dedup (file order → last row wins):
    # a rows: 10,20,15,99 → 99; b rows: 5,6 → 6
    assert got[("b", True)] == 6.0
    assert got[("c", False)] is None
    assert got[("a", True)] == got[("a", False)]


def test_training_set_multi_feature_and_lag(spark, feature_df, label_df):
    cat = _mk_catalog(spark, feature_df, label_df)
    cat.register_feature("f1", "v1", ("feat", "v1"), "entity", "value", "ts")
    cat.register_feature("f2", "v1", ("feat", "v1"), "entity", "value", "ts")
    cat.register_label("l1", "v1", ("lbl", "v1"), "entity", "value", "ts")
    cat.register_training_set(
        "ts1",
        "v1",
        ("l1", "v1"),
        [("f1", "v1"), ("f2", "v1")],
        lags=[FeatureLag("f1", "v1", timedelta(days=1), alias="f1_lag1d")],
    )
    out = cat.training_set_dataframe("ts1", "v1")
    assert "feature__f1__v1" in out.columns
    assert "feature__f2__v1" in out.columns
    assert "f1_lag1d" in out.columns
    rows = {(r["entity"], r["label"]): r for r in out.collect()}
    # grouped features (same source/entity/ts) produce identical values
    for r in rows.values():
        assert r["feature__f1__v1"] == r["feature__f2__v1"]
    assert rows[("a", True)]["f1_lag1d"] == 10.0


def test_training_set_composite_entity(spark):
    feat_user = spark.createDataFrame(
        [("u1", 1.0, _ts("2024-01-01T00:00:00"))], ["user_id", "value", "ts"]
    )
    feat_merch = spark.createDataFrame(
        [("m1", 2.0, _ts("2024-01-01T00:00:00"))], ["merchant_id", "value", "ts"]
    )
    lbls = spark.createDataFrame(
        [("u1", "m1", True, _ts("2024-01-02T00:00:00")),
         ("u1", "m2", False, _ts("2024-01-02T00:00:00"))],
        ["user_id", "merchant_id", "value", "ts"],
    )
    cat = Catalog(spark)
    for name, df in [("fu", feat_user), ("fm", feat_merch), ("lb", lbls)]:
        df.createOrReplaceTempView(f"_src_{name}")
        cat.df_transformation(name, "v1", (lambda n: lambda: spark.table(f"_src_{n}"))(name), [])
    cat.register_feature("uf", "v1", ("fu", "v1"), "user_id", "value", "ts", entity="user")
    cat.register_feature("mf", "v1", ("fm", "v1"), "merchant_id", "value", "ts", entity="merchant")
    cat.register_label(
        "ml", "v1", ("lb", "v1"), "", "value", "ts",
        entity_mappings=[EntityMapping("user", "user_id"), EntityMapping("merchant", "merchant_id")],
    )
    cat.register_training_set("cts", "v1", ("ml", "v1"), [("uf", "v1"), ("mf", "v1")])
    out = cat.training_set_dataframe("cts", "v1")
    rows = {
        (r["entity__user"], r["entity__merchant"]): r for r in out.collect()
    }
    assert rows[("u1", "m1")]["feature__uf__v1"] == 1.0
    assert rows[("u1", "m1")]["feature__mf__v1"] == 2.0
    assert rows[("u1", "m2")]["feature__mf__v1"] is None


def test_bucketed_asof_equals_union(spark, sf_dir):
    """Skew-resistant (entity, time-bucket) ASOF must produce exactly
    the plain union strategy's result — incl. fused lags — across
    bucket widths (1 day splits the events range into many buckets;
    10 years collapses to one bucket = degenerate case)."""
    import os
    from datetime import timedelta

    from embeddinghub_spark.catalog import Catalog, FeatureLag
    from embeddinghub_spark.operators.pit import build_training_set

    def make_cat():
        cat = Catalog(spark)
        cat.register_file("events", "default", os.path.join(sf_dir, "events.parquet"))
        cat.sql_transformation(
            "clicks", "v1",
            "SELECT user_id, value, ts FROM {{events.default}} WHERE event_type = 'click'",
        )
        cat.sql_transformation(
            "purchases", "v1",
            "SELECT user_id, value, ts FROM {{events.default}} WHERE event_type = 'purchase'",
        )
        cat.register_feature("cv", "v1", ("clicks", "v1"), "user_id", "value", "ts")
        cat.register_label("p", "v1", ("purchases", "v1"), "user_id", "value", "ts")
        cat.register_training_set(
            "ts_b", "v1", ("p", "v1"), [("cv", "v1")],
            lags=[FeatureLag("cv", "v1", timedelta(hours=1), alias="cv_lag")],
        )
        return cat

    def rows(strategy):
        df = build_training_set(make_cat(), make_cat().training_set("ts_b", "v1"), strategy=strategy)
        collected = [
            (r["entity"], r["feature__cv__v1"], r["cv_lag"], r["label"], r["label_ts"])
            for r in df.collect()
        ]
        return sorted(
            collected, key=lambda t: tuple((v is None, v) for v in t)
        )

    expected = rows("union")
    assert rows("union_bucketed") == expected
    assert len(expected) > 50

    # width extremes on the raw operator: one giant bucket (degenerate
    # = plain union) and tiny 1-hour buckets (maximal stitching)
    from embeddinghub_spark.operators.pit import asof_join_union, asof_join_union_bucketed

    cat = make_cat()
    labels = cat.label_table("p", "v1").dropDuplicates()
    feat = cat.dataframe("clicks", "v1")
    base = sorted(
        ((r["entity"], r["value"], r["ts"], r["fv"]) for r in
         asof_join_union(labels, feat, {"fv": "value"},
                         label_entity_col="entity", feature_entity_col="user_id",
                         label_ts_col="ts", feature_ts_col="ts").collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    for width in (3600, 10**10):
        got = sorted(
            ((r["entity"], r["value"], r["ts"], r["fv"]) for r in
             asof_join_union_bucketed(labels, feat, {"fv": "value"},
                                      label_entity_col="entity", feature_entity_col="user_id",
                                      label_ts_col="ts", feature_ts_col="ts",
                                      bucket_seconds=width).collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )
        assert got == base, f"width={width}"


def test_catalog_apply_validates_dag(spark, sf_dir):
    """apply() resolves every resource (entry point A); broken
    references fail at apply time, not serve time."""
    import os

    from embeddinghub_spark.catalog import Catalog, ResourceNotFound

    cat = Catalog(spark)
    cat.register_file("events", "default", os.path.join(sf_dir, "events.parquet"))
    cat.sql_transformation(
        "clicks", "v1",
        "SELECT user_id, value, ts FROM {{events.default}} WHERE event_type = 'click'",
    )
    cat.register_feature("cv", "v1", ("clicks", "v1"), "user_id", "value", "ts")
    cat.register_label("pl", "v1", ("events", "default"), "user_id", "value", "ts")
    cat.register_training_set("t", "v1", ("pl", "v1"), [("cv", "v1")])
    counts = cat.apply()
    assert counts == {
        "sources": 2, "features": 1, "labels": 1, "training_sets": 1, "on_demand": 0,
    }
    # a dangling reference fails apply()
    bad = Catalog(spark)
    bad.sql_transformation("x", "v1", "SELECT 1 FROM {{missing.default}}")
    import pytest as _pytest

    with _pytest.raises(ResourceNotFound):
        bad.apply()


def test_asof_strategy_skew_heuristic(spark):
    """The auto strategy probes entity skew: a whale entity (>=10% of
    probed rows) or a dense per-entity timeline selects the bucketed
    window; balanced keys keep the single-window plan."""
    import datetime as dt

    from embeddinghub_spark.operators.pit import (
        asof_join,
        asof_join_union,
        choose_asof_strategy,
        probe_entity_skew,
    )

    t0 = dt.datetime(2024, 1, 1)
    whale = spark.createDataFrame(
        [("whale" if i % 2 == 0 else f"u{i}", float(i),
          t0 + dt.timedelta(minutes=i)) for i in range(2000)],
        ["entity", "value", "ts"],
    )
    balanced = spark.createDataFrame(
        [(f"u{i % 500}", float(i), t0 + dt.timedelta(minutes=i))
         for i in range(2000)],
        ["entity", "value", "ts"],
    )
    p = probe_entity_skew(whale, "entity")
    assert p["top_share"] >= 0.4
    assert choose_asof_strategy(whale, "entity") == "union_bucketed"
    assert choose_asof_strategy(balanced, "entity") == "union"
    # dense timeline (few entities, many rows each) also goes bucketed
    assert (
        choose_asof_strategy(balanced, "entity", avg_rows_threshold=3.0)
        == "union_bucketed"
    )

    # auto dispatch returns the same rows as the plain union strategy
    labels = spark.createDataFrame(
        [("whale", 1.0, t0 + dt.timedelta(hours=30)),
         ("u3", 0.0, t0 + dt.timedelta(hours=30))],
        ["entity", "label", "ts"],
    )
    got = asof_join(
        labels, whale, {"f": "value"}, strategy="auto",
        label_ts_col="ts", feature_ts_col="ts",
    )
    want = asof_join_union(labels, whale, {"f": "value"})
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_catalog_manifest_round_trip(spark, sf_dir, tmp_path):
    """The JSON manifest persists every declarative resource; a
    reloaded catalog produces the IDENTICAL training set. Python
    callables rebind explicitly from a functions registry (the
    reference ships pickled bytes; we make that trust decision
    visible) — unbound DF transformations are skipped, not guessed."""
    import datetime as dt
    import os

    from embeddinghub_spark.catalog import (
        Catalog,
        load_manifest,
        save_manifest,
    )

    cat = Catalog(spark)
    cat.register_entity("user", "clickstream user")
    cat.register_file("events", "default", os.path.join(sf_dir, "events.parquet"))
    cat.sql_transformation(
        "clicks", "v1",
        "SELECT user_id, value, ts FROM {{events.default}} WHERE event_type = 'click'",
    )
    cat.sql_transformation(
        "purchases", "v1",
        "SELECT user_id, value, ts FROM {{events.default}} WHERE event_type = 'purchase'",
    )
    cat.register_feature("click_value", "v1", ("clicks", "v1"), "user_id", "value", "ts")
    cat.register_label("purchase", "v1", ("purchases", "v1"), "user_id", "value", "ts")
    cat.register_training_set(
        "ts_m", "v1", ("purchase", "v1"), [("click_value", "v1")],
        lags=[FeatureLag("click_value", "v1", dt.timedelta(hours=1), alias="lag1h")],
    )
    cat.register_on_demand("odf", "v1", fn=lambda store, p, e: p["x"] * 2)

    def double_df(events):
        return events

    cat.register_source(
        __import__("embeddinghub_spark.catalog", fromlist=["SourceVariant"]).SourceVariant(
            name="dfx", variant="v1", fn=double_df, inputs=(("events", "default"),)
        )
    )

    path = str(tmp_path / "manifest.json")
    save_manifest(cat, path)
    odf = lambda store, p, e: p["x"] * 2  # noqa: E731
    cat2 = load_manifest(
        spark, path,
        functions={"dfx__v1": double_df, "odf__v1": odf},
    )

    a = cat.training_set_dataframe("ts_m", "v1")
    b = cat2.training_set_dataframe("ts_m", "v1")
    assert a.columns == b.columns
    assert sorted(map(repr, a.collect())) == sorted(map(repr, b.collect()))
    assert cat2.on_demand("odf", "v1").fn(None, {"x": 3}, {}) == 6
    assert cat2.source("dfx", "v1").fn is double_df

    # unbound DF transformation: skipped, the rest still loads
    cat3 = load_manifest(spark, path)
    assert cat3.training_set("ts_m", "v1").lags[0].alias == "lag1h"
    with pytest.raises(Exception):
        cat3.source("dfx", "v1")


def test_skew_probe_memoized_across_builds(spark):
    """Round-3 bench regression root cause: the ASOF auto-strategy
    probe re-ran its Spark job on every training-set build. Two fresh
    DataFrames over the same logical plan must share one probe."""
    from embeddinghub_spark.operators import pit

    a = spark.range(10_000).selectExpr("id % 7 as entity", "id as v")
    b = spark.range(10_000).selectExpr("id % 7 as entity", "id as v")
    r1 = pit.probe_entity_skew(a, "entity")
    r2 = pit.probe_entity_skew(b, "entity")
    assert r1 is r2  # identity: second call was a cache hit, no job
    # a semantically different plan probes fresh
    c = spark.range(10_000).selectExpr("id % 3 as entity", "id as v")
    assert pit.probe_entity_skew(c, "entity") is not r1


def test_validate_pit_flags_leaked_features(spark):
    """A feature timestamp after the label timestamp is a PIT
    violation; NULL feature ts (no match) is not; clean frames come
    back empty."""
    import pytest
    from datetime import datetime

    from embeddinghub_spark.operators.pit import validate_pit

    t = lambda d: datetime(2024, 1, d)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, t(10), t(9), t(8)),    # ok
            (2, t(10), t(11), t(8)),   # f1 leaked
            (3, t(10), t(12), t(13)),  # both leaked
            (4, t(10), None, t(1)),    # null feature ts: ok
        ],
        ["entity", "label_ts", "f1__ts", "f2__ts"],
    )
    out = {r["entity"]: r["violations"] for r in validate_pit(df).collect()}
    assert out == {2: ["f1__ts"], 3: ["f1__ts", "f2__ts"]}

    clean = df.filter("entity IN (1, 4)")
    assert validate_pit(clean).count() == 0
    with pytest.raises(ValueError, match="feature timestamp"):
        validate_pit(df.select("entity", "label_ts"))


def test_validate_pit_null_label_ts_is_flagged(spark):
    from datetime import datetime

    from embeddinghub_spark.operators.pit import validate_pit

    df = spark.createDataFrame(
        [(1, None, datetime(2024, 1, 1))],
        "entity int, label_ts timestamp_ntz, f1__ts timestamp_ntz",
    )
    out = validate_pit(df).collect()
    assert len(out) == 1 and out[0]["violations"] == ["label_ts"]


def test_pit_staleness_ages_and_cold_start(spark):
    """Per-label staleness equals label_ts − latest eligible feature
    ts in COMPLETE seconds (µs-exact floor, engine-neutral); labels
    before any feature row are the NULL cold-start population; a
    feature at exactly label_ts is age 0."""
    import datetime as dt

    from embeddinghub_spark.operators.pit import pit_staleness

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(sec, micro=0):
        return t0 + dt.timedelta(seconds=sec, microseconds=micro)

    labels = spark.createDataFrame(
        [
            (1, "a", ts(100)),           # matched: f@40.5 -> 59.5s -> 59
            (2, "a", ts(40, 500000)),    # exact hit at f ts -> 0
            (3, "a", ts(10)),            # before any feature -> NULLs
            (4, "b", ts(50)),            # other entity's features ignored
        ],
        ["label_id", "entity", "ts"],
    )
    feature = spark.createDataFrame(
        [("a", ts(40, 500000)), ("a", ts(20)), ("b", ts(49))],
        ["entity", "ts"],
    )
    out = {
        r["label_id"]: (r["feature_ts"], r["staleness_seconds"])
        for r in pit_staleness(labels, feature).collect()
    }
    assert out[1] == (ts(40, 500000), 59)  # floor of 59.5
    assert out[2] == (ts(40, 500000), 0)
    assert out[3] == (None, None)
    assert out[4] == (ts(49), 1)
    # label columns pass through untouched
    cols = pit_staleness(labels, feature).columns
    assert cols == ["label_id", "entity", "ts", "feature_ts", "staleness_seconds"]


def test_time_to_next_event_forward_asof(spark):
    """Forward ASOF: each anchor gets the FIRST strictly-later event
    (equal-ts events excluded), right-censored anchors carry NULLs,
    and the gap is µs-exact floored seconds."""
    import datetime as dt

    from embeddinghub_spark.operators.pit import time_to_next_event

    t0 = dt.datetime(2024, 1, 1)

    def ts(sec, micro=0):
        return t0 + dt.timedelta(seconds=sec, microseconds=micro)

    anchors = spark.createDataFrame(
        [
            (1, "a", ts(10)),   # next event at 40.5 -> 30.5 -> 30
            (2, "a", ts(40, 500000)),  # equal-ts event NOT next; 60 is -> 19
            (3, "a", ts(70)),   # nothing later -> censored
            (4, "b", ts(5)),    # other entity -> its own event at 6
        ],
        ["anchor_id", "entity", "ts"],
    )
    events = spark.createDataFrame(
        [("a", ts(40, 500000)), ("a", ts(60)), ("a", ts(8)), ("b", ts(6))],
        ["entity", "ts"],
    )
    out = {
        r["anchor_id"]: (r["next_ts"], r["seconds_to_next"])
        for r in time_to_next_event(anchors, events).collect()
    }
    assert out[1] == (ts(40, 500000), 30)
    assert out[2] == (ts(60), 19)  # floor(19.5)
    assert out[3] == (None, None)
    assert out[4] == (ts(6), 1)
    cols = time_to_next_event(anchors, events).columns
    assert cols == ["anchor_id", "entity", "ts", "next_ts", "seconds_to_next"]


def test_trailing_window_features_window_semantics(spark):
    """[t−w, t) exactly: event at label ts EXCLUDED, event at t−w
    INCLUDED; empty windows give count 0 / sum NULL; per-entity
    isolation; exact decimal sums."""
    import datetime as dt

    from embeddinghub_spark.operators.pit import trailing_window_features

    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    labels = spark.createDataFrame(
        [
            (1, "a", ts(100)),  # window [0,100): events at 0,50 -> 2, 3.5
            (2, "a", ts(150)),  # window [50,150): 50,100,149 -> 3, 7.25
            (3, "a", ts(10)),   # window [-90,10): event at 0 -> 1, 1.25
            (4, "b", ts(100)),  # no b events -> 0, NULL
        ],
        ["label_id", "entity", "ts"],
    )
    events = spark.createDataFrame(
        [
            ("a", ts(0), 1.25),
            ("a", ts(50), 2.25),   # exactly at window start of label 2
            ("a", ts(100), 2.0),   # exactly at label-1 ts -> excluded
            ("a", ts(149), 3.0),
        ],
        ["entity", "ts", "value"],
    )
    out = {
        r["label_id"]: (r["w_count"], r["w_sum"])
        for r in trailing_window_features(
            labels, events, window_seconds=100, value_col="value"
        ).collect()
    }
    assert out[1] == (2, 3.5)       # 1.25 + 2.25; event@100 excluded
    assert out[2] == (3, 7.25)      # 2.25 + 2.0 + 3.0; event@50 included
    assert out[3] == (1, 1.25)
    assert out[4] == (0, None)

    # count-only mode drops the sum column
    cols = trailing_window_features(labels, events, 100).columns
    assert cols == ["label_id", "entity", "ts", "w_count"]

    # duplicate label rows stay distinct (anchor ids pair correctly)
    dup = spark.createDataFrame(
        [(9, "a", ts(100)), (9, "a", ts(100))], ["label_id", "entity", "ts"]
    )
    rows = trailing_window_features(dup, events, 100).collect()
    assert len(rows) == 2 and all(r["w_count"] == 2 for r in rows)


def test_trailing_window_features_multi_window_fusion(spark):
    """A window LIST shares one cumulative pass: per-window results
    equal the single-window op run separately, columns suffixed per
    window, and the physical plan carries exactly ONE entity
    exchange."""
    import datetime as dt

    from embeddinghub_spark.operators.pit import trailing_window_features

    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    labels = spark.createDataFrame(
        [(i, "a", ts(100 + 10 * i)) for i in range(5)]
        + [(9, "b", ts(100))],
        ["label_id", "entity", "ts"],
    )
    events = spark.createDataFrame(
        [("a", ts(s), float(s)) for s in range(0, 140, 7)]
        + [("b", ts(90), 1.5)],
        ["entity", "ts", "value"],
    )
    fused = trailing_window_features(
        labels, events, [30, 100], value_col="value"
    )
    assert fused.columns == [
        "label_id", "entity", "ts",
        "w30_count", "w30_sum", "w100_count", "w100_sum",
    ]
    got = {r["label_id"]: r.asDict() for r in fused.collect()}
    for w in (30, 100):
        solo = {
            r["label_id"]: (r["w_count"], r["w_sum"])
            for r in trailing_window_features(
                labels, events, w, value_col="value"
            ).collect()
        }
        for lid, d in got.items():
            assert (d[f"w{w}_count"], d[f"w{w}_sum"]) == solo[lid], (lid, w)

    # fusion claim: exchange count does NOT grow with the number of
    # windows (extra windows are extra anchor ROWS, not extra passes).
    # Compare FRESH plans — an executed DataFrame renders AQE's final
    # per-stage form, which double-counts exchanges vs a fresh plan.
    import re

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(r"Exchange hashpartitioning", plan))

    solo_df = trailing_window_features(labels, events, 30, value_col="value")
    fresh_fused = trailing_window_features(
        labels, events, [30, 100], value_col="value"
    )
    assert n_exchanges(fresh_fused) == n_exchanges(solo_df) == 2

    import pytest
    with pytest.raises(ValueError, match="distinct"):
        trailing_window_features(labels, events, [30, 30])


def test_training_set_refresh_incremental_equals_full(spark, tmp_path):
    """An incremental refresh joins ONLY the labels newer than
    `since` (delta == the full set filtered by label_ts), a full
    bootstrap + replayed refresh id stays idempotent, and a no-ts
    label rejects an event-time cutoff."""
    import datetime as dt

    import pytest

    from embeddinghub_spark.catalog import Catalog
    from embeddinghub_spark.operators.pit import (
        read_training_set_dir,
        training_set_refresh,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    cat = Catalog(spark)
    src = str(tmp_path / "events.parquet")
    rows = (
        [(u, "click", float(u * 10 + h), ts(h)) for u in (1, 2) for h in (1, 4, 7)]
        + [(u, "purchase", float(u), ts(h)) for u in (1, 2) for h in (3, 6, 9)]
    )
    spark.createDataFrame(rows, ["user_id", "etype", "value", "ts"]).write.parquet(src)
    cat.register_file("ev", "v1", src, timestamp_column="ts")
    cat.sql_transformation(
        "clicks", "v1",
        "SELECT user_id, value, ts FROM {{ev.v1}} WHERE etype = 'click'",
    )
    cat.sql_transformation(
        "buys", "v1",
        "SELECT user_id, value, ts FROM {{ev.v1}} WHERE etype = 'purchase'",
    )
    cat.register_feature("cv", "v1", ("clicks", "v1"), "user_id", "value", "ts")
    cat.register_label("spend", "v1", ("buys", "v1"), "user_id", "value", "ts")
    cat.register_training_set("tset", "v1", ("spend", "v1"), [("cv", "v1")])

    full = cat.training_set_dataframe("tset", "v1")
    want = sorted(tuple(r) for r in full.collect())
    cutoff = ts(5)

    # delta refresh == the full set restricted to labels past the cutoff
    delta_path = training_set_refresh(
        cat, "tset", "v1", str(tmp_path / "delta_out"), refresh_id=7,
        since=cutoff,
    )
    delta = sorted(tuple(r) for r in spark.read.parquet(delta_path).collect())
    want_delta = sorted(
        tuple(r) for r in full.filter(F.col("label_ts") > cutoff).collect()
    )
    assert delta == want_delta and len(delta) == 4  # h in (6, 9) x 2 users

    # full bootstrap, then a replayed refresh id overwrites (no dupes)
    out = str(tmp_path / "tset_out")
    training_set_refresh(cat, "tset", "v1", out, refresh_id=0)
    training_set_refresh(cat, "tset", "v1", out, refresh_id=0)
    got = sorted(tuple(r) for r in read_training_set_dir(spark, out).collect())
    assert got == want

    # no-ts label cannot take an event-time cutoff
    cat.register_label("flat", "v1", ("buys", "v1"), "user_id", "value", None)
    cat.register_training_set("tset2", "v1", ("flat", "v1"), [("cv", "v1")])
    with pytest.raises(ValueError, match="label timestamp"):
        training_set_refresh(
            cat, "tset2", "v1", str(tmp_path / "x"), refresh_id=0, since=cutoff
        )


def test_trailing_window_random_brute_force(spark):
    """Seeded random labels/events vs a pure-Python [t−w, t) replica —
    counts exact, sums under the decimal protocol."""
    import datetime as dt
    import random

    from embeddinghub_spark.operators.pit import trailing_window_features

    rng = random.Random(11)
    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    events = [
        (f"e{rng.randint(0, 5)}", ts(rng.randint(0, 1000)),
         round(rng.uniform(-5, 5), 3))
        for _ in range(300)
    ]
    labels = [
        (i, f"e{rng.randint(0, 6)}", ts(rng.randint(0, 1100)))
        for i in range(80)
    ]
    w = 137
    got = {
        r["label_id"]: (r["w_count"], r["w_sum"])
        for r in trailing_window_features(
            spark.createDataFrame(labels, ["label_id", "entity", "ts"]),
            spark.createDataFrame(events, ["entity", "ts", "value"]),
            window_seconds=w,
            value_col="value",
        ).collect()
    }
    for lid, ent, lts in labels:
        hits = [
            v for e, ets, v in events
            if e == ent and lts - dt.timedelta(seconds=w) <= ets < lts
        ]
        want_sum = round(sum(round(v, 9) for v in hits), 6) if hits else None
        assert got[lid] == (len(hits), want_sum), lid


def test_time_to_next_event_random_brute_force(spark):
    """Seeded random anchors/events vs a pure-Python strict-forward
    replica — next timestamps and floored-second gaps exact."""
    import datetime as dt
    import random

    from embeddinghub_spark.operators.pit import time_to_next_event

    rng = random.Random(13)
    t0 = dt.datetime(2024, 1, 1)

    def ts(us):
        return t0 + dt.timedelta(microseconds=us)

    events = [
        (f"e{rng.randint(0, 4)}", ts(rng.randint(0, 10_000_000)))
        for _ in range(250)
    ]
    anchors = [
        (i, f"e{rng.randint(0, 5)}", ts(rng.randint(0, 11_000_000)))
        for i in range(70)
    ]
    got = {
        r["anchor_id"]: (r["next_ts"], r["seconds_to_next"])
        for r in time_to_next_event(
            spark.createDataFrame(anchors, ["anchor_id", "entity", "ts"]),
            spark.createDataFrame(events, ["entity", "ts"]),
        ).collect()
    }
    for aid, ent, ats in anchors:
        later = [ets for e, ets in events if e == ent and ets > ats]
        if later:
            nxt = min(later)
            secs = int((nxt - ats).total_seconds())  # µs floor
            assert got[aid] == (nxt, secs), aid
        else:
            assert got[aid] == (None, None), aid


def _decay_expected(events, labels, g, K, hl, weights):
    """Pure-Python replica of the bucketed-decay protocol: per label,
    reference = its bucket start; events in the K complete prior
    buckets weigh by whole-bucket age; scaled-BIGINT arithmetic with
    scale-0 HALF_UP rounding mirroring Spark's shortest-repr
    BigDecimal round(double, 0)."""
    import datetime as dt
    from decimal import ROUND_HALF_UP, Decimal

    def r0(x: float) -> int:
        return int(
            Decimal(repr(float(x))).quantize(Decimal("1"), ROUND_HALF_UP)
        )

    def r9(x: float) -> float:
        return float(
            Decimal(repr(float(x))).quantize(Decimal("1e-9"), ROUND_HALF_UP)
        )

    epoch = dt.datetime(1970, 1, 1)
    part: dict = {}
    for e, ets, v in events:
        b = int((ets - epoch).total_seconds()) // g
        c, s9 = part.get((e, b), (0, 0))
        part[(e, b)] = (c + 1, s9 + r0(r9(v) * 1e9))
    want = {}
    for lid, ent, lts in labels:
        lb = int((lts - epoch).total_seconds()) // g
        cnt, score9, vsum9 = 0, 0, 0
        for d in range(1, K + 1):
            hit = part.get((ent, lb - d))
            if hit:
                c, s9 = hit
                cnt += c
                score9 += r0(c * weights[d - 1] * 1e9)
                vsum9 += r0(float(s9) * weights[d - 1])
        want[lid] = (
            cnt,
            r0(score9 / 1000.0) / 1e6 if cnt else None,
            r0(vsum9 / 1000.0) / 1e6 if cnt else None,
        )
    return want


def test_decayed_trailing_random_brute_force(spark):
    """Seeded random labels/events vs the pure-Python bucketed-decay
    replica — counts exact, decayed score and value sums bit-equal
    under the decimal protocol."""
    import datetime as dt
    import random

    from embeddinghub_spark.operators.pit import (
        decay_bucket_weights,
        decayed_trailing_features,
    )

    rng = random.Random(17)
    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    events = [
        (f"e{rng.randint(0, 5)}", ts(rng.randint(0, 4000)),
         round(rng.uniform(-5, 5), 3))
        for _ in range(400)
    ]
    labels = [
        (i, f"e{rng.randint(0, 6)}", ts(rng.randint(0, 4500)))
        for i in range(90)
    ]
    g, K, hl = 60, 16, 240.0
    weights = decay_bucket_weights(K, g, hl)
    got = {
        r["label_id"]: (r["decay_count"], r["decay_score"], r["decay_sum"])
        for r in decayed_trailing_features(
            spark.createDataFrame(labels, ["label_id", "entity", "ts"]),
            spark.createDataFrame(events, ["entity", "ts", "value"]),
            bucket_seconds=g,
            n_buckets=K,
            half_life_seconds=hl,
            value_col="value",
        ).collect()
    }
    want = _decay_expected(events, labels, g, K, hl, weights)
    assert got == want


def test_decayed_trailing_window_semantics(spark):
    """Boundary pins: the label's own in-progress bucket is EXCLUDED
    (leak-free), the K-th prior bucket is the last one in, K+1 is
    out, recent buckets outweigh old ones, and an empty window gives
    (0, NULL, NULL)."""
    import datetime as dt

    from embeddinghub_spark.operators.pit import (
        decay_bucket_weights,
        decayed_trailing_features,
    )

    t0 = dt.datetime(2024, 1, 1)  # midnight = bucket boundary
    g, K, hl = 60, 4, 120.0
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    events = [
        ("a", s(95), 1.0),    # label bucket (minute 1): excluded
        ("a", s(30), 1.0),    # d=1
        ("a", s(-180), 1.0),  # d=4 (last included)
        ("a", s(-181), 1.0),  # d=5: beyond horizon, excluded
        ("b", s(30), 2.0),    # d=1 for b's label
        ("b", s(-120), 2.0),  # d=3
    ]
    labels = [(0, "a", s(90)), (1, "b", s(65)), (2, "ghost", s(90))]
    w = decay_bucket_weights(K, g, hl)
    got = {
        r["label_id"]: (r["decay_count"], r["decay_score"])
        for r in decayed_trailing_features(
            spark.createDataFrame(labels, ["label_id", "entity", "ts"]),
            spark.createDataFrame(events, ["entity", "ts", "value"]),
            bucket_seconds=g,
            n_buckets=K,
            half_life_seconds=hl,
            value_col="value",
        ).collect()
    }
    assert got[0] == (2, round(w[0] + w[3], 6))
    assert got[1] == (2, round(w[0] + w[2], 6))
    assert got[2] == (0, None)
    # recency: b's d=1 event outweighs its d=3 event in the score
    assert w[0] > w[2]


def test_decayed_trailing_plan_shape(spark):
    """Scale pins: ONE map-side-combinable exchange over the event
    side (hashpartitioning on entity+bucket), label fan-out bounded by
    K probes (a generate/explode, never a range join), and no
    cartesian/broadcast-nested-loop anywhere."""
    import datetime as dt

    from embeddinghub_spark.operators.pit import decayed_trailing_features

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [("a", t0, 1.0)], ["entity", "ts", "value"]
    )
    labels = spark.createDataFrame([(1, "a", t0)], ["lid", "entity", "ts"])
    out = decayed_trailing_features(
        labels, events, bucket_seconds=60, n_buckets=8,
        half_life_seconds=120.0, value_col="value",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the event side pre-aggregates before its exchange (partial agg)
    assert "partial_count" in plan or "partial_sum" in plan


def test_trailing_distinct_matches_python_replica(spark):
    """Seeded random labels/events vs a pure-Python replica of the
    md5-register protocol: estimates bit-equal (round 3), bucket
    support exact, empty windows exactly 0.0, and the window estimate
    EQUALS a single sketch over the window's raw values (HLL union is
    lossless)."""
    import datetime as dt
    import hashlib
    import math
    import random

    from embeddinghub_spark.functions.profile import _hll_alpha
    from embeddinghub_spark.operators.pit import trailing_distinct_features

    rng = random.Random(23)
    t0 = dt.datetime(2024, 1, 1)
    g, K, p = 3600, 6, 9
    m = 1 << p

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    events = [
        (f"e{rng.randint(0, 4)}", ts(rng.randint(0, 40000)),
         f"dev{rng.randint(0, 60)}")
        for _ in range(600)
    ]
    labels = [
        (i, f"e{rng.randint(0, 5)}", ts(rng.randint(0, 44000)))
        for i in range(60)
    ]
    got = {
        r["label_id"]: (r["approx_distinct"], r["approx_distinct_buckets_used"])
        for r in trailing_distinct_features(
            spark.createDataFrame(labels, ["label_id", "entity", "ts"]),
            spark.createDataFrame(events, ["entity", "ts", "device"]),
            bucket_seconds=g,
            n_buckets=K,
            value_col="device",
        ).collect()
    }

    epoch = dt.datetime(1970, 1, 1)

    def bucket_of(t):
        return int((t - epoch).total_seconds()) // g

    def estimate(values):
        regs: dict = {}
        for v in values:
            h = hashlib.md5(str(v).encode()).hexdigest()
            reg = int(h[:3], 16) % m
            tail = int(h[3:16], 16)
            rho = 53 if tail == 0 else 53 - tail.bit_length()
            regs[reg] = max(regs.get(reg, 0), rho)
        used = len(regs)
        s_used = sum(1 << (53 - r) for r in regs.values())
        s_total = s_used + (m - used) * (1 << 53)
        c1 = _hll_alpha(m) * m * m * float(1 << 53)
        raw = c1 / float(s_total)
        empties = m - used
        if raw <= 2.5 * m and empties > 0:
            return round(m * math.log(m / float(empties)), 3)
        return round(raw, 3)

    for lid, ent, lts in labels:
        lb = bucket_of(lts)
        window_vals = [
            v for e, ets, v in events
            if e == ent and lb - K <= bucket_of(ets) <= lb - 1
        ]
        want_sup = len({
            bucket_of(ets) for e, ets, v in events
            if e == ent and lb - K <= bucket_of(ets) <= lb - 1
        })
        assert got[lid] == (estimate(window_vals), want_sup), lid
        if not window_vals:
            assert got[lid][0] == 0.0


def test_decayed_trailing_multi_half_life_fusion(spark):
    """A half-life LIST shares one probe join: per-half-life columns
    equal the single-half-life runs exactly, the unweighted count is
    shared, and the plan contains exactly as many joins as the scalar
    run (fusion adds literal columns, not exchanges)."""
    import datetime as dt
    import random

    from embeddinghub_spark.operators.pit import decayed_trailing_features

    rng = random.Random(31)
    t0 = dt.datetime(2024, 1, 1)
    events = [
        (f"e{rng.randint(0, 4)}", t0 + dt.timedelta(seconds=rng.randint(0, 4000)),
         round(rng.uniform(-3, 3), 3))
        for _ in range(300)
    ]
    labels = [
        (i, f"e{rng.randint(0, 5)}", t0 + dt.timedelta(seconds=rng.randint(0, 4500)))
        for i in range(50)
    ]
    ldf = spark.createDataFrame(labels, ["label_id", "entity", "ts"])
    edf = spark.createDataFrame(events, ["entity", "ts", "value"])
    g, K = 60, 12
    fused = decayed_trailing_features(
        ldf, edf, bucket_seconds=g, n_buckets=K,
        half_life_seconds=[120, 600], value_col="value",
    )
    assert set(fused.columns) >= {
        "decay_count", "decay120_score", "decay120_sum",
        "decay600_score", "decay600_sum",
    }
    got = {r["label_id"]: r for r in fused.collect()}
    for hl in (120, 600):
        single = {
            r["label_id"]: r
            for r in decayed_trailing_features(
                ldf, edf, bucket_seconds=g, n_buckets=K,
                half_life_seconds=float(hl), value_col="value",
            ).collect()
        }
        for lid in single:
            assert got[lid][f"decay{hl}_score"] == single[lid]["decay_score"]
            assert got[lid][f"decay{hl}_sum"] == single[lid]["decay_sum"]
            assert got[lid]["decay_count"] == single[lid]["decay_count"]
    # fusion must not add joins vs the scalar plan
    def n_joins(df):
        import re

        p = df._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(
            r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"
            r"|BroadcastNestedLoopJoin|CartesianProduct", p))
    # compare FRESH (pre-AQE) plans — the collected `fused` frame's
    # plan is AQE-finalized and prints differently
    fused_plan = decayed_trailing_features(
        ldf, edf, bucket_seconds=g, n_buckets=K,
        half_life_seconds=[120, 600], value_col="value",
    )
    single_plan = decayed_trailing_features(
        ldf, edf, bucket_seconds=g, n_buckets=K,
        half_life_seconds=120.0, value_col="value",
    )
    assert n_joins(fused_plan) == n_joins(single_plan) == 1


def test_decayed_trailing_null_ts_label_survives(spark):
    """ADVICE r8 pin: a NULL-ts label must survive with count 0 /
    NULL score (the trailing_window_features convention), not vanish
    from the training frame; same for trailing_distinct (0.0
    estimate, 0 buckets used)."""
    import datetime as dt

    from embeddinghub_spark.operators.pit import (
        decayed_trailing_features,
        trailing_distinct_features,
    )

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [("a", t0, 1.0, "d1")], ["entity", "ts", "value", "device"]
    )
    labels = spark.createDataFrame(
        [(0, "a", t0 + dt.timedelta(seconds=90)), (1, "a", None)],
        "label_id INT, entity STRING, ts TIMESTAMP",
    )
    got = {
        r["label_id"]: (r["decay_count"], r["decay_score"])
        for r in decayed_trailing_features(
            labels, events, bucket_seconds=60, n_buckets=4,
            half_life_seconds=120.0,
        ).collect()
    }
    assert set(got) == {0, 1}, "NULL-ts label dropped"
    assert got[1] == (0, None)
    assert got[0][0] == 1

    gd = {
        r["label_id"]: (r["approx_distinct"], r["approx_distinct_buckets_used"])
        for r in trailing_distinct_features(
            labels, events, bucket_seconds=60, n_buckets=4,
            value_col="device",
        ).collect()
    }
    assert set(gd) == {0, 1}, "NULL-ts label dropped"
    assert gd[1] == (0.0, 0)
    # HLL small-range estimate of 1 distinct: 512·ln(512/511) ≈ 1.001
    assert abs(gd[0][0] - 1.0) < 0.01 and gd[0][1] == 1


def test_trailing_topk_features_matches_brute_force(spark):
    """Exact top-k trailing items: per label, counts over the K
    complete buckets before the label's bucket equal a Python brute
    force, ordered count DESC / item ASC; NULL items never count;
    empty-window and NULL-ts labels survive with one NULL sentinel
    row."""
    from collections import Counter
    from datetime import datetime, timedelta

    from embeddinghub_spark.operators.pit import trailing_topk_features

    g, K, k = 60, 4, 2
    base = datetime(2024, 1, 1)
    events = []
    for i in range(60):
        events.append(
            (
                f"u{i % 3}",
                base + timedelta(seconds=(i * 37) % 400),
                ["a", "b", "c", None][i % 4],
            )
        )
    labels = [
        ("u0", base + timedelta(seconds=250)),
        ("u1", base + timedelta(seconds=70)),   # partial window
        ("u2", base + timedelta(seconds=0)),    # empty window
        ("u0", None),                           # NULL ts survives
    ]
    edf = spark.createDataFrame(
        events, "entity string, ts timestamp, item string"
    )
    ldf = spark.createDataFrame(labels, "entity string, ts timestamp")
    out = trailing_topk_features(
        ldf, edf, bucket_seconds=g, n_buckets=K, item_col="item", k=k
    ).collect()

    # brute force
    def window_counts(e, ts):
        lb = int(ts.timestamp()) // g
        c = Counter()
        for ee, ets, it in events:
            if ee != e or it is None or ets is None:
                continue
            b = int(ets.timestamp()) // g
            if lb - K <= b <= lb - 1:
                c[it] += 1
        return c

    got = {}
    for r in out:
        got.setdefault((r["entity"], r["ts"]), []).append(
            (r["rank"], r["item"], r["item_count"])
        )
    for e, ts in labels:
        rows = sorted(got[(e, ts)])
        if ts is None:
            assert rows == [(1, None, None)]
            continue
        c = window_counts(e, ts)
        want = sorted(c.items(), key=lambda x: (-x[1], x[0]))[:k]
        if not want:
            assert rows == [(1, None, None)]
        else:
            assert rows == [
                (i + 1, it, n) for i, (it, n) in enumerate(want)
            ], (e, ts, rows, want)
