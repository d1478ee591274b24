"""Q10: OpenSearch search-body (query + aggs JSON) compiler."""

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query import interval_ms, run_aggs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(f"{SF}/events.parquet").persist()
    yield df
    df.unpersist()


def test_interval_ms_parsing():
    assert interval_ms("90s") == 90_000
    assert interval_ms("1h") == 3_600_000
    assert interval_ms("2d") == 172_800_000
    assert interval_ms(500) == 500
    with pytest.raises(ValueError):
        interval_ms("1 fortnight")


def test_body_with_query_metrics_terms_and_filter(events):
    body = {
        "query": {"range": {"value": {"gte": 10}}},
        "aggs": {
            "n": {"value_count": {"field": "event_id"}},
            "v_max": {"max": {"field": "value"}},
            "top_users": {"terms": {"field": "user_id", "size": 3},
                          "aggs": {"v_avg": {"avg": {"field": "value"}}}},
            "clicks": {"filter": {"term": {"event_type": "click"}},
                       "aggs": {"v_sum": {"sum": {"field": "value"}}}},
        },
    }
    res = run_aggs(events, body)
    base = events.filter(F.col("value") >= 10)
    assert res["n"].collect()[0]["n"] == base.count()
    assert res["v_max"].collect()[0]["v_max"] == \
        base.agg(F.max("value")).collect()[0][0]
    top = res["top_users"].toPandas()
    assert len(top) == 3 and {"user_id", "doc_count", "v_avg"} <= set(top.columns)
    want_top = (base.groupBy("user_id").count()
                .orderBy(F.desc("count"), F.asc("user_id")).first())
    assert top.iloc[0].user_id == want_top["user_id"]
    clicks = res["clicks"].collect()[0]
    assert clicks["doc_count"] == base.filter("event_type = 'click'").count()


def test_body_histogram_with_pipeline_and_composite(events):
    body = {
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts", "fixed_interval": "1d",
                                   "min_doc_count": 1},
                "aggs": {"v_avg": {"avg": {"field": "value"}},
                         "d": {"serial_diff": {"buckets_path": "v_avg"}},
                         "top2": {"bucket_sort": {
                             "sort": [{"doc_count": {"order": "desc"}}],
                             "size": 2}}},
            },
            "by_type_user": {"composite": {"sources": [
                {"t": {"terms": {"field": "event_type"}}},
                {"u": {"terms": {"field": "user_id"}}}]}},
        },
    }
    res = run_aggs(events, body)
    per_day = res["per_day"].toPandas()
    assert len(per_day) == 2          # bucket_sort size=2
    assert {"bucket_start", "doc_count", "v_avg", "d"} <= set(per_day.columns)
    comp = res["by_type_user"].toPandas()
    assert {"t", "u", "doc_count"} <= set(comp.columns)
    assert len(comp) == events.select("event_type", "user_id").distinct().count()


def test_body_composite_entity_script(spark, events):
    from anomaly_detection_spark.functions import with_entity

    ent = with_entity(events, {"user": "user_id", "type": "event_type"})
    body = {"aggs": {"by_ent": {"composite": {"sources": [
        {"eu": {"terms": {"script": {
            "params": {"field": "entity", "category": "user"}}}}}]}}}}
    res = run_aggs(ent, body)["by_ent"].toPandas()
    assert len(res) == events.select("user_id").distinct().count()


def test_body_auto_date_histogram(events):
    res = run_aggs(events, {"aggs": {"auto": {
        "auto_date_histogram": {"field": "ts", "buckets": 20},
        "aggs": {"v_avg": {"avg": {"field": "value"}}}}}})["auto"].toPandas()
    assert 0 < len(res) <= 20
    assert {"bucket_start", "doc_count", "v_avg", "interval_ms"} <= set(res.columns)


def test_body_rejects_unknown(events):
    with pytest.raises(ValueError, match="unsupported aggregation"):
        run_aggs(events, {"aggs": {"x": {"geo_grid": {"field": "v"}}}})
    with pytest.raises(ValueError, match="unsupported sub-aggs"):
        run_aggs(events, {"aggs": {"x": {
            "terms": {"field": "user_id"},
            "aggs": {"bad": {"nested_thing": {}}}}}})


def test_nested_terms_inside_date_histogram(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "ts": [pd.Timestamp("2025-01-01 00:05"), pd.Timestamp("2025-01-01 00:15"),
               pd.Timestamp("2025-01-01 00:25"), pd.Timestamp("2025-01-01 01:05"),
               pd.Timestamp("2025-01-01 01:15")],
        "kind": ["a", "a", "b", "b", "c"],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0]}))
    out = run_aggs(df, {"aggs": {"h": {
        "date_histogram": {"field": "ts", "fixed_interval": "1h"},
        "aggs": {"top": {"terms": {"field": "kind", "size": 1},
                 "aggs": {"vm": {"max": {"field": "value"}}}}}}}})["h"]
    rows = sorted(out.collect(), key=lambda r: str(r.bucket_start))
    # hour 0: 'a' wins (2 docs); hour 1: tie b/c → 'b' by key asc
    assert [(r.kind, r.doc_count, r.vm) for r in rows] == [
        ("a", 2, 2.0), ("b", 1, 4.0)]


def test_nested_date_histogram_inside_terms(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "ts": [pd.Timestamp("2025-01-01 00:05"), pd.Timestamp("2025-01-01 01:05"),
               pd.Timestamp("2025-01-01 00:15"), pd.Timestamp("2025-01-01 00:20"),
               pd.Timestamp("2025-01-01 02:05")],
        "kind": ["a", "a", "b", "b", "c"],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0]}))
    out = run_aggs(df, {"aggs": {"t": {
        "terms": {"field": "kind", "size": 2},
        "aggs": {"hist": {"date_histogram": {"field": "ts",
                                             "fixed_interval": "1h"}}}}}})["t"]
    rows = sorted(out.collect(), key=lambda r: (r.kind, str(r.bucket_start)))
    # top-2 keys: a (2 docs) and b (2 docs); c excluded
    assert [(r.kind, r.doc_count) for r in rows] == [
        ("a", 1), ("a", 1), ("b", 2)]


def test_nested_depth_two_raises(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "ts": [pd.Timestamp("2025-01-01")], "kind": ["a"], "value": [1.0]}))
    with pytest.raises(ValueError, match="metric sub-aggs only"):
        run_aggs(df, {"aggs": {"h": {
            "date_histogram": {"field": "ts", "fixed_interval": "1h"},
            "aggs": {"t": {"terms": {"field": "kind"},
                     "aggs": {"deeper": {"terms": {"field": "kind"}}}}}}}})
