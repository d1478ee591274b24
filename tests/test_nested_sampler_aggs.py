"""Round-5 scope aggs: nested / reverse_nested / sampler /
diversified_sampler — DuckDB UNNEST oracles on a per-user nested
events frame.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query import run_aggs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nested_users(spark):
    """One row per user with an array<struct> of their events —
    the same shape the nested_exists_users gate entry builds."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    df = (ev.groupBy("user_id")
          .agg(F.collect_list(F.struct("event_type", "value"))
               .alias("events")).persist())
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"create view events as select * from '{SF}/events.parquet'")
    yield c
    c.close()


def test_nested_global_metrics(nested_users, con):
    body = {"aggs": {"evs": {
        "nested": {"path": "events"},
        "aggs": {"v_avg": {"avg": {"field": "events.value"}},
                 "v_max": {"max": {"field": "events.value"}}}}}}
    got = run_aggs(nested_users, body)["evs"].collect()[0]
    want = con.execute(
        "select count(*), avg(value), max(value) from events").fetchone()
    assert got["doc_count"] == want[0]
    assert got["v_avg"] == pytest.approx(want[1])
    assert got["v_max"] == want[2]


def test_nested_terms_with_reverse_nested(nested_users, con):
    body = {"aggs": {"evs": {
        "nested": {"path": "events"},
        "aggs": {"by_type": {
            "terms": {"field": "events.event_type", "size": 3},
            "aggs": {"v_avg": {"avg": {"field": "events.value"}},
                     "parents": {"reverse_nested": {}}}}}}}}
    got = (run_aggs(nested_users, body)["evs"]
           .orderBy(F.desc("doc_count"), "event_type").toPandas())
    want = con.execute("""
      select event_type, count(*) as n, avg(value) as v,
             count(distinct user_id) as parents
      from events group by 1 order by n desc, event_type limit 3
    """).df()
    assert list(got.event_type) == list(want.event_type)
    assert list(got.doc_count) == list(want.n)
    for g, w in zip(got.v_avg, want.v):
        assert g == pytest.approx(w)
    # reverse_nested: parent (user) docs per nested bucket
    assert list(got.parents_doc_count) == list(want.parents)


def test_sampler_top_n_by_value(spark, con):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    body = {"aggs": {"s": {
        "sampler": {"shard_size": 50, "sort": "value",
                    "tie_breaker": "event_id"},
        "aggs": {"v_min": {"min": {"field": "value"}},
                 "v_avg": {"avg": {"field": "value"}}}}}}
    got = run_aggs(ev, body)["s"].collect()[0]
    want = con.execute("""
      with s as (select value from events
                 order by value desc, event_id limit 50)
      select count(*), min(value), avg(value) from s""").fetchone()
    assert got["doc_count"] == want[0]
    assert got["v_min"] == pytest.approx(want[1])
    assert got["v_avg"] == pytest.approx(want[2])
    with pytest.raises(ValueError, match="sort"):
        run_aggs(ev, {"aggs": {"s": {"sampler": {"shard_size": 5}}}})


def test_diversified_sampler_caps_per_value(spark, con):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    body = {"aggs": {"s": {
        "diversified_sampler": {
            "shard_size": 20, "sort": "value", "field": "user_id",
            "max_docs_per_value": 1, "tie_breaker": "event_id"},
        "aggs": {"v_avg": {"avg": {"field": "value"}}}}}}
    got = run_aggs(ev, body)["s"].collect()[0]
    want = con.execute("""
      with ranked as (
        select value, row_number() over (
            partition by user_id order by value desc, event_id) as rk
        from events),
      s as (select value from ranked where rk = 1
            order by value desc limit 20)
      select count(*), avg(value) from s""").fetchone()
    assert got["doc_count"] == want[0]
    assert got["v_avg"] == pytest.approx(want[1])
