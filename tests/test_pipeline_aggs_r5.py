"""Round-5 pipeline-agg ring: moving_fn, normalize,
moving_percentiles, cumulative_cardinality — each against a DuckDB
oracle computing the documented reference formula on the same data.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query import run_aggs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(f"{SF}/events.parquet").persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"create view events as select * from '{SF}/events.parquet'")
    yield c
    c.close()


DAY = 86_400_000
DAILY = ("select (epoch_ms(ts) // 86400000) * 86400000 as b, "
         "count(*) as n, avg(value) as v from events "
         "group by 1 order by 1")


def _daily_body(pipes):
    return {"aggs": {"per_day": {
        "date_histogram": {"field": "ts", "fixed_interval": "1d",
                           "min_doc_count": 1},
        "aggs": {"v": {"avg": {"field": "value"}}, **pipes}}}}


def test_moving_fn_simple_and_weighted(events, con):
    body = _daily_body({
        "mmax": {"moving_fn": {"buckets_path": "v", "window": 3,
                               "script": "max"}},
        "mavg_inc": {"moving_fn": {"buckets_path": "v", "window": 3,
                                   "shift": 1,
                                   "script": "unweightedAvg"}},
        "lwa": {"moving_fn": {"buckets_path": "v", "window": 4,
                              "shift": 1,
                              "script": "linearWeightedAvg"}},
        "ew": {"moving_fn": {"buckets_path": "v", "window": 4,
                             "shift": 1, "alpha": 0.4,
                             "script": "ewma"}},
    })
    got = (run_aggs(events, body)["per_day"]
           .orderBy("bucket_start").toPandas())
    base = con.execute(DAILY).df()
    v = base.v.to_numpy()
    # shift=0 window = 3 buckets strictly before i
    for i in range(len(v)):
        lo = max(0, i - 3)
        wantmax = v[lo:i].max() if i > lo else None
        if wantmax is None:
            assert got.mmax[i] is None or np.isnan(got.mmax[i])
        else:
            assert got.mmax[i] == pytest.approx(wantmax)
        # shift=1 includes current bucket
        lo1 = max(0, i - 2)
        assert got.mavg_inc[i] == pytest.approx(v[lo1:i + 1].mean())
        xs = v[max(0, i - 3):i + 1]
        wts = np.arange(1, len(xs) + 1)
        assert got.lwa[i] == pytest.approx((xs * wts).sum() / wts.sum())
        ew = xs[0]
        for x in xs[1:]:
            ew = 0.4 * x + 0.6 * ew
        assert got.ew[i] == pytest.approx(ew)


def test_normalize_methods(events, con):
    body = _daily_body({
        "r01": {"normalize": {"buckets_path": "v",
                              "method": "rescale_0_1"}},
        "pos": {"normalize": {"buckets_path": "v",
                              "method": "percent_of_sum"}},
        "mn": {"normalize": {"buckets_path": "v", "method": "mean"}},
        "z": {"normalize": {"buckets_path": "v", "method": "z-score"}},
        "sm": {"normalize": {"buckets_path": "v", "method": "softmax"}},
    })
    got = (run_aggs(events, body)["per_day"]
           .orderBy("bucket_start").toPandas())
    v = con.execute(DAILY).df().v.to_numpy()
    assert np.allclose(got.r01, (v - v.min()) / (v.max() - v.min()))
    assert np.allclose(got.pos, v / v.sum())
    assert np.allclose(got.mn, (v - v.mean()) / (v.max() - v.min()))
    assert np.allclose(got.z, (v - v.mean()) / v.std())
    assert np.allclose(got.sm, np.exp(v) / np.exp(v).sum())
    with pytest.raises(ValueError, match="normalize method"):
        run_aggs(events, _daily_body(
            {"bad": {"normalize": {"buckets_path": "v",
                                   "method": "nope"}}}))


def test_moving_percentiles(events, con):
    body = _daily_body({
        "mp": {"moving_percentiles": {"buckets_path": "v", "window": 5,
                                      "shift": 1,
                                      "percents": [50.0]}}})
    got = (run_aggs(events, body)["per_day"]
           .orderBy("bucket_start").toPandas())
    v = con.execute(DAILY).df().v.to_numpy()
    for i in range(len(v)):
        xs = v[max(0, i - 4):i + 1]
        assert got.mp[i] == pytest.approx(np.percentile(xs, 50))


def test_cumulative_cardinality_vs_duckdb(events, con):
    body = {"query": {"range": {"value": {"gte": 0}}},
            "aggs": {"per_day": {
                "date_histogram": {"field": "ts",
                                   "fixed_interval": "1d",
                                   "min_doc_count": 1},
                "aggs": {
                    "u": {"cardinality": {"field": "user_id"}},
                    "total_u": {"cumulative_cardinality": {
                        "buckets_path": "u"}}}}}}
    got = (run_aggs(events, body)["per_day"]
           .orderBy("bucket_start").toPandas())
    want = con.execute("""
      with b as (
        select (epoch_ms(ts) // 86400000) * 86400000 as b, user_id
        from events where value >= 0),
      f as (select user_id, min(b) as b from b group by 1),
      n as (select b, count(*) as new from f group by 1)
      select b, sum(new) over (order by b
          rows between unbounded preceding and current row) as cum
      from n order by b
    """).df()
    # forward-fill oracle onto the engine's bucket list
    m = dict(zip(want.b, want.cum))
    run = 0
    ms = got.bucket_start.astype("int64") // 10**6
    for i, row in got.iterrows():
        run = m.get(ms[i], run)
        assert row.total_u == run
    # monotone, ends at the global distinct count
    assert got.total_u.is_monotonic_increasing
    assert got.total_u.iloc[-1] == con.execute(
        "select count(distinct user_id) from events where value >= 0"
    ).fetchone()[0]
    with pytest.raises(ValueError, match="cardinality sub-agg"):
        run_aggs(events, {"aggs": {"per_day": {
            "date_histogram": {"field": "ts", "fixed_interval": "1d"},
            "aggs": {"v": {"avg": {"field": "value"}},
                     "t": {"cumulative_cardinality": {
                         "buckets_path": "v"}}}}}})


def test_sibling_stats_buckets_vs_duckdb(events, con):
    """stats_bucket / extended_stats_bucket / percentiles_bucket
    through the body compiler — population moments + sigma bounds
    hand-computed from the same DuckDB daily series."""
    body = _daily_body({
        "es": {"extended_stats_bucket": {"buckets_path": "v",
                                         "sigma": 1.5}},
        "pb": {"percentiles_bucket": {"buckets_path": "v",
                                      "percents": [25.0, 75.0]}},
    })
    got = run_aggs(events, body)["per_day"].toPandas()
    v = con.execute(DAILY).df().v.to_numpy()
    assert len(got) == 1
    r = got.iloc[0]
    assert r.v_count == len(v)
    assert r.v_avg == pytest.approx(v.mean())
    assert r.v_sum == pytest.approx(v.sum())
    assert r.v_sum_of_squares == pytest.approx((v * v).sum())
    assert r.v_variance == pytest.approx(v.var())       # population
    sd = np.sqrt(v.var())
    assert r.v_std_deviation == pytest.approx(sd)
    assert r.v_std_upper == pytest.approx(v.mean() + 1.5 * sd)
    assert r.v_std_lower == pytest.approx(v.mean() - 1.5 * sd)
    assert r.v_percentiles == pytest.approx(
        [np.percentile(v, 25), np.percentile(v, 75)])
    # stats_bucket alone shares the plain moments
    sb = run_aggs(events, _daily_body(
        {"sb": {"stats_bucket": {"buckets_path": "v"}}}))["per_day"] \
        .toPandas().iloc[0]
    assert sb.v_count == len(v) and sb.v_sum == pytest.approx(v.sum())
    # colliding sibling outputs reject by name
    with pytest.raises(ValueError, match="colliding"):
        run_aggs(events, _daily_body({
            "a": {"stats_bucket": {"buckets_path": "v"}},
            "b": {"extended_stats_bucket": {"buckets_path": "v"}},
        }))["per_day"].columns


def test_cumulative_cardinality_gap_buckets_carry_total(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "ts": pd.to_datetime([0, 1, 3 * DAY, 3 * DAY + 5],
                             unit="ms"),
        "user_id": ["a", "b", "b", "c"]}))
    body = {"aggs": {"per_day": {
        "date_histogram": {"field": "ts", "fixed_interval": "1d",
                           "min_doc_count": 0},
        "aggs": {"u": {"cardinality": {"field": "user_id"}},
                 "t": {"cumulative_cardinality": {
                     "buckets_path": "u"}}}}}}
    got = (run_aggs(df, body)["per_day"]
           .orderBy("bucket_start").toPandas())
    assert list(got.bucket_start.astype("int64") // 10**6) == \
        [0, DAY, 2 * DAY, 3 * DAY]
    assert list(got.doc_count) == [2, 0, 0, 2]
    assert list(got.t) == [2, 2, 2, 3]
