"""scripted_metric — the distributive painless subset: canonical
profit example, guards/ternary/params, reduce expressions, bucket
sub-agg placement, partition invariance, and by-name rejections."""

import pytest

from anomaly_detection_spark.query.aggs import (_painless_arith,
                                                scripted_metric_column)
from anomaly_detection_spark.query.aggs_body import run_aggs


@pytest.fixture(scope="module")
def sales(spark):
    rows = [("sale", 10.0, "a"), ("cost", 3.0, "a"), ("sale", 7.5, "b"),
            ("cost", 2.5, "b"), ("sale", 4.0, "a"), ("cost", 1.0, "b")]
    return spark.createDataFrame(
        rows, "type string, amount double, region string").repartition(3)


def test_painless_arith_translation():
    assert _painless_arith("doc['amount'].value * 2", {}) == \
        "`amount` * 2"
    assert _painless_arith("doc.amount.value + params.fee",
                           {"fee": 1.5}) == "`amount` + 1.5"
    sql = _painless_arith(
        "doc['type'].value == 'sale' ? doc['amount'].value : 0", {})
    assert sql == "IF(`type` == 'sale', `amount`, 0)"
    with pytest.raises(ValueError, match="unknown scripted_metric param"):
        _painless_arith("params.nope", {})
    with pytest.raises(ValueError, match="unsupported"):
        _painless_arith("java.lang.Runtime.getRuntime()", {})
    with pytest.raises(ValueError, match="unsupported"):
        _painless_arith("doc['x'].value); DROP TABLE t; --", {})


def test_canonical_profit(sales):
    # the documented scripted_metric example: profit = sales - costs
    body = {"aggs": {"profit": {"scripted_metric": {
        "init_script": "state.profit = 0",
        "map_script": ("state.profit += doc['type'].value == 'sale' "
                       "? doc['amount'].value "
                       ": -1 * doc['amount'].value"),
        "combine_script": "return state",
    }}}}
    got = run_aggs(sales, body)["profit"].collect()[0]["profit"]
    assert got == pytest.approx((10.0 + 7.5 + 4.0) - (3.0 + 2.5 + 1.0))


def test_guarded_statements_and_reduce(sales):
    body = {"aggs": {"avg_sale": {"scripted_metric": {
        "init_script": "state.total = 0; state.n = 0",
        "map_script": ("if (doc['type'].value == 'sale') "
                       "{ state.total += doc['amount'].value; "
                       "state.n += 1; }"),
        "reduce_script": "return state.total / state.n",
    }}}}
    got = run_aggs(sales, body)["avg_sale"].collect()[0]["avg_sale"]
    assert got == pytest.approx((10.0 + 7.5 + 4.0) / 3)


def test_multi_accumulator_struct(sales):
    body = {"aggs": {"s": {"scripted_metric": {
        "map_script": ("state.total += doc['amount'].value; "
                       "state.n += 1"),
    }}}}
    row = run_aggs(sales, body)["s"].collect()[0]["s"]
    assert row["total"] == pytest.approx(28.0)
    assert row["n"] == 6


def test_under_terms_bucket(sales):
    body = {"aggs": {"by_region": {
        "terms": {"field": "region"},
        "aggs": {"profit": {"scripted_metric": {
            "map_script": ("state.p += doc['type'].value == 'sale' "
                           "? doc['amount'].value "
                           ": -1 * doc['amount'].value")}}}}}}
    rows = {r["region"]: r["profit"]
            for r in run_aggs(sales, body)["by_region"].collect()}
    assert rows["a"] == pytest.approx(10.0 + 4.0 - 3.0)
    assert rows["b"] == pytest.approx(7.5 - 2.5 - 1.0)


def test_partition_invariance(sales):
    body = {"aggs": {"p": {"scripted_metric": {
        "map_script": "state.p += doc['amount'].value * params.w",
        "params": {"w": 2.0}}}}}
    a = run_aggs(sales.repartition(1), body)["p"].collect()[0]["p"]
    b = run_aggs(sales.repartition(7), body)["p"].collect()[0]["p"]
    assert a == b == pytest.approx(56.0)


def test_rejections():
    with pytest.raises(ValueError, match="shard-count-dependent"):
        scripted_metric_column(
            {"init_script": "state.x = 5", "map_script": "state.x += 1"},
            "a")
    with pytest.raises(ValueError, match="combine_script subset"):
        scripted_metric_column(
            {"map_script": "state.x += 1",
             "combine_script": "return state.x * 2"}, "a")
    with pytest.raises(ValueError, match="requires a map_script"):
        scripted_metric_column({}, "a")
    with pytest.raises(ValueError, match="must be 'state.v"):
        scripted_metric_column({"map_script": "state.x = 1"}, "a")
    with pytest.raises(ValueError, match="unknown accumulators"):
        scripted_metric_column(
            {"map_script": "state.x += 1",
             "reduce_script": "return state.y"}, "a")
