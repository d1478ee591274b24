"""Fourth-session parity batch: date math in range queries, terms
agg ordering, metric/terms `missing` substitution, histogram
extended_bounds."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.datemath import datemath_ms
from anomaly_detection_spark.query.aggs_body import run_aggs
from anomaly_detection_spark.query.planner import compile_filter

NOW = int(dt.datetime(2025, 6, 10, 12, 0, 0,
                      tzinfo=dt.timezone.utc).timestamp() * 1000)


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    for d in range(1, 10):  # 2025-06-01 .. 2025-06-09, noon
        rows.append((d, dt.datetime(2025, 6, d, 12, 0, 0), "u%d" % (d % 3),
                     float(d)))
    return spark.createDataFrame(
        rows, "docid long, ts timestamp_ntz, user string, v double") \
        .persist()


# ------------------------------------------------------------ datemath

def test_datemath_formula_cases():
    base = dt.datetime(2025, 6, 10, 12, 0, 0, tzinfo=dt.timezone.utc)

    def iso(ms):
        return dt.datetime.fromtimestamp(ms / 1000, tz=dt.timezone.utc)

    assert iso(datemath_ms("now-1d/d", NOW)) == \
        base.replace(day=9, hour=0)
    assert iso(datemath_ms("now/M", NOW)) == base.replace(day=1, hour=0)
    assert iso(datemath_ms("2025-01-31||+1M", NOW)) == \
        dt.datetime(2025, 2, 28, tzinfo=dt.timezone.utc)
    assert iso(datemath_ms("now-1w+2h", NOW)) == \
        base.replace(day=3, hour=14)
    with pytest.raises(ValueError, match="unparseable"):
        datemath_ms("now-1q", NOW)


def test_range_query_accepts_date_math(events):
    q = {"range": {"ts": {"gte": "now-7d/d", "lt": "now-2d/d",
                          "now_ms": NOW}}}
    got = sorted(r["docid"] for r in
                 events.filter(compile_filter(events, q)).collect())
    # [2025-06-03 00:00, 2025-06-08 00:00) -> days 3..7
    assert got == [3, 4, 5, 6, 7]
    # anchored form
    q2 = {"range": {"ts": {"gte": "2025-06-04||/d",
                           "lt": "2025-06-04||+2d/d"}}}
    got2 = sorted(r["docid"] for r in
                  events.filter(compile_filter(events, q2)).collect())
    assert got2 == [4, 5]


# --------------------------------------------------------- terms order

def test_terms_agg_order_variants(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("c", 2.0), ("c", 4.0),
         ("c", 6.0)], ["k", "v"])
    body = lambda order: {"aggs": {"t": {  # noqa: E731
        "terms": {"field": "k", "size": 3, "order": order},
        "aggs": {"m": {"avg": {"field": "v"}}}}}}
    assert list(run_aggs(df, body({"_count": "asc"}))["t"]
                .toPandas().k) == ["b", "a", "c"]
    assert list(run_aggs(df, body({"_key": "desc"}))["t"]
                .toPandas().k) == ["c", "b", "a"]
    # order by the sub-metric: avg(v) = a 2.0, b 10.0, c 4.0
    assert list(run_aggs(df, body({"m": "desc"}))["t"]
                .toPandas().k) == ["b", "c", "a"]
    # size cut happens AFTER the requested order (top by metric)
    out = run_aggs(df, {"aggs": {"t": {
        "terms": {"field": "k", "size": 1, "order": {"m": "asc"}},
        "aggs": {"m": {"avg": {"field": "v"}}}}}})["t"].toPandas()
    assert list(out.k) == ["a"]
    with pytest.raises(ValueError, match="order"):
        run_aggs(df, body({"nope": "desc"}))


# ------------------------------------------------------------- missing

def test_missing_substitution(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 4.0), (None, 10.0)],
        ["k", "v"])
    # metric missing: null v scores as 0
    out = run_aggs(df, {"aggs": {"m": {
        "avg": {"field": "v", "missing": 0.0}}}})["m"].collect()[0]
    assert out["m"] == pytest.approx((1.0 + 0.0 + 4.0 + 10.0) / 4)
    # terms missing: null key becomes the bucket "N/A"
    out = run_aggs(df, {"aggs": {"t": {"terms": {
        "field": "k", "missing": "N/A"}}}})["t"].toPandas()
    assert set(out.k) == {"a", "b", "N/A"}
    assert int(out[out.k == "N/A"].doc_count.iloc[0]) == 1


# ------------------------------------------------- extended_bounds

def test_histogram_extended_bounds(spark):
    df = spark.createDataFrame([(5.0,), (7.0,)], ["v"])
    out = run_aggs(df, {"aggs": {"h": {"histogram": {
        "field": "v", "interval": 2.0, "min_doc_count": 0,
        "extended_bounds": {"min": 0, "max": 11}}}}})["h"].toPandas()
    assert list(out.key) == [0.0, 2.0, 4.0, 6.0, 8.0, 10.0]
    assert list(out.doc_count) == [0, 0, 1, 1, 0, 0]
    # without bounds the grid spans only the data extent
    out2 = run_aggs(df, {"aggs": {"h": {"histogram": {
        "field": "v", "interval": 2.0,
        "min_doc_count": 0}}}})["h"].toPandas()
    assert list(out2.key) == [4.0, 6.0]


# ------------------------------------------------ composite after/size

def test_composite_after_key_paging(spark):
    rows = [("a", 1), ("a", 2), ("b", 1), ("b", 2), ("c", 1)]
    df = spark.createDataFrame(rows, ["k", "n"])
    body = lambda after: {"aggs": {"c": {"composite": {  # noqa: E731
        "sources": [{"k": {"terms": {"field": "k"}}},
                    {"n": {"terms": {"field": "n"}}}],
        "size": 2, **({"after": after} if after else {})}}}}
    pages, after = [], None
    while True:
        rows_ = run_aggs(df, body(after))["c"].collect()
        if not rows_:
            break
        pages.append([(r["k"], r["n"]) for r in rows_])
        after = {"k": rows_[-1]["k"], "n": rows_[-1]["n"]}
        if len(rows_) < 2:
            break
    assert pages == [[("a", 1), ("a", 2)], [("b", 1), ("b", 2)],
                     [("c", 1)]]
    # paging == one unpaged run
    full = run_aggs(df, {"aggs": {"c": {"composite": {"sources": [
        {"k": {"terms": {"field": "k"}}},
        {"n": {"terms": {"field": "n"}}}]}}}})["c"]
    assert sorted((r["k"], r["n"]) for r in full.collect()) == \
        [p for pg in pages for p in pg]
    # dict-after validation
    with pytest.raises(ValueError, match="missing sources"):
        run_aggs(df, body({"k": "a"}))


# --------------------------------- date_range date math, other_bucket

def test_date_range_accepts_date_math(events):
    out = run_aggs(events, {"aggs": {"r": {"date_range": {
        "field": "ts", "now_ms": NOW,
        "ranges": [{"from": "now-7d/d", "to": "now-5d/d"},
                   {"from": "now-5d/d", "to": "now/d"}]}}}})["r"]
    rows = out.collect()
    # [06-03, 06-05): days 3,4 ; [06-05, 06-10): days 5..9
    assert [r["doc_count"] for r in rows] == [2, 5]


def test_filters_other_bucket(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("c", 4)], ["k", "v"])
    out = run_aggs(df, {"aggs": {"f": {"filters": {
        "filters": {"as": {"term": {"k": "a"}},
                    "bs": {"term": {"k": "b"}}},
        "other_bucket": True}}}})["f"].toPandas()
    got = dict(zip(out.filter_key, out.doc_count))
    assert got == {"as": 1, "bs": 1, "_other_": 2}
    out2 = run_aggs(df, {"aggs": {"f": {"filters": {
        "filters": {"as": {"term": {"k": "a"}}},
        "other_bucket": True, "other_bucket_key": "rest"}}}})["f"] \
        .toPandas()
    got2 = dict(zip(out2.filter_key, out2.doc_count))
    assert got2 == {"as": 1, "rest": 3}


def test_compile_filter_pins_one_now(events, monkeypatch):
    # two now-based clauses in one bool must resolve against ONE now
    import anomaly_detection_spark.functions.datemath as dm

    seen = []
    orig = dm.datemath_ms

    def spy(expr, now_ms=None):
        seen.append(now_ms)
        return orig(expr, now_ms)

    monkeypatch.setattr(dm, "datemath_ms", spy)
    compile_filter(events, {"bool": {"filter": [
        {"range": {"ts": {"gte": "now-7d"}}},
        {"range": {"ts": {"lt": "now-1d"}}}]}})
    assert len(seen) == 2 and seen[0] == seen[1] is not None
