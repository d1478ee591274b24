"""runtime_mappings, terms include/exclude, docvalue/stored_fields."""

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query.aggs_body import run_aggs
from anomaly_detection_spark.query.planner import search


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(i, ["a", "b", "c", "d"][i % 4], float(i), i % 3)
            for i in range(24)]
    return spark.createDataFrame(
        rows, "docid long, grp string, v double, small long").persist()


def test_runtime_field_in_query_sort_and_response(frame):
    body = {
        "runtime_mappings": {
            "v2": {"type": "double",
                   "script": {"source":
                              "emit(doc['v'].value * params.f)",
                              "params": {"f": 2.0}}},
            "is_big": {"type": "boolean",
                       "script": "emit(doc['v'].value >= 20)"}},
        "query": {"range": {"v2": {"gte": 40.0}}},
        "sort": [{"v2": {"order": "desc"}}],
        "size": 100,
    }
    rows = search(frame, body).collect()
    # v2 = 2v >= 40 -> v >= 20 -> docids 20..23, sorted desc by v2
    assert [r["docid"] for r in rows] == [23, 22, 21, 20]
    assert rows[0]["v2"] == 46.0 and rows[0]["is_big"] is True


def test_runtime_field_in_aggs(frame):
    body = {"runtime_mappings": {
        "bucket2": {"type": "keyword",
                    "script": "emit(doc['small'].value == 0 "
                              "? 'zero' : 'nonzero')"}},
        "aggs": {"by": {"terms": {"field": "bucket2"},
                        "aggs": {"s": {"sum": {"field": "v"}}}}}}
    rows = {r["bucket2"]: r for r in run_aggs(frame, body)["by"].collect()}
    assert rows["zero"]["doc_count"] == 8
    assert rows["nonzero"]["doc_count"] == 16


def test_runtime_field_rejections(frame):
    with pytest.raises(ValueError, match="single\\s+emit|single emit"):
        search(frame, {"runtime_mappings": {
            "x": {"script": "doc['v'].value"}},
            "query": {"match_all": {}}})
    with pytest.raises(ValueError, match="unsupported type"):
        search(frame, {"runtime_mappings": {
            "x": {"type": "date", "script": "emit(1)"}},
            "query": {"match_all": {}}})


def test_terms_include_exclude(frame):
    body = {"aggs": {"t": {"terms": {
        "field": "grp", "include": ["a", "b", "c"], "exclude": ["b"]}}}}
    rows = [r["grp"] for r in run_aggs(frame, body)["t"].collect()]
    assert sorted(rows) == ["a", "c"]
    # regex forms, anchored like the reference's IncludeExclude
    body = {"aggs": {"t": {"terms": {"field": "grp",
                                     "include": "[ab]"}}}}
    rows = [r["grp"] for r in run_aggs(frame, body)["t"].collect()]
    assert sorted(rows) == ["a", "b"]
    body = {"aggs": {"t": {"terms": {"field": "grp",
                                     "exclude": "a|d"}}}}
    rows = [r["grp"] for r in run_aggs(frame, body)["t"].collect()]
    assert sorted(rows) == ["b", "c"]


def test_docvalue_and_stored_fields(frame):
    from anomaly_detection_spark.query import analyze_docs

    an = analyze_docs(frame.withColumn(
        "text", F.concat(F.lit("term"), F.col("grp"))))
    body = {"query": {"match": {"text": "terma"}},
            "_source": False,
            "docvalue_fields": ["v", {"field": "grp"}],
            "size": 3}
    rows = search(an, body).collect()
    assert rows and set(rows[0].asDict()) == {"docid", "score", "v",
                                              "grp"}
    with pytest.raises(ValueError, match="format"):
        search(an, {"query": {"match": {"text": "terma"}},
                    "docvalue_fields": [
                        {"field": "v", "format": "0.0"}]})
    with pytest.raises(ValueError, match="not available"):
        search(an, {"query": {"match": {"text": "terma"}},
                    "docvalue_fields": ["nope"]})


def test_significance_heuristics(spark):
    # contingency fixture: 10 fg docs of 40 bg; "hot" is fg-skewed
    import math

    rows = []
    for i in range(40):
        fg = i < 10
        term = "hot" if (i < 8 or i == 20) else "cold"
        rows.append((i, "fg" if fg else "bg", term))
    df = spark.createDataFrame(rows, "id long, scope string, term string")
    body_base = {"query": {"term": {"scope": "fg"}}}

    def run(heur_key=None):
        spec = {"field": "term", "min_doc_count": 1}
        if heur_key:
            spec[heur_key] = {}
        out = run_aggs(df, {**body_base,
                            "aggs": {"s": {"significant_terms": spec}}})
        return {r["term"]: r for r in out["s"].collect()}

    a, b_, n_fg, n_bg = 8.0, 2.0, 10.0, 40.0   # fg hot / fg other
    bg_hot = 9.0
    # percentage = fg_count / bg_count
    got = run("percentage")
    assert got["hot"]["score"] == pytest.approx(8 / 9)
    # chi_square vs hand formula
    c = bg_hot - a
    d = (n_bg - n_fg) - c
    num = n_bg * (a * d - b_ * c) ** 2
    den = (a + b_) * (c + d) * (a + c) * (b_ + d)
    got = run("chi_square")
    assert got["hot"]["score"] == pytest.approx(num / den)
    # negative association ("cold" is bg-skewed) scores 0 -> dropped
    assert "cold" not in got
    # gnd = 1 - NGD
    fx, fy, fxy, nn = n_fg, bg_hot, a, n_bg
    gnd = ((max(math.log(fx), math.log(fy)) - math.log(fxy))
           / (math.log(nn) - min(math.log(fx), math.log(fy))))
    got = run("gnd")
    assert got["hot"]["score"] == pytest.approx(max(0.0, 1 - gnd))
    # default stays JLH
    fg_pct, bg_pct = a / n_fg, bg_hot / n_bg
    got = run()
    assert got["hot"]["score"] == pytest.approx(
        (fg_pct - bg_pct) * fg_pct / bg_pct)
    with pytest.raises(ValueError, match="at most one"):
        run_aggs(df, {**body_base, "aggs": {"s": {"significant_terms": {
            "field": "term", "jlh": {}, "gnd": {}}}}})


def test_ip_range_agg(spark):
    rows = [(0, "10.0.0.1"), (1, "10.0.0.120"), (2, "10.0.0.200"),
            (3, "192.168.1.1"), (4, "not-an-ip"), (5, None),
            (6, "10.0.0.5")]
    df = spark.createDataFrame(rows, "id long, ip string")
    body = {"aggs": {"r": {"ip_range": {"field": "ip", "ranges": [
        {"to": "10.0.0.100"},
        {"from": "10.0.0.100", "to": "11.0.0.0"},
        {"mask": "10.0.0.0/25"},
    ]}}}}
    out = {r["range_id"]: r["doc_count"]
           for r in run_aggs(df, body)["r"].collect()}
    assert out[0] == 2          # .1 and .5
    assert out[1] == 2          # .120 and .200
    assert out[2] == 3          # /25 covers .1 .5 .120 (<128): 3
    # invalid / null / out-of-range never bucket; IPv6 rejects
    import pytest as _pt
    with _pt.raises(ValueError, match="IPv4"):
        run_aggs(df, {"aggs": {"r": {"ip_range": {
            "field": "ip", "ranges": [{"from": "::1"}]}}}})


def test_ip_prefix_agg(spark):
    rows = [(0, "10.0.0.1"), (1, "10.0.0.120"), (2, "10.0.0.200"),
            (3, "192.168.1.1"), (4, "not-an-ip"), (5, None),
            (6, "10.0.0.5"), (7, "10.0.1.9")]
    df = spark.createDataFrame(rows, "id long, ip string")
    out = run_aggs(df, {"aggs": {"p": {"ip_prefix": {
        "field": "ip", "prefix_length": 24}}}})["p"].collect()
    # sorted ascending by network address; invalid / null never bucket
    assert [(r["key"], r["doc_count"]) for r in out] == [
        ("10.0.0.0", 4), ("10.0.1.0", 1), ("192.168.1.0", 1)]
    out = run_aggs(df, {"aggs": {"p": {
        "ip_prefix": {"field": "ip", "prefix_length": 25,
                      "append_prefix_length": True, "min_doc_count": 2},
        "aggs": {"mx": {"max": {"field": "id"}}}}}})["p"].collect()
    # /25 splits 10.0.0.x at 128: {.1,.5,.120} vs {.200}; mdc=2 keeps
    # only the low half; sub-agg rides the same groupBy
    assert [(r["key"], r["doc_count"], r["mx"]) for r in out] == [
        ("10.0.0.0/25", 3, 6.0)]
    import pytest as _pt
    with _pt.raises(ValueError, match="IPv4"):
        run_aggs(df, {"aggs": {"p": {"ip_prefix": {
            "field": "ip", "prefix_length": 64, "is_ipv6": True}}}})
    with _pt.raises(ValueError, match="prefix_length"):
        run_aggs(df, {"aggs": {"p": {"ip_prefix": {
            "field": "ip", "prefix_length": 33}}}})
    with _pt.raises(ValueError, match="unsupported"):
        run_aggs(df, {"aggs": {"p": {"ip_prefix": {
            "field": "ip", "prefix_length": 24, "keyed": True}}}})


def test_parent_id_query(spark):
    from anomaly_detection_spark.query.relations import parent_id

    children = spark.createDataFrame(
        [("c1", 0), ("c1", 1), ("c2", 0)], ["conv_id", "turn_idx"])
    got = parent_id(children, "c1").collect()
    assert len(got) == 2 and all(r["conv_id"] == "c1" for r in got)


def test_match_fuzziness_filter_context(spark):
    from anomaly_detection_spark.query.planner import compile_filter, search

    df = spark.createDataFrame(
        [(0, "the quick borwn fox"),     # transposition of brown
         (1, "a quikc evening"),         # transposition of quick
         (2, "nothing relevant")],
        "docid long, text string")
    q = {"match": {"text": {"query": "brown quick",
                            "fuzziness": 1, "operator": "or"}}}
    got = sorted(r["docid"] for r in
                 df.filter(compile_filter(df, q)).collect())
    assert got == [0, 1]
    # operator and: doc must carry BOTH fuzzy tokens
    q_and = {"match": {"text": {"query": "brown quick",
                                "fuzziness": 1, "operator": "and"}}}
    got = sorted(r["docid"] for r in
                 df.filter(compile_filter(df, q_and)).collect())
    assert got == [0]
    # AUTO: short tokens get 0 edits
    q_auto = {"match": {"text": {"query": "fox", "fuzziness": "AUTO"}}}
    got = sorted(r["docid"] for r in
                 df.filter(compile_filter(df, q_auto)).collect())
    assert got == [0]
    # scored context raises by name
    import pytest as _pt
    from anomaly_detection_spark.query import analyze_docs
    with _pt.raises(ValueError, match="filter context"):
        search(analyze_docs(df),
               {"query": {"match": {"text": {"query": "brown",
                                             "fuzziness": 1}}}})


def test_search_rejects_aggs_section(spark):
    from anomaly_detection_spark.query.planner import search

    df = spark.createDataFrame([(0, "x")], "docid long, text string")
    import pytest as _pt
    with _pt.raises(ValueError, match="run_aggs"):
        search(df, {"query": {"match_all": {}},
                    "aggs": {"t": {"terms": {"field": "text"}}}})
