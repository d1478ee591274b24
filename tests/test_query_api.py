"""API ring: terms lookup, validate_query, field_caps, msearch,
count."""

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query import analyze_docs
from anomaly_detection_spark.query.api import (
    count, field_caps, msearch, validate_query)
from anomaly_detection_spark.query.planner import compile_filter, search


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "user", ["u1", "u2"], "alpha beta"),
        (1, "tool", ["u2"], "gamma"),
        (2, "user", ["u3"], "alpha"),
        (3, "u2", None, "beta gamma"),
    ]
    df = spark.createDataFrame(
        rows, "docid long, role string, followers array<string>, "
              "text string")
    return analyze_docs(df).persist()


def test_terms_lookup(docs):
    # doc 0's followers list feeds the terms filter on role
    q = {"terms": {"role": {"id": 0, "path": "followers"}}}
    got = sorted(r["docid"] for r in
                 docs.filter(compile_filter(docs, q)).collect())
    assert got == [3]  # role == "u2" only
    # null-source doc -> matches nothing
    q = {"terms": {"role": {"id": 3, "path": "followers"}}}
    assert docs.filter(compile_filter(docs, q)).count() == 0
    with pytest.raises(ValueError, match="lookup"):
        compile_filter(docs, {"terms": {"role": {"id": 0}}})
    with pytest.raises(ValueError, match="unsupported"):
        compile_filter(docs, {"terms": {"role": {
            "id": 0, "path": "followers", "routing": "x"}}})


def test_validate_query(docs):
    ok = validate_query(docs, {"bool": {"filter": [
        {"term": {"role": "user"}},
        {"exists": {"field": "followers"}}]}})
    assert ok["valid"] and "role" in ok["explanation"]
    bad = validate_query(docs, {"knn_broken": {"x": 1}})
    assert not bad["valid"] and "knn_broken" in bad["error"]
    bad2 = validate_query(docs, {"terms_set": {"text": {
        "terms": ["a"]}}})
    assert not bad2["valid"] and "minimum_should_match" in bad2["error"]


def test_field_caps(docs):
    caps = {c["field"]: c for c in field_caps(docs)}
    assert "tokens" not in caps and "doc_len" not in caps
    assert caps["role"]["aggregatable"] is True
    assert caps["followers"]["aggregatable"] is False
    assert caps["followers"]["type"] == "array<string>"
    assert all(c["searchable"] for c in caps.values())


def test_msearch_and_count(docs):
    outs = msearch(docs, [
        {"query": {"term": {"role": "user"}}, "size": 10,
         "sort": [{"docid": "asc"}]},
        {"query": {"match": {"text": "alpha"}}, "size": 2},
    ])
    assert [r["docid"] for r in outs[0].collect()] == [0, 2]
    assert len(outs[1].collect()) == 2
    assert count(docs) == 4
    assert count(docs, {"term": {"role": "tool"}}) == 1


def test_analyze_and_suggest_sections(docs):
    from anomaly_detection_spark.query.api import analyze, suggest

    assert analyze("The Quick-Brown FOX") == ["the", "quick",
                                              "brown", "fox"]
    out = suggest(docs, {
        "fix": {"text": "alpah", "term": {"size": 2}},
        "didyoumean": {"text": "alpha gama",
                       "phrase": {"size": 2}}})
    fix = out["fix"].toPandas()
    assert fix.option[0] == "alpha"
    dym = out["didyoumean"].toPandas()
    assert dym.suggestion[0] == "alpha gamma"
    with pytest.raises(ValueError, match="exactly one"):
        suggest(docs, {"s": {"text": "x"}})


def test_wrapper_match_none_exists_empty_array(spark, docs):
    import base64
    import json

    ids = lambda q: sorted(  # noqa: E731
        r["docid"] for r in
        docs.filter(compile_filter(docs, q)).collect())
    assert ids({"match_none": {}}) == []
    inner = {"term": {"role": "user"}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    assert ids({"wrapper": {"query": b64}}) == ids(inner)
    # exists: empty array == missing (the reference's doc-values view)
    df = spark.createDataFrame(
        [(0, ["x"]), (1, []), (2, None)],
        "docid long, tags array<string>")
    got = sorted(r["docid"] for r in df.filter(
        compile_filter(df, {"exists": {"field": "tags"}})).collect())
    assert got == [0]


def test_suggest_section_completion(docs):
    from anomaly_detection_spark.query.api import suggest

    out = suggest(docs, {"c": {"prefix": "alp",
                               "completion": {"size": 2}}})
    got = out["c"].toPandas()
    assert list(got.option) == ["alpha"]


def test_termvectors(spark):
    from anomaly_detection_spark.query.api import mtermvectors, termvectors

    df = spark.createDataFrame(
        [(0, "the Quick fox the fox"), (1, "solo")],
        "docid long, text string")
    tv = termvectors(df, 0)
    by = {e["term"]: e for e in tv}
    assert by["the"]["tf"] == 2 and by["the"]["positions"] == [0, 3]
    assert by["quick"]["tf"] == 1          # analyzer lowercases
    assert by["fox"]["positions"] == [2, 4]
    assert [e["term"] for e in tv] == sorted(by)
    mt = mtermvectors(df, [0, 1])
    assert mt[1][0]["term"] == "solo"
    import pytest as _pt
    with _pt.raises(ValueError, match="not found"):
        termvectors(df, 99)
