"""``script`` query (ScriptQueryBuilder): boolean painless subset
compiled to one codegen predicate, replayed against direct DataFrame
filters."""

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query.planner import compile_filter, search


def _ids(df, cond):
    return sorted(r["docid"] for r in
                  df.filter(cond).select("docid").collect())


def test_script_query_arith_and_connectives(tiny_transcripts):
    df = tiny_transcripts
    got = _ids(df, compile_filter(df, {"script": {"script": {
        "source": "doc['turn_idx'].value % 2 == 0 "
                  "&& doc['role'].value == 'user'"}}}))
    want = _ids(df, (F.col("turn_idx") % 2 == 0)
                & (F.col("role") == "user"))
    assert got == want and got


def test_script_query_params_and_shorthand(tiny_transcripts):
    df = tiny_transcripts
    got = _ids(df, compile_filter(df, {"script": {"script": {
        "source": "doc['turn_idx'].value >= params.lo "
                  "&& doc['turn_idx'].value < params.hi "
                  "&& doc['role'].value != params.who",
        "params": {"lo": 2, "hi": 5, "who": "assistant"}}}}))
    want = _ids(df, (F.col("turn_idx") >= 2) & (F.col("turn_idx") < 5)
                & (F.col("role") != "assistant"))
    assert got == want and got
    # shorthand: {"script": {"source": ...}} without the inner nesting
    short = _ids(df, compile_filter(df, {"script": {
        "source": "doc['turn_idx'].value == 0"}}))
    assert short == _ids(df, F.col("turn_idx") == 0)


def test_script_query_math_and_negation(tiny_transcripts):
    df = tiny_transcripts
    got = _ids(df, compile_filter(df, {"script": {"script": {
        "source": "Math.abs(doc['turn_idx'].value - 3) <= 1"}}}))
    want = _ids(df, F.abs(F.col("turn_idx") - 3) <= 1)
    assert got == want and got
    neg = _ids(df, compile_filter(df, {"script": {"script": {
        "source": "!(doc['role'].value == 'user')"}}}))
    assert neg == _ids(df, ~(F.col("role") == "user"))


def test_script_query_in_bool_and_search(tiny_transcripts):
    df = tiny_transcripts
    body = {"query": {"bool": {"filter": [
        {"term": {"role": "user"}},
        {"script": {"script": {
            "source": "doc['turn_idx'].value > params.n",
            "params": {"n": 4}}}},
    ]}}, "size": 10_000}
    got = sorted(r["docid"] for r in
                 search(df, body).select("docid").collect())
    want = _ids(df, (F.col("role") == "user") & (F.col("turn_idx") > 4))
    assert got == want and got


def test_script_query_rejections(tiny_transcripts):
    df = tiny_transcripts
    with pytest.raises(ValueError, match="unknown field"):
        compile_filter(df, {"script": {"script": {
            "source": "doc['nope'].value > 0"}}})
    with pytest.raises(ValueError, match="unsupported script query"):
        compile_filter(df, {"script": {"script": {
            "source": "doc['text'].value.contains('x')"}}})
    with pytest.raises(ValueError, match="unsupported script query"):
        compile_filter(df, {"script": {"script": {
            "source": "for (int i = 0; i < 3; i++) {}"}}})
    with pytest.raises(ValueError, match="must be a scalar"):
        compile_filter(df, {"script": {"script": {
            "source": "doc['turn_idx'].value > params.x",
            "params": {"x": [1, 2]}}}})
    with pytest.raises(ValueError, match="lang"):
        compile_filter(df, {"script": {"script": {
            "source": "1 == 1", "lang": "mustache"}}})
    with pytest.raises(ValueError, match="source"):
        compile_filter(df, {"script": {"script": {"params": {"a": 1}}}})
