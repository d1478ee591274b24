"""search pipelines: request/response processors compose search()
with body rewrites and narrow frame ops — replayed against manual
equivalents."""

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query.planner import search
from anomaly_detection_spark.query.search_pipeline import (
    search_with_pipeline)


def _ids(df):
    return [r["docid"] for r in df.select("docid").collect()]


def test_filter_query_equals_manual_bool(tiny_transcripts):
    df = tiny_transcripts
    body = {"query": {"match": {"text": "the data"}}, "size": 10,
            "_source": True}
    pipe = {"request_processors": [
        {"filter_query": {"query": {"term": {"role": "user"}}}}]}
    got = search_with_pipeline(df, body, pipe)
    want = search(df, {"query": {"bool": {
        "must": [{"match": {"text": "the data"}}],
        "filter": [{"term": {"role": "user"}}]}}, "size": 10,
        "_source": True})
    assert _ids(got) == _ids(want) and _ids(got)
    roles = {r["role"] for r in got.collect()}
    assert roles == {"user"}


def test_oversample_truncate_and_collapse(tiny_transcripts):
    df = tiny_transcripts
    body = {"query": {"match": {"text": "the data"}}, "size": 5,
            "_source": True}
    pipe = {
        "request_processors": [{"oversample": {"sample_factor": 4}}],
        "response_processors": [
            {"collapse": {"field": "role"}},
            {"truncate_hits": {}},
        ],
    }
    got = search_with_pipeline(df, body, pipe).collect()
    # collapse keeps the single best hit per role, truncate caps at
    # the ORIGINAL size; oversampling made 20 candidates available
    roles = [r["role"] for r in got]
    assert len(roles) == len(set(roles))
    assert len(got) <= 5
    # the kept hit per role is the best-scored one among the 20
    wide = search(df, {**body, "size": 20}).collect()
    best = {}
    for r in wide:
        best.setdefault(r["role"], r["docid"])
    for r in got:
        assert best[r["role"]] == r["docid"]


def test_sort_and_rename(tiny_transcripts):
    df = tiny_transcripts
    body = {"query": {"match": {"text": "the data"}}, "size": 8,
            "_source": True}
    pipe = {"response_processors": [
        {"sort": {"field": "turn_idx", "order": "desc"}},
        {"rename_field": {"field": "turn_idx",
                          "target_field": "turn"}},
    ]}
    got = search_with_pipeline(df, body, pipe).collect()
    turns = [r["turn"] for r in got]
    assert turns == sorted(turns, reverse=True) and got
    assert "turn_idx" not in got[0].asDict()


def test_pipeline_rejections(tiny_transcripts):
    df = tiny_transcripts
    body = {"query": {"match_all": {}}, "size": 3}
    with pytest.raises(ValueError, match="request processor"):
        search_with_pipeline(df, body, {"request_processors": [
            {"script": {"source": "x"}}]})
    with pytest.raises(ValueError, match="response processor"):
        search_with_pipeline(df, body, {"response_processors": [
            {"retrieval_augmented_generation": {}}]})
    with pytest.raises(ValueError, match="sample_factor"):
        search_with_pipeline(df, body, {"request_processors": [
            {"oversample": {"sample_factor": 0.5}}]})
    with pytest.raises(ValueError, match="not in the hit frame"):
        search_with_pipeline(df, body, {"response_processors": [
            {"rename_field": {"field": "zzz", "target_field": "a"}}]})
