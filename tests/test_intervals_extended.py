"""Intervals extensions: prefix/wildcard/fuzzy sources + filter rules
(containing / contained_by / overlapping and negations) via the span
enumeration kernel."""

import pytest

from anomaly_detection_spark.query.planner import compile_filter


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "my favorite food is cold porridge"),
        (1, "when it's cold my favorite food is porridge"),
        (2, "hot porridge is the best food"),
        (3, "my favourite meal is soup"),
    ]
    return spark.createDataFrame(rows, "docid long, text string") \
        .persist()


def _ids(docs, q):
    return sorted(r["docid"] for r in
                  docs.filter(compile_filter(docs, q)).collect())


def test_intervals_prefix_wildcard_fuzzy_sources(docs):
    q = {"intervals": {"text": {"prefix": {"prefix": "favo"}}}}
    assert _ids(docs, q) == [0, 1, 3]   # favorite / favourite
    q = {"intervals": {"text": {"wildcard": {"pattern": "po*ge"}}}}
    assert _ids(docs, q) == [0, 1, 2]
    q = {"intervals": {"text": {"fuzzy": {"term": "fod",
                                          "fuzziness": 1}}}}
    assert _ids(docs, q) == [0, 1, 2]   # food within 1 edit


def test_intervals_filter_containing(docs):
    # the documented example: "favorite food" within max_gaps 10,
    # FILTERED to windows containing "cold" — doc 0's minimal window
    # [favorite..food] does NOT contain cold; doc 1's window spans
    # [favorite food] directly (gap 0) and also excludes cold.
    q = {"intervals": {"text": {"match": {
        "query": "my food", "max_gaps": 10, "ordered": True,
        "filter": {"containing": {"match": {"query": "favorite"}}}}}}}
    # doc 0: window my..food = [0, 5) contains favorite@1 -> hit
    # doc 1: minimal my..food window [3,6) contains favorite@4 -> hit
    # doc 3: no "food"
    assert _ids(docs, q) == [0, 1]
    # not_containing flips within the matching windows
    q_not = {"intervals": {"text": {"match": {
        "query": "my food", "max_gaps": 10, "ordered": True,
        "filter": {"not_containing": {"match": {"query": "favorite"}}}}}}}
    assert _ids(docs, q_not) == []


def test_intervals_filter_contained_by_and_overlap(docs):
    # "porridge" contained by a "cold ... porridge" window
    q = {"intervals": {"text": {"match": {
        "query": "porridge",
        "filter": {"contained_by": {"match": {
            "query": "cold porridge", "max_gaps": 5,
            "ordered": True}}}}}}}
    assert _ids(docs, q) == [0, 1]
    q = {"intervals": {"text": {"match": {
        "query": "cold porridge", "max_gaps": 0, "ordered": True,
        "filter": {"overlapping": {"match": {"query": "porridge"}}}}}}}
    assert _ids(docs, q) == [0]         # adjacent only in doc 0
    q = {"intervals": {"text": {"match": {
        "query": "porridge",
        "filter": {"not_overlapping": {"match": {"query": "cold"}}}}}}}
    assert _ids(docs, q) == [0, 1, 2]   # porridge never overlaps cold


def test_intervals_any_of_with_pred_and_filter(docs):
    q = {"intervals": {"text": {"any_of": {"intervals": [
        {"fuzzy": {"term": "soap", "fuzziness": 1}},
        {"prefix": {"prefix": "porr"}}]}}}}
    assert _ids(docs, q) == [0, 1, 2, 3]
    # all_of over unit preds composes into a near
    q = {"intervals": {"text": {"all_of": {
        "intervals": [{"prefix": {"prefix": "favo"}},
                      {"match": {"query": "food"}}],
        "ordered": True, "max_gaps": 1}}}}
    assert _ids(docs, q) == [0, 1]
    with pytest.raises(ValueError, match="filter rule"):
        _ids(docs, {"intervals": {"text": {"match": {
            "query": "food",
            "filter": {"before": {"match": {"query": "cold"}}}}}}})
