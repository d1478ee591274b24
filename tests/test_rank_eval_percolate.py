"""_rank_eval metrics vs hand-computed formulas; percolate reverse
search vs per-query filter replay."""

import math

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query import analyze_docs
from anomaly_detection_spark.query.percolate import percolate
from anomaly_detection_spark.query.planner import compile_filter, search
from anomaly_detection_spark.query.rank_eval import rank_eval


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "user", "alpha beta gamma"),
        (1, "tool", "alpha alpha beta"),
        (2, "user", "beta gamma"),
        (3, "tool", "alpha delta"),
        (4, "user", "unrelated text"),
    ]
    df = spark.createDataFrame(rows, ["docid", "role", "text"])
    return analyze_docs(df).persist()


# ----------------------------------------------------------- rank_eval

def _ranked(docs, body, k):
    return [r["docid"] for r in
            search(docs, {**body, "size": k}).collect()]


def test_rank_eval_precision_and_recall(docs):
    req = {"id": "q1", "request": {"query": {"match": {"text": "alpha"}}},
           "ratings": [{"_id": 1, "rating": 1}, {"_id": 3, "rating": 0},
                       {"_id": 2, "rating": 1}]}
    ranked = _ranked(docs, req["request"], 10)
    out = rank_eval(docs, [req], {"precision": {"k": 10}})
    rated = [d for d in ranked]
    want = sum((d in (1, 2)) for d in rated) / len(rated)
    assert out["metric_score"] == pytest.approx(want)
    # ignore_unlabeled drops doc 0 (unrated) from the denominator
    out2 = rank_eval(docs, [req], {"precision": {
        "k": 10, "ignore_unlabeled": True}})
    labeled = [d for d in ranked if d in (0, 1, 2, 3)
               and d in (1, 2, 3)]
    assert out2["metric_score"] == pytest.approx(
        sum(d in (1, 2) for d in labeled) / len(labeled))
    rec = rank_eval(docs, [req], {"recall": {"k": 1}})
    got1 = _ranked(docs, req["request"], 1)
    assert rec["metric_score"] == pytest.approx(
        sum(d in (1, 2) for d in got1) / 2)
    assert rec["details"]["q1"]["unrated_docs"] == [
        d for d in got1 if d not in (1, 2, 3)]


def test_rank_eval_mrr_dcg_err(docs):
    req = {"id": "q", "request": {"query": {"match": {"text": "alpha"}}},
           "ratings": [{"_id": 0, "rating": 3}, {"_id": 1, "rating": 2}]}
    ranked = _ranked(docs, req["request"], 10)
    rates = {0: 3, 1: 2}
    mrr = rank_eval(docs, [req], {"mean_reciprocal_rank": {
        "k": 10, "relevant_rating_threshold": 2}})
    first = next(i for i, d in enumerate(ranked)
                 if rates.get(d, 0) >= 2)
    assert mrr["metric_score"] == pytest.approx(1 / (first + 1))
    dcg = rank_eval(docs, [req], {"dcg": {"k": 10}})
    want = sum((2 ** rates.get(d, 0) - 1) / math.log2(i + 2)
               for i, d in enumerate(ranked))
    assert dcg["metric_score"] == pytest.approx(want)
    ndcg = rank_eval(docs, [req], {"dcg": {"k": 10, "normalize": True}})
    ideal = sum((2 ** r - 1) / math.log2(i + 2)
                for i, r in enumerate(sorted(rates.values(),
                                             reverse=True)))
    assert ndcg["metric_score"] == pytest.approx(want / ideal)
    err = rank_eval(docs, [req], {"expected_reciprocal_rank": {
        "k": 10, "maximum_relevance": 3}})
    p, w = 1.0, 0.0
    for i, d in enumerate(ranked):
        r = (2 ** rates.get(d, 0) - 1) / 8
        w += p * r / (i + 1)
        p *= 1 - r
    assert err["metric_score"] == pytest.approx(w)
    # mean across two requests
    both = rank_eval(docs, [req, req], {"dcg": {"k": 10}})
    assert both["metric_score"] == pytest.approx(want)


def test_rank_eval_rejects_unknown_metric(docs):
    with pytest.raises(ValueError, match="metric"):
        rank_eval(docs, [], {"f_measure": {}})


# ----------------------------------------------------------- percolate

def test_percolate_matches_per_query_replay(docs):
    queries = {
        "alpha_users": {"bool": {"filter": [
            {"term": {"role": "user"}},
            {"match": {"text": "alpha"}}]}},
        "beta_docs": {"match": {"text": "beta"}},
        "nothing": {"term": {"role": "nope"}},
    }
    got = [(r["docid"], r["query_id"])
           for r in percolate(docs, queries).collect()]
    want = sorted(
        (r["docid"], qid)
        for qid, q in queries.items()
        for r in docs.filter(compile_filter(docs, q))
        .select("docid").collect())
    assert got == want
    assert ("0", "nothing") not in got
    # batching changes nothing
    got_b = [(r["docid"], r["query_id"])
             for r in percolate(docs, queries, batch_size=1).collect()]
    assert got_b == want


def test_percolate_empty_and_plan_shape(docs):
    assert percolate(docs, {}).count() == 0
    plan = (percolate(docs, {"q": {"term": {"role": "user"}}})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan.split("AdaptiveSparkPlan")[0] \
        or "Sort" in plan  # only the final presentation sort shuffles
