"""neural_sparse query + pipeline.text.sparse_encode: weight
dot-product scoring over a map<string,double> column, replayed
against a pandas oracle."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.text import sparse_encode
from anomaly_detection_spark.query.planner import search


@pytest.fixture(scope="module")
def sparse_docs(spark):
    rows = [
        (1, "alpha beta beta gamma"),
        (2, "beta delta"),
        (3, "gamma gamma gamma alpha"),
        (4, "epsilon zeta"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "docid long, text string")
    return sparse_encode(df, id_col="docid").persist()


def _oracle(rows, qtok):
    scored = []
    for docid, text in rows:
        tf = Counter(t for t in text.split() if t)
        w = {t: 1.0 + math.log(c) for t, c in tf.items()}
        if not set(qtok) & set(w):
            continue
        s = sum(qw * w.get(t, 0.0) for t, qw in qtok.items())
        scored.append((docid, s))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return scored


def test_sparse_encode_weights(sparse_docs):
    m = {r["docid"]: r["sparse"] for r in sparse_docs.collect()}
    assert m[1]["beta"] == pytest.approx(1.0 + math.log(2))
    assert m[1]["alpha"] == 1.0
    assert m[3]["gamma"] == pytest.approx(1.0 + math.log(3))
    assert m[5] == {}
    raw = {r["docid"]: r["sparse"] for r in
           sparse_encode(sparse_docs.drop("sparse"), id_col="docid",
                         weighting="tf").collect()}
    assert raw[1]["beta"] == 2.0
    with pytest.raises(ValueError, match="weighting"):
        sparse_encode(sparse_docs.drop("sparse"), weighting="idf")


def test_neural_sparse_query_tokens_oracle(sparse_docs):
    rows = [(r["docid"], r["text"]) for r in
            sparse_docs.select("docid", "text").collect()]
    qtok = {"beta": 2.0, "gamma": 0.5, "zeta": 1.0}
    got = search(sparse_docs, {"query": {"neural_sparse": {"sparse": {
        "query_tokens": qtok}}}, "size": 10})
    got = [(r["docid"], r["score"]) for r in
           got.select("docid", "score").collect()]
    want = _oracle(rows, qtok)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1])
    # doc 5 (empty) and doc 4-only terms: no-overlap docs never match
    assert 5 not in {g[0] for g in got}


def test_neural_sparse_query_text_mode(sparse_docs):
    # query_text encodes with the same deterministic 1+ln(tf) encoder
    got_text = search(sparse_docs, {"query": {"neural_sparse": {
        "sparse": {"query_text": "beta beta gamma"}}}, "size": 10})
    qtok = {"beta": 1.0 + math.log(2), "gamma": 1.0}
    got_tok = search(sparse_docs, {"query": {"neural_sparse": {
        "sparse": {"query_tokens": qtok}}}, "size": 10})
    a = [(r["docid"], r["score"]) for r in
         got_text.select("docid", "score").collect()]
    b = [(r["docid"], r["score"]) for r in
         got_tok.select("docid", "score").collect()]
    assert [x for x, _ in a] == [x for x, _ in b] and a
    for (_, sa), (_, sb) in zip(a, b):
        assert sa == pytest.approx(sb)


def test_neural_sparse_filter_and_rejections(sparse_docs):
    got = search(sparse_docs, {"query": {"neural_sparse": {"sparse": {
        "query_tokens": {"beta": 1.0},
        "filter": {"range": {"docid": {"gte": 2}}}}}}, "size": 10})
    assert [r["docid"] for r in got.select("docid").collect()] == [2]
    with pytest.raises(ValueError, match="query_tokens or query_text"):
        search(sparse_docs, {"query": {"neural_sparse": {"sparse": {}}}})
    with pytest.raises(ValueError, match="no tokens"):
        search(sparse_docs, {"query": {"neural_sparse": {"sparse": {
            "query_tokens": {}}}}})
