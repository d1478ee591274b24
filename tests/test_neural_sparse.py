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


def test_unigram_lm_perplexity(spark):
    import math

    from anomaly_detection_spark.pipeline.text import (
        perplexity_scores, train_unigram_lm)

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps the lazy dog the end")
         for i in range(20)],
        "doc_id long, text string")
    lm = train_unigram_lm(ref, vocab_size=6, smoothing_k=1.0)
    rows = {r["term"]: r for r in lm.collect()}
    assert len(rows) == 6 and "the" in rows     # top-6 by frequency
    # hand formula: 10 tokens/doc ('the' x3) over 20 docs
    N, V, k = 20 * 10, 6, 1.0
    assert rows["the"]["logp"] == pytest.approx(
        math.log((60 + k) / (N + k * (V + 1))))
    oov = math.log(k / (N + k * (V + 1)))
    assert rows["the"]["oov_logp"] == pytest.approx(oov)

    docs = spark.createDataFrame(
        [(1, "the quick fox"), (2, "zzz qqq www"), (3, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           perplexity_scores(docs, lm).collect()}
    in_logp = [rows[t]["logp"] for t in ("the", "quick", "fox")
               if t in rows]
    exp1 = math.exp(-sum(in_logp + [oov] * (3 - len(in_logp))) / 3)
    assert got[1]["perplexity"] == pytest.approx(exp1)
    assert got[2]["perplexity"] == pytest.approx(math.exp(-oov))
    assert got[1]["perplexity"] < got[2]["perplexity"]  # keep signal
    assert got[3]["perplexity"] is None and got[3]["lm_tokens"] == 0
