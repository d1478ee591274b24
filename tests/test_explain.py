"""_explain analog: per-term BM25 breakdown sums exactly to the
engine's match score, brute ≡ index, nested-tree rendering."""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.index import build_index
from anomaly_detection_spark.query import IndexReader, analyze_docs
from anomaly_detection_spark.query.brute_force import bm25_scores
from anomaly_detection_spark.query.explain import explain_doc, explain_match


@pytest.fixture(scope="module")
def corpus(spark, tiny_transcripts):
    tmp = tempfile.mkdtemp(prefix="adspark_xpl_")
    paths = build_index(tiny_transcripts, f"{tmp}/idx", seg_size=512,
                        block_size=64, segments_per_batch=2)
    reader = IndexReader(spark, paths.root)
    analyzed = analyze_docs(tiny_transcripts).persist()
    yield analyzed, reader
    analyzed.unpersist()
    shutil.rmtree(tmp, ignore_errors=True)


def test_explain_weights_sum_to_score(corpus):
    analyzed, _ = corpus
    q = "spark query query data"  # repeated term -> query_mult 2
    want = {r["docid"]: r["score"]
            for r in bm25_scores(analyzed, q).collect()}
    got = {r["docid"]: r["total"] for r in
           explain_match(analyzed, q).groupBy("docid")
           .agg(F.sum("weight").alias("total")).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_explain_brute_equals_index(corpus):
    analyzed, reader = corpus
    q = "spark data pipeline"
    b = explain_match(analyzed, q).toPandas().sort_values(
        ["docid", "term"]).reset_index(drop=True)
    i = explain_match(reader, q).toPandas().sort_values(
        ["docid", "term"]).reset_index(drop=True)
    assert list(b.docid) == list(i.docid)
    assert list(b.term) == list(i.term)
    for col in ("tf", "df", "doc_len", "idf", "tf_norm", "weight"):
        assert np.allclose(b[col].to_numpy(dtype=float),
                           i[col].to_numpy(dtype=float)), col


def test_explain_docids_narrowing(corpus):
    analyzed, _ = corpus
    hit = explain_match(analyzed, "spark").limit(1).collect()[0]["docid"]
    out = explain_match(analyzed, "spark", docids=[hit]).collect()
    assert {r["docid"] for r in out} == {hit}


def test_explain_doc_tree(corpus):
    analyzed, reader = corpus
    hit = (bm25_scores(analyzed, "spark query")
           .orderBy(F.desc("score")).limit(1).collect()[0])
    tree = explain_doc(reader, "spark query", hit["docid"])
    assert tree["matched"]
    assert tree["value"] == pytest.approx(hit["score"], rel=1e-12)
    assert all(d["details"][0]["value"] > 0 for d in tree["details"])
    # unmatched doc / unknown terms
    none = explain_doc(analyzed, "zzzznotaterm", hit["docid"])
    assert none == {"matched": False, "value": 0,
                    "description": none["description"], "details": []}


def test_match_msm_brute_equals_index(corpus):
    from anomaly_detection_spark.query.planner import search

    analyzed, reader = corpus
    body = {"query": {"match": {"text": {
        "query": "spark data merge query",
        "minimum_should_match": "50%"}}}, "size": 10}
    want = search(analyzed, body).toPandas()
    got = search(reader, body).select("docid", "score").toPandas()
    assert list(got.docid) == list(want.docid)
    assert np.allclose(got.score.to_numpy(dtype=float),
                       want.score.to_numpy(dtype=float))
