"""Query rescorer (RescorerBuilder / Lucene QueryRescorer): the top
window_size primary hits are re-scored with a second query and
re-sorted; hits beyond the window keep primary order below the
window.  Hand oracles over full BM25 score sets + brute ≡ index."""

import shutil
import tempfile

import numpy as np
import pytest

from anomaly_detection_spark.index import build_index
from anomaly_detection_spark.query import IndexReader, analyze_docs
from anomaly_detection_spark.query.brute_force import bm25_scores
from anomaly_detection_spark.query.planner import search


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "user", "the quick brown fox jumps"),
        (1, "tool", "quick query data"),
        (2, "user", "slow query engine"),
        (3, "user", "nothing relevant here"),
        (4, "tool", "quick quick query data engine"),
        (5, "user", "data data engine"),
    ]
    df = spark.createDataFrame(rows, ["docid", "role", "text"])
    return analyze_docs(df).persist()


def _smap(docs, text):
    return {r["docid"]: r["score"]
            for r in bm25_scores(docs, text).collect()}


def _rescore_oracle(docs, ptext, stext, window, qw, rw, mode, size):
    """Independent Python replay of the Lucene rescore contract."""
    prim = _smap(docs, ptext)
    sec = _smap(docs, stext)
    ranked = sorted(prim, key=lambda d: (-prim[d], d))
    win, rest = ranked[:window], ranked[window:]
    combine = {
        "total": lambda p, s: p + s, "multiply": lambda p, s: p * s,
        "avg": lambda p, s: (p + s) / 2.0, "max": max, "min": min,
    }[mode]

    def final(d):
        if d in sec:
            return combine(qw * prim[d], rw * sec[d])
        return qw * prim[d]

    new_win = sorted(win, key=lambda d: (-final(d), d))
    order = new_win + rest
    scores = {**{d: prim[d] for d in rest}, **{d: final(d) for d in win}}
    return [(d, scores[d]) for d in order[:size]]


@pytest.mark.parametrize("mode", ["total", "multiply", "max", "avg"])
def test_rescore_matches_hand_oracle(docs, mode):
    body = {"query": {"match": {"text": "quick query"}},
            "rescore": {"window_size": 3, "query": {
                "rescore_query": {"match": {"text": "data engine"}},
                "query_weight": 0.7, "rescore_query_weight": 1.2,
                "score_mode": mode}},
            "size": 10}
    got = [(r["docid"], r["score"])
           for r in search(docs, body).select("docid", "score").collect()]
    want = _rescore_oracle(docs, "quick query", "data engine",
                           3, 0.7, 1.2, mode, 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert np.allclose([s for _, s in got], [s for _, s in want])


def test_rescore_window_stays_above_remainder(docs):
    # negative rescore weight drives window scores far below the
    # remainder's primary scores — the window must STILL sort first
    body = {"query": {"match": {"text": "quick query"}},
            "rescore": {"window_size": 2, "query": {
                "rescore_query": {"match": {"text": "data"}},
                "rescore_query_weight": -100.0}},
            "size": 10}
    out = search(docs, body).select("docid", "score").collect()
    want = _rescore_oracle(docs, "quick query", "data",
                           2, 1.0, -100.0, "total", 10)
    assert [r["docid"] for r in out] == [d for d, _ in want]
    # remainder rows keep raw primary scores, higher than the window's
    prim = _smap(docs, "quick query")
    got = {r["docid"]: r["score"] for r in out}
    for d in [d for d, _ in want][2:]:
        assert got[d] == pytest.approx(prim[d])


def test_rescore_chained_passes(docs):
    # second pass re-ranks the top-2 of the first pass's ordering
    body = {"query": {"match": {"text": "quick query"}},
            "rescore": [
                {"window_size": 3, "query": {
                    "rescore_query": {"match": {"text": "data engine"}},
                    "score_mode": "total"}},
                {"window_size": 2, "query": {
                    "rescore_query": {"match": {"text": "engine"}},
                    "rescore_query_weight": 50.0}},
            ],
            "size": 10}
    got = [r["docid"] for r in search(docs, body).collect()]
    # replay: pass 1
    p1 = _rescore_oracle(docs, "quick query", "data engine",
                         3, 1.0, 1.0, "total", 10)
    sec = _smap(docs, "engine")
    win, rest = p1[:2], p1[2:]
    f = {d: (s + 50.0 * sec[d] if d in sec else s) for d, s in win}
    order = sorted(f, key=lambda d: (-f[d], d)) + [d for d, _ in rest]
    assert got == order


def test_rescore_brute_equals_index(spark, tiny_transcripts):
    tmp = tempfile.mkdtemp(prefix="adspark_rsc_")
    try:
        paths = build_index(tiny_transcripts, f"{tmp}/idx", seg_size=512,
                            block_size=64, segments_per_batch=2)
        reader = IndexReader(spark, paths.root)
        analyzed = analyze_docs(tiny_transcripts).persist()
        body = {"query": {"match": {"text": "spark query"}},
                "rescore": {"window_size": 5, "query": {
                    "rescore_query": {"match": {"text": "data pipeline"}},
                    "query_weight": 0.8,
                    "rescore_query_weight": 1.5}},
                "size": 8}
        want = search(analyzed, body).select("docid", "score").toPandas()
        got = search(reader, body).select("docid", "score").toPandas()
        assert list(got.docid) == list(want.docid)
        assert np.allclose(got.score.to_numpy(dtype=float),
                           want.score.to_numpy(dtype=float))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        analyzed.unpersist()


def test_rescore_rejections(docs):
    with pytest.raises(ValueError, match="collapse"):
        search(docs, {"query": {"match": {"text": "quick"}},
                      "collapse": {"field": "role"},
                      "rescore": {"query": {
                          "rescore_query": {"match": {"text": "data"}}}}})
    with pytest.raises(ValueError, match="scored primary"):
        search(docs, {"query": {"term": {"role": "user"}},
                      "rescore": {"query": {
                          "rescore_query": {"match": {"text": "data"}}}}})
    with pytest.raises(ValueError, match="score_mode"):
        search(docs, {"query": {"match": {"text": "quick"}},
                      "rescore": {"query": {
                          "rescore_query": {"match": {"text": "data"}},
                          "score_mode": "median"}}})
