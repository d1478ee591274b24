"""Sloppy phrase (slop > 0, round 5): Lucene's documented two-term
distances, brute-force/index score identity over positional postings,
filter-context predicate, and slop=0 degeneration."""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.index import build_index
from anomaly_detection_spark.query import IndexReader, analyze_docs
from anomaly_detection_spark.query.brute_force import (
    corpus_stats,
    match_phrase_topk,
    sloppy_phrase_freq,
)
from anomaly_detection_spark.query.index_search import (
    match_phrase_topk_indexed,
)
from anomaly_detection_spark.query.planner import compile_filter, search


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "quick brown fox"),
        (1, "quick fox"),            # exact "quick fox"
        (2, "fox quick"),            # transposed — needs slop 2
        (3, "quick red big fox"),    # two words between — slop 2
        (4, "nothing here"),
        (5, "quick fox quick fox"),  # two exact occurrences
    ]
    return analyze_docs(
        spark.createDataFrame(rows, ["docid", "text"])).persist()


def _freqs(docs, phrase, slop):
    from anomaly_detection_spark.functions.tokenizer import tokenize_query

    terms = tokenize_query(phrase)
    out = docs.select("docid", sloppy_phrase_freq(
        F.col("tokens"), terms, slop).alias("f")).orderBy("docid").collect()
    return {r["docid"]: r["f"] for r in out}


def test_lucene_documented_distances(docs):
    # "quick fox" slop 0 ≡ exact; slop 1 admits one word between;
    # transposition needs slop 2 (PhraseQuery#setSlop docs)
    f0 = _freqs(docs, "quick fox", 0)
    assert f0[1] > 0 and f0[5] > 0
    assert f0[0] == 0 and f0[2] == 0 and f0[3] == 0
    f1 = _freqs(docs, "quick fox", 1)
    assert f1[0] == pytest.approx(0.5)      # 1 word between: 1/(1+1)
    assert f1[1] == pytest.approx(1.0)
    assert f1[2] == 0                        # transposed not yet
    f2 = _freqs(docs, "quick fox", 2)
    assert f2[2] == pytest.approx(1.0 / 3.0)  # transposed: 1/(1+2)
    assert f2[3] == pytest.approx(1.0 / 3.0)  # two words between
    assert f2[5] == pytest.approx(2.0)


def test_slop_zero_matches_exact_pf(docs):
    # sloppy freq at slop=0 matches the exact sliding-window matcher
    for phrase in ("quick fox", "quick brown fox", "fox"):
        f = _freqs(docs, phrase, 0)
        got = {d for d, v in f.items() if v > 0}
        want = {r["docid"] for r in match_phrase_topk(
            docs, phrase, k=10).collect()}
        assert got == want, phrase


def test_filter_context_sloppy(docs):
    cond = compile_filter(
        docs, {"match_phrase": {"text": {"query": "quick fox",
                                         "slop": 2}}})
    got = sorted(r["docid"] for r in docs.filter(cond).collect())
    assert got == [0, 1, 2, 3, 5]


def test_scored_search_body_sloppy(docs):
    out = search(docs, {"query": {"match_phrase": {"text": {
        "query": "quick fox", "slop": 1}}}, "size": 10}).toPandas()
    assert list(out.docid[:2]) == [5, 1]     # freq 2 > freq 1
    assert 0 in set(out.docid)
    assert 2 not in set(out.docid)


@pytest.fixture(scope="module")
def pos_reader(spark, tiny_transcripts):
    tmp = tempfile.mkdtemp(prefix="adspark_sloppy_")
    paths = build_index(tiny_transcripts, f"{tmp}/idx", seg_size=512,
                        block_size=64, segments_per_batch=2,
                        positions=True)
    yield IndexReader(spark, paths.root)
    shutil.rmtree(tmp, ignore_errors=True)


def test_index_matches_bruteforce_sloppy(spark, tiny_transcripts,
                                         pos_reader):
    analyzed = analyze_docs(tiny_transcripts).persist()
    stats = corpus_stats(analyzed)
    rows = (analyzed.filter(F.size("tokens") >= 8)
            .orderBy("docid").limit(3).collect())
    # real token pairs with a gap — guaranteed sloppy-only matches
    phrases = [" ".join([r["tokens"][1], r["tokens"][3]]) for r in rows]
    phrases += [" ".join(rows[0]["tokens"][2:4])]
    for phrase in phrases:
        for slop in (1, 2, 3):
            want = match_phrase_topk(analyzed, phrase, k=10, stats=stats,
                                     slop=slop).toPandas()
            got = match_phrase_topk_indexed(pos_reader, phrase, k=10,
                                            slop=slop).toPandas()
            assert list(got.docid) == list(want.docid), (phrase, slop)
            assert np.allclose(got.score, want.score), (phrase, slop)
            assert len(want) > 0, (phrase, slop)
