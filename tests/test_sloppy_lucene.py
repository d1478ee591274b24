"""Reference-exact sloppy phrase (``slop_semantics="lucene"``): the
SloppyPhraseScorer sweep kernel, documented divergences from the
engine's anchor-nearest default, brute ≡ index identity, and DSL
routing."""

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
)
from anomaly_detection_spark.query.index_search import (
    match_phrase_topk_indexed,
)
from anomaly_detection_spark.query.planner import compile_filter, search
from anomaly_detection_spark.query.sloppy import (
    build_plists,
    lucene_sloppy_freq,
)


def _f(text: str, phrase: str, slop: int) -> float:
    pls = build_plists(text.split(), phrase.split())
    return 0.0 if pls is None else lucene_sloppy_freq(pls, slop)


def test_sweep_kernel_documented_distances():
    # PhraseQuery#setSlop's documented two-term distances
    assert _f("a b", "a b", 0) == 1.0
    assert _f("a x b", "a b", 0) == 0.0
    assert _f("a x b", "a b", 1) == pytest.approx(0.5)
    assert _f("b a", "a b", 1) == 0.0
    assert _f("b a", "a b", 2) == pytest.approx(1 / 3)
    # slop=0 degenerates to the exact occurrence count
    assert _f("a b c x x a b c", "a b c", 0) == 2.0
    # a missing term can never match
    assert _f("x y z", "a b", 10) == 0.0


def test_sweep_diverges_from_anchor_nearest_where_lucene_does():
    # multi-occurrence: the sweep minimizes ONE window through both
    # a's (freq 1.0); anchor-nearest counts one match per anchor (1.5)
    assert _f("a a b", "a b", 2) == pytest.approx(1.0)
    # m=3 reordering: sweep window width is end-start in adjusted
    # space = 2 ("b a c" vs "a b c"); anchor-nearest sums per-slot
    # nearest distances = 3 — Lucene matches at slop 2, anchor doesn't
    assert _f("b a c", "a b c", 2) == pytest.approx(1 / 3)


def test_anchor_divergence_values(spark):
    # lock the anchor values the engine default produces for the same
    # inputs so the divergence itself is pinned
    from anomaly_detection_spark.query.brute_force import (
        sloppy_phrase_freq,
    )

    rows = [(0, "a a b"), (1, "b a c")]
    an = analyze_docs(spark.createDataFrame(rows, ["docid", "text"]))
    out = an.select(
        "docid",
        sloppy_phrase_freq(F.col("tokens"), ["a", "b"], 2).alias("f2"),
        sloppy_phrase_freq(F.col("tokens"), ["a", "b", "c"], 2).alias("f3"),
    ).orderBy("docid").collect()
    assert out[0]["f2"] == pytest.approx(1.5)   # anchor counts 2 matches
    assert out[1]["f3"] == 0.0                  # anchor needs slop 3


def test_brute_lucene_semantics_scores(spark):
    rows = [
        (0, "quick fox"),
        (1, "quick quick fox"),        # repeat occurrence of one term
        (2, "fox red quick"),
        (3, "none here"),
    ]
    an = analyze_docs(spark.createDataFrame(rows, ["docid", "text"]))
    got = match_phrase_topk(an, "quick fox", k=10, slop=2,
                            slop_semantics="lucene").toPandas()
    # doc 2 is a transposition with one word between: adjusted window
    # width 3, admitted only at slop >= 3
    assert set(got.docid) == {0, 1}
    got3 = match_phrase_topk(an, "quick fox", k=10, slop=3,
                             slop_semantics="lucene").toPandas()
    assert set(got3.docid) == {0, 1, 2}
    # repeating PHRASE terms reject by name under lucene semantics
    with pytest.raises(ValueError, match="distinct"):
        match_phrase_topk(an, "quick fox quick", k=5, slop=1,
                          slop_semantics="lucene")
    with pytest.raises(ValueError, match="slop_semantics"):
        match_phrase_topk(an, "quick fox", k=5, slop=1,
                          slop_semantics="bogus")


def test_filter_context_lucene_semantics(spark):
    rows = [(0, "a a b"), (1, "b x a"), (2, "a"), (3, "b c a c")]
    df = spark.createDataFrame(rows, ["docid", "text"])
    cond = compile_filter(df, {"match_phrase": {"text": {
        "query": "a b", "slop": 2, "slop_semantics": "lucene"}}})
    got = sorted(r["docid"] for r in df.filter(cond).collect())
    # transposed-with-gap docs are width 3; only doc 0 fits slop 2
    assert got == [0]
    cond3 = compile_filter(df, {"match_phrase": {"text": {
        "query": "a b", "slop": 3, "slop_semantics": "lucene"}}})
    got3 = sorted(r["docid"] for r in df.filter(cond3).collect())
    assert got3 == [0, 1, 3]


@pytest.fixture(scope="module")
def pos_reader(spark, tiny_transcripts):
    tmp = tempfile.mkdtemp(prefix="adspark_sloplucene_")
    paths = build_index(tiny_transcripts, f"{tmp}/idx", seg_size=512,
                        block_size=64, segments_per_batch=2,
                        positions=True)
    yield IndexReader(spark, paths.root)
    shutil.rmtree(tmp, ignore_errors=True)


def test_index_matches_bruteforce_lucene_semantics(spark,
                                                   tiny_transcripts,
                                                   pos_reader):
    analyzed = analyze_docs(tiny_transcripts).persist()
    stats = corpus_stats(analyzed)
    rows = (analyzed.filter(F.size("tokens") >= 8)
            .orderBy("docid").limit(3).collect())
    phrases = [" ".join([r["tokens"][1], r["tokens"][3]]) for r in rows]
    phrases += [" ".join(rows[0]["tokens"][2:5])]
    checked = 0
    for phrase in phrases:
        toks = phrase.split()
        if len(set(toks)) != len(toks):
            continue  # repeats reject under lucene semantics
        for slop in (1, 2, 3):
            want = match_phrase_topk(
                analyzed, phrase, k=10, stats=stats, slop=slop,
                slop_semantics="lucene").toPandas()
            got = match_phrase_topk_indexed(
                pos_reader, phrase, k=10, slop=slop,
                slop_semantics="lucene").toPandas()
            assert list(got.docid) == list(want.docid), (phrase, slop)
            assert np.allclose(got.score, want.score), (phrase, slop)
            checked += 1
    assert checked >= 6


def test_search_body_routes_lucene_semantics(spark):
    rows = [(0, "a a b"), (1, "a x b"), (2, "b a"), (3, "c")]
    df = spark.createDataFrame(rows, ["docid", "text"])
    out = search(df, {"query": {"match_phrase": {"text": {
        "query": "a b", "slop": 2, "slop_semantics": "lucene"}}},
        "size": 10}).toPandas()
    # doc 1 (one gap, freq 1/2) vs doc 0 (minimized window freq 1.0)
    # vs doc 2 (transposed, freq 1/3): lucene order 0, 1, 2
    assert list(out.docid) == [0, 1, 2]
