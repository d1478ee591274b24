"""Query-time synonyms: Lucene SynonymQuery blended scoring —
hand-formula lock on a constructed corpus, brute ≡ index identity
over a real posting index, edge semantics."""

import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.index import build_index
from anomaly_detection_spark.query import IndexReader
from anomaly_detection_spark.query.brute_force import analyze_docs
from anomaly_detection_spark.query.synonyms import (
    expand_groups, synonym_match_topk, synonym_match_topk_indexed)

K1, B = 1.2, 0.75


def _bm25(tf, dl, avgdl, df, n):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / avgdl))


def test_blended_scoring_hand_formula(spark):
    docs = spark.createDataFrame(
        [(0, "quick fox"), (1, "fast fox"), (2, "quick fast fox"),
         (3, "fox")], "docid long, text string")
    an = analyze_docs(docs)
    got = {r.docid: r.score for r in synonym_match_topk(
        an, "quick", {"quick": ["fast"]}, k=10).collect()}
    n, avgdl = 4, (2 + 2 + 3 + 1) / 4
    df_blend = 2          # max(df_quick=2, df_fast=2)
    # d2 holds BOTH variants: ONE pseudo-term with tf=2, not idf+idf
    assert got[2] == pytest.approx(_bm25(2, 3, avgdl, df_blend, n))
    assert got[0] == pytest.approx(_bm25(1, 2, avgdl, df_blend, n))
    assert got[1] == pytest.approx(_bm25(1, 2, avgdl, df_blend, n))
    assert 3 not in got
    # blended df uses the MAX over the group: rare synonym of a common
    # term must NOT get the rare idf
    got2 = {r.docid: r.score for r in synonym_match_topk(
        an, "fox", {"fox": ["quick"]}, k=10).collect()}
    assert got2[3] == pytest.approx(_bm25(1, 1, avgdl, 4, n))  # df=4


def test_expand_groups_edges(spark):
    assert expand_groups("Quick FOX", {"quick": ["speedy"]}) == \
        [("quick", "speedy"), ("fox",)]
    with pytest.raises(ValueError, match="multi-token"):
        expand_groups("quick", {"quick": ["very fast"]})
    # all-absent group contributes nothing; absent-only query → empty
    docs = spark.createDataFrame([(0, "alpha beta")],
                                 "docid long, text string")
    an = analyze_docs(docs)
    assert synonym_match_topk(an, "zzz", {}, k=5).count() == 0
    # present synonym rescues an absent query token (Lucene: the group
    # matches through any member)
    got = synonym_match_topk(an, "zzz", {"zzz": ["alpha"]}, k=5).collect()
    assert [r.docid for r in got] == [0]


@pytest.fixture(scope="module")
def syn_index(spark, tiny_transcripts):
    tmp = tempfile.mkdtemp(prefix="adspark_syn_")
    paths = build_index(tiny_transcripts, f"{tmp}/idx", seg_size=512,
                        block_size=64, segments_per_batch=2)
    an = analyze_docs(tiny_transcripts).persist()
    yield IndexReader(spark, paths.root), an
    an.unpersist()
    shutil.rmtree(tmp, ignore_errors=True)


SYN = {"spark": ["query"], "data": ["merge", "table"], "zzz": ["error"]}


def test_brute_equals_index(syn_index):
    reader, an = syn_index
    for q in ["spark data", "the data", "zzz", "spark spark"]:
        gb = [(r.docid, round(r.score, 9)) for r in
              synonym_match_topk(an, q, SYN, k=10).collect()]
        gi = [(r.docid, round(r.score, 9)) for r in
              synonym_match_topk_indexed(reader, q, SYN, k=10).collect()]
        assert gb == gi, q
        assert gb, q          # non-vacuous


def test_search_body_routes_synonyms(syn_index):
    from anomaly_detection_spark.query.planner import search

    reader, an = syn_index
    body = {"query": {"match": {"text": {
        "query": "spark data", "synonyms": SYN}}}, "size": 7}
    gb = search(an, body).select("docid", "score").collect()
    gi = search(reader, body).select("docid", "score").collect()
    assert [(r.docid, round(r.score, 9)) for r in gb] == \
        [(r.docid, round(r.score, 9)) for r in gi]
    # scores differ from the plain (no-synonyms) match → expansion ran
    plain = search(an, {"query": {"match": {"text": "spark data"}},
                        "size": 7}).select("docid", "score").collect()
    assert [(r.docid, round(r.score, 9)) for r in gb] != \
        [(r.docid, round(r.score, 9)) for r in plain]
    # under bool with a filter: alias filter semantics stack
    fb = {"query": {"bool": {
        "must": [{"match": {"text": {"query": "spark data",
                                     "synonyms": SYN}}}],
        "filter": [{"term": {"role": "user"}}]}}, "size": 7}
    got = search(an, fb).collect()
    user_ids = {r.docid for r in
                an.filter(F.col("role") == "user")
                .select("docid").collect()}
    assert got and all(r.docid in user_ids for r in got)
    # filter-context synonym match: any group member matches
    fc = search(an, {"query": {"bool": {"filter": [
        {"match": {"text": {"query": "zzz", "synonyms":
                            {"zzz": ["error"]}}}}]}}, "size": 5})
    assert fc.count() > 0
    # scored operator:and with synonyms rejects by name
    with pytest.raises(ValueError, match="operator:and"):
        search(an, {"query": {"match": {"text": {
            "query": "spark data", "operator": "and",
            "synonyms": SYN}}}}).collect()


def test_brute_equals_index_filtered(syn_index):
    reader, an = syn_index
    cond = F.col("role") == "user"
    gb = [(r.docid, round(r.score, 9)) for r in
          synonym_match_topk(an, "spark data", SYN, k=10,
                             filter_cond=cond).collect()]
    gi = [(r.docid, round(r.score, 9)) for r in
          synonym_match_topk_indexed(reader, "spark data", SYN, k=10,
                                     filter_cond=cond).collect()]
    assert gb == gi and gb
