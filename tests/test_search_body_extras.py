"""Search-body extras batch: significant_text, sort `missing`
(_first/_last/literal), `_source` response filtering, `min_score`."""

import pandas as pd
import pytest

from anomaly_detection_spark.query import analyze_docs
from anomaly_detection_spark.query.aggs_body import run_aggs
from anomaly_detection_spark.query.brute_force import bm25_scores
from anomaly_detection_spark.query.planner import scroll, search


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "user", 5.0, "alpha beta common"),
        (1, "user", None, "alpha alpha common"),
        (2, "tool", 2.0, "gamma common"),
        (3, "tool", 8.0, "gamma delta common"),
        (4, "user", None, "beta common"),
    ]
    df = spark.createDataFrame(rows, ["docid", "role", "pri", "text"])
    return analyze_docs(df).persist()


# ---------------------------------------------------- significant_text

def test_significant_text_tokenizes_and_dedupes(docs):
    out = run_aggs(docs, {
        "query": {"term": {"role": "user"}},
        "aggs": {"sig": {"significant_text": {
            "field": "text", "min_doc_count": 1}}}})["sig"].toPandas()
    # per-doc deduped doc frequencies: alpha fg2/bg2, beta fg2/bg2,
    # common fg3/bg5 (not over-represented -> score<=0, dropped),
    # gamma/delta fg0 -> dropped
    assert set(out.term) == {"alpha", "beta"}
    row = out[out.term == "alpha"].iloc[0]
    fg_pct, bg_pct = 2 / 3, 2 / 5
    assert row.fg_count == 2 and row.bg_count == 2
    assert abs(row.score - (fg_pct - bg_pct) * fg_pct / bg_pct) < 1e-12


# -------------------------------------------------------- sort missing

def test_sort_missing_default_last_and_first(docs):
    body = {"query": {"match_all": {}}, "sort": [{"pri": "asc"}],
            "size": 10}
    got = [r["docid"] for r in search(docs, body).collect()]
    # OpenSearch default missing=_last on BOTH directions (Spark's
    # asc default would put nulls first)
    assert got[:3] == [2, 0, 3] and set(got[3:]) == {1, 4}
    body = {"query": {"match_all": {}},
            "sort": [{"pri": {"order": "asc", "missing": "_first"}},
                     {"docid": "asc"}], "size": 10}
    got = [r["docid"] for r in search(docs, body).collect()]
    assert got == [1, 4, 2, 0, 3]


def test_sort_missing_literal_value_and_search_after(docs):
    # missing=3.0 slots null-pri docs between pri=2 and pri=5
    sort = [{"pri": {"order": "asc", "missing": 3.0}},
            {"docid": "asc"}]
    body = {"query": {"match_all": {}}, "sort": sort, "size": 10}
    got = [r["docid"] for r in search(docs, body).collect()]
    assert got == [2, 1, 4, 0, 3]
    # search_after resumes THROUGH the null rows (they're reachable
    # now that the predicate coalesces with the same literal)
    after = {"query": {"match_all": {}}, "sort": sort,
             "search_after": [3.0, 1], "size": 10}
    got2 = [r["docid"] for r in search(docs, after).collect()]
    assert got2 == [4, 0, 3]
    # scroll walks every row exactly once, nulls included
    pages = list(scroll(docs, {"query": {"match_all": {}},
                               "sort": sort}, page_size=2))
    assert [r["docid"] for p in pages for r in p] == [2, 1, 4, 0, 3]


# ------------------------------------------------------------ _source

def test_source_filtering_shapes(docs):
    body = {"query": {"match": {"text": "alpha"}}, "size": 5}
    # a scored hit is (docid, score) by default; _source=true fetches
    # the stored columns (the reference always ships _source — here
    # it's opt-in, the columnar-world default)
    assert search(docs, body).columns == ["docid", "score"]
    full = search(docs, {**body, "_source": True}).columns
    assert "role" in full and "text" in full
    only = search(docs, {**body, "_source": False}).columns
    assert only == ["docid", "score"]
    inc = search(docs, {**body, "_source": ["role", "pri"]}).columns
    assert inc == ["docid", "score", "role", "pri"]
    pat = search(docs, {**body, "_source": {
        "includes": "*", "excludes": ["t*", "conv*"]}}).columns
    assert "text" not in pat and "role" in pat
    # filter-context path gets it too
    fc = search(docs, {"query": {"term": {"role": "user"}},
                       "_source": "pri", "size": 5}).columns
    assert fc == ["docid", "pri"]


# ---------------------------------------------------------- min_score

def test_min_score_cuts_low_hits(docs):
    smap = {r["docid"]: r["score"]
            for r in bm25_scores(docs, "alpha common").collect()}
    floor = sorted(smap.values())[len(smap) // 2]
    out = search(docs, {"query": {"match": {"text": "alpha common"}},
                        "min_score": floor, "size": 10}).collect()
    want = sorted((d for d, s in smap.items() if s >= floor),
                  key=lambda d: (-smap[d], d))
    assert [r["docid"] for r in out] == want
    with pytest.raises(ValueError, match="min_score"):
        search(docs, {"query": {"term": {"role": "user"}},
                      "min_score": 0.5, "size": 5})


# ------------------------------------------------------- script_fields

def test_script_fields_scored_and_filter_paths(docs):
    body = {"query": {"match": {"text": "alpha"}},
            "script_fields": {"pri2": {"script": {
                "source": "doc['pri'].value * 2 + _score"}}},
            "size": 5}
    out = search(docs, body).collect()
    for r in out:
        if r["pri"] is not None:
            assert r["pri2"] == pytest.approx(r["pri"] * 2 + r["score"])
        else:
            assert r["pri2"] is None
    # _source filter keeps script fields as metadata
    cols = search(docs, {**body, "_source": ["role"]}).columns
    assert cols == ["docid", "score", "pri2", "role"]
    # filter-context path (doc columns already present, no _score)
    fc = search(docs, {"query": {"term": {"role": "tool"}},
                       "script_fields": {"half": {
                           "script": "doc['pri'].value / 2"}},
                       "size": 5}).collect()
    assert all(r["half"] == pytest.approx(r["pri"] / 2) for r in fc)
    with pytest.raises(ValueError, match="unknown field"):
        search(docs, {"query": {"term": {"role": "tool"}},
                      "script_fields": {"x": {
                          "script": "doc['nope'].value"}}, "size": 2})


# ----------------------------------------- match minimum_should_match

def test_match_minimum_should_match(docs):
    from anomaly_detection_spark.query.planner import parse_msm

    assert parse_msm(2, 3) == 2
    assert parse_msm("75%", 4) == 3
    assert parse_msm("-1", 4) == 3
    assert parse_msm("-25%", 4) == 3
    assert parse_msm(9, 3) == 3 and parse_msm(0, 3) == 1
    smap = {r["docid"]: r["score"]
            for r in bm25_scores(docs, "alpha beta gamma").collect()}
    out = search(docs, {"query": {"match": {"text": {
        "query": "alpha beta gamma", "minimum_should_match": 2}}},
        "size": 10}).collect()
    # docs with >= 2 distinct matched terms: 0 (alpha beta),
    # 2 (gamma... only gamma -> 1), 3 (gamma delta -> 1), 4 (beta)
    assert [r["docid"] for r in out] == [0]
    assert out[0]["score"] == pytest.approx(smap[0])


def test_case_insensitive_flags(spark):
    df = spark.createDataFrame(
        [(0, "Alpha"), (1, "ALPHA"), (2, "beta")], ["docid", "k"])
    from anomaly_detection_spark.query.planner import compile_filter

    ids = lambda q: sorted(  # noqa: E731
        r["docid"] for r in df.filter(compile_filter(df, q)).collect())
    assert ids({"term": {"k": {"value": "alpha",
                               "case_insensitive": True}}}) == [0, 1]
    assert ids({"term": {"k": "alpha"}}) == []
    assert ids({"wildcard": {"k": {"value": "al*",
                                   "case_insensitive": True}}}) == [0, 1]
    assert ids({"prefix": {"k": {"value": "alp",
                                 "case_insensitive": True}}}) == [0, 1]
    assert ids({"regexp": {"k": {"value": "alpha",
                                 "case_insensitive": True}}}) == [0, 1]
    assert ids({"regexp": {"k": "alpha"}}) == []
