"""Search-UX ring: from/size offset pagination and highlight
(round 5 continuation)."""

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.highlight import query_terms
from anomaly_detection_spark.query import analyze_docs
from anomaly_detection_spark.query.planner import search


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "user", "the quick brown fox jumps"),
        (1, "tool", "quick query data"),
        (2, "user", "slow query engine"),
        (3, "user", "nothing relevant here"),
        (4, "tool", "quick quick query"),
    ]
    df = spark.createDataFrame(rows, ["docid", "role", "text"])
    return analyze_docs(df).persist()


def test_from_offsets_scored_pages(docs):
    full = search(docs, {"query": {"match": {"text": "quick query"}},
                         "size": 10}).toPandas()
    page2 = search(docs, {"query": {"match": {"text": "quick query"}},
                          "from": 2, "size": 2}).toPandas()
    assert list(page2.docid) == list(full.docid[2:4])
    assert list(page2.score) == list(full.score[2:4])
    # beyond the result set → empty, not an error
    beyond = search(docs, {"query": {"match": {"text": "quick query"}},
                           "from": 50, "size": 10}).toPandas()
    assert len(beyond) == 0
    with pytest.raises(ValueError, match="from"):
        search(docs, {"query": {"match_all": {}}, "from": -1})


def test_from_offsets_filter_pages(docs):
    body = {"query": {"term": {"role": "user"}},
            "sort": [("docid", "asc")], "size": 2}
    p1 = search(docs, body).toPandas()
    p2 = search(docs, {**body, "from": 2}).toPandas()
    assert list(p1.docid) == [0, 2]
    assert list(p2.docid) == [3]


def test_highlight_wraps_matched_tokens(docs):
    out = search(docs, {"query": {"match": {"text": "quick query"}},
                        "size": 10,
                        "highlight": {"fields": {"text": {}}}}).toPandas()
    by_id = dict(zip(out.docid, out.text_highlight))
    assert by_id[1] == "<em>quick</em> <em>query</em> data"
    assert by_id[4] == "<em>quick</em> <em>quick</em> <em>query</em>"
    # token boundaries: "quick" must not highlight inside "quickly"
    assert "text" in out.columns          # original preserved


def test_highlight_custom_tags_and_case(spark):
    df = analyze_docs(spark.createDataFrame(
        [(0, "Quick QUICKLY quick-fix")], ["docid", "text"]))
    out = search(df, {"query": {"match": {"text": "quick"}}, "size": 5,
                      "highlight": {"fields": {"text": {}},
                                    "pre_tags": ["[["],
                                    "post_tags": ["]]"]}}).toPandas()
    assert out.text_highlight[0] == "[[Quick]] QUICKLY [[quick]]-fix"


def test_highlight_terms_from_compound_queries():
    terms = query_terms({"function_score": {
        "query": {"dis_max": {"queries": [
            {"match": {"text": "alpha beta"}},
            {"bool": {"should": [{"match_phrase": {"text": "gamma"}}]}},
        ]}}}})
    assert terms == ["alpha", "beta", "gamma"]


def test_highlight_on_index_path(spark, tiny_transcripts):
    import shutil
    import tempfile

    from anomaly_detection_spark.index import build_index
    from anomaly_detection_spark.query import IndexReader

    tmp = tempfile.mkdtemp(prefix="adspark_hl_")
    try:
        paths = build_index(tiny_transcripts, f"{tmp}/idx", seg_size=512,
                            block_size=64, segments_per_batch=2,
                            keep_cols=("text", "role"))
        reader = IndexReader(spark, paths.root)
        out = search(reader, {"query": {"match": {"text": "spark query"}},
                              "size": 5,
                              "highlight": {"fields": {"text": {}}}}
                     ).toPandas()
        assert len(out) == 5
        assert out.text_highlight.str.contains("<em>").all()
        # a field the index did not store → a clear error, not a crash
        with pytest.raises(ValueError, match="keep_cols"):
            search(reader, {"query": {"match": {"text": "spark"}},
                            "size": 5,
                            "highlight": {"fields": {"tool": {}}}})
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ------------------------------------------------- fragment highlights

def test_highlight_fragments(spark):
    from anomaly_detection_spark.query import analyze_docs
    from anomaly_detection_spark.query.planner import search

    filler = " ".join(f"w{i}" for i in range(60))
    text = f"alpha starts here {filler} middle alpha beta again {filler} tail beta end"
    df = analyze_docs(spark.createDataFrame(
        [(0, text), (1, "no matches at all")], ["docid", "text"]))
    out = search(df, {
        "query": {"match": {"text": "alpha beta"}},
        "_source": True,
        "highlight": {"fields": {"text": {
            "fragment_size": 60, "number_of_fragments": 3}}},
        "size": 5}).collect()
    byid = {r["docid"]: r["text_highlight"] for r in out}
    frags = byid[0]
    assert 2 <= len(frags) <= 3
    joined = " ".join(frags)
    assert "<em>alpha</em>" in joined and "<em>beta</em>" in joined
    # fragments are snippets, not the whole field, in document order
    assert all(len(f) < len(text) / 2 for f in frags)
    assert text.find(frags[0].replace("<em>", "").replace("</em>", "")
                     [:20]) < text.find(
        frags[-1].replace("<em>", "").replace("</em>", "")[:20])
    # never split a word: each fragment's raw form appears verbatim
    for f in frags:
        raw = f.replace("<em>", "").replace("</em>", "")
        assert raw in text
    # number_of_fragments=1 caps
    one = search(df, {
        "query": {"match": {"text": "alpha beta"}},
        "_source": True,
        "highlight": {"fields": {"text": {
            "fragment_size": 40, "number_of_fragments": 1}}},
        "size": 5}).collect()
    assert len({r["docid"]: r for r in one}[0]["text_highlight"]) == 1
    # number_of_fragments=0 keeps the whole-field string mode
    whole = search(df, {
        "query": {"match": {"text": "alpha"}},
        "_source": True,
        "highlight": {"fields": {"text": {"number_of_fragments": 0}}},
        "size": 5}).collect()
    w = {r["docid"]: r for r in whole}[0]["text_highlight"]
    assert isinstance(w, str) and w.count("<em>alpha</em>") == 2


def test_highlight_survives_source_filtering(spark):
    from anomaly_detection_spark.query import analyze_docs
    from anomaly_detection_spark.query.planner import search

    df = analyze_docs(spark.createDataFrame(
        [(0, "u", "alpha beta gamma")], ["docid", "role", "text"]))
    out = search(df, {"query": {"match": {"text": "alpha"}},
                      "_source": False,
                      "highlight": {"fields": {"text": {
                          "number_of_fragments": 1}}},
                      "size": 1})
    assert out.columns == ["docid", "score", "text_highlight"]
    assert out.collect()[0]["text_highlight"] == ["<em>alpha</em> beta gamma"]
