"""query_string / simple_query_string compiler + match_phrase_prefix
(round 5): parser → DSL shapes, filter-context evaluation, scored
routing, brute/index identity for phrase-prefix."""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.index import build_index
from anomaly_detection_spark.query import (
    IndexReader,
    analyze_docs,
    compile_query_string,
    corpus_stats,
    match_phrase_prefix_topk,
)
from anomaly_detection_spark.query.index_search import (
    match_phrase_prefix_topk_indexed,
)
from anomaly_detection_spark.query.planner import compile_filter, search


# -------------------------------------------------------- parser → DSL

def test_compile_plain_terms_or_bag():
    dsl = compile_query_string({"query": "spark data engine"})
    assert dsl == {"bool": {
        "should": [{"match": {"text": "spark"}},
                   {"match": {"text": "data"}},
                   {"match": {"text": "engine"}}],
        "minimum_should_match": 1}}


def test_compile_and_merges_conjunctive_match():
    dsl = compile_query_string({"query": "spark AND data"})
    assert dsl == {"match": {"text": {"query": "spark data",
                                      "operator": "and"}}}


def test_compile_not_field_phrase_prefix():
    dsl = compile_query_string(
        {"query": 'role:user AND "exact phrase"~2 AND quer* NOT role:tool'})
    b = dsl["bool"]
    assert {"term": {"role": "user"}} in b["must"]
    assert {"match_phrase": {"text": {"query": "exact phrase",
                                      "slop": 2}}} in b["must"]
    assert {"match_phrase_prefix": {"text": {"query": "quer"}}} in b["must"]
    # NOT hoists into the enclosing bool's must_not (A AND B NOT C)
    assert b["must_not"] == [{"term": {"role": "tool"}}]


def test_compile_modifiers_and_wildcard_fuzzy():
    dsl = compile_query_string(
        {"query": "+required -banned plain src:ab?c src:fuzz~1"})
    b = dsl["bool"]
    assert {"match": {"text": "required"}} in b["must"]
    assert {"match": {"text": "banned"}} in b["must_not"]
    assert {"match": {"text": "plain"}} in b["should"]
    assert {"wildcard": {"src": "ab?c"}} in b["should"]
    assert {"fuzzy": {"src": {"value": "fuzz", "fuzziness": 1}}} \
        in b["should"]


def test_compile_query_string_ranges():
    # [ ] inclusive / { } exclusive, mixed brackets, numeric endpoints
    assert compile_query_string({"query": "v:[1 TO 5]"}) \
        == {"range": {"v": {"gte": 1, "lte": 5}}}
    assert compile_query_string({"query": "v:{1.5 TO 5]"}) \
        == {"range": {"v": {"gt": 1.5, "lte": 5}}}
    # * = open end; [* TO *] = exists; strings ride through raw
    assert compile_query_string({"query": "ts:[now-7d/d TO *]"}) \
        == {"range": {"ts": {"gte": "now-7d/d"}}}
    assert compile_query_string({"query": "v:[* TO *]"}) \
        == {"exists": {"field": "v"}}
    # bare range on the default field (colons inside endpoints OK)
    assert compile_query_string(
        {"query": "[2020-01-01T00:00:00 TO 2021-01-01T00:00:00}",
         "default_field": "ts"}) \
        == {"range": {"ts": {"gte": "2020-01-01T00:00:00",
                             "lt": "2021-01-01T00:00:00"}}}
    # >= > <= < shorthands
    assert compile_query_string({"query": "v:>=10"}) \
        == {"range": {"v": {"gte": 10}}}
    assert compile_query_string({"query": "v:<3 AND v:>1"}) \
        == {"bool": {"must": [{"range": {"v": {"lt": 3}}},
                              {"range": {"v": {"gt": 1}}}]}}
    # malformed ranges still raise in strict mode
    with pytest.raises(ValueError, match="range"):
        compile_query_string({"query": "v:[1 5]"})
    # simple_query_string has no range syntax → lenient degrade
    assert set(compile_query_string({"query": "v:[1 TO 5]"},
                                    simple=True)) \
        <= {"match", "bool", "match_all"}


def test_query_string_range_filter_context(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (1, 5.0), (2, 10.0), (3, None)],
        ["docid", "value"])
    got = sorted(r["docid"] for r in df.filter(compile_filter(
        df, {"query_string": {
            "query": "value:[1 TO 5] OR value:>9",
            "default_field": "text"}})).collect())
    assert got == [0, 1, 2]
    got2 = sorted(r["docid"] for r in df.filter(compile_filter(
        df, {"query_string": {"query": "value:{1 TO 10}",
                              "default_field": "text"}})).collect())
    assert got2 == [1]


def test_simple_query_string_flags():
    q = 'a | b -c "x y"~1 pre*'
    # default = ALL: every operator active
    full = compile_query_string({"query": q}, simple=True)
    assert {"match_phrase": {"text": {"query": "x y", "slop": 1}}} \
        in full["bool"]["should"]
    assert full["bool"]["must_not"] == [{"match": {"text": "c"}}]
    # NONE: every operator character is literal text
    none = compile_query_string({"query": q, "flags": "NONE"},
                                simple=True)
    assert none == {"bool": {"should": [
        {"match": {"text": "a"}}, {"match": {"text": "b"}},
        {"match": {"text": "-c"}}, {"match": {"text": "x y"}},
        {"match": {"text": "pre"}}], "minimum_should_match": 1}}
    # PHRASE without NEAR: quoted phrase honored, ~N suffix literal
    assert compile_query_string({"query": '"x y"~3', "flags": "PHRASE"},
                                simple=True) \
        == {"match_phrase": {"text": {"query": "x y", "slop": 0}}}
    # selective: OR active, NOT disabled → -c is literal
    sel = compile_query_string({"query": "a | b -c", "flags": "OR"},
                               simple=True)
    assert {"match": {"text": "-c"}} in sel["bool"]["should"]
    # parameter errors raise even in the never-raising simple mode
    with pytest.raises(ValueError, match="flag"):
        compile_query_string({"query": "a", "flags": "BOGUS"},
                             simple=True)
    with pytest.raises(ValueError, match="simple_query_string"):
        compile_query_string({"query": "a", "flags": "ALL"})


def test_simple_query_string_never_raises():
    # unbalanced parens + range syntax → degrades to a term bag
    dsl = compile_query_string({"query": '((broken v:[1 TO'},
                               simple=True)
    assert set(dsl) <= {"match", "bool", "match_all"}
    dsl2 = compile_query_string({"query": "a | b +c -d"}, simple=True)
    assert "bool" in dsl2 or "match" in dsl2


# -------------------------------------------------- filter-context eval

@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "user", "the quick brown fox jumps"),
        (1, "tool", "quick query data"),
        (2, "user", "slow query engine"),
        (3, "user", "nothing relevant"),
    ]
    return spark.createDataFrame(rows, ["docid", "role", "text"]).persist()


def test_query_string_filter_context(docs):
    got = sorted(r["docid"] for r in docs.filter(compile_filter(
        docs, {"query_string": {
            "query": "quick OR engine"}})).collect())
    assert got == [0, 1, 2]
    got2 = sorted(r["docid"] for r in docs.filter(compile_filter(
        docs, {"query_string": {
            "query": "query AND role:user"}})).collect())
    assert got2 == [2]
    got3 = sorted(r["docid"] for r in docs.filter(compile_filter(
        docs, {"query_string": {"query": "qu* NOT brown"}})).collect())
    assert got3 == [1, 2]


def test_match_phrase_prefix_filter_context(docs):
    got = sorted(r["docid"] for r in docs.filter(compile_filter(
        docs, {"match_phrase_prefix": {"text": {"query": "quick qu"}}}
    )).collect())
    assert got == [1]
    got1 = sorted(r["docid"] for r in docs.filter(compile_filter(
        docs, {"match_phrase_prefix": {"text": "qui"}})).collect())
    assert got1 == [0, 1]


def test_scored_query_string_topk(docs):
    an = analyze_docs(docs)
    out = search(an, {"query": {"query_string": {
        "query": "quick query"}}, "size": 10}).toPandas()
    assert set(out.docid) == {0, 1, 2}
    assert list(out.docid)[0] == 1      # both terms → top


# ----------------------------------------- phrase-prefix brute ≡ index

def test_phrase_prefix_index_matches_bruteforce(spark, tiny_transcripts):
    tmp = tempfile.mkdtemp(prefix="adspark_pp_")
    try:
        paths = build_index(tiny_transcripts, f"{tmp}/idx", seg_size=512,
                            block_size=64, segments_per_batch=2,
                            positions=True)
        reader = IndexReader(spark, paths.root)
        analyzed = analyze_docs(tiny_transcripts).persist()
        stats = corpus_stats(analyzed)
        rows = (analyzed.filter(F.size("tokens") >= 6)
                .orderBy("docid").limit(3).collect())
        cases = [" ".join(r["tokens"][1:3])[:-1] or r["tokens"][1]
                 for r in rows]
        cases += [rows[0]["tokens"][0][:2]]      # single prefix term
        for phrase in cases:
            want = match_phrase_prefix_topk(
                analyzed, phrase, k=10, stats=stats).toPandas()
            got = match_phrase_prefix_topk_indexed(
                reader, phrase, k=10).toPandas()
            assert list(got.docid) == list(want.docid), phrase
            assert np.allclose(got.score, want.score), phrase
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_field_grouping_and_boosts_never_silently_wrong():
    from anomaly_detection_spark.query.query_string import (
        compile_query_string)

    # Lucene field grouping distributes the field over the group
    assert compile_query_string({"query": "role:(user assistant)",
                                 "default_field": "text"}) \
        == {"bool": {"should": [{"term": {"role": "user"}},
                                {"term": {"role": "assistant"}}],
                     "minimum_should_match": 1}}
    # modifiers and phrases inside the group bind to the field too
    assert compile_query_string({"query": 'text:(+fast -"slow query")',
                                 "default_field": "other",
                                 "analyzed_fields": ["text"]}) \
        == {"bool": {"must": [{"match": {"text": "fast"}}],
                     "must_not": [{"match_phrase": {
                         "text": {"query": "slow query", "slop": 0}}}]}}
    # terms AFTER the group revert to the default field
    after = compile_query_string({"query": "role:(user) fast",
                                  "default_field": "text"})
    assert {"match": {"text": "fast"}} in after["bool"]["should"]
    assert {"term": {"role": "user"}} in after["bool"]["should"]
    with pytest.raises(ValueError, match="boosts"):
        compile_query_string({"query": "role:admin^2",
                              "default_field": "text"})
    with pytest.raises(ValueError, match="dangling field"):
        compile_query_string({"query": "role: user",
                              "default_field": "text"})
    # simple mode: SimpleQueryParser has no field syntax — ':' is
    # literal text and the group is plain parentheses
    out = compile_query_string({"query": "role:(user assistant)",
                                "default_field": "text"}, simple=True)
    assert {"match": {"text": "role:"}} in out["bool"]["should"]
    # ranges/shorthands are literal text in simple mode too
    assert compile_query_string({"query": "v:[1 TO 5]"}, simple=True) \
        == {"match": {"text": "v:[1 TO 5]"}}
    # strict multi-field mode: unqualified range syntax is NOT a plain
    # term bag — raise like every other rich clause instead of silently
    # matching the literal text (ADVICE r5)
    for rich in ("[1 TO 5]", "{1 TO 5}", ">=5", "<5", "fast >3"):
        with pytest.raises(ValueError, match="field:"):
            compile_query_string({"query": rich, "fields": ["a", "b"]})
    # simple multi-field mode keeps them literal (no range syntax there)
    assert compile_query_string(
        {"query": "[1 TO 5]", "fields": ["a", "b"]}, simple=True) \
        == {"multi_match": {"query": "[1 TO 5]", "fields": ["a", "b"]}}


def test_score_script_field_containing_score_substring(spark):
    from anomaly_detection_spark.query.compound import (
        _compile_score_script, compile_filter_script)

    df = spark.createDataFrame([(1, 2.0, 5.0)],
                               "docid long, raw_score double, v double")
    c = _compile_score_script("doc['raw_score'].value * 2",
                              {"raw_score", "v", "score"})
    row = df.withColumn("score", F.lit(1.0)).select(c.alias("x")) \
        .collect()[0]
    assert row["x"] == 4.0
    # exponent-form numeric params pass the validator
    cond = compile_filter_script("doc['v'].value > params.eps",
                                 {"eps": 1e-9}, {"v"})
    assert df.filter(cond).count() == 1
