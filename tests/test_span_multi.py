"""span_multi (SpanMultiTermQueryWrapper): predicate matchers, the
rewrite-to-span_or semantics vs manual expansion, planner wiring,
brute ≡ index identity, and the TooManyClauses expansion cap."""

import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

from anomaly_detection_spark.functions.spans import (
    parse_span_tree, pred_matcher, rewrite_preds, span_tree_match,
    tree_preds)


def _m(kind, val, **extra):
    node = {"k": "pred", "kind": kind, "val": val, **extra}
    return pred_matcher(node)


def test_pred_matchers():
    vocab = pd.Series(["quick", "quiet", "brown", "fox", "foxes",
                       "quickly", "ab", "ba", "box"])
    assert list(vocab[_m("prefix", "qui")(vocab)]) == \
        ["quick", "quiet", "quickly"]
    assert list(vocab[_m("wildcard", "f*x")(vocab)]) == ["fox"]
    assert list(vocab[_m("wildcard", "?ox")(vocab)]) == ["fox", "box"]
    assert list(vocab[_m("regexp", "fox(es)?")(vocab)]) == \
        ["fox", "foxes"]
    # fuzzy = OSA: adjacent transposition is ONE edit
    assert list(vocab[_m("fuzzy", "ab", max_edits=1)(vocab)]) == \
        ["ab", "ba"]
    assert list(vocab[_m("fuzzy", "fox", max_edits=1)(vocab)]) == \
        ["fox", "box"]


def test_parse_span_multi():
    fld, node = parse_span_tree("span_multi", {
        "match": {"prefix": {"text": {"value": "qu"}}}})
    assert fld == "text" and node["k"] == "pred" \
        and node["kind"] == "prefix" and node["val"] == "qu"
    fld, node = parse_span_tree("span_multi", {
        "match": {"fuzzy": {"text": {"value": "fox",
                                     "fuzziness": 1}}}})
    assert node["max_edits"] == 1
    with pytest.raises(ValueError, match="prefix/wildcard"):
        parse_span_tree("span_multi", {
            "match": {"match": {"text": "nope"}}})


def test_rewrite_equals_manual_expansion():
    toks = "the quick brown fox jumps over the quiet lazy dog".split()
    tree = parse_span_tree("span_near", {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": {"value": "qu"}}}}},
        {"span_term": {"text": "fox"}}],
        "slop": 1, "in_order": True})[1]
    manual = parse_span_tree("span_near", {"clauses": [
        {"span_or": {"clauses": [{"span_term": {"text": "quick"}},
                                 {"span_term": {"text": "quiet"}}]}},
        {"span_term": {"text": "fox"}}],
        "slop": 1, "in_order": True})[1]
    assert span_tree_match(toks, tree) == span_tree_match(toks, manual)
    assert span_tree_match(toks, tree) is True
    # no token matches the pred -> no spans, no crash
    none = parse_span_tree("span_multi", {
        "match": {"prefix": {"text": {"value": "zzz"}}}})[1]
    assert span_tree_match(toks, none) is False


def test_rewrite_preds_dfs_order():
    tree = parse_span_tree("span_not", {
        "include": {"span_multi": {
            "match": {"prefix": {"text": {"value": "a"}}}}},
        "exclude": {"span_multi": {
            "match": {"prefix": {"text": {"value": "b"}}}}}})[1]
    assert [p["val"] for p in tree_preds(tree)] == ["a", "b"]
    rw = rewrite_preds(tree, iter([["apple"], ["bad"]]))
    assert rw["inc"]["cl"][0]["t"] == "apple"
    assert rw["exc"]["cl"][0]["t"] == "bad"


def test_planner_span_multi_filter(spark):
    from anomaly_detection_spark.query.planner import compile_filter

    df = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "a quiet evening"),
         (2, "nothing here")], "docid long, text string")
    q = {"span_multi": {"match": {"prefix": {"text": {"value": "qui"}}}}}
    got = sorted(r["docid"] for r in
                 df.filter(compile_filter(df, q)).collect())
    assert got == [0, 1]
    # inside span_near: pred clause is unit-length, accepted
    q2 = {"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": {"value": "qui"}}}}},
        {"span_term": {"text": "fox"}}], "slop": 1, "in_order": True}}
    got = sorted(r["docid"] for r in
                 df.filter(compile_filter(df, q2)).collect())
    assert got == [0]


def test_span_multi_brute_equals_index(spark, tiny_transcripts):
    from anomaly_detection_spark.index import build_index
    from anomaly_detection_spark.query import IndexReader, analyze_docs
    from anomaly_detection_spark.query.index_search import (
        span_tree_docs_indexed)

    tmp = tempfile.mkdtemp(prefix="adspark_spmulti_")
    analyzed = None
    try:
        paths = build_index(tiny_transcripts, f"{tmp}/idx", seg_size=256,
                            block_size=64, segments_per_batch=2,
                            positions=True)
        reader = IndexReader(spark, paths.root)
        analyzed = analyze_docs(tiny_transcripts).persist()
        trees = [
            parse_span_tree("span_multi", {
                "match": {"prefix": {"text": {"value": "pip"}}}})[1],
            parse_span_tree("span_near", {"clauses": [
                {"span_multi": {"match": {
                    "prefix": {"text": {"value": "que"}}}}},
                {"span_multi": {"match": {
                    "wildcard": {"text": {"value": "d*ta*"}}}}}],
                "slop": 3, "in_order": True})[1],
            parse_span_tree("span_multi", {
                "match": {"fuzzy": {"text": {"value": "spark",
                                             "fuzziness": 1}}}})[1],
        ]
        toks = analyzed.select("docid", "tokens").toPandas()
        nonvacuous = 0
        for node in trees:
            want = sorted(
                int(r.docid) for r in toks.itertuples()
                if span_tree_match(list(r.tokens), node))
            got = [r["docid"] for r in
                   span_tree_docs_indexed(reader, node).collect()]
            assert got == want, node
            nonvacuous += bool(want)
        assert nonvacuous >= 2
        # TooManyClauses parity on the dictionary expansion
        wide = parse_span_tree("span_multi", {
            "match": {"prefix": {"text": {"value": ""}}}})[1]
        with pytest.raises(ValueError, match="TooManyClauses"):
            span_tree_docs_indexed(reader, wide, max_expansions=5)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        if analyzed is not None:
            analyzed.unpersist()


def test_field_masking_span_parse_and_match():
    from anomaly_detection_spark.functions.spans import (
        span_tree_match_fields, tree_leaf_fields)

    fld, node = parse_span_tree("span_near", {"clauses": [
        {"span_term": {"title": "quick"}},
        {"field_masking_span": {
            "query": {"span_term": {"body": "fox"}},
            "field": "title"}}],
        "slop": 0, "in_order": True})
    assert fld == "title"
    assert tree_leaf_fields(node) == {None, "body"}
    # title: "the quick ... "; body positions supply "fox" at pos 2
    by_field = {"title": "the quick story".split(),
                "body": "a b fox c".split()}
    assert span_tree_match_fields(by_field, node, "title") is True
    # move body's fox away from title's quick+1 -> no match at slop 0
    by_field2 = {"title": "the quick story".split(),
                 "body": "fox b c d".split()}
    assert span_tree_match_fields(by_field2, node, "title") is False
    # masked trees refuse the single-field matcher (silent-wrong guard)
    from anomaly_detection_spark.functions.spans import span_tree_match
    with pytest.raises(ValueError, match="field_masking_span"):
        span_tree_match(["x"], node)


def test_field_masking_span_planner(spark):
    from anomaly_detection_spark.query.planner import compile_filter

    df = spark.createDataFrame(
        [(0, "alpha beta", "gamma delta"),
         (1, "alpha x", "y beta"),
         (2, "alpha", "beta")],
        "docid long, title string, extra string")
    # span_near(title:alpha, mask(extra:beta as title)) slop 0 ordered:
    # needs beta in EXTRA at position right after alpha's position in
    # TITLE. doc0: alpha@0(title), extra beta? no ("gamma delta").
    # doc1: alpha@0, extra "y beta" -> beta@1 -> window [0,2) ok.
    # doc2: alpha@0, extra beta@0 -> not after -> no.
    q = {"span_near": {"clauses": [
        {"span_term": {"title": "alpha"}},
        {"field_masking_span": {
            "query": {"span_term": {"extra": "beta"}},
            "field": "title"}}],
        "slop": 0, "in_order": True}}
    got = sorted(r["docid"] for r in
                 df.filter(compile_filter(df, q)).collect())
    assert got == [1]
    # span_multi inside a masked clause
    q2 = {"span_near": {"clauses": [
        {"span_term": {"title": "alpha"}},
        {"field_masking_span": {
            "query": {"span_multi": {
                "match": {"prefix": {"extra": {"value": "bet"}}}}},
            "field": "title"}}],
        "slop": 0, "in_order": True}}
    got = sorted(r["docid"] for r in
                 df.filter(compile_filter(df, q2)).collect())
    assert got == [1]


def test_field_masking_span_index_rejects(spark, tiny_transcripts):
    from anomaly_detection_spark.index import build_index
    from anomaly_detection_spark.query import IndexReader
    from anomaly_detection_spark.query.index_search import (
        span_tree_docs_indexed)

    _, node = parse_span_tree("field_masking_span", {
        "query": {"span_term": {"other": "x"}}, "field": "text"})
    tmp = tempfile.mkdtemp(prefix="adspark_fmask_")
    try:
        paths = build_index(tiny_transcripts, f"{tmp}/idx",
                            seg_size=512, block_size=64, positions=True)
        reader = IndexReader(spark, paths.root)
        with pytest.raises(ValueError, match="brute path"):
            span_tree_docs_indexed(reader, node)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
