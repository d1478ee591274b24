import pandas as pd
from pyspark.sql import functions as F

from anomaly_detection_spark.query import analyze_docs, bm25_topk_bruteforce, corpus_stats

from .oracle import bm25_oracle_topk

QUERIES = [
    "spark query data",
    "the",
    "error result table join",
    "naïve éclair",
    "zzzznotaword",
    "index merge",
]


def _pdf(tiny_transcripts):
    return tiny_transcripts.select("docid", "text", "role", "tool", "ts").orderBy("docid").toPandas()


def test_bruteforce_matches_oracle(spark, tiny_transcripts):
    analyzed = analyze_docs(tiny_transcripts).persist()
    stats = corpus_stats(analyzed)
    pdf = _pdf(tiny_transcripts)
    for q in QUERIES:
        got = bm25_topk_bruteforce(analyzed, q, k=10, stats=stats).toPandas()
        want = bm25_oracle_topk(pdf, q, k=10)
        assert list(got.docid) == list(want.docid), f"rank mismatch for {q!r}"
        assert (got.score - want.score).abs().max() < 1e-9 if len(got) else True


def test_bruteforce_with_filters_matches_oracle(spark, tiny_transcripts):
    analyzed = analyze_docs(tiny_transcripts).persist()
    stats = corpus_stats(analyzed)
    pdf = _pdf(tiny_transcripts)

    cond = (F.col("role") == "assistant") & F.col("tool").isNotNull()
    mask = (pdf.role == "assistant") & pdf.tool.notna()
    got = bm25_topk_bruteforce(analyzed, "spark query data", k=10,
                               filter_cond=cond, stats=stats).toPandas()
    want = bm25_oracle_topk(pdf, "spark query data", k=10, mask=mask)
    assert list(got.docid) == list(want.docid)

    # ts range filter — half-open [from, to) epoch-millis semantics
    ts_lo = pd.Timestamp("2025-06-02")
    ts_hi = pd.Timestamp("2025-06-05")
    cond = (F.col("ts") >= F.lit("2025-06-02")) & (F.col("ts") < F.lit("2025-06-05"))
    mask = (pdf.ts >= ts_lo) & (pdf.ts < ts_hi)
    got = bm25_topk_bruteforce(analyzed, "error result", k=10,
                               filter_cond=cond, stats=stats).toPandas()
    want = bm25_oracle_topk(pdf, "error result", k=10, mask=mask)
    assert list(got.docid) == list(want.docid)


def test_empty_query_returns_empty(spark, tiny_transcripts):
    analyzed = analyze_docs(tiny_transcripts)
    assert bm25_topk_bruteforce(analyzed, "...!!!", k=5).count() == 0


# --- multi_match (multi-field scored match) ----------------------------------


def test_multi_match_best_and_most_fields(spark):
    """Per-field statistics + DisMax/tie_breaker combination
    (MultiMatchQueryBuilder best_fields) and plain sum (most_fields),
    checked against a hand-built two-field corpus."""
    import pandas as pd

    from anomaly_detection_spark.query import (
        analyze_docs,
        bm25_scores,
        multi_match_topk,
    )

    pdf = pd.DataFrame({
        "docid": [0, 1, 2, 3],
        "title": ["spark engine", "query planner", "spark spark", "misc"],
        "body": ["a query engine for data", "spark does queries",
                 "nothing here", "spark query"],
    })
    docs = spark.createDataFrame(pdf)

    # per-field reference scores through the single-field path
    st = {r["docid"]: r["score"] for r in
          bm25_scores(analyze_docs(docs, "title"), "spark query").collect()}
    sb = {r["docid"]: r["score"] for r in
          bm25_scores(analyze_docs(docs, "body"), "spark query").collect()}

    tie = 0.4
    got = {r["docid"]: r["score"] for r in
           multi_match_topk(docs, "spark query", ["title", "body"], k=10,
                            tie_breaker=tie).collect()}
    for d in got:
        a, b_ = st.get(d, 0.0), sb.get(d, 0.0)
        want = max(a, b_) + tie * (a + b_ - max(a, b_))
        assert abs(got[d] - want) < 1e-9

    most = {r["docid"]: r["score"] for r in
            multi_match_topk(docs, "spark query", ["title", "body"], k=10,
                             match_type="most_fields").collect()}
    for d in most:
        assert abs(most[d] - (st.get(d, 0.0) + sb.get(d, 0.0))) < 1e-9

    # ranking: top-k ordered (score desc, docid asc), bounded by k
    top2 = multi_match_topk(docs, "spark query", ["title", "body"],
                            k=2).toPandas()
    assert len(top2) == 2
    assert top2.score.is_monotonic_decreasing


def test_multi_match_through_search_and_index_raises(spark):
    import pandas as pd
    import pytest

    from anomaly_detection_spark.query.planner import search

    docs = spark.createDataFrame(pd.DataFrame({
        "docid": [0, 1], "title": ["spark", "query"],
        "body": ["query", "spark"]}))
    out = search(docs, {"query": {"multi_match": {
        "query": "spark", "fields": ["title", "body"]}}, "size": 5})
    assert out.count() == 2

    with pytest.raises(ValueError, match="best_fields / most_fields"):
        search(docs, {"query": {"multi_match": {
            "query": "spark", "fields": ["title"], "type": "phrase"}}})
