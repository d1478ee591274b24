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
