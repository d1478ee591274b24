import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query.aggs import (
    auto_date_histogram,
    bucket_sort,
    composite_agg,
    date_histogram,
    date_range_agg,
    filter_agg,
    min_bucket,
    serial_diff,
    terms_agg,
)
from anomaly_detection_spark.query.planner import compile_filter, plan_query, search

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(f"{SF}/events.parquet").persist()
    yield df
    # unpersist: a leaked cache entry makes CacheManager substitute the
    # full-schema InMemoryRelation into other files' plan-audit tests
    df.unpersist()


# ---------------------------------------------------------------- planner

def test_term_terms_range_exists(tiny_transcripts):
    df = tiny_transcripts
    pdf = df.toPandas()
    n = df.filter(compile_filter(df, {"term": {"role": "user"}})).count()
    assert n == (pdf.role == "user").sum()
    n = df.filter(compile_filter(df, {"terms": {"role": ["user", "tool"]}})).count()
    assert n == pdf.role.isin(["user", "tool"]).sum()
    n = df.filter(compile_filter(df, {"exists": {"field": "tool"}})).count()
    assert n == pdf.tool.notna().sum()
    q = {"range": {"turn_idx": {"gte": 2, "lt": 5}}}
    n = df.filter(compile_filter(df, q)).count()
    assert n == ((pdf.turn_idx >= 2) & (pdf.turn_idx < 5)).sum()


def test_range_epoch_millis_on_ts(tiny_transcripts):
    df = tiny_transcripts
    pdf = df.toPandas()
    lo = pd.Timestamp("2025-06-02")
    hi = pd.Timestamp("2025-06-04")
    q = {"range": {"ts": {"gte": int(lo.value // 10**6), "lt": int(hi.value // 10**6)}}}
    n = df.filter(compile_filter(df, q)).count()
    assert n == ((pdf.ts >= lo) & (pdf.ts < hi)).sum()


def test_bool_and_must_not_and_wildcard(tiny_transcripts):
    df = tiny_transcripts
    pdf = df.toPandas()
    q = {"bool": {
        "filter": [{"term": {"role": "assistant"}}],
        "must_not": [{"term": {"tool": "bash"}}],
        "should": [{"range": {"turn_idx": {"lt": 3}}},
                   {"range": {"turn_idx": {"gte": 10}}}],
    }}
    # with filter clauses present, minimum_should_match defaults to 0
    # (OpenSearch BoolQueryBuilder): should must NOT shrink the set
    n = df.filter(compile_filter(df, q)).count()
    want = ((pdf.role == "assistant")
            & ~(pdf.tool == "bash").fillna(False)).sum()
    assert n == want
    # explicit minimum_should_match=1 restores the conjunction
    q["bool"]["minimum_should_match"] = 1
    n = df.filter(compile_filter(df, q)).count()
    want = ((pdf.role == "assistant") & ~(pdf.tool == "bash").fillna(False)
            & ((pdf.turn_idx < 3) | (pdf.turn_idx >= 10))).sum()
    assert n == want
    n = df.filter(compile_filter(df, {"wildcard": {"conv_id": {"value": "conv-0000001*"}}})).count()
    assert n == pdf.conv_id.str.match(r"conv-0000001.*").sum()


def test_match_filter_context(tiny_transcripts):
    df = tiny_transcripts
    q = {"match": {"text": "spark query"}}
    got = df.filter(compile_filter(df, q)).count()
    from anomaly_detection_spark.functions.tokenizer import tokenize_texts
    pdf = df.select("text").toPandas()
    toks = tokenize_texts(pdf.text)
    want = toks.map(lambda tl: bool({"spark", "query"} & set(tl))).sum()
    assert got == want


def test_nested_query(spark):
    rows = [(1, [{"name": "host", "value": "h1"}, {"name": "proc", "value": "p2"}]),
            (2, [{"name": "host", "value": "h2"}]),
            (3, [])]
    df = spark.createDataFrame(
        rows, "id int, entity array<struct<name:string,value:string>>")
    q = {"nested": {"path": "entity", "query": {"term": {"entity.value": "h2"}}}}
    got = [r["id"] for r in df.filter(compile_filter(df, q)).collect()]
    assert got == [2]


def test_search_scored_routes_to_bm25(tiny_transcripts):
    from anomaly_detection_spark.query import analyze_docs, bm25_topk_bruteforce
    analyzed = analyze_docs(tiny_transcripts).persist()
    body = {"query": {"bool": {"must": [{"match": {"text": "spark query data"}}],
                               "filter": [{"term": {"role": "user"}}]}},
            "size": 5}
    got = search(analyzed, body).toPandas()
    want = bm25_topk_bruteforce(analyzed, "spark query data", k=5,
                                filter_cond=F.col("role") == "user").toPandas()
    assert list(got.docid) == list(want.docid)


# ---------------------------------------------------------------- aggs

def test_date_histogram_min_doc_count_zero(events):
    out = date_histogram(events, "ts", 3600_000,
                         {"v_sum": {"sum": {"field": "value"}}}).toPandas()
    pdf = events.toPandas()
    buckets = pdf.ts.dt.floor("h").value_counts()
    # dense grid: every hour between min and max present
    lo, hi = pdf.ts.min().floor("h"), pdf.ts.max().floor("h")
    expect_n = int((hi - lo) / pd.Timedelta("1h")) + 1
    assert len(out) == expect_n
    nz = out[out.doc_count > 0].set_index("bucket_start").doc_count
    assert (nz == buckets[nz.index]).all()
    assert (out[out.doc_count == 0].v_sum.isna()).all()


def test_auto_date_histogram_bucket_cap(events):
    out = auto_date_histogram(events, "ts", 20).toPandas()
    assert 0 < len(out) <= 20
    assert out.interval_ms.nunique() == 1


def test_date_range_overlapping(events):
    pdf = events.toPandas()
    base = int(pdf.ts.min().value // 10**6)
    ranges = [(base, base + 7200_000), (base + 3600_000, base + 10800_000)]
    out = date_range_agg(events, "ts", ranges,
                         {"v_max": {"max": {"field": "value"}}}).toPandas()
    ms = pdf.ts.astype("int64") // 10**6
    for i, (lo, hi) in enumerate(ranges):
        m = (ms >= lo) & (ms < hi)
        row = out[out.range_id == i]
        assert int(row.doc_count.iloc[0]) == m.sum()
        assert abs(float(row.v_max.iloc[0]) - pdf.value[m].max()) < 1e-9


def test_terms_agg_tie_order(events):
    out = terms_agg(events, "event_type", size=3).toPandas()
    pdf = events.toPandas()
    counts = pdf.event_type.value_counts()
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(out.event_type, out.doc_count)) == want


def test_composite_and_filter_agg(events):
    out = composite_agg(events, ["event_type", "user_id"],
                        {"v_avg": {"avg": {"field": "value"}}})
    pdf = events.toPandas()
    assert out.count() == pdf.groupby(["event_type", "user_id"]).ngroups
    fa = filter_agg(events, F.col("value") > 50,
                    {"v_min": {"min": {"field": "value"}}}).toPandas()
    assert int(fa.doc_count.iloc[0]) == (pdf.value > 50).sum()


def test_pipeline_aggs(events):
    hist = date_histogram(events, "ts", 3600_000, min_doc_count=1)
    d = serial_diff(hist, "doc_count", "bucket_start").toPandas()
    d = d.sort_values("bucket_start").reset_index(drop=True)
    assert pd.isna(d.doc_count_diff.iloc[0])
    assert (d.doc_count_diff[1:] == d.doc_count.diff()[1:]).all()
    mb = min_bucket(hist, "doc_count").toPandas()
    assert int(mb.min_doc_count.iloc[0]) == int(d.doc_count.min())
    bs = bucket_sort(hist, [("doc_count", "desc"), ("bucket_start", "asc")],
                     from_=1, size=3).toPandas()
    full = d.sort_values(["doc_count", "bucket_start"],
                         ascending=[False, True]).reset_index(drop=True)
    assert list(bs.doc_count) == list(full.doc_count[1:4])
