"""Star-tree index analog: one-pass cube build, partition-pruned
slice routing, carrier re-aggregation — every answer checked against
direct aggregation of the raw frame."""
import tempfile

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.index.star_tree import (build_star_tree,
                                                     star_tree_search)


@pytest.fixture(scope="module")
def raw(spark):
    rows = []
    for i in range(2000):
        rows.append((i,
                     f"src{i % 5}",
                     ["en", "fr", "de"][i % 3],
                     # 4 days of data, one row per ~3 min
                     1_700_000_000_000 + i * 180_000,
                     float(i % 97)))
    df = spark.createDataFrame(
        rows, "id long, source string, lang string, ts_ms long, "
              "value double").withColumn(
        "ts", F.timestamp_millis(F.col("ts_ms"))).drop("ts_ms")
    df = df.persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def tree(raw):
    dest = tempfile.mkdtemp(prefix="star_tree_")
    build_star_tree(
        raw, dest,
        dims=["source", "lang", {"field": "ts", "fixed_interval": "1h"}],
        metrics={"v_sum": {"sum": {"field": "value"}},
                 "v_min": {"min": {"field": "value"}},
                 "v_max": {"max": {"field": "value"}},
                 "v_avg": {"avg": {"field": "value"}},
                 "v_cnt": {"value_count": {"field": "value"}}})
    return dest


def _direct(raw, group_cols, cond=None):
    df = raw if cond is None else raw.filter(cond)
    out = (df.groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("doc_count"),
                F.sum("value").alias("v_sum"),
                F.avg("value").alias("v_avg"),
                F.max("value").alias("v_max")))
    return {tuple(r[c] for c in group_cols):
            (r["doc_count"], round(r["v_sum"], 6),
             round(r["v_avg"], 6), r["v_max"])
            for r in out.collect()}


def _got(out, group_cols):
    return {tuple(r[c] for c in group_cols):
            (r["doc_count"], round(r["v_sum"], 6),
             round(r["v_avg"], 6), r["v_max"])
            for r in out.collect()}


_AGGS = {"v_sum": {"sum": {"field": "value"}},
         "v_avg": {"avg": {"field": "value"}},
         "v_max": {"max": {"field": "value"}}}


def test_group_by_one_dim_matches_direct(spark, raw, tree):
    out = star_tree_search(spark, tree, {
        "group_by": [{"terms": {"field": "source"}}],
        "aggregations": _AGGS})
    assert _got(out, ["source"]) == _direct(raw, ["source"])


def test_group_by_two_dims_matches_direct(spark, raw, tree):
    out = star_tree_search(spark, tree, {
        "group_by": [{"terms": {"field": "source"}},
                     {"terms": {"field": "lang"}}],
        "aggregations": _AGGS})
    assert _got(out, ["source", "lang"]) == _direct(raw,
                                                    ["source", "lang"])


def test_filter_outside_grouping_reaggregates_carriers(spark, raw, tree):
    # filter dim (lang) NOT in the grouping: the slice has both dims
    # materialized; carriers re-aggregate after the filter — exact
    out = star_tree_search(spark, tree, {
        "query": {"term": {"lang": "fr"}},
        "group_by": [{"terms": {"field": "source"}}],
        "aggregations": _AGGS})
    assert _got(out, ["source"]) == _direct(
        raw, ["source"], F.col("lang") == "fr")


def test_bool_filter_terms_and_global_agg(spark, raw, tree):
    out = star_tree_search(spark, tree, {
        "query": {"bool": {"filter": [
            {"terms": {"source": ["src1", "src3"]}},
            {"term": {"lang": "en"}}]}},
        "aggregations": _AGGS})
    r = out.collect()[0]
    cond = F.col("source").isin("src1", "src3") & (F.col("lang") == "en")
    want = raw.filter(cond).agg(
        F.count(F.lit(1)), F.sum("value"), F.avg("value")).collect()[0]
    assert r["doc_count"] == want[0]
    assert r["v_sum"] == pytest.approx(want[1])
    assert r["v_avg"] == pytest.approx(want[2])


def test_date_histogram_rebuckets_to_multiple(spark, raw, tree):
    # built at 1h; query at 1d (a multiple) — must equal direct
    out = star_tree_search(spark, tree, {
        "group_by": [{"date_histogram": {"field": "ts",
                                         "fixed_interval": "1d"}}],
        "aggregations": _AGGS})
    day = F.timestamp_millis(
        (F.floor(F.unix_millis(F.col("ts")) / 86_400_000)
         * 86_400_000).cast("long"))
    direct = _direct(raw.withColumn("ts", day), ["ts"])
    assert _got(out, ["ts"]) == direct
    with pytest.raises(ValueError, match="multiple"):
        star_tree_search(spark, tree, {
            "group_by": [{"date_histogram": {
                "field": "ts", "fixed_interval": "90m"}}]})


def test_slice_routing_reads_one_partition(spark, raw, tree):
    out = star_tree_search(spark, tree, {
        "group_by": [{"terms": {"field": "source"}}],
        "aggregations": _AGGS})
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the grouping-id equality lands in the scan's PartitionFilters —
    # the other 2^k − 1 slices are never read
    assert "_gid" in plan and "PartitionFilters" in plan


def test_rejections_by_name(spark, raw, tree):
    with pytest.raises(ValueError, match="not mergeable"):
        build_star_tree(raw, tempfile.mkdtemp(), dims=["source"],
                        metrics={"p": {"percentiles": {"field": "value"}}})
    with pytest.raises(ValueError, match="at most"):
        build_star_tree(raw, tempfile.mkdtemp(),
                        dims=[f"d{i}" for i in range(9)], metrics={})
    with pytest.raises(ValueError, match="not a dim"):
        star_tree_search(spark, tree, {
            "query": {"term": {"value": 3.0}},
            "group_by": [{"terms": {"field": "source"}}]})
    with pytest.raises(ValueError, match="no star_tree carrier"):
        star_tree_search(spark, tree, {
            "group_by": [{"terms": {"field": "source"}}],
            "aggregations": {"x": {"sum": {"field": "id"}}}})
    with pytest.raises(ValueError, match="term/terms"):
        star_tree_search(spark, tree, {
            "query": {"range": {"value": {"gte": 1}}},
            "group_by": [{"terms": {"field": "source"}}]})
    with pytest.raises(ValueError, match="date dim"):
        star_tree_search(spark, tree, {
            "query": {"term": {"ts": "2023-11-14"}},
            "group_by": [{"terms": {"field": "source"}}]})


def test_single_clause_bool_filter_dict(spark, raw, tree):
    # the reference accepts bool.filter as a bare clause dict
    out = star_tree_search(spark, tree, {
        "query": {"bool": {"filter": {"term": {"lang": "fr"}}}},
        "aggregations": _AGGS})
    r = out.collect()[0]
    want = raw.filter(F.col("lang") == "fr").count()
    assert r["doc_count"] == want


def test_unknown_dim_option_rejects_by_name(raw):
    with pytest.raises(ValueError, match="calendar_interval"):
        build_star_tree(raw, tempfile.mkdtemp(), dims=[
            {"field": "ts", "calendar_interval": "1d"}],
            metrics={})
